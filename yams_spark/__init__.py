"""yams_spark — a PySpark-native entity-resolution / record-linkage engine.

Re-expresses the query and data-processing capabilities of the reference
system (trvon/yams, a C++ content-addressed store + hybrid search engine)
as idiomatic Spark DataFrame pipelines: blocking (content-defined chunk
hashes, MinHash/LSH bands, SimHash bands, title keys) → vectorized pairwise
scoring → transitive clustering (large-star/small-star connected
components) → canonical selection and lineage metrics.
"""

__version__ = "0.1.0"
