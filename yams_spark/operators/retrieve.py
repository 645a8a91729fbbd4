"""Content retrieval: manifest-driven chunk reassembly (the `yams cat`/
retrieve sink, content_store_impl.cpp:379+).

The store keeps per-document manifests (doc_hash → ordered chunk hashes)
and a deduplicated chunk table; retrieval joins manifest to chunks and
re-concatenates in offset order. Spark recast: equi-join + ordered
aggregation (``array_join(array_sort(collect_list(struct(offset, data))))``
— one shuffle, whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yams_spark.functions.chunker import ChunkingConfig, PAGE_CHUNKING, chunk_data


def build_manifest(
    docs: DataFrame,
    id_col: str = "url",
    content_col: str = "text",
    cfg: ChunkingConfig = PAGE_CHUNKING,
) -> tuple[DataFrame, DataFrame]:
    """(manifest, chunks): manifest = (doc_id, chunk_idx, offset, size,
    chunk_hash); chunks = deduplicated (chunk_hash, data). Mirrors
    ContentStore::store's chunk/dedup path (content_store_impl.cpp:217-306)."""
    import pandas as pd

    def chunkify(iterator):
        for pdf in iterator:
            rows = []
            for did, content in zip(pdf[id_col], pdf[content_col]):
                data = content.encode("utf-8") if isinstance(content, str) else bytes(content)
                for i, (off, size, h) in enumerate(chunk_data(data, cfg)):
                    rows.append((did, i, off, size, h, data[off : off + size]))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["doc_id", "chunk_idx", "offset", "size", "chunk_hash", "data"],
                )

    full = docs.select(id_col, content_col).mapInPandas(
        chunkify,
        schema="doc_id string, chunk_idx int, offset long, size long, "
        "chunk_hash string, data binary",
    )
    manifest = full.select("doc_id", "chunk_idx", "offset", "size", "chunk_hash")
    chunks = full.select("chunk_hash", "data").dropDuplicates(["chunk_hash"])
    return manifest, chunks


def retrieve(manifest: DataFrame, chunks: DataFrame) -> DataFrame:
    """doc_hash → reassembled content: join manifest with the chunk store and
    concatenate in offset order. Returns (doc_id, content)."""
    joined = manifest.join(chunks, "chunk_hash")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("offset", "data"))).alias("parts")
        )
        .select(
            "doc_id",
            F.expr(
                "aggregate(parts, cast('' as binary), (acc, p) -> concat(acc, p.data))"
            ).alias("content"),
        )
    )


def dedup_storage_stats(manifest: DataFrame) -> DataFrame:
    """DeduplicationStats (rabin_chunker.cpp:224-239): totals vs unique."""
    total = manifest.agg(
        F.sum("size").alias("total_bytes"), F.count("*").alias("chunk_count")
    )
    uniq = (
        manifest.dropDuplicates(["chunk_hash"])
        .agg(F.sum("size").alias("unique_bytes"), F.count("*").alias("unique_chunks"))
    )
    return total.crossJoin(uniq).withColumn(
        "dedup_ratio",
        F.when(
            F.col("total_bytes") > 0,
            F.lit(1.0) - F.col("unique_bytes") / F.col("total_bytes"),
        ).otherwise(F.lit(0.0)),
    )
