"""Tag and metadata evidence components for the fusion pipeline.

The fusion stage (operators/search.py fuse_evidence) declares weights for
``tag`` and ``metadata`` sources (search_engine_config.h:78-96); these are
the producers, recast from the reference's SearchEngine component queries:

* ``tag_component`` — ``queryTags`` (search_engine.cpp:5510-5553):
  matchAll intersects the tag set (docs carrying EVERY requested tag,
  score 1.0); matchAny unions them with position-based decay
  ``1 / (1 + 0.1·rank)``.
* ``metadata_component`` — ``queryMetadata`` (search_engine.cpp:5556+):
  conjunctive key=value filters over exploded metadata, every match
  scored 1.0.

Both emit the fusion contract (doc_id, source, score, rank) and both are
single-shuffle groupBy/join plans — tag posting lists at 100 TB behave
exactly like term posting lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yams_spark.operators.search import global_rank


def tag_component(
    doc_tags: DataFrame,
    tags: list[str],
    match_all: bool = True,
    limit: int = 100,
    id_col: str = "doc_id",
    tag_col: str = "tag",
) -> DataFrame:
    """(doc_id, source='tag', score, rank). doc_tags: one row per
    (document, tag). Deterministic order: match count desc, doc_id asc."""
    hits = doc_tags.where(F.col(tag_col).isin(tags)).groupBy(
        F.col(id_col).alias("doc_id")
    ).agg(F.countDistinct(tag_col).alias("n_matched"))
    if match_all:
        hits = hits.where(F.col("n_matched") == len(set(tags)))
    order = [F.col("n_matched").desc(), F.col("doc_id").asc()]
    pooled = hits.orderBy(*order).limit(limit)
    ranked = global_rank(pooled, order, "rk")
    score = (
        F.lit(1.0)
        if match_all
        else F.lit(1.0) / (F.lit(1.0) + 0.1 * (F.col("rk") - 1))
    )
    return ranked.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("tag").alias("source"),
        score.alias("score"),
        (F.col("rk") - 1).alias("rank"),
    )


def metadata_component(
    doc_meta: DataFrame,
    filters: dict[str, str],
    limit: int = 100,
    id_col: str = "doc_id",
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """(doc_id, source='metadata', score=1.0, rank). doc_meta: one row per
    (document, key, value); a document matches when EVERY filter key maps
    to the requested value (conjunctive, like the reference's parsed
    key:value query filters). Empty ``filters`` is rejected: the reference
    treats "no metadata filters" as "don't run the metadata component at
    all" (the caller skips it, see hybrid_search), so an empty conjunction
    here is a caller bug, not an unconstrained scan."""
    if not filters:
        raise ValueError(
            "metadata_component requires at least one key=value filter; "
            "skip the component entirely for unconstrained queries"
        )
    cond = None
    for k, v in filters.items():
        c = (F.col(key_col) == k) & (F.col(value_col) == v)
        cond = c if cond is None else (cond | c)
    hits = (
        doc_meta.where(cond)
        .groupBy(F.col(id_col).alias("doc_id"))
        .agg(F.countDistinct(key_col).alias("n_keys"))
        .where(F.col("n_keys") == len(filters))
    )
    order = [F.col("doc_id").asc()]
    pooled = hits.orderBy(*order).limit(limit)
    ranked = global_rank(pooled, order, "rk")
    return ranked.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("metadata").alias("source"),
        F.lit(1.0).alias("score"),
        (F.col("rk") - 1).alias("rank"),
    )
