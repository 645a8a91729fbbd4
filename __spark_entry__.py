"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ER pipeline at sf0.001 and returns the
clusters DataFrame. ``queries()`` exposes one entry per implemented
operator family from SURVEY.md §2 (scans/filters, windows, aggregations,
joins, text/search scoring, dedup, similarity search, ER pipeline stages);
``oracle_sql()`` carries the DuckDB-equivalent SQL for every
SQL-expressible query. Column names/aliases match pairwise; floats are
rounded to stable precision on both sides.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

_REPO = os.path.dirname(os.path.abspath(__file__))
import sys

if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# ---------- helpers ----------

_TOKENIZE_SPARK = (
    "filter(split(lower(regexp_replace({col}, '[^0-9a-zA-Z]+', ' ')), ' '), x -> x <> '')"
)
_TOKENIZE_DUCK = (
    "list_filter(string_split(lower(regexp_replace({col}, '[^0-9a-zA-Z]+', ' ', 'g')), ' '), "
    "x -> x <> '')"
)

_BM25_TERMS = ["query", "table", "stream"]
_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ship_package(spark: SparkSession) -> None:
    from yams_spark.session import _ship_package as ship

    ship(spark)


# ---------- flagship ----------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full ER pipeline over pages derived from sf0.001."""
    _ship_package(spark)
    from yams_spark.plans.er_pipeline import PipelineConfig, run_pipeline
    from yams_spark.sources.pages import materialize_pages

    pages, _truth = materialize_pages(
        spark, "/root/testdata/sf0.001", "/tmp/yams_entry_pages_sf0.001"
    )
    out = run_pipeline(spark, pages, PipelineConfig())
    return out["clusters"].select(
        "group_key", "algorithm_version", "canonical_url", "member_count",
        "max_pair_score", "threshold",
    )


# ---------- ER pipeline (rows-only checks; not ANSI-SQL-expressible) ----------

_ER_CACHE: dict[str, dict[str, DataFrame]] = {}


def _er_outputs(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    key = os.path.normpath(sf_dir)
    if key not in _ER_CACHE:
        _ship_package(spark)
        from yams_spark.plans.er_pipeline import PipelineConfig, run_pipeline
        from yams_spark.sources.pages import materialize_pages

        tag = os.path.basename(key)
        pages, _ = materialize_pages(spark, sf_dir, f"/tmp/yams_entry_pages_{tag}")
        ckpt = f"/tmp/yams_entry_ckpt_{tag}"
        os.makedirs(ckpt, exist_ok=True)
        _ER_CACHE[key] = run_pipeline(
            spark, pages, PipelineConfig(checkpoint_dir=ckpt, run_id=f"entry_{tag}")
        )
    return _ER_CACHE[key]


def er_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _er_outputs(spark, sf_dir)["clusters"].select(
        "group_key", "canonical_url", "member_count", "max_pair_score"
    )


def er_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _er_outputs(spark, sf_dir)["members"].select(
        "group_key", "url", "role", "similarity_to_canonical", "pair_score"
    )


def er_scored_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _er_outputs(spark, sf_dir)["scored_pairs"].select(
        "url_a", "url_b",
        F.round("cosine", 6).alias("cosine"),
        F.round("pair_score", 6).alias("pair_score"),
        "accepted",
    )


def er_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _er_outputs(spark, sf_dir)["blocks"].groupBy("family").agg(
        F.count("*").alias("key_rows"),
        F.countDistinct("block_key").alias("distinct_keys"),
    )


def er_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identity invariant: re-extracted text equals the input text."""
    sig = _er_outputs(spark, sf_dir)["signatures"]
    return sig.select(
        "url",
        F.sha2(F.encode("extracted_text", "UTF-8"), 256).alias("text_sha256"),
        "title",
    )


# ---------- SQL-expressible operator queries ----------


def q01_list_scan_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """List scan with filters + sort + limit (services.hpp:630-690)."""
    return (
        _t(spark, sf_dir, "documents")
        .where((F.col("lang") == "en") & F.col("n_chars").between(100, 400))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .limit(50)
    )


def q02_time_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range filter + per-type aggregation (services.hpp:654-660)."""
    return (
        _t(spark, sf_dir, "events")
        .where(
            (F.col("ts") >= F.lit("2024-01-08 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q03_hash_prefix_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-prefix doc lookup (search_service.cpp:893-900)."""
    return (
        _t(spark, sf_dir, "documents")
        .withColumn("doc_hash", F.sha2(F.encode("text", "UTF-8"), 256))
        .where(F.col("doc_hash").startswith("ab"))
        .select("doc_id", "doc_hash")
        .orderBy("doc_id")
    )


def q04_glob_filter_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Glob/pattern include filter (services.hpp:637) as LIKE."""
    return (
        _t(spark, sf_dir, "documents")
        .where(F.col("source").like("src1%"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.round(F.avg("n_chars"), 4).cast("double").alias("avg_chars"))
    )


def q05_exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by key with keep-smallest canonical (dedupe.cpp:510-562,
    mode 'hash'; canonical strategy sort :543-548)."""
    d = _t(spark, sf_dir, "documents").withColumn("gkey", F.substring("text", 1, 40))
    return (
        d.groupBy("gkey")
        .agg(
            F.count("*").alias("member_count"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.max("n_chars").alias("max_chars"),
        )
        .where(F.col("member_count") >= 2)
    )


def q06_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per source window (search_engine_config.h:369-377)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def q07_canonical_keep_newest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-newest canonical selection (dedupe.cpp:223-240)."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").asc())
    return (
        _t(spark, sf_dir, "events")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("user_id", "event_id", "event_type")
    )


def q08_facet_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facet counts (search_facets.cpp)."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n"))
    )


def q09_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """term_stats: document_frequency + collection_frequency
    (migration.cpp:2302-2344)."""
    d = _t(spark, sf_dir, "documents").withColumn(
        "tokens", F.expr(_TOKENIZE_SPARK.format(col="text"))
    )
    exploded = d.select("doc_id", F.explode("tokens").alias("term"))
    return (
        exploded.groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("document_frequency"),
            F.count("*").alias("collection_frequency"),
        )
        .orderBy(F.col("document_frequency").desc(), F.col("term").asc())
        .limit(100)
    )


def q10_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corpus_term_stats: totals + avg doc length (migration.cpp:2302-2344)."""
    d = _t(spark, sf_dir, "documents").withColumn(
        "dl", F.size(F.expr(_TOKENIZE_SPARK.format(col="text")))
    )
    return d.agg(
        F.count("*").alias("total_documents"),
        F.round(F.avg(F.col("dl").cast("double")), 6).cast("double").alias("avg_document_length"),
        F.sum("dl").alias("total_tokens"),
    )


def q11_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75 — FTS5 defaults; search_ops.cpp:174) over the
    fixed query terms, computed from term/corpus statistics."""
    d = _t(spark, sf_dir, "documents").withColumn(
        "tokens", F.expr(_TOKENIZE_SPARK.format(col="text"))
    )
    d = d.withColumn("dl", F.size("tokens").cast("double"))
    stats = d.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = float(stats["n_docs"]), float(stats["avgdl"])

    tf = (
        d.select("doc_id", "dl", F.explode("tokens").alias("term"))
        .where(F.col("term").isin(_BM25_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(df_, "term")
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(n_docs) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * F.lit(2.2)
            / (F.col("tf") + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl))),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).cast("double").alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(20)
    )
    return scored


def q12_fusion_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-RRF evidence fusion (evidence_search_pipeline.cpp:49-56,
    rrfK=12): two signals = n_chars rank and doc_id-hash rank."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w1 = Window.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    w2 = Window.orderBy(
        F.sha2(F.col("doc_id").cast("string").cast("binary"), 256).asc(),
        F.col("doc_id").asc(),
    )
    ranked = d.withColumn("rank1", F.row_number().over(w1)).withColumn(
        "rank2", F.row_number().over(w2)
    )
    fused = ranked.withColumn(
        "fused_score",
        F.round(
            F.lit(0.6) / (F.lit(12.0) + F.col("rank1"))
            + F.lit(0.4) / (F.lit(12.0) + F.col("rank2")),
            8,
        ).cast("double"),
    )
    return (
        fused.select("doc_id", "rank1", "rank2", "fused_score")
        .orderBy(F.col("fused_score").desc(), F.col("doc_id").asc())
        .limit(25)
    )


def q13_tree_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tree diff: full outer join of two snapshots on path
    (tree_differ.cpp:125-200). Base = doc_id%7!=0; target = doc_id%5!=0
    with text 'modified' for doc_id%3==0."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = d.where(F.col("doc_id") % 7 != 0).select(
        "doc_id", F.sha2(F.encode("text", "UTF-8"), 256).alias("base_hash")
    )
    target = d.where(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.sha2(F.encode(F.concat(F.col("text"), F.lit("!")), "UTF-8"), 256),
        )
        .otherwise(F.sha2(F.encode("text", "UTF-8"), 256))
        .alias("target_hash"),
    )
    joined = base.join(target, "doc_id", "full_outer")
    return joined.select(
        "doc_id",
        F.when(F.col("base_hash").isNull(), F.lit("added"))
        .when(F.col("target_hash").isNull(), F.lit("deleted"))
        .when(F.col("base_hash") != F.col("target_hash"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def q14_rename_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rename detection: deleted x added equi-join on content hash
    (tree_differ.cpp:204-243)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.sha2(F.encode("text", "UTF-8"), 256).alias("h")
    )
    deleted = d.where(F.col("doc_id") % 4 == 0).select(
        F.concat(F.lit("/a/"), F.col("doc_id")).alias("old_path"), "h"
    )
    added = d.where(F.col("doc_id") % 4 == 0).select(
        F.concat(F.lit("/b/"), F.col("doc_id")).alias("new_path"), "h"
    )
    return (
        deleted.join(added, "h")
        .select("old_path", "new_path", "h")
        .orderBy("old_path", "new_path")
    )


def q15_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage/dedup stats (rabin_chunker.cpp:224-239, types.h:289-296)."""
    d = _t(spark, sf_dir, "documents").withColumn("k", F.substring("text", 1, 40))
    uniq = d.groupBy("k").agg(F.min("n_chars").alias("n_chars"))
    total = d.agg(
        F.sum("n_chars").alias("tb"), F.count("*").alias("tc")
    ).collect()[0]
    u = uniq.agg(F.sum("n_chars").alias("ub"), F.count("*").alias("uc")).collect()[0]
    return spark.createDataFrame(
        [
            (
                int(total["tb"]),
                int(total["tc"]),
                int(u["ub"]),
                int(u["uc"]),
                round(1.0 - float(u["ub"]) / float(total["tb"]), 6),
            )
        ],
        "total_bytes long, total_docs long, unique_bytes long, unique_docs long, dedup_ratio double",
    )


def q16_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (training-data op): whitespace + alnum-run tokens."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.expr("filter(split(text, ' '), x -> x <> '')")).alias("ws_tokens"),
        F.size(F.expr(_TOKENIZE_SPARK.format(col="text"))).alias("alnum_tokens"),
        F.length("text").alias("n_bytes"),
    )


def q17_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (training-data op): length/stopword/diversity mix."""
    d = _t(spark, sf_dir, "documents").withColumn(
        "tokens", F.expr(_TOKENIZE_SPARK.format(col="text"))
    )
    stop_arr = ", ".join(f"'{s}'" for s in _STOPWORDS)
    d = (
        d.withColumn("n_tokens", F.size("tokens"))
        .withColumn("n_distinct", F.size(F.array_distinct("tokens")))
        .withColumn(
            "n_stop",
            F.size(F.expr(f"filter(tokens, x -> array_contains(array({stop_arr}), x))")),
        )
    )
    return d.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("n_distinct") / F.col("n_tokens"), 6).cast("double").alias("diversity"),
        F.round(F.col("n_stop") / F.col("n_tokens"), 6).cast("double").alias("stopword_ratio"),
        F.round(
            F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
            * (F.col("n_distinct") / F.col("n_tokens")),
            6,
        ).cast("double").alias("quality"),
    ).where(F.col("n_tokens") > 0)


def q18_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (training-data op): stopword-set votes."""
    d = _t(spark, sf_dir, "documents").withColumn(
        "tokens", F.expr(_TOKENIZE_SPARK.format(col="text"))
    )
    sets = {
        "en": ["the", "and", "of"],
        "de": ["der", "die", "und"],
        "fr": ["le", "la", "et"],
        "es": ["el", "los", "y"],
    }
    for code, words in sets.items():
        arr = ", ".join(f"'{w}'" for w in words)
        d = d.withColumn(
            f"v_{code}",
            F.size(F.expr(f"filter(tokens, x -> array_contains(array({arr}), x))")),
        )
    best = F.greatest(*[F.col(f"v_{c}") for c in sets])
    pred = (
        F.when((best == 0), F.lit("und"))
        .when(F.col("v_en") == best, F.lit("en"))
        .when(F.col("v_de") == best, F.lit("de"))
        .when(F.col("v_fr") == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return d.select(
        "doc_id", F.col("lang").alias("labeled_lang"), pred.alias("predicted_lang"),
        *[F.col(f"v_{c}") for c in sets],
    )


_DOT_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
    "0D, (acc, v) -> acc + v)"
)


def q19_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline (EmbeddingService.cpp:555-610),
    broadcast-matmul pattern (no per-row JVM lambda evaluation)."""
    _ship_package(spark)
    from yams_spark.operators.ann import cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk(spark, e, q, k=5)


def q20_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (training-data dedup op):
    broadcast-matmul with per-batch top-n pruning before the global top-n."""
    _ship_package(spark)
    from yams_spark.operators.ann import near_dup_pairs_topn

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return near_dup_pairs_topn(spark, e, n=100)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_list_scan_filters": q01_list_scan_filters,
        "q02_time_filter_agg": q02_time_filter_agg,
        "q03_hash_prefix_lookup": q03_hash_prefix_lookup,
        "q04_glob_filter_counts": q04_glob_filter_counts,
        "q05_exact_dedup_groups": q05_exact_dedup_groups,
        "q06_topk_per_group": q06_topk_per_group,
        "q07_canonical_keep_newest": q07_canonical_keep_newest,
        "q08_facet_counts": q08_facet_counts,
        "q09_term_stats": q09_term_stats,
        "q10_corpus_stats": q10_corpus_stats,
        "q11_bm25": q11_bm25,
        "q12_fusion_rrf": q12_fusion_rrf,
        "q13_tree_diff": q13_tree_diff,
        "q14_rename_detection": q14_rename_detection,
        "q15_dedup_stats": q15_dedup_stats,
        "q16_token_count": q16_token_count,
        "q17_quality_score": q17_quality_score,
        "q18_lang_id": q18_lang_id,
        "q19_cosine_topk": q19_cosine_topk,
        "q20_embedding_near_dup": q20_embedding_near_dup,
        "er_clusters": er_clusters,
        "er_members": er_members,
        "er_scored_pairs": er_scored_pairs,
        "er_blocks": er_blocks,
        "er_extraction": er_extraction,
    }


def oracle_sql() -> dict[str, str]:
    tok = _TOKENIZE_DUCK.format(col="text")
    stop_list = ", ".join(f"'{s}'" for s in _STOPWORDS)
    bm25_terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    dot_duck = (
        "list_sum(list_transform(list_zip({a}, {b}), "
        "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
    )
    return {
        "q01_list_scan_filters": """
            SELECT doc_id, lang, source, n_chars FROM documents
            WHERE lang = 'en' AND n_chars BETWEEN 100 AND 400
            ORDER BY n_chars DESC, doc_id ASC LIMIT 50
        """,
        "q02_time_filter_agg": """
            SELECT event_type, COUNT(*) AS n_events,
                   CAST(ROUND(SUM(value), 4) AS DOUBLE) AS sum_value,
                   COUNT(DISTINCT user_id) AS n_users
            FROM events
            WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
              AND ts < TIMESTAMP '2024-01-15 00:00:00'
            GROUP BY event_type
        """,
        "q03_hash_prefix_lookup": """
            SELECT doc_id, sha256(text) AS doc_hash FROM documents
            WHERE sha256(text) LIKE 'ab%' ORDER BY doc_id
        """,
        "q04_glob_filter_counts": """
            SELECT source, COUNT(*) AS n_docs,
                   CAST(ROUND(AVG(n_chars), 4) AS DOUBLE) AS avg_chars
            FROM documents WHERE source LIKE 'src1%' GROUP BY source
        """,
        "q05_exact_dedup_groups": """
            SELECT substr(text, 1, 40) AS gkey, COUNT(*) AS member_count,
                   MIN(doc_id) AS canonical_doc_id, MAX(n_chars) AS max_chars
            FROM documents GROUP BY 1 HAVING COUNT(*) >= 2
        """,
        "q06_topk_per_group": """
            SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
                FROM orders) WHERE rk <= 3
        """,
        "q07_canonical_keep_newest": """
            SELECT user_id, event_id, event_type FROM (
                SELECT user_id, event_id, event_type,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id ASC) AS rk
                FROM events) WHERE rk = 1
        """,
        "q08_facet_counts": """
            SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY lang, source
        """,
        "q09_term_stats": f"""
            WITH toks AS (
                SELECT doc_id, unnest({tok}) AS term FROM documents)
            SELECT term, COUNT(DISTINCT doc_id) AS document_frequency,
                   COUNT(*) AS collection_frequency
            FROM toks GROUP BY term
            ORDER BY document_frequency DESC, term ASC LIMIT 100
        """,
        "q10_corpus_stats": f"""
            WITH d AS (SELECT len({tok}) AS dl FROM documents)
            SELECT COUNT(*) AS total_documents,
                   CAST(ROUND(AVG(CAST(dl AS DOUBLE)), 6) AS DOUBLE) AS avg_document_length,
                   CAST(SUM(dl) AS BIGINT) AS total_tokens
            FROM d
        """,
        "q11_bm25": f"""
            WITH d AS (
                SELECT doc_id, CAST(len({tok}) AS DOUBLE) AS dl,
                       {tok} AS tokens
                FROM documents),
            corpus AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM d),
            tf AS (
                SELECT doc_id, dl, term, COUNT(*) AS tf FROM (
                    SELECT doc_id, dl, unnest(tokens) AS term FROM d)
                WHERE term IN ({bm25_terms})
                GROUP BY doc_id, dl, term),
            df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term)
            SELECT doc_id,
                   CAST(ROUND(SUM(
                       ln(1.0 + (corpus.n_docs - df.df + 0.5) / (df.df + 0.5))
                       * tf.tf * 2.2
                       / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / corpus.avgdl))
                   ), 6) AS DOUBLE) AS bm25
            FROM tf JOIN df USING (term) CROSS JOIN corpus
            GROUP BY doc_id ORDER BY bm25 DESC, doc_id ASC LIMIT 20
        """,
        "q12_fusion_rrf": """
            WITH ranked AS (
                SELECT doc_id,
                       ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rank1,
                       ROW_NUMBER() OVER (ORDER BY sha256(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rank2
                FROM documents)
            SELECT doc_id, CAST(rank1 AS INTEGER) AS rank1, CAST(rank2 AS INTEGER) AS rank2,
                   CAST(ROUND(0.6 / (12.0 + rank1) + 0.4 / (12.0 + rank2), 8) AS DOUBLE)
                       AS fused_score
            FROM ranked ORDER BY fused_score DESC, doc_id ASC LIMIT 25
        """,
        "q13_tree_diff": """
            WITH base AS (
                SELECT doc_id, sha256(text) AS base_hash FROM documents WHERE doc_id % 7 <> 0),
            target AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 3 = 0 THEN sha256(text || '!')
                            ELSE sha256(text) END AS target_hash
                FROM documents WHERE doc_id % 5 <> 0)
            SELECT COALESCE(base.doc_id, target.doc_id) AS doc_id,
                   CASE WHEN base.base_hash IS NULL THEN 'added'
                        WHEN target.target_hash IS NULL THEN 'deleted'
                        WHEN base.base_hash <> target.target_hash THEN 'modified'
                        ELSE 'unchanged' END AS status
            FROM base FULL OUTER JOIN target ON base.doc_id = target.doc_id
        """,
        "q14_rename_detection": """
            WITH d AS (SELECT doc_id, sha256(text) AS h FROM documents),
            deleted AS (SELECT '/a/' || doc_id AS old_path, h FROM d WHERE doc_id % 4 = 0),
            added AS (SELECT '/b/' || doc_id AS new_path, h FROM d WHERE doc_id % 4 = 0)
            SELECT old_path, new_path, deleted.h AS h
            FROM deleted JOIN added USING (h)
            ORDER BY old_path, new_path
        """,
        "q15_dedup_stats": """
            WITH d AS (SELECT substr(text, 1, 40) AS k, n_chars FROM documents),
            u AS (SELECT k, MIN(n_chars) AS n_chars FROM d GROUP BY k)
            SELECT CAST((SELECT SUM(n_chars) FROM d) AS BIGINT) AS total_bytes,
                   (SELECT COUNT(*) FROM d) AS total_docs,
                   CAST((SELECT SUM(n_chars) FROM u) AS BIGINT) AS unique_bytes,
                   (SELECT COUNT(*) FROM u) AS unique_docs,
                   CAST(ROUND(1.0 - (SELECT SUM(n_chars) FROM u) * 1.0
                        / (SELECT SUM(n_chars) FROM d), 6) AS DOUBLE) AS dedup_ratio
        """,
        "q16_token_count": f"""
            SELECT doc_id,
                   CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INTEGER) AS ws_tokens,
                   CAST(len({tok}) AS INTEGER) AS alnum_tokens,
                   CAST(length(text) AS INTEGER) AS n_bytes
            FROM documents
        """,
        "q17_quality_score": f"""
            WITH d AS (
                SELECT doc_id, {tok} AS tokens FROM documents),
            s AS (
                SELECT doc_id, len(tokens) AS n_tokens,
                       len(list_distinct(tokens)) AS n_distinct,
                       len(list_filter(tokens, x -> list_contains([{stop_list}], x))) AS n_stop
                FROM d)
            SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
                   CAST(ROUND(n_distinct * 1.0 / n_tokens, 6) AS DOUBLE) AS diversity,
                   CAST(ROUND(n_stop * 1.0 / n_tokens, 6) AS DOUBLE) AS stopword_ratio,
                   CAST(ROUND(LEAST(n_tokens / 100.0, 1.0) * (n_distinct * 1.0 / n_tokens), 6)
                        AS DOUBLE) AS quality
            FROM s WHERE n_tokens > 0
        """,
        "q18_lang_id": f"""
            WITH d AS (SELECT doc_id, lang, {tok} AS tokens FROM documents),
            v AS (
                SELECT doc_id, lang,
                       CAST(len(list_filter(tokens, x -> list_contains(['the','and','of'], x))) AS INTEGER) AS v_en,
                       CAST(len(list_filter(tokens, x -> list_contains(['der','die','und'], x))) AS INTEGER) AS v_de,
                       CAST(len(list_filter(tokens, x -> list_contains(['le','la','et'], x))) AS INTEGER) AS v_fr,
                       CAST(len(list_filter(tokens, x -> list_contains(['el','los','y'], x))) AS INTEGER) AS v_es
                FROM d)
            SELECT doc_id, lang AS labeled_lang,
                   CASE WHEN GREATEST(v_en, v_de, v_fr, v_es) = 0 THEN 'und'
                        WHEN v_en = GREATEST(v_en, v_de, v_fr, v_es) THEN 'en'
                        WHEN v_de = GREATEST(v_en, v_de, v_fr, v_es) THEN 'de'
                        WHEN v_fr = GREATEST(v_en, v_de, v_fr, v_es) THEN 'fr'
                        ELSE 'es' END AS predicted_lang,
                   v_en, v_de, v_fr, v_es
            FROM v
        """,
        "q19_cosine_topk": f"""
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
            scored AS (
                SELECT q.query_id, e.vec_id,
                       CAST(ROUND(
                           {dot_duck.format(a='q.qe', b='e.embedding')}
                           / (sqrt({dot_duck.format(a='q.qe', b='q.qe')})
                              * sqrt({dot_duck.format(a='e.embedding', b='e.embedding')})), 5)
                           AS DOUBLE) AS cosine
                FROM q JOIN embeddings e ON e.vec_id <> q.query_id)
            SELECT query_id, vec_id, cosine, CAST(rk AS INTEGER) AS rk FROM (
                SELECT query_id, vec_id, cosine,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, vec_id ASC) AS rk
                FROM scored) WHERE rk <= 5
        """,
        "q20_embedding_near_dup": f"""
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   CAST(ROUND(
                       {dot_duck.format(a='a.embedding', b='b.embedding')}
                       / (sqrt({dot_duck.format(a='a.embedding', b='a.embedding')})
                          * sqrt({dot_duck.format(a='b.embedding', b='b.embedding')})), 5)
                       AS DOUBLE) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            ORDER BY cosine DESC, id_a ASC, id_b ASC LIMIT 100
        """,
    }
