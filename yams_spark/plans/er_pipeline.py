"""End-to-end ER pipeline DAG with per-stage lineage metrics and
resume-from-checkpoint.

Stage DAG (mirrors the reference ingest→dedupe dataflow, SURVEY.md §3.1/§3.3):

    extract+sign → block → (salt) → pair → score → cluster → publish

Every stage is a pure function of its input table. When a ``checkpoint_dir``
is given, each stage writes its output parquet plus a watermark row to the
metrics table; a rerun skips any stage whose watermark + output already
exist (idempotent resume — the WAL/recovery analog of wal_manager.h:23-80,
done the Spark way via durable table commits).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yams_spark.functions.chunker import PAGE_CHUNKING, ChunkingConfig
from yams_spark.operators.blocking import (
    DEFAULT_BLOCK_CAP,
    DEFAULT_FAMILIES,
    blocks_stage,
    candidate_pairs_stage,
    salt_blocks,
)
from yams_spark.operators.clustering import clusters_stage
from yams_spark.operators.scoring import attach_pair_features, scored_pairs_stage
from yams_spark.operators.signatures import signatures_stage

STAGES = ["sign", "block", "pair", "score", "cluster_groups", "cluster_members"]

METRICS_SCHEMA = (
    "run_id string, stage string, partition_id int, block_id string, "
    "pair_count long, score_histogram array<long>, rows_in long, "
    "rows_out long, watermark_ts timestamp"
)


@dataclass
class PipelineConfig:
    threshold: float = 0.92  # dedupe.h:16
    strategy: str = "keep-newest"  # dedupe.h:15
    block_cap: int = DEFAULT_BLOCK_CAP
    #: cap on published component size (topology_baseline.cpp:44-120 uses
    #: 64). None = off (default), preserving exact oracle equality; when
    #: set, oversized components are split before the packed publish and a
    #: `cluster_split` lineage row records how many components fired.
    max_component_docs: int | None = None
    #: blocking-key families (shared contract, operators/signatures.py)
    families: tuple[str, ...] = DEFAULT_FAMILIES
    #: transitive-closure driver-finish gate (clustering.DRIVER_CC_MAX_EDGES);
    #: 0 forces the pure distributed large-star/small-star path — the bench
    #: runs that once per round to time it at measured scale
    driver_cc_max_edges: int = -1  # -1 = library default
    chunk_cfg: ChunkingConfig = field(default_factory=lambda: PAGE_CHUNKING)
    #: real-embedding-model seam (embedding_generator.cpp:386-407): a
    #: picklable ``list[str] -> vectors`` batch callable; None keeps the
    #: deterministic feature-hash stand-in the oracles share
    embed_fn: object | None = None
    #: run the KG-population stage after signatures (the PostIngestQueue
    #: KnowledgeGraph/Entity stage position, PostIngestQueue.cpp:289-500):
    #: emits kg_doc_entities/nodes/aliases/edges/node_stats keyed by
    #: xxhash64(url) (the Spark-native analog of the reference's numeric
    #: document rowid), checkpointed + lineage-tracked like any stage
    build_kg: bool = False
    kg_pagerank_iters: int = 5
    checkpoint_dir: str | None = None
    run_id: str = ""

    def __post_init__(self) -> None:
        if not self.run_id:
            self.run_id = uuid.uuid4().hex[:12]

    @classmethod
    def scale(cls, **overrides) -> "PipelineConfig":
        """The 100-TB deployment profile in one switch.

        Differences from the default (which preserves exact oracle
        equality for the driver's correctness checks):

        * ``max_component_docs=64`` — publish-side component cap
          (topology_baseline.cpp:44-120): a boilerplate mega-component is
          split before the packed publish instead of landing in one task.

        Everything else already defends itself at scale by default
        (block_cap salting, AQE skew handling, the 2M-edge driver-CC gate
        re-checked per round). Session-level knobs that belong with this
        profile — AQE on, advisoryPartitionSizeInBytes >= 8m, no raised
        autoBroadcastJoinThreshold — live in ``yams_spark.session.get_spark``
        and BENCH/BASELINE.md.
        """
        overrides.setdefault("max_component_docs", 64)
        return cls(**overrides)


def _stage_path(cfg: PipelineConfig, stage: str) -> str:
    assert cfg.checkpoint_dir
    return os.path.join(cfg.checkpoint_dir, f"{stage}.parquet")


def _watermark_path(cfg: PipelineConfig, stage: str) -> str:
    assert cfg.checkpoint_dir
    return os.path.join(cfg.checkpoint_dir, f"{stage}.watermark.json")


def _stage_done(cfg: PipelineConfig, stage: str) -> bool:
    return (
        cfg.checkpoint_dir is not None
        and os.path.exists(_stage_path(cfg, stage))
        and os.path.exists(_watermark_path(cfg, stage))
    )


def _commit_stage(
    spark: SparkSession, cfg: PipelineConfig, stage: str, df: DataFrame
) -> DataFrame:
    """Write stage output + watermark; return the durable re-read DataFrame."""
    if cfg.checkpoint_dir is None:
        return df
    path = _stage_path(cfg, stage)
    df.write.mode("overwrite").parquet(path)
    with open(_watermark_path(cfg, stage), "w") as f:
        json.dump(
            {
                "run_id": cfg.run_id,
                "stage": stage,
                "watermark_ts": datetime.now(timezone.utc).isoformat(),
            },
            f,
        )
    return spark.read.parquet(path)


def _partition_metrics(df: DataFrame, run_id: str, stage: str) -> DataFrame:
    """Per-partition lineage rows (rows_out per partition + watermark)."""
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("rows_out"))
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            F.col("partition_id"),
            F.lit(None).cast("string").alias("block_id"),
            F.lit(None).cast("long").alias("pair_count"),
            F.lit(None).cast("array<long>").alias("score_histogram"),
            F.lit(None).cast("long").alias("rows_in"),
            F.col("rows_out").cast("long"),
            F.current_timestamp().alias("watermark_ts"),
        )
    )


def _score_histogram_metrics(scored: DataFrame, run_id: str) -> DataFrame:
    """20-bin histogram of pair scores over [0,1] as a lineage row.

    One job: the 20 bin counts are collected (tiny) and the row is built
    driver-side — the total is the bin sum, not a second full count()
    action over the scored table.
    """
    counts = (
        scored.withColumn(
            "bin", F.least(F.floor(F.col("pair_score") * 20).cast("int"), F.lit(19))
        )
        .groupBy("bin")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    bins = {r["bin"]: r["c"] for r in counts}
    hist = [int(bins.get(i, 0)) for i in range(20)]
    total = sum(hist)
    return scored.sparkSession.createDataFrame(
        [(run_id, "score", -1, None, total, hist, None, total)],
        (
            "run_id string, stage string, partition_id int, block_id string, "
            "pair_count long, score_histogram array<long>, rows_in long, "
            "rows_out long"
        ),
    ).withColumn("watermark_ts", F.current_timestamp())


def _append_metrics(cfg: PipelineConfig, metrics: DataFrame) -> None:
    if cfg.checkpoint_dir is None:
        return
    metrics.write.mode("append").parquet(os.path.join(cfg.checkpoint_dir, "metrics.parquet"))


class _MetricsPump:
    """Run lineage-metrics side jobs on ONE background thread (guide §2.6:
    overlap independent jobs) so stage-N metrics scans back-fill the cores
    while stage N+1 computes, instead of serializing ~6 extra Spark jobs
    onto the critical path. A single worker keeps the parquet appends to
    metrics.parquet strictly ordered; ``join()`` re-raises any failure and
    must be called before the metrics table is read."""

    def __init__(self) -> None:
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(max_workers=1)
        self._futures: list = []

    def submit(self, fn) -> None:
        self._futures.append(self._pool.submit(fn))

    def join(self) -> None:
        for f in self._futures:
            f.result()
        self._futures.clear()

    def close(self) -> None:
        self.join()
        self._pool.shutdown()


def _stage_timer():
    """Env-gated per-stage wall-clock tracing (YAMS_TIMING=1): prints
    'TIMING <stage> <sec>' lines for bench forensics; no-op otherwise."""
    if os.environ.get("YAMS_TIMING") != "1":
        return lambda _stage: None
    state = {"t": time.time()}

    def mark(stage: str) -> None:
        now = time.time()
        print(f"TIMING {stage} {now - state['t']:.2f}", flush=True)
        state["t"] = now

    return mark


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    cfg: PipelineConfig | None = None,
    precomputed_embeddings: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Full ER pipeline. Returns every stage's DataFrame keyed by stage name.

    ``precomputed_embeddings`` — optional ``(url, embedding)`` table that
    hydrates embeddings from an external vector store instead of the
    in-line feature-hash stand-in (the reference keeps embeddings in a
    separate vector database keyed by document hash,
    vector_database.cpp / EmbeddingService.cpp — at 100 TB you never
    recompute vectors you already paid for). Rows without a precomputed
    vector keep the computed one (left join + coalesce, broadcast-eligible
    when the override table is small).
    """
    cfg = cfg or PipelineConfig()
    out: dict[str, DataFrame] = {}
    mark = _stage_timer()

    # A small-file input (one parquet split) would serialize the extraction
    # UDF; at 100TB there are plenty of splits and this no-ops. File count
    # is a free lower bound on scan parallelism — touching pages.rdd would
    # force a deserialization plan node just to ask the same question.
    par = spark.sparkContext.defaultParallelism
    try:
        n_splits = len(pages.inputFiles())
    except Exception:
        n_splits = 0
    if n_splits < par:
        pages = pages.repartition(par * 2)

    # Scale-adaptive shuffle partitioning (guide §2.2): never run the
    # pipeline's wide stages on fewer reduce slots than the session has
    # cores — a fixed small shuffle-partition constant leaves cores idle at
    # high core counts, while AQE's advisory-size coalescing still merges
    # anything that comes out tiny. Only ever raises, never lowers, so an
    # explicit cluster-tuned setting wins.
    try:
        cur_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        cur_parts = 0
    if 0 < cur_parts < 2 * par:
        spark.conf.set("spark.sql.shuffle.partitions", str(2 * par))

    pump = _MetricsPump()

    # --- sign (extract + signatures; narrow, no shuffle) ---
    if _stage_done(cfg, "sign"):
        signatures = spark.read.parquet(_stage_path(cfg, "sign"))
    else:
        signatures = signatures_stage(pages, cfg.chunk_cfg, embed_fn=cfg.embed_fn)
        if precomputed_embeddings is not None:
            pre = precomputed_embeddings.select(
                "url", F.col("embedding").alias("_pre_embedding")
            )
            signatures = (
                signatures.join(pre, "url", "left")
                .withColumn(
                    "embedding",
                    F.coalesce(F.col("_pre_embedding"), F.col("embedding")),
                )
                .drop("_pre_embedding")
            )
        if cfg.checkpoint_dir is None:
            # several downstream branches (blocks, pair-feature joins,
            # cluster windows) would otherwise re-run the extraction UDF
            signatures = signatures.persist()
        signatures = _commit_stage(spark, cfg, "sign", signatures)
        pump.submit(lambda df=signatures: _append_metrics(
            cfg, _partition_metrics(df, cfg.run_id, "sign")))
    out["signatures"] = signatures
    mark("sign")

    # --- optional KG population (PostIngestQueue stage position) ---
    if cfg.build_kg:
        from yams_spark.operators.kg import populate_kg

        kg_docs = signatures.select(
            F.xxhash64("url").alias("doc_id"),
            F.col("extracted_text").alias("text"),
        )
        kg = populate_kg(
            kg_docs,
            pagerank_iters=cfg.kg_pagerank_iters,
            doc_embeddings=signatures.select(
                F.xxhash64("url").alias("vec_id"), "embedding"
            ),
        )
        for name, df in kg.items():
            if _stage_done(cfg, name):
                out[name] = spark.read.parquet(_stage_path(cfg, name))
            else:
                out[name] = _commit_stage(spark, cfg, name, df)
                pump.submit(lambda d=out[name], n=name: _append_metrics(
                    cfg, _partition_metrics(d, cfg.run_id, n)))
        mark("kg")

    # --- block (+salting report) ---
    if _stage_done(cfg, "block"):
        blocks = spark.read.parquet(_stage_path(cfg, "block"))
    else:
        raw_blocks = blocks_stage(signatures, cfg.families)
        blocks, oversize = salt_blocks(raw_blocks, cfg.block_cap)
        if cfg.checkpoint_dir is None:
            # the pair stage re-aggregates blocks; without a durable commit
            # the key explode + salting join would be recomputed per consumer
            blocks = blocks.persist()
        blocks = _commit_stage(spark, cfg, "block", blocks)
        pump.submit(lambda df=blocks: _append_metrics(
            cfg, _partition_metrics(df, cfg.run_id, "block")))
        if cfg.checkpoint_dir is not None:
            oversize_rows = oversize.select(
                F.lit(cfg.run_id).alias("run_id"),
                F.lit("block_oversize").alias("stage"),
                F.lit(-1).alias("partition_id"),
                F.col("block_key").alias("block_id"),
                F.col("dropped_pairs_upper_bound").alias("pair_count"),
                F.lit(None).cast("array<long>").alias("score_histogram"),
                F.col("block_size").cast("long").alias("rows_in"),
                F.col("n_salt").cast("long").alias("rows_out"),
                F.current_timestamp().alias("watermark_ts"),
            )
            pump.submit(lambda df=oversize_rows: _append_metrics(cfg, df))
    out["blocks"] = blocks
    mark("block")

    # --- pair ---
    if _stage_done(cfg, "pair"):
        pairs = spark.read.parquet(_stage_path(cfg, "pair"))
    else:
        pairs = candidate_pairs_stage(blocks)
        pairs = _commit_stage(spark, cfg, "pair", pairs)
        pump.submit(lambda df=pairs: _append_metrics(
            cfg, _partition_metrics(df, cfg.run_id, "pair")))
    out["pairs"] = pairs
    mark("pair")

    # --- score ---
    if _stage_done(cfg, "score"):
        scored = spark.read.parquet(_stage_path(cfg, "score"))
    else:
        scored = scored_pairs_stage(
            attach_pair_features(pairs, signatures), cfg.threshold
        )
        if cfg.checkpoint_dir is None:
            scored = scored.persist()
        scored = _commit_stage(spark, cfg, "score", scored)
        if cfg.checkpoint_dir is not None:
            pump.submit(lambda df=scored: _append_metrics(
                cfg, _score_histogram_metrics(df, cfg.run_id)))
    out["scored_pairs"] = scored
    mark("score")

    # --- cluster + publish ---
    accepted = scored.where(F.col("accepted"))
    if _stage_done(cfg, "cluster_groups") and _stage_done(cfg, "cluster_members"):
        clusters = spark.read.parquet(_stage_path(cfg, "cluster_groups"))
        members = spark.read.parquet(_stage_path(cfg, "cluster_members"))
    else:
        from yams_spark.operators.clustering import DRIVER_CC_MAX_EDGES

        cc_stats: dict = {}
        clusters, members = clusters_stage(
            signatures, accepted, cfg.threshold, cfg.strategy,
            max_component_docs=cfg.max_component_docs,
            driver_cc_max_edges=(
                DRIVER_CC_MAX_EDGES
                if cfg.driver_cc_max_edges < 0
                else cfg.driver_cc_max_edges
            ),
            cc_stats=cc_stats,
        )
        out["cc_stats"] = cc_stats
        clusters = _commit_stage(spark, cfg, "cluster_groups", clusters)
        members = _commit_stage(spark, cfg, "cluster_members", members)
        pump.submit(lambda df=clusters: _append_metrics(
            cfg, _partition_metrics(df, cfg.run_id, "cluster_groups")))
        pump.submit(lambda df=members: _append_metrics(
            cfg, _partition_metrics(df, cfg.run_id, "cluster_members")))
        if cfg.max_component_docs is not None and cfg.checkpoint_dir is not None:
            # lineage: one row per split parent component (labels look like
            # "<component>#<i>"), rows_out = sub-clusters it produced
            split_rows = (
                clusters.where(F.col("component").contains("#"))
                .withColumn("parent", F.substring_index("component", "#", 1))
                .groupBy("parent")
                .agg(F.count("*").alias("n_sub"), F.sum("member_count").alias("n_docs"))
                .select(
                    F.lit(cfg.run_id).alias("run_id"),
                    F.lit("cluster_split").alias("stage"),
                    F.lit(-1).alias("partition_id"),
                    F.col("parent").alias("block_id"),
                    F.lit(None).cast("long").alias("pair_count"),
                    F.lit(None).cast("array<long>").alias("score_histogram"),
                    F.col("n_docs").cast("long").alias("rows_in"),
                    F.col("n_sub").cast("long").alias("rows_out"),
                    F.current_timestamp().alias("watermark_ts"),
                )
            )
            pump.submit(lambda df=split_rows: _append_metrics(cfg, df))
    out["clusters"] = clusters
    out["members"] = members
    mark("cluster")

    pump.close()
    if cfg.checkpoint_dir is not None:
        out["metrics"] = spark.read.parquet(
            os.path.join(cfg.checkpoint_dir, "metrics.parquet")
        )
    return out
