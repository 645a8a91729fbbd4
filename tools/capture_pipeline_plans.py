"""Capture .explain("formatted") for every ER-pipeline stage DataFrame
(pre-commit, so the real stage plan shows — not the checkpoint re-read).

Usage: python tools/capture_pipeline_plans.py <suffix> [sf_dir]
Writes plans/r06/er_pipeline_<stage>_<suffix>.txt
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def explain_str(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main() -> None:
    suffix = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    from yams_spark.session import get_spark
    from yams_spark.sources.pages import materialize_pages
    from yams_spark.plans.er_pipeline import PipelineConfig
    from yams_spark.operators.blocking import blocks_stage, salt_blocks, candidate_pairs_stage
    from yams_spark.operators.signatures import signatures_stage
    from yams_spark.operators.scoring import attach_pair_features, scored_pairs_stage
    from yams_spark.operators.clustering import clusters_stage
    from pyspark.sql import functions as F

    spark = get_spark(app_name="plan_capture", master="local[8]",
                      shuffle_partitions=16)
    pages, _ = materialize_pages(spark, sf_dir, f"/tmp/yams_plans_pages_{os.path.basename(sf_dir)}")
    cfg = PipelineConfig()

    out_dir = os.path.join(_REPO, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    def dump(name, df):
        with open(os.path.join(out_dir, f"er_pipeline_{name}_{suffix}.txt"), "w") as f:
            f.write(explain_str(df))
        print("wrote", name)

    signatures = signatures_stage(pages, cfg.chunk_cfg).persist()
    dump("sign", signatures)
    raw_blocks = blocks_stage(signatures, cfg.families)
    blocks, oversize = salt_blocks(raw_blocks, cfg.block_cap)
    blocks = blocks.persist()
    dump("block", blocks)
    dump("block_oversize", oversize)
    pairs = candidate_pairs_stage(blocks)
    dump("pair", pairs)
    scored = scored_pairs_stage(attach_pair_features(pairs, signatures), cfg.threshold).persist()
    dump("score", scored)
    accepted = scored.where(F.col("accepted"))
    clusters, members = clusters_stage(signatures, accepted, cfg.threshold, cfg.strategy)
    dump("cluster_groups", clusters)
    dump("cluster_members", members)
    spark.stop()


if __name__ == "__main__":
    main()
