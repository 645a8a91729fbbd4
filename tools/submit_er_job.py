"""spark-submit entry point for the ER pipeline (the north rule's
deployment shape: ``spark-submit --py-files yams_spark.zip
tools/submit_er_job.py --pages ... --out ...``).

Deliberately imports yams_spark ONLY through the --py-files distribution
(no repo-root sys.path injection), so the packaged zip is what actually
runs on both driver and executors — the same artifact a real cluster
submit ships. Writes clusters/members parquet plus the lineage metrics
table, and prints one JSON status line.
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages parquet path")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--families", default="exact,chunk,minhash,title")
    ap.add_argument("--threshold", type=float, default=0.92)
    ap.add_argument("--max-component-docs", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # plain builder: master/conf come from spark-submit, exactly like a
    # cluster deployment (no get_spark() localhost defaults)
    spark = SparkSession.builder.appName("yams_spark_er").getOrCreate()

    from yams_spark.plans.er_pipeline import PipelineConfig, run_pipeline

    pages = spark.read.parquet(args.pages)
    cfg = PipelineConfig(
        families=tuple(args.families.split(",")),
        threshold=args.threshold,
        max_component_docs=args.max_component_docs,
        checkpoint_dir=os.path.join(args.out, "stages"),
    )
    out = run_pipeline(spark, pages, cfg)
    n_clusters = out["clusters"].count()
    n_members = out["members"].count()
    print(
        "SUBMIT_RESULT "
        + json.dumps(
            {
                "pages": pages.count(),
                "clusters": n_clusters,
                "members": n_members,
                "out": args.out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
