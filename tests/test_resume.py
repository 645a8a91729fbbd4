"""Resume-from-checkpoint: rerunning the pipeline after losing a later
stage's watermark recomputes only that stage and yields identical outputs
(FIXTURES.md §5.6; the Spark analog of WAL replay, wal_manager.h:23-80).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from yams_spark.plans.er_pipeline import PipelineConfig, run_pipeline
from yams_spark.sources.pages import generate_pages_pdf


@pytest.fixture(scope="module")
def small_corpus(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    return generate_pages_pdf(docs.head(40), replicate=1)


def test_resume_skips_completed_stages(spark, small_corpus, tmp_path_factory) -> None:
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    pages = spark.createDataFrame(small_corpus[["url", "warc_ts", "html", "text", "lang"]])

    cfg1 = PipelineConfig(checkpoint_dir=ckpt, run_id="run1")
    first = run_pipeline(spark, pages, cfg1)
    clusters1 = sorted(first["clusters"].toPandas()["group_key"])

    sign_mtime = os.path.getmtime(os.path.join(ckpt, "sign.watermark.json"))

    # lose the cluster stage -> rerun recomputes only clustering
    os.remove(os.path.join(ckpt, "cluster_groups.watermark.json"))
    cfg2 = PipelineConfig(checkpoint_dir=ckpt, run_id="run2")
    second = run_pipeline(spark, pages, cfg2)
    clusters2 = sorted(second["clusters"].toPandas()["group_key"])

    assert clusters1 == clusters2
    # earlier stages untouched (watermark not rewritten)
    assert os.path.getmtime(os.path.join(ckpt, "sign.watermark.json")) == sign_mtime


def test_metrics_lineage_rows(spark, small_corpus, tmp_path_factory) -> None:
    ckpt = str(tmp_path_factory.mktemp("ckpt_metrics"))
    pages = spark.createDataFrame(small_corpus[["url", "warc_ts", "html", "text", "lang"]])
    out = run_pipeline(spark, pages, PipelineConfig(checkpoint_dir=ckpt, run_id="mrun"))
    metrics = out["metrics"].toPandas()
    stages = set(metrics["stage"])
    assert {"sign", "block", "pair", "score"}.issubset(stages)
    score_rows = metrics[metrics["stage"] == "score"]
    hist = score_rows.iloc[0]["score_histogram"]
    assert len(hist) == 20
    assert sum(hist) == score_rows.iloc[0]["pair_count"]
    # per-partition rows carry watermarks
    assert metrics["watermark_ts"].notna().all()
