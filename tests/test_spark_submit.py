"""North-rule deployment shape: the pipeline runs via
``spark-submit --py-files yams_spark.zip`` in a clean subprocess whose
only access to the package is the shipped zip artifact."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest


def _build_zip(tmp: str) -> str:
    import yams_spark

    pkg_dir = os.path.dirname(os.path.abspath(yams_spark.__file__))
    zip_path = os.path.join(tmp, "yams_spark.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for name in files:
                if name.endswith(".py"):
                    full = os.path.join(root, name)
                    zf.write(
                        full,
                        os.path.join("yams_spark",
                                     os.path.relpath(full, pkg_dir)),
                    )
    return zip_path


def test_spark_submit_py_files_runs_pipeline(spark, tmp_path):
    """Build a tiny pages parquet, then run the full ER pipeline through a
    REAL ``spark-submit --py-files`` subprocess (fresh JVM, no repo on
    sys.path) and check the published clusters."""
    submit = shutil.which("spark-submit")
    if submit is None:
        submit = os.path.join(
            os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
        )
        if not os.path.exists(submit):
            pytest.skip("spark-submit not available")

    # 6 pages: two identical-text pairs + two singletons
    rows = []
    for i in range(6):
        body = f"document body {i // 2}" if i < 4 else f"unique body {i}"
        html = f"<html><body>{body}</body></html>".encode()
        rows.append((f"u{i}", 1704067200 + i, bytearray(html), None, "en"))
    pages = spark.createDataFrame(
        rows, "url string, ts long, html binary, text string, lang string"
    ).selectExpr("url", "timestamp_seconds(ts) as warc_ts", "html", "text", "lang")
    pages_path = str(tmp_path / "pages.parquet")
    pages.write.parquet(pages_path)

    zip_path = _build_zip(str(tmp_path))
    out_dir = str(tmp_path / "out")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    proc = subprocess.run(
        [
            submit,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--py-files", zip_path,
            os.path.join(repo, "tools", "submit_er_job.py"),
            "--pages", pages_path,
            "--out", out_dir,
            "--families", "exact",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),  # NOT the repo root: only the zip provides the pkg
        timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(
        l for l in proc.stdout.splitlines() if l.startswith("SUBMIT_RESULT ")
    )
    res = json.loads(line[len("SUBMIT_RESULT "):])
    assert res == {
        "pages": 6, "clusters": 2, "members": 4, "out": out_dir,
    }
    # stage checkpoints + lineage metrics landed as durable parquet
    assert os.path.exists(os.path.join(out_dir, "stages", "sign.parquet"))
    assert os.path.exists(os.path.join(out_dir, "stages", "metrics.parquet"))
