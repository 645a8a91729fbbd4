"""Path-derived values (path_utils.cpp) — scalar twin vs the compiled
std::filesystem oracle goldens, and the Spark fold vs the scalar twin.

Golden recipe: tests/goldens_pathnorm.json was produced by a 30-line C++
program calling path::lexically_normal / parent_path / component count
(the exact calls path_utils.cpp makes) over 65 curated + 400 fuzzed
paths — rebuild with g++ -O2 -std=c++17 (source in the git history of
/tmp/pathnorm_oracle.cpp, quoted in the round-5 commit message).
"""

from __future__ import annotations

import hashlib
import json
import os

from yams_spark.functions.pathnorm import (
    compute_path_derived,
    lexically_normal,
    with_path_derived,
)

_GOLD = json.load(
    open(os.path.join(os.path.dirname(__file__), "goldens_pathnorm.json"))
)


def test_lexically_normal_matches_cpp_oracle():
    for case in _GOLD:
        got = lexically_normal(case["path"])
        assert got == case["normalized"], case


def test_parent_and_depth_match_cpp_oracle():
    for case in _GOLD:
        d = compute_path_derived(case["path"])
        assert d["path_prefix"] == case["parent"], case
        assert d["path_depth"] == case["depth"], case


def test_hashes_and_reverse():
    d = compute_path_derived("a/../b\\c/")
    assert d["normalized_path"] == "b/c/"
    assert d["reverse_path"] == "/c/b"
    assert d["path_hash"] == hashlib.sha256(b"b/c/").hexdigest()
    assert d["parent_hash"] == hashlib.sha256(b"b/c").hexdigest()
    # Empty prefix hashes to the empty string, not sha256("")
    # (path_utils.cpp:66: parentForHash.empty() -> {}).
    root = compute_path_derived("a.txt")
    assert root["path_prefix"] == ""
    assert root["parent_hash"] == ""


def test_spark_fold_equals_scalar_twin(spark):
    paths = [c["path"] for c in _GOLD]
    df = spark.createDataFrame([(p,) for p in paths], ["path"])
    rows = with_path_derived(df, "path").collect()
    assert len(rows) == len(paths)
    for row in rows:
        want = compute_path_derived(row["path"])
        got = {
            "normalized_path": row["normalized_path"],
            "path_prefix": row["path_prefix"],
            "parent_hash": row["parent_hash"],
            "reverse_path": row["reverse_path"],
            "path_hash": row["path_hash"],
            "path_depth": row["path_depth"],
        }
        assert got == want, row["path"]


def test_spark_plan_is_exchange_free(spark):
    df = spark.createDataFrame([("a/../b",)], ["path"])
    plan = (
        with_path_derived(df, "path")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
