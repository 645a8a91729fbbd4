"""er_semantic_mini: the semantic ER path verified against an independent
SQL engine (DuckDB) — cosine gates, weighted score, transitive closure,
canonical selection, group key (dedupe.cpp:113-244 semantics).

The corpus design (yams_spark/oracle/semantic_mini.py) makes the DuckDB
closed-form cosine bit-identical to the pipeline's einsum, so these are
exact-equality tests, not approximate ones.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from yams_spark.functions.similarity import cosine_matrix
from yams_spark.oracle.semantic_mini import (
    clusters_oracle_sql,
    embedding_for,
    members_oracle_sql,
    semantic_mini_spec,
)

GATE_MARGIN = 2e-3  # no pair cosine may sit closer than this to a gate


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.9g}"
        return str(v)

    return (
        df.apply(lambda col: col.map(norm))
        .sort_values(list(df.columns))
        .reset_index(drop=True)
    )


def test_spec_gate_margins_and_uniqueness():
    """Design invariants: unique urls, and every within-group pair cosine
    keeps a safe margin from both acceptance gates (so float32 rounding
    can never flip a branch on any machine)."""
    spec = semantic_mini_spec()
    urls = [p["url"] for p in spec]
    assert len(urls) == len(set(urls)) == 48
    by_group: dict[int, list[dict]] = {}
    for p in spec:
        by_group.setdefault(p["g"], []).append(p)
    for members in by_group.values():
        embs = np.stack([embedding_for(p) for p in members]).astype(np.float32)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                cos = float(
                    cosine_matrix(embs[i : i + 1], embs[j : j + 1])[0]
                )
                assert abs(cos - 0.92) > GATE_MARGIN, (i, j, cos)
                assert abs(cos - 0.975) > GATE_MARGIN, (i, j, cos)


def test_closed_form_cosine_is_bit_exact():
    """The 4-term closed form the oracle uses equals the full 384-dim
    einsum bit-for-bit (zeros never perturb an IEEE sum)."""
    spec = semantic_mini_spec()
    by_group: dict[int, list[dict]] = {}
    for p in spec:
        by_group.setdefault(p["g"], []).append(p)
    for members in by_group.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = members[i], members[j]
                full = float(
                    cosine_matrix(
                        np.asarray([embedding_for(a)], dtype=np.float32),
                        np.asarray([embedding_for(b)], dtype=np.float32),
                    )[0]
                )
                dot = a["c"] * b["c"] + a["s"] * b["s"]
                na = math.sqrt(a["c"] * a["c"] + a["s"] * a["s"])
                nb = math.sqrt(b["c"] * b["c"] + b["s"] * b["s"])
                closed = float(
                    np.float64(np.float32(dot / (na * nb)))
                )
                assert full == closed, (a["url"], b["url"], full, closed)


@pytest.fixture(scope="module")
def outputs(spark):
    import __spark_entry__ as entry

    return {
        "clusters": entry.er_semantic_mini(spark, "unused").toPandas(),
        "members": entry.er_semantic_mini_members(spark, "unused").toPandas(),
        "scored": entry._er_semantic_outputs(spark)["scored_pairs"].toPandas(),
    }


def test_matches_duckdb_oracle(outputs):
    con = duckdb.connect()
    for key, sql in (
        ("clusters", clusters_oracle_sql()),
        ("members", members_oracle_sql()),
    ):
        duck = con.sql(sql).df()
        sp = outputs[key]
        assert sorted(sp.columns) == sorted(duck.columns)
        assert len(sp) == len(duck)
        assert _canon(sp).equals(_canon(duck)), key


def test_every_acceptance_branch_fires(outputs):
    """The scenario mix must actually exercise all of dedupe.cpp:191-204:
    auto-accept (cos>=0.975), overlap-gated mid-cosine accepts, mid-cosine
    rejects for missing overlap, and below-threshold rejects."""
    s = outputs["scored"]
    mid = (s["cosine"] >= 0.92) & (s["cosine"] < 0.975)
    assert (s["cosine"] >= 0.975).any()
    assert (
        s["accepted"] & mid & ((s["title_overlap"] > 0) | (s["path_overlap"] > 0))
    ).any()
    assert (~s["accepted"] & mid).any()
    assert (~s["accepted"] & (s["cosine"] < 0.92)).any()
    # both blocking families contributed pairs: title-kind pairs have
    # title_overlap 1.0, exact-kind pairs 0.0
    assert set(np.round(s["title_overlap"], 6)) == {0.0, 1.0}


def test_transitive_only_members_published(outputs):
    """Members with NO direct accepted pair to the canonical must still be
    published (transitive closure), with NULL similarity_to_canonical —
    a case the exact-family er_mini can never produce."""
    m = outputs["members"]
    dup = m[m["role"] == "duplicate"]
    assert dup["similarity_to_canonical"].isna().any()
    assert dup["similarity_to_canonical"].notna().any()
    # cluster membership: 8 clusters (2 each of scenarios A/B/D/F), sizes
    # 4/3/4/4 — scenarios C and E publish nothing
    c = outputs["clusters"]
    assert len(c) == 8
    assert sorted(c["member_count"]) == [3, 3, 4, 4, 4, 4, 4, 4]


def test_eval_truth_and_confusion(spark):
    """The north-rule pairwise-F1 evaluation over the mini corpus:
    scenario-intent truth families populate every confusion cell
    (C rejections = tn, F sub-family bridge = fp, B/E drops = fn),
    matching the DuckDB eval oracle's closed-form counts."""
    from __spark_entry__ import er_semantic_eval
    from yams_spark.oracle.semantic_mini import (
        eval_truth_family,
        semantic_mini_spec,
    )

    spec = semantic_mini_spec()
    fams = {}
    for p in spec:
        fams.setdefault(p["g"], set()).add(eval_truth_family(p))
    for g, f in fams.items():
        kind = g % 6
        assert len(f) == (4 if kind == 2 else 2 if kind == 5 else 1), (g, f)

    row = er_semantic_eval(spark, "/root/testdata/sf0.001").collect()[0]
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (34, 8, 18, 12)
    assert row["precision"] == 0.809524
    assert row["recall"] == 0.653846
    assert row["f1"] == 0.723404
