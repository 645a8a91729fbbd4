"""Topology-routed search session (topology_baseline.cpp:771-985 +
topology_routing_session.cpp:130-160, 782-806, 1382-1459)."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from yams_spark.operators.topo_routing import (
    construction_fingerprint,
    route_clusters,
    routed_members,
    select_routes_for_narrowing,
)


def _mk_clusters(spark):
    # 3 clusters with orthogonal-ish centroids; query aligned with c0
    rows = [
        ("c0", 4, 0.4, 0.8, [1.0, 0.0, 0.0]),
        ("c1", 10, 0.2, 0.5, [0.0, 1.0, 0.0]),
        ("c2", 2, 0.6, 0.2, [0.6, 0.8, 0.0]),
    ]
    clusters = spark.createDataFrame(
        rows,
        "cluster_id string, member_count long, persistence double, "
        "cohesion double, centroid array<double>",
    )
    mem = spark.createDataFrame(
        [(f"d{i}", "c0") for i in range(4)]
        + [(f"e{i}", "c1") for i in range(10)]
        + [("x0", "c2"), ("x1", "c2")],
        "doc_hash string, cluster_id string",
    )
    return clusters, mem


def test_route_scores_match_hand_computation(spark):
    clusters, mem = _mk_clusters(spark)
    seeds = {"d0": 2.0, "d1": 1.0, "e0": 1.0}  # mass: c0=3, c1=1, c2=0
    q = [1.0, 0.0, 0.0]
    alpha = 0.5

    def dense(cent):
        cos = sum(a * b for a, b in zip(q, cent)) / (
            math.sqrt(sum(x * x for x in q))
            * math.sqrt(sum(x * x for x in cent))
        )
        return min(max((cos + 1.0) * 0.5, 0.0), 1.0)

    expect = {}
    for cid, n, pers, coh, cent in [
        ("c0", 4, 0.4, 0.8, [1.0, 0.0, 0.0]),
        ("c1", 10, 0.2, 0.5, [0.0, 1.0, 0.0]),
        ("c2", 2, 0.6, 0.2, [0.6, 0.8, 0.0]),
    ]:
        sparse = {"c0": 3.0, "c1": 1.0, "c2": 0.0}[cid] / 3.0
        d = dense(cent)
        blended = alpha * sparse + (1 - alpha) * d
        damp = 1.0 / (1.0 + math.log1p(n))
        expect[cid] = {
            "current": blended + pers * 0.05,
            "size_weighted": (blended + 0.05 * pers + 0.05 * coh) * damp,
            "seed_coverage": sparse + 0.10 * d + pers * 0.05,
        }

    for mode in ("current", "size_weighted", "seed_coverage"):
        got = {
            r["cluster_id"]: r["route_score"]
            for r in route_clusters(
                spark, clusters, mem, query_embedding=q,
                weighted_seeds=seeds, alpha=alpha, scoring_mode=mode,
            ).collect()
        }
        for cid in expect:
            assert got[cid] == pytest.approx(expect[cid][mode], abs=1e-12), (
                mode, cid)


def test_route_alpha_one_skips_dense(spark):
    """alpha >= 1 never evaluates the dense signal (reference :871,:889):
    semantic_cost is NULL, score is pure sparse + persistence."""
    clusters, mem = _mk_clusters(spark)
    rows = route_clusters(
        spark, clusters, mem, query_embedding=[1.0, 0.0, 0.0],
        weighted_seeds={"d0": 1.0}, alpha=1.0,
    ).collect()
    by = {r["cluster_id"]: r for r in rows}
    assert by["c0"]["semantic_cost"] is None
    assert by["c0"]["route_score"] == pytest.approx(1.0 + 0.4 * 0.05)
    assert by["c1"]["route_score"] == pytest.approx(0.0 + 0.2 * 0.05)


def test_narrowing_adaptive_gap_and_abstention():
    routes = [
        {"cluster_id": "a", "route_score": 0.9},
        {"cluster_id": "b", "route_score": 0.88},
        {"cluster_id": "c", "route_score": 0.5},
        {"cluster_id": "d", "route_score": 0.49},
    ]
    # gap 0.05: start at min=1, extend while best-score gap <= 0.05 -> {a,b}
    sel = select_routes_for_narrowing(routes, 1, 4, adaptive_score_gap=0.05)
    assert [r["cluster_id"] for r in sel["routes"]] == ["a", "b"]
    assert sel["boundary_score_margin"] == pytest.approx(0.38)
    assert not sel["abstained"]
    # boundary margin demanded higher than actual -> abstain
    sel = select_routes_for_narrowing(
        routes, 1, 3, adaptive_score_gap=0.0, min_boundary_margin=0.05
    )
    assert len(sel["routes"]) == 3
    assert sel["boundary_score_margin"] == pytest.approx(0.01)
    assert sel["abstained"]
    # maxClusters=0 -> all routes, no margin (nothing beyond selection)
    sel = select_routes_for_narrowing(routes, 2, 0)
    assert len(sel["routes"]) == 4 and sel["boundary_score_margin"] == 0.0


def test_fingerprint_matches_independent_byte_stream():
    """Cross-check the FNV-1a replica against an independently built byte
    stream (little-endian lengths, float32/float64 bit patterns) folded
    with the textbook FNV-1a loop."""
    cluster = {
        "cluster_id": "c1",
        "member_count": 2,
        "persistence": 0.25,
        "cohesion": 0.5,
        "density": 0.0,
        "bridge_mass": 0.0,
        "medoid_hash": "m",
        "members": ["b", "a"],
        "centroid": [0.5, -1.0],
    }
    mem = [{"doc_hash": "a", "cluster_id": "c1"},
           {"doc_hash": "b", "cluster_id": "c1"}]
    got = construction_fingerprint([cluster], mem, algorithm="alg")

    def le(v, n=8):
        return struct.pack("<Q", v & ((1 << 64) - 1))[:n]

    def s(x):
        return le(len(x)) + x.encode()

    stream = b""
    stream += s("alg") + le(0, 1) + s("") + s("")
    stream += le(1)  # one cluster
    stream += s("c1") + s("") + le(0) + le(2)
    for d in (0.25, 0.5, 0.0, 0.0):
        stream += struct.pack("<Q", struct.unpack("<Q", struct.pack("<d", d))[0])
    stream += le(0) + le(0) + s("m")
    stream += le(2) + s("a") + s("b")  # members sorted
    stream += le(0)  # overlaps
    stream += le(2)  # centroid
    for f in (0.5, -1.0):
        # fingerprintFloat folds the float32 bit pattern as FOUR bytes
        stream += struct.pack("<I", struct.unpack("<I", struct.pack("<f", f))[0])
    stream += le(2)  # memberships
    for dh in ("a", "b"):
        stream += s(dh) + s("c1") + s("") + le(0)
        for d in (0.0, 0.0, 0.0):
            stream += struct.pack("<d", d)
        stream += le(0, 1) + le(0)
    h = 14695981039346656037
    for b in stream:
        h = ((h ^ b) * 1099511628211) & ((1 << 64) - 1)
    assert got == format(h, "016x")


def test_fingerprint_sensitive_and_order_invariant():
    c = [{"cluster_id": "c1", "member_count": 1, "members": ["a"],
          "centroid": [1.0]}]
    m = [{"doc_hash": "a", "cluster_id": "c1"}]
    base = construction_fingerprint(c, m)
    assert base == construction_fingerprint(c, m)
    # member order is sorted before hashing -> invariant
    c2 = [{"cluster_id": "c1", "member_count": 2, "members": ["b", "a"],
           "centroid": [1.0]}]
    c2r = [{"cluster_id": "c1", "member_count": 2, "members": ["a", "b"],
            "centroid": [1.0]}]
    m2 = [{"doc_hash": "a", "cluster_id": "c1"},
          {"doc_hash": "b", "cluster_id": "c1"}]
    assert construction_fingerprint(c2, m2) == construction_fingerprint(c2r, m2)
    # any field change moves the hash
    c3 = [{"cluster_id": "c1", "member_count": 1, "members": ["a"],
           "centroid": [1.0], "persistence": 0.1}]
    assert construction_fingerprint(c3, m) != base


def test_routed_members_comparator_and_cap(spark):
    mem = spark.createDataFrame(
        [("s1", "c0"), ("m0", "c0"), ("z9", "c0"), ("a1", "c1"), ("s2", "c1")],
        "doc_hash string, cluster_id string",
    )
    selected = [
        {"cluster_id": "c0", "route_score": 0.9, "medoid_hash": "m0"},
        {"cluster_id": "c1", "route_score": 0.7, "medoid_hash": None},
    ]
    out = routed_members(
        mem, selected, seed_weights={"s1": 1.0, "s2": 2.0}
    ).collect()
    order = [r["doc_hash"] for r in out]
    # seeds first (weight desc), then score desc, medoid breaks ties, hash last
    assert order == ["s2", "s1", "m0", "z9", "a1"]
    capped = routed_members(mem, selected, seed_weights={"s1": 1.0}, max_docs=2)
    assert capped.count() == 2


def test_hybrid_search_route_gate(spark):
    from yams_spark.operators.neighbors import hybrid_search

    docs = spark.createDataFrame(
        [(i, f"orbital mechanics paper {i} about kepler") for i in range(8)],
        "doc_id long, text string",
    )
    full = hybrid_search(spark, docs, "orbital kepler", None, limit=8).collect()
    assert len(full) > 2
    gate = spark.createDataFrame([("1",), ("3",)], "doc_id string")
    gated = hybrid_search(
        spark, docs, "orbital kepler", None, limit=8, route_gate=gate
    ).collect()
    assert {r["doc_id"] for r in gated} <= {"1", "3"}
    assert len(gated) == 2


def test_route_hotzone_boost(spark):
    """route_score' = score * (1 + w*(boost-1)) for hot clusters; missing
    clusters default to boost 1 (no change)."""
    clusters, mem = _mk_clusters(spark)
    hz = spark.createDataFrame([("c1", 1.8)], "cluster_id string, boost double")
    base = {r["cluster_id"]: r["route_score"] for r in route_clusters(
        spark, clusters, mem, query_embedding=[1.0, 0.0, 0.0],
        weighted_seeds={"d0": 1.0}, alpha=0.5).collect()}
    boosted = {r["cluster_id"]: r["route_score"] for r in route_clusters(
        spark, clusters, mem, query_embedding=[1.0, 0.0, 0.0],
        weighted_seeds={"d0": 1.0}, alpha=0.5,
        hotzone=hz, hotzone_weight=0.5).collect()}
    assert boosted["c1"] == pytest.approx(base["c1"] * (1 + 0.5 * 0.8))
    assert boosted["c0"] == pytest.approx(base["c0"])
    assert boosted["c2"] == pytest.approx(base["c2"])


def test_rank_seed_evidence_and_merge(spark):
    """search_topology_stage.cpp:26-112 — rank-discounted seed weights
    with skip branches, per-doc max dedup, and the tier1+vector merge
    with the added-seed budget."""
    import math

    from yams_spark.operators.topo_routing import (
        LEXICAL_SEED_SOURCES,
        VECTOR_SEED_SOURCES,
        merge_topology_seed_hashes,
        rank_seed_evidence,
    )

    nan = float("nan")
    comp = spark.createDataFrame(
        [
            ("a", "text", 0.9, 0),          # w = 0.9/(1+ln 2)
            ("a", "simeon_text", 0.9, 4),   # lower (worse rank) -> max keeps rank 0
            ("b", "graph_text", 0.8, 1),
            ("c", "text", 0.0, 0),          # score <= 0 skips
            ("d", "text", nan, 0),          # non-finite skips
            ("", "text", 0.9, 0),           # empty hash skips
            ("e", "vector", 0.9, 0),        # wrong family for lexical
            ("a", "vector", 0.95, 0),       # vector seed duplicating tier1
            ("f", "graph_vector", 0.7, 1),
            ("g", "entity_vector", 0.6, 0),
            ("h", "path_tree", 0.9, 0),     # never a topology seed
        ],
        "doc_hash string, source string, score double, rank int",
    )
    lex = rank_seed_evidence(comp, LEXICAL_SEED_SOURCES, 16)
    got = {r["doc_hash"]: r["weight"] for r in lex.collect()}
    assert set(got) == {"a", "b"}
    assert got["a"] == pytest.approx(0.9 / (1 + math.log(2.0)))
    assert got["b"] == pytest.approx(0.8 / (1 + math.log(3.0)))
    assert [r["doc_hash"] for r in lex.collect()] == ["a", "b"]  # weight order
    # cap
    assert rank_seed_evidence(comp, LEXICAL_SEED_SOURCES, 1).count() == 1
    assert rank_seed_evidence(comp, LEXICAL_SEED_SOURCES, 0).count() == 0

    vec = rank_seed_evidence(comp, VECTOR_SEED_SOURCES, 16)
    merged = merge_topology_seed_hashes(lex, vec, 2).orderBy("ord").collect()
    # tier1 first in order, then the 2 best NEW vector seeds ('a' skipped;
    # g = 0.6/(1+ln2) outranks f = 0.7/(1+ln3) despite the lower score)
    assert [(r["ord"], r["doc_hash"], r["origin"]) for r in merged] == [
        (1, "a", "tier1"), (2, "b", "tier1"),
        (3, "e", "vector"), (4, "g", "vector"),
    ]
    # budget 0 adds none; budget 1 adds exactly the best new one
    assert merge_topology_seed_hashes(lex, vec, 0).count() == 2
    one = merge_topology_seed_hashes(lex, vec, 1).orderBy("ord").collect()
    assert [r["doc_hash"] for r in one] == ["a", "b", "e"]


def test_fill_topology_skip_reason_cascade():
    """search_topology_stage.cpp:114-140 — every branch in cascade
    order."""
    from yams_spark.operators.topo_routing import fill_topology_skip_reason

    f = fill_topology_skip_reason
    # pre-set reason always wins, even over 'disabled'
    assert f("epoch_mismatch", "disabled", True, True, True, True, 3) == "epoch_mismatch"
    assert f("", "disabled", True, True, True, True, 3) == "disabled"
    assert f("", "weak_query_only", False, True, True, True, 3) == "strong_tier1_query"
    # weak query under weak_query_only falls through to the store check
    assert f("", "weak_query_only", True, False, True, True, 3) == "missing_store"
    assert f("", "always", True, False, True, True, 3) == "missing_store"
    # applied session: success, reason stays empty
    assert f("", "always", True, True, True, True, 3) == ""
    assert f("", "always", True, True, False, True, 3) == "no_added_candidates"
    assert f("", "always", True, True, False, True, 0) == "no_routes"
    assert f("", "always", True, True, False, False, 0) == "not_loaded"
