"""Connected-components correctness: distributed large-star/small-star
labels must equal a union-find oracle on random edge sets (FIXTURES.md §5.4).
"""

from __future__ import annotations

import random

import pytest

from yams_spark.operators.clustering import connected_components
from yams_spark.oracle.dedupe_oracle import UnionFind


def _uf_labels(nodes: list[str], edges: list[tuple[str, str]]) -> dict[str, str]:
    uf = UnionFind()
    for n in nodes:
        uf.find(n)
    for a, b in edges:
        uf.union(a, b)
    comp: dict[str, list[str]] = {}
    for n in nodes:
        comp.setdefault(uf.find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


# 0 = fully distributed; 2M = straight driver union-find; 250 = distributed
# star rounds that contract under the gate, then driver finish (the hybrid)
@pytest.mark.parametrize("driver_max", [0, 2_000_000, 250])
@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 30, 20), (2, 100, 80), (3, 200, 300), (4, 50, 0)])
def test_cc_matches_union_find(spark, seed: int, n_nodes: int, n_edges: int, driver_max: int) -> None:
    rng = random.Random(seed)
    nodes = [f"n{i:04d}" for i in range(n_nodes)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(n_edges)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _uf_labels(nodes, edges)
    # distributed CC only sees edge endpoints; singletons label themselves
    if edges:
        df = spark.createDataFrame(edges, ["url_a", "url_b"])
        got = {
            r["url"]: r["component"]
            for r in connected_components(df, driver_max_edges=driver_max).collect()
        }
    else:
        got = {}
    for n in nodes:
        assert got.get(n, n) == expected[n], f"node {n}"


def test_cc_chain_and_cycle(spark) -> None:
    # chain a-b-c-d plus cycle e-f-g-e, isolated pair h-i
    edges = [("b", "a"), ("c", "b"), ("d", "c"), ("e", "f"), ("f", "g"), ("g", "e"), ("i", "h")]
    df = spark.createDataFrame(edges, ["url_a", "url_b"])
    got = {r["url"]: r["component"] for r in connected_components(df).collect()}
    assert got == {
        "a": "a", "b": "a", "c": "a", "d": "a",
        "e": "e", "f": "e", "g": "e",
        "h": "h", "i": "h",
    }


def test_cc_stats_and_config_plumbing(spark) -> None:
    """cc stats report mode/rounds/edges; PipelineConfig.driver_cc_max_edges
    reaches connected_components (the bench's distributed-CC forcing knob)."""
    edges = [("b", "a"), ("c", "b"), ("d", "c"), ("f", "e")]
    df = spark.createDataFrame(edges, ["url_a", "url_b"])
    s: dict = {}
    connected_components(df, stats=s).collect()
    assert s == {"edges_initial": 4, "rounds": 0, "mode": "driver"}
    s = {}
    got = {r["url"]: r["component"]
           for r in connected_components(df, driver_max_edges=0, stats=s).collect()}
    assert s["mode"] == "distributed" and s["rounds"] >= 1
    assert got["d"] == "a" and got["f"] == "e"
