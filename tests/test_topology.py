"""H0 persistence (topological_quality.cpp:76-131 exact replica) and the
centroid pipeline (TopologyManager.cpp:667-704)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from yams_spark.operators.topology import (
    cluster_centroids_f32,
    persistence_h0,
    topology_quality_stats,
)


def test_persistence_h0_hand_computed() -> None:
    # 3 collinear points at 0, 1, 3: distances {1, 2, 3}; MST deaths
    # sorted = [1, 2], essential (last, n-1th) merge skipped -> only the
    # first n-2 = 1 death counts. norm = 95th pct of {1,2,3}:
    # idx = floor(.95*2) = 1 -> sorted[1] = 2. persistence = 1/2.
    pts = [[0.0], [1.0], [3.0]]
    assert persistence_h0(pts) == pytest.approx(0.5)

    # 4 points on a line at 0,1,2,10: distances sorted
    # [1,1,2,8,9,10]; deaths = 1,1 (n-2 = 2 merges; the 10-gap essential
    # merge skipped). norm: m=6, idx=floor(.95*5)=4 -> 5th smallest = 9.
    pts4 = [[0.0], [1.0], [2.0], [10.0]]
    assert persistence_h0(pts4) == pytest.approx((1.0 + 1.0) / 9.0)

    # degenerate inputs
    assert persistence_h0([[1.0]]) == 0.0
    assert persistence_h0([]) == 0.0
    assert persistence_h0([[0.0, 0.0], [0.0, 0.0]]) == 0.0  # zero norm

    # 2D distances are Euclidean
    tri = [[0.0, 0.0], [3.0, 4.0], [0.0, 100.0]]
    # dists: 5, 100, sqrt(9+96^2); m=3, idx=floor(.95*2)=1 -> middle
    d13 = math.sqrt(9 + 96.0**2)
    assert persistence_h0(tri) == pytest.approx(5.0 / d13)


def test_persistence_invariance_properties() -> None:
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(20, 4)).astype(np.float32)
    p = persistence_h0(pts)
    # permutation invariance (stable tie order only matters for exact
    # duplicates; generic random points have none)
    perm = pts[rng.permutation(20)]
    assert persistence_h0(perm) == pytest.approx(p, rel=1e-12)
    # translation invariance
    assert persistence_h0(pts + 5.0) == pytest.approx(p, rel=1e-5)
    # scale invariance (norm scales with the cloud)
    assert persistence_h0(pts * 3.0) == pytest.approx(p, rel=1e-5)


def test_cluster_centroids_f32(spark) -> None:
    members = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [3.0, 4.0]),
         ("b", [9.0, 9.0]),                    # single member: dropped
         ("c", [1.0, 1.0]), ("c", None), ("c", [3.0, 3.0])],
        "cluster_id string, embedding array<float>",
    )
    rows = {r["cluster"]: r for r in cluster_centroids_f32(members).collect()}
    assert set(rows) == {"a", "c"}
    assert rows["a"]["centroid"] == [2.0, 3.0] and rows["a"]["n_members"] == 2
    assert rows["c"]["centroid"] == [2.0, 2.0]  # None embedding skipped


def test_topology_quality_stats(spark) -> None:
    members = spark.createDataFrame(
        [("a", [0.0]), ("a", [0.0]),
         ("b", [1.0]), ("b", [1.0]),
         ("c", [3.0]), ("c", [3.0])],
        "cluster_id string, embedding array<float>",
    )
    out = topology_quality_stats(members)
    # centroids = [0], [1], [3] -> the hand-computed 0.5 case
    assert out["centroid_count"] == 3
    assert out["persistence"] == pytest.approx(0.5)
    # gate: with max_centroids=2 only 2 centroids enter -> n-2 = 0
    # merges -> persistence 0
    gated = topology_quality_stats(members, max_centroids=2)
    assert gated["centroid_count"] == 2 and gated["persistence"] == 0.0
