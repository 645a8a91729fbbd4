"""Deterministic mini-fixture for DuckDB-oracle verification of the two
cluster-artifact post-passes the reference runs after topology build
(``/root/reference/src/topology/topology_representatives.cpp``):

* ``selectDiverseRoutingRepresentatives`` (:33-91) — greedy max-min
  (k-center / Gonzalez) selection of extra routing representatives per
  cluster, seeded by cosine distance to the centroid; candidates are
  hash-sorted, ties resolved by strict ``>`` (first-in-hash-order wins).
* ``applyOrthogonalBoundarySpill`` (:93-287) — SOAR-style secondary
  cluster assignment: a boundary document spills into candidate clusters
  whose residual distance is within ``overlapBoundaryDistanceRatio`` of
  the primary residual, ranked by
  ``loss = |x-c|² + λ·(⟨x-p, x-c⟩² / |x-p|²)`` (the orthogonality
  penalty, topology_representatives.cpp:246-252); documents sitting
  exactly on their centroid take the outlier branch gated by the
  candidate cluster's observed member radius (:253-258).

Exactness trick (same as ``oracle/semantic_mini.py``): every embedding
and centroid is 2-sparse — nonzero only in dims (0, 1) of the 384-dim
float32 vector — so the pipeline's 384-term Catalyst/numpy folds sum 382
exact zeros plus the two real terms, reproducing the DuckDB 2-term
closed form *bit-for-bit* (adding IEEE zeros never perturbs a sum). All
gate comparisons keep ≥ 1e-2 absolute margin and all distinct losses
are either exactly equal (mirror-symmetric constructions, where the
cluster-id tie-break is itself under test) or ≥ 1e-8 apart
(``tests/test_topo_reps.py::test_spill_mini_margins`` asserts both), so
float32 quantisation can never flip a branch.

This one spec feeds BOTH the Spark entry builders and the DuckDB VALUES
clauses (CLAUDE.md invariant style) — never edit one side.
"""

from __future__ import annotations

import math

import numpy as np

EMBED_DIM = 384
#: kResidualEpsilon (topology_representatives.cpp:118)
RESIDUAL_EPS = 1e-12
#: entry config: overlapLimit / overlapBoundaryDistanceRatio /
#: overlapResidualPenalty used by q86 (TopologyBuildConfig defaults are
#: 1 / 1.05 / 1.0; the fixture widens limit+ratio to exercise rank-2
#: spills and the ratio gate with clean margins).
SPILL_LIMIT = 2
SPILL_RATIO = 1.25
SPILL_PENALTY = 1.0
#: q85 config: routingRepresentativeCount (centroid-implicit first rep
#: + 2 selected extras).
REP_COUNT = 3


def _f32(x: float) -> float:
    return float(np.float32(x))


def _xy(x: float, y: float) -> tuple[float, float]:
    return _f32(x), _f32(y)


def _ang(deg: float, radius: float) -> tuple[float, float]:
    rad = math.radians(deg)
    return _f32(radius * math.cos(rad)), _f32(radius * math.sin(rad))


def spill_mini_clusters() -> list[dict]:
    """Cluster artifacts with explicit centroids (the reference's
    applyOrthogonalBoundarySpill consumes centroids as given artifacts,
    not recomputed means — so the fixture supplies them literally)."""
    out = []
    for cid, (x, y) in (
        ("tc_a", (1.0, 0.0)),   # primary home of the spill showcase docs
        ("tc_b", (1.6, 0.0)),   # radial candidate: SOAR-penalised
        ("tc_c", (1.3, 0.32)),  # tangential candidate: SOAR-preferred
        ("tc_e", (1.3, -0.32)),  # exact y-mirror of tc_c (tie-break test)
        ("tc_d", (0.0, 1.0)),   # far cluster, never admitted
    ):
        cx, cy = _xy(x, y)
        out.append({"cluster_id": cid, "cx": cx, "cy": cy})
    return out


def spill_mini_docs() -> list[dict]:
    """Spill-corpus memberships. ``overlap`` non-empty ⇒ the reference
    skips the doc (:174-177); unknown cluster id ⇒ dropped (:178-181).

    Scenario map (losses/gates derive from the float32-widened doubles):
      sa0 core (1.3,0): spills tc_c/tc_e at EXACTLY equal loss 0.1024
          (cluster-id tie-break) while nearest-centroid tc_b (|res|²=0.09,
          loss 0.18 after the parallel-residual penalty) is pushed to
          rank 3 and cut by the limit — the SOAR reorder, demonstrated.
      sa1 core at centroid: |primary residual|² = 0 and not outlier ⇒
          skipped (:199-202).
      sa2 OUTLIER at centroid: candidate-radius branch — admitted by
          tc_c/tc_e (0.1924 ≤ radius²·ratio² = 0.2025), rejected by
          tc_b/tc_d whose member radii are too small.
      sa3 core near centroid: every candidate fails the boundary ratio ⇒
          no spill rows.
      sa4 would spill but carries a pre-existing overlap ⇒ skipped.
      sa5 points at an unknown cluster ⇒ dropped.
      sc0/se0 mirror pair: spill into tc_a (rank 1) and tc_b (rank 2) —
          the ~4e-8 loss gap between the two comes from float32
          asymmetry of |1.3f-1.0| vs |1.3f-1.6f| and is stable on both
          engines because both compute the identical doubles.
      sb*/sc1/se1/sd* contribute radii and produce no spills.
    """
    rows = []
    for h, cid, (x, y), role, overlap in (
        ("sa0", "tc_a", (1.3, 0.0), "core", []),
        ("sa1", "tc_a", (1.0, 0.0), "core", []),
        ("sa2", "tc_a", (1.0, 0.0), "outlier", []),
        ("sa3", "tc_a", (0.97, 0.01), "core", []),
        ("sa4", "tc_a", (1.35, 0.0), "core", ["tc_x"]),
        ("sa5", "tc_zz", (1.3, 0.0), "core", []),
        ("sb0", "tc_b", (1.4, 0.0), "core", []),
        ("sb1", "tc_b", (1.8, 0.0), "core", []),
        ("sc0", "tc_c", (1.3, -0.04), "core", []),
        ("sc1", "tc_c", (1.3, 0.68), "core", []),
        ("se0", "tc_e", (1.3, 0.04), "core", []),
        ("se1", "tc_e", (1.3, -0.68), "core", []),
        ("sd0", "tc_d", (0.0, 1.1), "core", []),
        ("sd1", "tc_d", (0.1, 1.0), "core", []),
    ):
        fx, fy = _xy(x, y)
        rows.append(
            {"doc_hash": h, "cluster_id": cid, "x": fx, "y": fy,
             "role": role, "overlap": list(overlap)}
        )
    return rows


def rep_mini_docs() -> list[dict]:
    """Representative-corpus members: per-cluster angle/radius spreads
    (cosine distance is radius-invariant — varied radii prove it), plus
    one non-finite member per the :48-52 finiteness filter and a
    one-candidate cluster exercising the early ``break`` (:81-83)."""
    rows = []
    for h, cid, (deg, radius) in (
        ("rpa0", "tc_a", (2.0, 0.7)),
        ("rpa1", "tc_a", (10.0, 1.2)),
        ("rpa2", "tc_a", (-6.0, 1.0)),
        ("rpa3", "tc_a", (25.0, 0.9)),   # sel 1: max dist to centroid
        ("rpa4", "tc_a", (14.0, 1.5)),   # sel 2: max-min after rpa3
        ("rpb0", "tc_b", (40.0, 1.0)),   # sel 1
        ("rpb1", "tc_b", (-35.0, 0.8)),  # sel 2
        ("rpb2", "tc_b", (5.0, 1.1)),
        ("rpc0", "tc_c", (90.0, 1.0)),   # sel 2
        ("rpc1", "tc_c", (100.0, 2.0)),
        ("rpc2", "tc_c", (170.0, 1.0)),  # sel 1
        ("rpd0", "tc_d", (50.0, 1.0)),   # lone valid candidate: sel 1 only
    ):
        x, y = _ang(deg, radius)
        rows.append({"doc_hash": h, "cluster_id": cid, "x": x, "y": y})
    rows.append(
        {"doc_hash": "rpa5", "cluster_id": "tc_a",
         "x": float("nan"), "y": 0.5}
    )
    rows.append(
        {"doc_hash": "rpd1", "cluster_id": "tc_d",
         "x": float("nan"), "y": float("nan")}
    )
    return rows


def embedding_xy(x: float, y: float) -> list[float]:
    """The full 384-dim float32 vector the pipeline runs on."""
    v = np.zeros(EMBED_DIM, dtype=np.float32)
    v[0] = np.float32(x)
    v[1] = np.float32(y)
    return [float(e) for e in v]


def _lit(v: float) -> str:
    """Exact double literal: DuckDB types bare decimal literals as
    DECIMAL (overflowing on products); a string→DOUBLE cast of the
    ``repr`` round-trips the IEEE value exactly."""
    if math.isnan(v):
        return "CAST('nan' AS DOUBLE)"
    return "CAST('{}' AS DOUBLE)".format(repr(v))


def _cluster_values() -> str:
    return ",\n                ".join(
        "('{cluster_id}', {cx}, {cy})".format(
            cluster_id=c["cluster_id"], cx=_lit(c["cx"]), cy=_lit(c["cy"])
        )
        for c in spill_mini_clusters()
    )


def _spill_doc_values() -> str:
    return ",\n                ".join(
        "('{h}', '{c}', {x}, {y}, '{r}', {ov})".format(
            h=d["doc_hash"], c=d["cluster_id"], x=_lit(d["x"]),
            y=_lit(d["y"]), r=d["role"],
            ov="TRUE" if d["overlap"] else "FALSE",
        )
        for d in spill_mini_docs()
    )


def _rep_doc_values() -> str:
    return ",\n                ".join(
        "('{h}', '{c}', {x}, {y})".format(
            h=d["doc_hash"], c=d["cluster_id"], x=_lit(d["x"]), y=_lit(d["y"])
        )
        for d in rep_mini_docs()
    )


def reps_oracle_sql() -> str:
    """Unrolled 2-step greedy (REP_COUNT=3 ⇒ two selections): step 1 is
    the max cosine-distance-to-centroid candidate, step 2 the max of
    ``min(d_to_centroid, d_to_step1)`` — exactly the C++ loop at
    topology_representatives.cpp:64-89 for two iterations. The strict-``>``
    first-in-hash-order tie rule is ``ORDER BY d DESC, doc_hash ASC``."""
    cosd = (
        "CASE WHEN ({ax}*{ax} + {ay}*{ay}) <= 0.0 "
        "OR ({bx}*{bx} + {by}*{by}) <= 0.0 THEN 2.0 "
        "ELSE 1.0 - LEAST(GREATEST(({ax}*{bx} + {ay}*{by}) / "
        "(sqrt({ax}*{ax} + {ay}*{ay}) * sqrt({bx}*{bx} + {by}*{by})), "
        "-1.0), 1.0) END"
    )
    d0 = cosd.format(ax="x", ay="y", bx="cx", by="cy")
    d_s1 = cosd.format(ax="c.x", ay="c.y", bx="s1.x", by="s1.y")
    return f"""
            WITH docs(doc_hash, cluster_id, x, y) AS (
                VALUES {_rep_doc_values()}),
            cents(cluster_id, cx, cy) AS (
                VALUES {_cluster_values()}),
            cand AS (
                SELECT d.cluster_id, d.doc_hash, d.x, d.y,
                       {d0} AS d0
                FROM docs d JOIN cents USING (cluster_id)
                WHERE isfinite(d.x) AND isfinite(d.y)),
            s1 AS (
                SELECT cluster_id, doc_hash, x, y, d0 FROM (
                    SELECT *, ROW_NUMBER() OVER (
                        PARTITION BY cluster_id
                        ORDER BY d0 DESC, doc_hash ASC) AS rn
                    FROM cand) WHERE rn = 1),
            m2 AS (
                SELECT c.cluster_id, c.doc_hash,
                       LEAST(c.d0, {d_s1}) AS mind
                FROM cand c JOIN s1 ON c.cluster_id = s1.cluster_id
                                    AND c.doc_hash <> s1.doc_hash),
            s2 AS (
                SELECT cluster_id, doc_hash, mind FROM (
                    SELECT *, ROW_NUMBER() OVER (
                        PARTITION BY cluster_id
                        ORDER BY mind DESC, doc_hash ASC) AS rn
                    FROM m2) WHERE rn = 1)
            SELECT cluster_id, CAST(1 AS INTEGER) AS sel_order, doc_hash,
                   CAST(ROUND(d0, 8) AS DOUBLE) AS sel_distance
            FROM s1
            UNION ALL
            SELECT cluster_id, CAST(2 AS INTEGER) AS sel_order, doc_hash,
                   CAST(ROUND(mind, 8) AS DOUBLE) AS sel_distance
            FROM s2
            ORDER BY cluster_id, sel_order
    """


def spill_oracle_sql() -> str:
    """The :93-287 dataflow restated over the 2-sparse corpus: observed
    member radius per cluster, primary residual + norm², candidate
    residual norm² + residual dot, the ratio gate on whichever branch the
    document takes, the SOAR loss, and the (loss, cluster-id) rank capped
    at SPILL_LIMIT."""
    ratio2 = _lit(SPILL_RATIO * SPILL_RATIO)
    eps = _lit(RESIDUAL_EPS)
    lam = _lit(SPILL_PENALTY)
    return f"""
            WITH docs(doc_hash, cluster_id, x, y, role, has_overlap) AS (
                VALUES {_spill_doc_values()}),
            cents(cluster_id, cx, cy) AS (
                VALUES {_cluster_values()}),
            radius AS (
                SELECT d.cluster_id,
                       MAX((d.x - c.cx) * (d.x - c.cx)
                           + (d.y - c.cy) * (d.y - c.cy)) AS r2
                FROM docs d JOIN cents c USING (cluster_id)
                GROUP BY d.cluster_id),
            prim AS (
                SELECT d.doc_hash, d.cluster_id, d.x, d.y, d.role,
                       (d.x - c.cx) AS px, (d.y - c.cy) AS py,
                       (d.x - c.cx) * (d.x - c.cx)
                           + (d.y - c.cy) * (d.y - c.cy) AS p2
                FROM docs d JOIN cents c USING (cluster_id)
                WHERE NOT d.has_overlap),
            elig AS (
                SELECT * FROM prim
                WHERE isfinite(p2)
                  AND (p2 > {eps} OR role = 'outlier')),
            cand AS (
                SELECT e.doc_hash, e.cluster_id AS primary_cluster,
                       k.cluster_id AS spill_cluster, e.p2,
                       (e.x - k.cx) * (e.x - k.cx)
                           + (e.y - k.cy) * (e.y - k.cy) AS cn2,
                       e.px * (e.x - k.cx) + e.py * (e.y - k.cy) AS rdot,
                       COALESCE(r.r2, 0.0) AS cand_r2
                FROM elig e
                CROSS JOIN cents k
                LEFT JOIN radius r ON r.cluster_id = k.cluster_id
                WHERE k.cluster_id <> e.cluster_id),
            gated AS (
                SELECT doc_hash, primary_cluster, spill_cluster,
                       CASE WHEN p2 > {eps}
                            THEN cn2 + {lam}
                                 * ((rdot * rdot) / p2)
                            ELSE cn2 END AS loss
                FROM cand
                WHERE isfinite(cn2)
                  AND CASE WHEN p2 > {eps}
                           THEN cn2 <= p2 * {ratio2}
                           ELSE cand_r2 > {eps}
                                AND cn2 <= cand_r2 * {ratio2} END),
            ranked AS (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY doc_hash
                    ORDER BY loss ASC, spill_cluster ASC) AS rk
                FROM gated WHERE isfinite(loss))
            SELECT doc_hash, primary_cluster, spill_cluster,
                   CAST(rk AS INTEGER) AS spill_rank,
                   CAST(ROUND(loss, 8) AS DOUBLE) AS loss
            FROM ranked WHERE rk <= {SPILL_LIMIT}
            ORDER BY doc_hash, spill_rank
    """
