"""Deterministic mini-fixtures for DuckDB-oracle verification of the
alternate topology cluster engines
(``/root/reference/src/topology/topology_alternate_engines.cpp``):

* **k-means blobs** (q87): three well-separated 2-sparse blobs plus an
  empty-embedding and a dimension-mismatched document. Farthest-first
  seeding picks one seed per blob (margins ≥ 0.03 in cosine distance at
  every greedy argmax), Lloyd converges with the initial assignment (the
  blob means move the centroids by ≤ 3° while the nearest competing
  centroid sits ≥ 34° away), so the DuckDB side can derive the SAME
  final assignment from the unrolled 3-step seeding + one
  nearest-centroid pass — an independent closed-form re-derivation that
  is valid precisely because of the pinned margins
  (``tests/test_topo_engines.py`` asserts them).
* **Louvain cliques** (q89): three edge-disjoint cliques with distinct
  weights and one isolated node. Greedy modularity moves merge each
  clique and never cross (there are no inter-clique edges), so
  communities == connected components, which DuckDB derives with the
  recursive min-label CTE. The replica test asserts every greedy
  decision's gain gap ≥ 1e-6 so unordered-map iteration order in the
  reference can never pick differently.
* **batch stats** (q88/q90): the cliques plus one cross edge and an
  explicit assignment — cohesion / persistence / density / bridge mass /
  protected vs preserved pairs / weighted-degree medoids / roles, all
  exact because every edge weight is a multiple of 1/64 (float32- and
  order-exact sums; the lc0/lc1 medoid tie is EXACT and resolved by the
  min-hash rule on both engines).

Shared-spec style (CLAUDE.md invariant): these functions feed BOTH the
Spark entry builders and the DuckDB VALUES clauses — never edit one side.
"""

from __future__ import annotations

import math

import numpy as np

EMBED_DIM = 384
KMEANS_K = 0  # auto: round(sqrt(9 usable)) = 3


def _f32(x: float) -> float:
    return float(np.float32(x))


def _ang(deg: float, radius: float) -> tuple[float, float]:
    rad = math.radians(deg)
    return _f32(radius * math.cos(rad)), _f32(radius * math.sin(rad))


def kmeans_mini_docs() -> list[dict]:
    """(doc_hash, idx, x, y, dim_n): dim_n 384 = usable 2-sparse doc,
    0 = empty embedding, 3 = mismatched dimension. Blob A ~0°, blob B
    ~40°, blob C ~90°; seeds picked by the greedy: ka0 (first usable),
    kc2 (farthest, 93°), kb1 (max-min, 43°)."""
    rows = []
    for h, idx, deg, radius in (
        ("ka0", 0, 0.0, 1.0),
        ("kb0", 1, 40.0, 1.0),
        ("kc0", 2, 90.0, 1.0),
        ("ka1", 3, 3.0, 1.3),
        ("kb1", 5, 43.0, 0.7),
        ("kc1", 6, 87.0, 1.1),
        ("ka2", 7, -3.0, 0.8),
        ("kb2", 9, 37.0, 1.4),
        ("kc2", 10, 93.0, 0.9),
    ):
        x, y = _ang(deg, radius)
        rows.append({"doc_hash": h, "idx": idx, "x": x, "y": y, "dim_n": EMBED_DIM})
    rows.append({"doc_hash": "ku0", "idx": 4, "x": 0.0, "y": 0.0, "dim_n": 0})
    rows.append({"doc_hash": "ku1", "idx": 8, "x": 1.0, "y": 0.0, "dim_n": 3})
    return sorted(rows, key=lambda r: r["idx"])


def kmeans_embedding(row: dict) -> list[float]:
    """The actual embedding array the Spark engine consumes."""
    if row["dim_n"] == 0:
        return []
    if row["dim_n"] == 3:
        return [1.0, 0.0, 0.5]
    v = np.zeros(EMBED_DIM, dtype=np.float32)
    v[0] = np.float32(row["x"])
    v[1] = np.float32(row["y"])
    return [float(e) for e in v]


#: Louvain corpus: cliques only (communities == components).
def louvain_mini_nodes() -> list[tuple[str, int]]:
    return [
        ("la0", 0), ("la1", 1), ("la2", 2),
        ("lb0", 3), ("lb1", 4), ("lb2", 5),
        ("lc0", 6), ("lc1", 7),
        ("ld0", 8),
    ]


def louvain_mini_edges() -> list[tuple[str, str, float]]:
    """Undirected weighted clique edges; every weight is a multiple of
    1/64 (exact in float32 and under any double summation order)."""
    return [
        ("la0", "la1", 1.25),
        ("la0", "la2", 1.3125),
        ("la1", "la2", 1.375),
        ("lb0", "lb1", 0.703125),
        ("lb0", "lb2", 0.75),
        ("lb1", "lb2", 0.71875),
        ("lc0", "lc1", 0.9375),
    ]


def batch_mini_edges() -> list[tuple[str, str, float]]:
    """The clique edges plus one cross-community edge (protected-pair
    evidence: counted by both sides' protected totals, preserved by
    neither)."""
    return louvain_mini_edges() + [("la2", "lb0", 0.25)]


def batch_mini_assignment() -> list[tuple[str, int]]:
    """Explicit opaque bucket keys for the batch-builder entries — the
    clique communities (assignment is an input of
    buildBatchFromAssignment, :100-104, independent of any engine)."""
    label = {"la": 0, "lb": 1, "lc": 2, "ld": 3}
    return [(h, label[h[:2]]) for h, _i in louvain_mini_nodes()]


def _lit(v: float) -> str:
    return "CAST('{}' AS DOUBLE)".format(repr(v))


def _kmeans_values() -> str:
    return ",\n                ".join(
        "('{h}', {i}, {x}, {y}, {d})".format(
            h=r["doc_hash"], i=r["idx"], x=_lit(r["x"]), y=_lit(r["y"]),
            d=r["dim_n"],
        )
        for r in kmeans_mini_docs()
    )


def _edges_values(edges: list[tuple[str, str, float]]) -> str:
    return ",\n                ".join(
        "('{a}', '{b}', {w})".format(a=a, b=b, w=_lit(_f32(w)))
        for a, b, w in edges
    )


def _nodes_values() -> str:
    return ",\n                ".join(
        "('{h}', {i})".format(h=h, i=i) for h, i in louvain_mini_nodes()
    )


def _assignment_values() -> str:
    return ",\n                ".join(
        "('{h}', {l})".format(h=h, l=l) for h, l in batch_mini_assignment()
    )


_COSD = (
    "CASE WHEN ({ax}*{ax} + {ay}*{ay}) <= 0.0 "
    "OR ({bx}*{bx} + {by}*{by}) <= 0.0 THEN 2.0 "
    "ELSE 1.0 - LEAST(GREATEST(({ax}*{bx} + {ay}*{by}) / "
    "(sqrt({ax}*{ax} + {ay}*{ay}) * sqrt({bx}*{bx} + {by}*{by})), "
    "-1.0), 1.0) END"
)


def kmeans_oracle_sql() -> str:
    """Unrolled deterministic seeding (first usable; farthest; max-min)
    + one nearest-centroid assignment — equal to the converged Lloyd
    result by the fixture's margin construction. Unusable documents are
    their own singletons (runKMeans :362-365, :471-476)."""
    d_c0 = _COSD.format(ax="u.x", ay="u.y", bx="c0.x", by="c0.y")
    d_s1 = _COSD.format(ax="u.x", ay="u.y", bx="s1.x", by="s1.y")
    d_cent = _COSD.format(ax="u.x", ay="u.y", bx="c.x", by="c.y")
    return f"""
            WITH docs(doc_hash, idx, x, y, dim_n) AS (
                VALUES {_kmeans_values()}),
            usable AS (
                SELECT * FROM docs
                WHERE dim_n = (SELECT dim_n FROM docs WHERE dim_n > 0
                               ORDER BY idx LIMIT 1)),
            c0 AS (SELECT * FROM usable ORDER BY idx LIMIT 1),
            d0 AS (
                SELECT u.doc_hash, u.idx, u.x, u.y, {d_c0} AS d
                FROM usable u, c0),
            s1 AS (
                SELECT * FROM d0
                WHERE idx <> (SELECT idx FROM c0)
                ORDER BY d DESC, idx ASC LIMIT 1),
            m1 AS (
                SELECT u.doc_hash, u.idx, u.x, u.y,
                       LEAST(u.d, {d_s1}) AS mind
                FROM d0 u, s1
                WHERE u.idx <> (SELECT idx FROM c0)
                  AND u.idx <> (SELECT idx FROM s1)),
            s2 AS (SELECT * FROM m1 ORDER BY mind DESC, idx ASC LIMIT 1),
            cents(ord, x, y) AS (
                SELECT 0, x, y FROM c0
                UNION ALL SELECT 1, x, y FROM s1
                UNION ALL SELECT 2, x, y FROM s2),
            assigned AS (
                SELECT doc_hash, ord FROM (
                    SELECT u.doc_hash, c.ord,
                           ROW_NUMBER() OVER (
                               PARTITION BY u.doc_hash
                               ORDER BY {d_cent} ASC, c.ord ASC) AS rn
                    FROM usable u CROSS JOIN cents c)
                WHERE rn = 1),
            grouped AS (
                SELECT doc_hash,
                       MIN(doc_hash) OVER (PARTITION BY ord) AS cluster_label,
                       COUNT(*) OVER (PARTITION BY ord) AS sz
                FROM assigned)
            SELECT doc_hash, cluster_label,
                   CAST(sz AS BIGINT) AS cluster_size
            FROM grouped
            UNION ALL
            SELECT doc_hash, doc_hash AS cluster_label,
                   CAST(1 AS BIGINT) AS cluster_size
            FROM docs
            WHERE dim_n <> (SELECT dim_n FROM docs WHERE dim_n > 0
                            ORDER BY idx LIMIT 1)
            ORDER BY doc_hash
    """


def louvain_oracle_sql() -> str:
    """Communities == connected components on the clique fixture
    (min-label recursive CTE), valid because the corpus has no
    inter-community edges and the replica test pins that the greedy
    merges every clique."""
    return f"""
            WITH RECURSIVE nodes(doc_hash, idx) AS (
                VALUES {_nodes_values()}),
            edges(a, b, w) AS (
                VALUES {_edges_values(louvain_mini_edges())}),
            sym AS (
                SELECT a AS src, b AS dst FROM edges
                UNION ALL SELECT b, a FROM edges),
            reach(node, lbl) AS (
                SELECT doc_hash, doc_hash FROM nodes
                UNION
                SELECT s.dst, r.lbl FROM reach r
                JOIN sym s ON s.src = r.node
                WHERE r.lbl < s.dst),
            comm AS (
                SELECT node AS doc_hash, MIN(lbl) AS community_label
                FROM reach GROUP BY node)
            SELECT c.doc_hash, c.community_label,
                   CAST(COUNT(*) OVER (PARTITION BY c.community_label)
                        AS BIGINT) AS community_size
            FROM comm c
            ORDER BY c.doc_hash
    """


def _batch_ctes() -> str:
    """Shared CTEs for the batch-builder oracles: labelled pairs,
    cluster ids, per-cluster edge stats, per-member weighted degrees."""
    return f"""
            WITH nodes(doc_hash, idx) AS (
                VALUES {_nodes_values()}),
            assign(doc_hash, label) AS (
                VALUES {_assignment_values()}),
            edges(a, b, w) AS (
                VALUES {_edges_values(batch_mini_edges())}),
            cid AS (
                SELECT label,
                       'topology.cluster.' || MIN(doc_hash) AS cluster_id,
                       COUNT(*) AS member_count
                FROM assign GROUP BY label),
            lp AS (
                SELECT e.a, e.b, e.w, sa.label AS la, sb.label AS lb
                FROM edges e
                JOIN assign sa ON sa.doc_hash = e.a
                JOIN assign sb ON sb.doc_hash = e.b),
            istats AS (
                SELECT la AS label, COUNT(*) AS internal_edge_count,
                       SUM(w) AS cohesion_sum, MIN(w) AS persistence_min
                FROM lp WHERE la = lb GROUP BY la),
            xstats AS (
                SELECT label, COUNT(*) AS cross_count FROM (
                    SELECT la AS label FROM lp WHERE la <> lb
                    UNION ALL
                    SELECT lb AS label FROM lp WHERE la <> lb)
                GROUP BY label),
            wd AS (
                SELECT doc_hash, SUM(w) AS weighted_degree,
                       COUNT(*) AS degree
                FROM (
                    SELECT a AS doc_hash, w FROM lp WHERE la = lb
                    UNION ALL
                    SELECT b AS doc_hash, w FROM lp WHERE la = lb)
                GROUP BY doc_hash),
            mem AS (
                SELECT s.doc_hash, s.label, c.cluster_id, c.member_count,
                       COALESCE(wd.weighted_degree, 0.0) AS weighted_degree,
                       COALESCE(wd.degree, 0) AS degree
                FROM assign s
                JOIN cid c ON c.label = s.label
                LEFT JOIN wd ON wd.doc_hash = s.doc_hash),
            medoid AS (
                SELECT label, doc_hash AS medoid_hash,
                       GREATEST(weighted_degree, 0.0) AS medoid_score
                FROM (
                    SELECT *, ROW_NUMBER() OVER (
                        PARTITION BY label
                        ORDER BY weighted_degree DESC, doc_hash ASC) AS rn
                    FROM mem) WHERE rn = 1),
            bridge AS (
                SELECT label, COUNT(*) AS bridge_count FROM mem
                WHERE member_count > 2 AND degree >= 2 GROUP BY label)
    """


def batch_oracle_sql() -> str:
    """Per-cluster artifact stats (buildBatchFromAssignment :137-225)."""
    return (
        _batch_ctes()
        + """
            SELECT c.cluster_id,
                   CAST(c.member_count AS BIGINT) AS member_count,
                   CAST(ROUND(CASE WHEN COALESCE(i.internal_edge_count, 0) > 0
                        THEN i.cohesion_sum / i.internal_edge_count
                        ELSE 0.0 END, 8) AS DOUBLE) AS cohesion,
                   CAST(ROUND(CASE WHEN COALESCE(i.internal_edge_count, 0) > 0
                        THEN i.persistence_min ELSE 0.0 END, 8) AS DOUBLE)
                       AS persistence,
                   CAST(ROUND(CASE WHEN c.member_count > 1
                        THEN COALESCE(i.internal_edge_count, 0)
                             / (c.member_count * (c.member_count - 1) / 2.0)
                        ELSE 0.0 END, 8) AS DOUBLE) AS density,
                   CAST(ROUND(COALESCE(b.bridge_count, 0)
                        * 1.0 / c.member_count, 8) AS DOUBLE) AS bridge_mass,
                   CAST(COALESCE(i.internal_edge_count, 0)
                        + COALESCE(x.cross_count, 0) AS BIGINT)
                       AS protected_pair_count,
                   CAST(COALESCE(i.internal_edge_count, 0) AS BIGINT)
                       AS preserved_protected_pair_count,
                   m.medoid_hash,
                   CAST(ROUND(m.medoid_score, 8) AS DOUBLE) AS medoid_score
            FROM cid c
            LEFT JOIN istats i ON i.label = c.label
            LEFT JOIN xstats x ON x.label = c.label
            LEFT JOIN bridge b ON b.label = c.label
            JOIN medoid m ON m.label = c.label
            ORDER BY c.cluster_id
    """
    )


def roles_oracle_sql() -> str:
    """Per-member membership rows (buildBatchFromAssignment :227-251)."""
    return (
        _batch_ctes()
        + """
            SELECT mem.doc_hash, mem.cluster_id,
                   CAST(ROUND(CASE WHEN mem.member_count > 1
                        THEN mem.weighted_degree / (mem.member_count - 1)
                        ELSE 0.0 END, 8) AS DOUBLE) AS bridge_score,
                   CASE WHEN mem.member_count = 1 THEN 'outlier'
                        WHEN mem.doc_hash = md.medoid_hash THEN 'medoid'
                        WHEN mem.member_count > 2
                             AND mem.weighted_degree >= 2.0 THEN 'bridge'
                        ELSE 'core' END AS role
            FROM mem JOIN medoid md ON md.label = mem.label
            ORDER BY mem.doc_hash
    """
    )
