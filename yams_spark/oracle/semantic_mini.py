"""Deterministic mini-corpus for DuckDB-oracle verification of the
SEMANTIC ER path (the assignment's core trace,
``/root/reference/src/cli/commands/doctor/repairs/dedupe.cpp:113-244``):
cosine gates 0.92 / 0.975, the 0.8·cos + 0.15·title + 0.05·path pair
score (dedupe.cpp:197-204), transitive closure, canonical selection and
the ``semantic:keep-newest:0.920:`` group key (dedupe.cpp:279-287) —
previously only rows-only / pytest-verified on the semantic family.

The corpus is built so an independent SQL engine can recompute *every*
stage bit-exactly:

* **2-sparse embeddings.** Page ``(g, i)`` gets the 384-dim float32
  vector ``cos(φ_i)·e_{2g} + sin(φ_i)·e_{2g+1}``. Pairwise cosine inside
  a group is then a four-term closed form
  ``(ca·cb + sa·sb) / (sqrt(ca²+sa²)·sqrt(cb²+sb²))`` — the pipeline's
  ``cosine_matrix`` einsum over all 384 dims sums the same two nonzero
  products (adding exact zeros never perturbs an IEEE sum), so the
  DuckDB expression reproduces the float64 math *bit-for-bit*, including
  the final float32 truncation both paths apply. No accumulation-order
  hazard exists by construction.
* **Two blocking families.** ``exact`` groups share an identical body
  (and empty title); ``title`` groups share an identical title with
  distinct bodies. Both reduce to SQL equi-joins.
* **Scenario coverage.** Six scenarios × 2 instances exercise every
  acceptance branch: auto-accept (cos ≥ 0.975), overlap-gated accept
  (0.92 ≤ cos < 0.975 with title/path overlap), overlap-missing reject,
  below-threshold reject, transitive-only members (no direct accepted
  pair with the canonical ⇒ NULL similarity_to_canonical), and
  fully-rejected groups that publish nothing. All angles keep ≥ 2e-3
  margin from both gates, so float32 rounding can never flip a branch.

The one spec below feeds BOTH the Spark page builder and the DuckDB
VALUES clause, so the two sides cannot drift (CLAUDE.md invariant
style, same as operators/signatures.py).
"""

from __future__ import annotations

import math

import numpy as np

EMBED_DIM = 384
BASE_TS = 1704067200  # 2024-01-01T00:00:00Z, same anchor as er_mini

#: (kind, angles°, url_scheme) — see module docstring for what each
#: scenario proves. acos(0.975)=12.84°, acos(0.92)=23.07°.
_SCENARIOS: list[tuple[str, list[float], str]] = [
    # A: exact-family chain; shared url token ⇒ path_overlap = 1/3 on
    #    every pair; (0,3) at 26° rejected but closed transitively.
    ("exact", [0.0, 8.0, 18.0, 26.0], "shared"),
    # B: exact-family auto-accept clique {0,1,2}; urls token-disjoint so
    #    only cos ≥ 0.975 admits; member 3 stays a singleton (dropped).
    ("exact", [0.0, 6.0, 12.0, 40.0], "disjoint"),
    # C: mid-cosine pairs (18° = 0.951) with zero overlap ⇒ the
    #    (title>0 OR path>0 OR cos≥0.975) gate rejects everything.
    ("exact", [0.0, 18.0, 36.0, 54.0], "disjoint"),
    # D: title-family chain at 16° (0.961): title_overlap = 1.0 carries
    #    the gate; only (2,3) is direct with the canonical.
    ("title", [0.0, 16.0, 32.0, 48.0], "disjoint"),
    # E: title-family all-reject: 26° = 0.8988 < 0.92 despite overlap.
    ("title", [0.0, 26.0, 52.0, 78.0], "disjoint"),
    # F: two url-token sub-pairs bridged into one component by the
    #    auto-accept (1,2) edge at 10°.
    ("exact", [0.0, 10.0, 20.0, 30.0], "split"),
]
N_INSTANCES = 2  # every scenario twice, distinct groups/dims/bodies


def _url(g: int, i: int, scheme: str) -> str:
    if scheme == "shared":
        return f"m{g}x{i}.grp{g}"
    if scheme == "split":
        return f"m{g}x{i}.ga{g}" if i < 2 else f"m{g}x{i}.gb{g}"
    return f"m{g}x{i}"


def semantic_mini_spec() -> list[dict]:
    """One dict per page: url, ts (epoch s), title, body, html, group g,
    member i, float32 cos/sin components (c, s) and their dims."""
    pages: list[dict] = []
    g = 0
    for _rep in range(N_INSTANCES):
        for kind, angles, scheme in _SCENARIOS:
            for i, deg in enumerate(angles):
                idx = g * 4 + i
                title = "" if kind == "exact" else f"topic{g} alpha{g}"
                body = (
                    f"shared body of group {g}"
                    if kind == "exact"
                    else f"body {g} {i} distinct content"
                )
                html = (
                    f"<html><head><title>{title}</title></head>"
                    f"<body>{body}</body></html>"
                )
                rad = math.radians(deg)
                pages.append(
                    {
                        "url": _url(g, i, scheme),
                        "ts": BASE_TS + idx * 60,
                        "title": title,
                        "body": body,
                        "html": html,
                        "g": g,
                        "i": i,
                        "c": float(np.float32(math.cos(rad))),
                        "s": float(np.float32(math.sin(rad))),
                        "dim_c": 2 * g,
                        "dim_s": 2 * g + 1,
                    }
                )
            g += 1
    return pages


def embedding_for(page: dict) -> list[float]:
    """The full 384-dim float32 vector the pipeline scores with."""
    v = np.zeros(EMBED_DIM, dtype=np.float32)
    v[page["dim_c"]] = np.float32(page["c"])
    v[page["dim_s"]] = np.float32(page["s"])
    return [float(x) for x in v]


def _values_clause() -> str:
    rows = []
    for p in semantic_mini_spec():
        rows.append(
            "('{url}', {ts}, '{title}', '{body}', '{html}', {g}, {c!r}, {s!r})".format(
                **p
            )
        )
    return ",\n                ".join(rows)


#: Everything below is the DuckDB re-derivation: blocking (equi-join on
#: body for the exact family / title for the title family), the bit-exact
#: closed-form cosine with float32 truncation, token-Jaccard path overlap,
#: the dedupe.cpp:191-204 gates and score, min-label transitive closure
#: (recursive CTE), keep-newest canonical selection and the group key.
def _common_cte() -> str:
    return f"""
            WITH RECURSIVE pages(url, ts, title, body, html, g, c, s) AS (
                VALUES {_values_clause()}),
            pr AS (
                SELECT a.url AS url_a, b.url AS url_b,
                       CAST(CAST(
                           (a.c * b.c + a.s * b.s)
                           / (sqrt(a.c * a.c + a.s * a.s)
                              * sqrt(b.c * b.c + b.s * b.s))
                           AS FLOAT) AS DOUBLE) AS cosine,
                       CASE WHEN a.title = '' THEN 0.0 ELSE 1.0 END
                           AS title_overlap,
                       CASE WHEN len(list_intersect(str_split(a.url, '.'),
                                                    str_split(b.url, '.'))) = 0
                            THEN 0.0
                            ELSE len(list_intersect(str_split(a.url, '.'),
                                                    str_split(b.url, '.'))) * 1.0
                                 / (len(str_split(a.url, '.'))
                                    + len(str_split(b.url, '.'))
                                    - len(list_intersect(str_split(a.url, '.'),
                                                         str_split(b.url, '.'))))
                       END AS path_overlap
                FROM pages a JOIN pages b
                  ON a.url < b.url
                 AND (a.body = b.body
                      OR (a.title <> '' AND a.title = b.title))),
            feat AS (
                SELECT url_a, url_b, cosine, title_overlap, path_overlap,
                       cosine * 0.8 + title_overlap * 0.15
                           + path_overlap * 0.05 AS pair_score,
                       cosine >= 0.92
                           AND (title_overlap > 0.0 OR path_overlap > 0.0
                                OR cosine >= 0.975) AS accepted
                FROM pr),
            edges AS (SELECT url_a AS a, url_b AS b FROM feat WHERE accepted),
            bidir AS (SELECT a, b FROM edges
                      UNION ALL SELECT b, a FROM edges),
            reach(url, lbl) AS (
                SELECT a, a FROM (SELECT DISTINCT a FROM bidir)
                UNION
                SELECT e.b, r.lbl FROM reach r
                JOIN bidir e ON e.a = r.url WHERE r.lbl < e.b),
            comp AS (SELECT url, MIN(lbl) AS component
                     FROM reach GROUP BY url),
            mem AS (
                SELECT c.component, p.url, p.ts, sha256(p.html) AS doc_hash
                FROM comp c JOIN pages p USING (url)),
            grp AS (
                SELECT component, COUNT(*) AS member_count,
                       'semantic:keep-newest:0.920:'
                           || string_agg(doc_hash, ',' ORDER BY doc_hash)
                           AS group_key
                FROM mem GROUP BY component HAVING COUNT(*) >= 2),
            canon AS (
                SELECT component, url AS canonical_url FROM (
                    SELECT component, url,
                           ROW_NUMBER() OVER (PARTITION BY component
                               ORDER BY ts DESC, url ASC) AS rk
                    FROM mem) WHERE rk = 1),
            mps AS (
                SELECT c.component, MAX(f.pair_score) AS max_pair_score
                FROM feat f JOIN comp c ON c.url = f.url_a
                WHERE f.accepted GROUP BY c.component)"""


def clusters_oracle_sql() -> str:
    return (
        _common_cte()
        + """
            SELECT g.group_key, n.canonical_url,
                   CAST(g.member_count AS BIGINT) AS member_count,
                   CAST(ROUND(m.max_pair_score, 6) AS DOUBLE) AS max_pair_score
            FROM grp g
            JOIN canon n USING (component)
            JOIN mps m USING (component)
        """
    )


def metrics_oracle_sql() -> str:
    """Per-component topology metrics (topology_baseline.cpp:122-208) over
    the semantic-mini accepted-pair graph: cohesion (mean edge weight),
    persistence (min), density, bridge_mass (frac of members with degree
    ≥ 2, n > 2 only), and the medoid by weighted internal degree with the
    hash-then-url tie-break. The degree ordering uses ROUND(wdeg, 6) —
    coarser than the pipeline's 1e-9 argmax tolerance, equivalent here
    because fixture degrees are either exactly tied or > 1e-4 apart."""
    return (
        _common_cte()
        + """
            , wedges AS (
                SELECT url_a AS u, url_b AS v, pair_score AS w FROM feat
                WHERE accepted),
            incident AS (
                SELECT u AS url, w FROM wedges
                UNION ALL SELECT v AS url, w FROM wedges),
            wdeg AS (
                SELECT url, SUM(w) AS wd, COUNT(*) AS deg
                FROM incident GROUP BY url),
            em AS (
                SELECT c.component, e.w FROM wedges e
                JOIN comp c ON c.url = e.u),
            compstats AS (
                SELECT component, COUNT(*) AS internal_edges,
                       AVG(w) AS cohesion, MIN(w) AS persistence
                FROM em GROUP BY component),
            nmem AS (
                SELECT component, COUNT(*) AS member_count FROM mem
                GROUP BY component),
            bridge AS (
                SELECT mem.component,
                       SUM(CASE WHEN wdeg.deg >= 2 THEN 1 ELSE 0 END) * 1.0
                           AS n_bridge
                FROM mem JOIN wdeg USING (url) GROUP BY mem.component),
            medoid AS (
                SELECT component, url AS medoid_url, wd AS medoid_score
                FROM (
                    SELECT mem.component, mem.url, wdeg.wd, mem.doc_hash,
                           ROW_NUMBER() OVER (PARTITION BY mem.component
                               ORDER BY ROUND(wdeg.wd, 6) DESC,
                                        mem.doc_hash ASC, mem.url ASC)
                               AS mrk
                    FROM mem JOIN wdeg USING (url))
                WHERE mrk = 1)
            SELECT n.component, CAST(n.member_count AS BIGINT) AS member_count,
                   CAST(s.internal_edges AS BIGINT) AS internal_edges,
                   CAST(ROUND(s.cohesion, 6) AS DOUBLE) AS cohesion,
                   CAST(ROUND(s.persistence, 6) AS DOUBLE) AS persistence,
                   CAST(ROUND(s.internal_edges
                        / (n.member_count * (n.member_count - 1) / 2.0), 6)
                        AS DOUBLE) AS density,
                   CAST(ROUND(CASE WHEN n.member_count > 2
                        THEN b.n_bridge / n.member_count ELSE 0.0 END, 6)
                        AS DOUBLE) AS bridge_mass,
                   m.medoid_url,
                   CAST(ROUND(m.medoid_score, 6) AS DOUBLE) AS medoid_score
            FROM nmem n
            JOIN compstats s USING (component)
            JOIN bridge b USING (component)
            JOIN medoid m USING (component)
        """
    )


def members_oracle_sql() -> str:
    return (
        _common_cte()
        + """
            SELECT g.group_key, mem.url,
                   CASE WHEN mem.url = n.canonical_url
                        THEN 'canonical' ELSE 'duplicate' END AS role,
                   CAST(ROUND(d.cosine, 6) AS DOUBLE)
                       AS similarity_to_canonical,
                   CAST(ROUND(d.title_overlap, 6) AS DOUBLE) AS title_overlap,
                   CAST(ROUND(d.path_overlap, 6) AS DOUBLE) AS path_overlap,
                   CAST(ROUND(d.pair_score, 6) AS DOUBLE) AS pair_score
            FROM mem
            JOIN grp g USING (component)
            JOIN canon n USING (component)
            LEFT JOIN feat d
              ON d.accepted
             AND ((d.url_a = n.canonical_url AND d.url_b = mem.url)
                  OR (d.url_b = n.canonical_url AND d.url_a = mem.url))
        """
    )


def eval_truth_family(page: dict) -> str:
    """Ground-truth family id for the pairwise-F1 evaluation (the north
    rule's metric) — defined BY the scenario intent, not by what the
    gates accept, so the confusion matrix is non-trivial:

    * scenario C (``g % 6 == 2``, mid-cosine zero-overlap rejects): the
      pages are blocking COLLISIONS, not duplicates — each its own
      family ⇒ the 6 rejected candidate pairs per group are TRUE
      NEGATIVES.
    * scenario F (``g % 6 == 5``, two url-token sub-pairs bridged by the
      auto-accept chain): truth is the url sub-family ⇒ the 4
      cross-sub-family pairs inside the single published cluster are
      FALSE POSITIVES (over-merge, priced by precision).
    * everything else: the whole group is one family ⇒ dropped members
      (scenario B's 40° outlier, scenario E's all-reject) cost recall.
    """
    g, i = page["g"], page["i"]
    if g % 6 == 2:
        return f"{g}:{i}"
    if g % 6 == 5:
        return f"{g}:{'a' if i < 2 else 'b'}"
    return str(g)


def eval_oracle_sql() -> str:
    """Pairwise precision/recall/F1 on labeled candidate pairs — the
    north-rule metric itself, independently re-derived: DuckDB rebuilds
    the candidate pair set (the ``pr`` blocking join), the published
    clusters (the full accepted-edge closure), the spec truth families,
    and the confusion matrix with the evaluator's exact GREATEST(…, 1)
    guards (operators/evaluation.py:31-63)."""
    return (
        _common_cte()
        + f"""
            , fam AS (
                SELECT url,
                       CASE WHEN g % 6 = 2
                            THEN g || ':' || ((ts - {BASE_TS}) / 60 - g * 4)
                            WHEN g % 6 = 5 THEN g || ':' ||
                                 (CASE WHEN ((ts - {BASE_TS}) / 60 - g * 4) < 2
                                       THEN 'a' ELSE 'b' END)
                            ELSE CAST(g AS VARCHAR) END AS family_id
                FROM pages),
            pubmem AS (
                SELECT mem.url, g.group_key FROM mem
                JOIN grp g USING (component)),
            scored AS (
                SELECT (fa.family_id = fb.family_id) AS is_match,
                       (pa.group_key IS NOT NULL AND pb.group_key IS NOT NULL
                        AND pa.group_key = pb.group_key) AS pred
                FROM pr c
                JOIN fam fa ON fa.url = c.url_a
                JOIN fam fb ON fb.url = c.url_b
                LEFT JOIN pubmem pa ON pa.url = c.url_a
                LEFT JOIN pubmem pb ON pb.url = c.url_b),
            cm AS (
                SELECT SUM(CASE WHEN is_match AND pred THEN 1 ELSE 0 END) AS tp,
                       SUM(CASE WHEN NOT is_match AND pred THEN 1 ELSE 0 END) AS fp,
                       SUM(CASE WHEN is_match AND NOT pred THEN 1 ELSE 0 END) AS fn,
                       SUM(CASE WHEN NOT is_match AND NOT pred THEN 1 ELSE 0 END) AS tn
                FROM scored)
            SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
                   CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
                   CAST(ROUND(tp * 1.0 / GREATEST(tp + fp, 1), 6) AS DOUBLE)
                       AS precision,
                   CAST(ROUND(tp * 1.0 / GREATEST(tp + fn, 1), 6) AS DOUBLE)
                       AS recall,
                   CAST(ROUND(2.0 * tp / GREATEST(2 * tp + fp + fn, 1), 6)
                        AS DOUBLE) AS f1
            FROM cm
        """
    )
