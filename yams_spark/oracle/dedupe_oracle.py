"""Pure-Python reference oracle for the ER pipeline.

Literal re-implementation of the reference semantic-dedupe trace
(``/root/reference/src/cli/commands/doctor/repairs/dedupe.cpp:113-350``)
with the ANN candidate generator replaced by exact within-block pair
enumeration (all pairs sharing ≥1 blocking key — the FIXTURES.md contract):

* pair features: cosine on embeddings (double accumulation,
  vector_database.cpp:1786-1810), title/path token Jaccard
  (dedupe.cpp:93-111) over normalizeTextForTokens output (:60-81)
* score = 0.8·cosine + 0.15·titleOverlap + 0.05·pathOverlap (:197)
* gates: cosine ≥ threshold AND (titleOverlap>0 OR pathOverlap>0 OR
  cosine ≥ 0.975) (:199-204)
* path-compressed union-find transitive closure (:135-155)
* groups of ≥2, canonical by strategy sort (keep-newest default,
  :223-240; ties broken by url asc — our deterministic refinement of the
  C++ unstable sort)
* group_key = "semantic:<strategy>:<threshold 3dp>:<sorted member doc
  hashes ,-joined>" (:279-287), algorithm_version "semantic-dedupe-v1"
  (:291), max_pair_score (:269-277), member pair metrics only for direct
  canonical pairs (:324-337)

Blocking keys and the embedding function are shared with the Spark
pipeline via ``yams_spark.operators.signatures.compute_signature_row``.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

from yams_spark.functions.chunker import PAGE_CHUNKING, ChunkingConfig
from yams_spark.functions.similarity import cosine_similarity
from yams_spark.functions.textnorm import jaccard_overlap
from yams_spark.operators.signatures import (
    DEFAULT_BLOCKING_FAMILIES as DEFAULT_FAMILIES,
    blocking_keys_from_signature,
    compute_signature_row,
)

ALGORITHM_VERSION = "semantic-dedupe-v1"


def blocking_keys(
    sig: dict, families: tuple[str, ...] = DEFAULT_FAMILIES
) -> list[tuple[str, str]]:
    """(family, key) list for one signature row — delegates to the shared
    blocking contract in operators/signatures.py (the same spec the Spark
    ``blocks_stage`` is built from)."""
    return blocking_keys_from_signature(sig, families)


@dataclass
class OracleResult:
    signatures: list[dict]
    accepted_pairs: list[dict]
    candidate_pairs: set[tuple[str, str]]
    clusters: list[dict] = field(default_factory=list)
    members: list[dict] = field(default_factory=list)
    labels: dict[str, str] = field(default_factory=dict)  # url -> cluster root


class UnionFind:
    """Path-compressed union-find, dedupe.cpp:135-155 (parent[rhs]=lhs)."""

    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        self.parent.setdefault(x, x)
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != x:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, lhs: str, rhs: str) -> None:
        lr, rr = self.find(lhs), self.find(rhs)
        if lr != rr:
            self.parent[rr] = lr


def score_pair(a: dict, b: dict, threshold: float) -> dict:
    cosine = cosine_similarity(a["embedding"], b["embedding"])
    title_overlap = jaccard_overlap(a["title_norm"], b["title_norm"])
    path_overlap = jaccard_overlap(a["url_norm"], b["url_norm"])
    score = cosine * 0.8 + title_overlap * 0.15 + path_overlap * 0.05
    accepted = not (
        cosine < threshold
        or (title_overlap == 0.0 and path_overlap == 0.0 and cosine < 0.975)
    )
    return {
        "url_a": a["url"],
        "url_b": b["url"],
        "cosine": cosine,
        "title_overlap": title_overlap,
        "path_overlap": path_overlap,
        "pair_score": score,
        "accepted": accepted,
    }


def run_oracle(
    pages: list[dict],
    threshold: float = 0.92,
    strategy: str = "keep-newest",
    chunk_cfg: ChunkingConfig = PAGE_CHUNKING,
) -> OracleResult:
    """pages rows: dicts with url, warc_ts, html (bytes), text, lang."""
    sigs = []
    for p in pages:
        sig = compute_signature_row(p["url"], p["html"], p.get("text"), chunk_cfg)
        sig["warc_ts"] = p["warc_ts"]
        sigs.append(sig)
    by_url = {s["url"]: s for s in sigs}

    # blocking: all pairs sharing >=1 key
    block_members: dict[str, list[str]] = defaultdict(list)
    for s in sigs:
        for _family, key in blocking_keys(s):
            block_members[key].append(s["url"])
    candidate_pairs: set[tuple[str, str]] = set()
    for urls in block_members.values():
        su = sorted(set(urls))
        for i in range(len(su)):
            for j in range(i + 1, len(su)):
                candidate_pairs.add((su[i], su[j]))

    uf = UnionFind()
    for s in sigs:
        uf.find(s["url"])
    accepted: list[dict] = []
    for ua, ub in sorted(candidate_pairs):
        p = score_pair(by_url[ua], by_url[ub], threshold)
        if p["accepted"]:
            accepted.append(p)
            uf.union(ua, ub)

    # groups (>=2), canonical by strategy
    comp: dict[str, list[str]] = defaultdict(list)
    for s in sigs:
        comp[uf.find(s["url"])].append(s["url"])
    labels = {u: r for r, urls in comp.items() for u in urls}

    result = OracleResult(
        signatures=sigs,
        accepted_pairs=accepted,
        candidate_pairs=candidate_pairs,
        labels=labels,
    )

    pair_index = {(p["url_a"], p["url_b"]): p for p in accepted}

    for root, urls in comp.items():
        if len(urls) < 2:
            continue
        rows = [by_url[u] for u in urls]
        rows.sort(key=lambda r: r["url"])  # stable tie-break: url asc
        if strategy == "keep-oldest":
            rows.sort(key=lambda r: r["warc_ts"])
        elif strategy == "keep-largest":
            rows.sort(key=lambda r: r["size"], reverse=True)
        else:  # keep-newest (dedupe.h:15 default)
            rows.sort(key=lambda r: r["warc_ts"], reverse=True)
        canonical = rows[0]

        member_urls = {r["url"] for r in rows}
        group_scores = [
            p["pair_score"]
            for (a, b), p in pair_index.items()
            if a in member_urls and b in member_urls
        ]
        max_pair_score = max(group_scores) if group_scores else 0.0
        hashes = sorted(r["doc_hash"] for r in rows)
        group_key = f"semantic:{strategy}:{threshold:.3f}:" + ",".join(hashes)

        result.clusters.append(
            {
                "group_key": group_key,
                "algorithm_version": ALGORITHM_VERSION,
                "canonical_url": canonical["url"],
                "member_count": len(rows),
                "max_pair_score": max_pair_score,
                "threshold": threshold,
            }
        )
        for r in rows:
            is_canon = r["url"] == canonical["url"]
            member = {
                "group_key": group_key,
                "url": r["url"],
                "role": "canonical" if is_canon else "duplicate",
                "similarity_to_canonical": None,
                "title_overlap": None,
                "path_overlap": None,
                "pair_score": None,
            }
            if not is_canon:
                key = (
                    (canonical["url"], r["url"])
                    if canonical["url"] < r["url"]
                    else (r["url"], canonical["url"])
                )
                direct = pair_index.get(key)
                if direct is not None:
                    member["similarity_to_canonical"] = direct["cosine"]
                    member["title_overlap"] = direct["title_overlap"]
                    member["path_overlap"] = direct["path_overlap"]
                    member["pair_score"] = direct["pair_score"]
            result.members.append(member)

    return result
