"""Relevance label store: the user-labeled tuning channel's persistence.

Replica of the reference's interactive-tuner session store
(``reference src/search/relevance_label_store.cpp``;
``include/yams/search/relevance_label_store.h``): a session holds one
labeled query list (per-rank relevant / not_relevant / unknown verdicts,
``relevanceLabelFromString`` accepts y/yes/n/no aliases — .h:38-46), a
per-query reward = position-discounted precision
``Σ rel_i / log2(i+2)`` normalized by the K-perfect maximum (.h:55-57),
and session metadata (timestamp, config hash, corpus/topology epochs,
source, k). Sessions append as JSON lines; reads skip malformed lines
with a warning (.cpp:118-145), ``read_recent`` keeps the newest
``limit``, ``read_by_config_hash`` filters then tail-limits
(.cpp:149-193).

Sessions feed ``SearchTuner.observe_relevance`` (the Labels channel) and
``TunerMAB.record_reward(..., 'labels')``. The JSONL file is deliberate
fidelity — it is session-scale (one line per tuning run); corpus-scale
relevance data lives in the qrels DataFrames that
``relevance.relevance_rewards`` consumes.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field

LABEL_UNKNOWN = "unknown"
LABEL_RELEVANT = "relevant"
LABEL_NOT_RELEVANT = "not_relevant"


def label_from_string(s: str) -> str:
    if s in ("relevant", "y", "yes"):
        return LABEL_RELEVANT
    if s in ("not_relevant", "n", "no"):
        return LABEL_NOT_RELEVANT
    return LABEL_UNKNOWN


def reward_from_labels(labels: list[str], k: int = 10) -> float:
    """Position-discounted precision (relevance_label_store.h:55-57):
    ``Σ_i rel_i / log2(i+2)`` over the labeled ranks, normalized by the
    all-relevant maximum for K. Unknown labels contribute 0."""
    if k <= 0:
        return 0.0
    num = sum(
        1.0 / math.log2(i + 2)
        for i, l in enumerate(labels[:k])
        if l == LABEL_RELEVANT
    )
    denom = sum(1.0 / math.log2(i + 2) for i in range(k))
    return num / denom if denom > 0 else 0.0


@dataclass
class LabeledQuery:
    query_text: str = ""
    ranked_doc_hashes: list[str] = field(default_factory=list)
    labels: list[str] = field(default_factory=list)
    reward: float = 0.0

    @classmethod
    def from_labels(cls, query_text, ranked_doc_hashes, labels, k=10):
        norm = [label_from_string(l) for l in labels]
        return cls(query_text, list(ranked_doc_hashes), norm,
                   reward_from_labels(norm, k))


@dataclass
class RelevanceSession:
    timestamp: str = ""
    config_hash: str = ""
    source: str = "interactive"
    k: int = 10
    corpus_epoch: int | None = None
    topology_epoch: int | None = None
    queries: list[LabeledQuery] = field(default_factory=list)

    def mean_reward(self) -> float:
        if not self.queries:
            return 0.0
        return sum(q.reward for q in self.queries) / len(self.queries)

    def to_json(self) -> dict:
        j = {
            "timestamp": self.timestamp,
            "config_hash": self.config_hash,
            "source": self.source,
            "k": self.k,
            "mean_reward": self.mean_reward(),
            "queries": [
                {
                    "query_text": q.query_text,
                    "ranked_doc_hashes": q.ranked_doc_hashes,
                    "labels": q.labels,
                    "reward": q.reward,
                }
                for q in self.queries
            ],
        }
        if self.corpus_epoch is not None:
            j["corpus_epoch"] = self.corpus_epoch
        if self.topology_epoch is not None:
            j["topology_epoch"] = self.topology_epoch
        return j

    @classmethod
    def from_json(cls, j: dict) -> "RelevanceSession":
        s = cls(
            timestamp=j.get("timestamp", ""),
            config_hash=j.get("config_hash", ""),
            source=j.get("source", "interactive"),
            k=int(j.get("k", 10)),
            corpus_epoch=j.get("corpus_epoch"),
            topology_epoch=j.get("topology_epoch"),
        )
        for qj in j.get("queries", []):
            s.queries.append(
                LabeledQuery(
                    query_text=qj.get("query_text", ""),
                    ranked_doc_hashes=[
                        h for h in qj.get("ranked_doc_hashes", [])
                        if isinstance(h, str)
                    ],
                    labels=[
                        label_from_string(l) for l in qj.get("labels", [])
                        if isinstance(l, str)
                    ],
                    reward=float(qj.get("reward", 0.0)),
                )
            )
        return s


class RelevanceLabelStore:
    """Append-only JSONL session store (relevance_label_store.cpp:91-203)."""

    def __init__(self, path: str):
        self.path = path

    def append(self, session: RelevanceSession) -> None:
        parent = os.path.dirname(self.path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(session.to_json()) + "\n")

    def _load_lines(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        out = []
        with open(self.path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    out.append(json.loads(line))
                except ValueError:
                    continue  # malformed line skipped (.cpp:136-141)
        return out

    def read_recent(self, limit: int = 20) -> list[RelevanceSession]:
        lines = self._load_lines()
        return [RelevanceSession.from_json(j) for j in lines[-limit:]]

    def read_by_config_hash(self, config_hash: str, limit: int = 20) -> list[RelevanceSession]:
        sessions = [
            RelevanceSession.from_json(j)
            for j in self._load_lines()
            if j.get("config_hash") == config_hash
        ]
        return sessions[-limit:] if len(sessions) > limit else sessions

    def clear(self) -> None:
        if os.path.exists(self.path):
            os.remove(self.path)
