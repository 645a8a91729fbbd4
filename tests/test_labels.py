"""Relevance label store (relevance_label_store.cpp replica): reward
math, JSONL persistence with malformed-line skip, filters, tuner feed."""

from __future__ import annotations

import math

import pytest

from yams_spark.operators.labels import (
    LabeledQuery,
    RelevanceLabelStore,
    RelevanceSession,
    label_from_string,
    reward_from_labels,
)


def test_label_aliases() -> None:
    assert label_from_string("y") == "relevant"
    assert label_from_string("yes") == "relevant"
    assert label_from_string("n") == "not_relevant"
    assert label_from_string("no") == "not_relevant"
    assert label_from_string("whatever") == "unknown"


def test_reward_hand_computed() -> None:
    # relevant at ranks 0 and 2 of k=3:
    # (1/log2(2) + 1/log2(4)) / (1/log2(2) + 1/log2(3) + 1/log2(4))
    num = 1.0 + 1.0 / 2.0
    denom = 1.0 + 1.0 / math.log2(3) + 0.5
    got = reward_from_labels(["relevant", "not_relevant", "relevant"], k=3)
    assert got == pytest.approx(num / denom)
    # all relevant -> 1.0; none/unknown -> 0.0
    assert reward_from_labels(["relevant"] * 5, k=5) == pytest.approx(1.0)
    assert reward_from_labels(["unknown"] * 5, k=5) == 0.0
    assert reward_from_labels([], k=0) == 0.0
    # labels beyond k are ignored
    assert reward_from_labels(["not_relevant", "relevant"], k=1) == 0.0


def test_session_store_roundtrip(tmp_path) -> None:
    store = RelevanceLabelStore(str(tmp_path / "sub" / "labels.jsonl"))
    for i in range(3):
        q = LabeledQuery.from_labels(f"query {i}", ["h1", "h2"], ["y", "n"], k=2)
        store.append(RelevanceSession(
            timestamp=f"2026-08-1{i}T00:00:00Z", config_hash=f"cfg{i % 2}",
            k=2, corpus_epoch=i, queries=[q],
        ))
    got = store.read_recent(limit=2)
    assert [s.timestamp for s in got] == [
        "2026-08-11T00:00:00Z", "2026-08-12T00:00:00Z",
    ]
    s = got[0]
    assert s.queries[0].labels == ["relevant", "not_relevant"]
    assert s.queries[0].reward == pytest.approx(
        1.0 / (1.0 + 1.0 / math.log2(3))
    )
    assert s.mean_reward() == pytest.approx(s.queries[0].reward)
    assert s.corpus_epoch == 1

    by_cfg = store.read_by_config_hash("cfg0")
    assert [x.timestamp[9] for x in by_cfg] == ["0", "2"]

    # malformed line is skipped, the rest still parse
    with open(store.path, "a") as f:
        f.write("{not json\n")
    assert len(store.read_recent(limit=10)) == 3

    store.clear()
    assert store.read_recent() == []
    store.clear()  # idempotent


def test_session_feeds_tuner() -> None:
    from yams_spark.operators.search_tuner import SearchTuner

    qs = [LabeledQuery.from_labels("q", ["h"], ls, k=1)
          for ls in (["y"], ["n"])]
    session = RelevanceSession(timestamp="t", queries=qs)
    t = SearchTuner()
    t.observe_relevance([q.reward for q in session.queries],
                        timestamp=session.timestamp)
    assert t.relevance_queries == 2
    # seeds on 1.0, folds 0.0 at alpha .2
    assert t.ewma_relevance_reward == pytest.approx(0.8)
