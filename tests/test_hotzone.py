"""Hotzone decay operator tests (reference semantics
hotzone_manager.cpp:18-61) — pure-math goldens, batch twin, and the
stateful-streaming path with cross-batch state."""

from __future__ import annotations

import math
import os
from datetime import datetime, timedelta, timezone

import pytest

from yams_spark.streaming import hotzone as hz

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def test_decay_factor() -> None:
    assert hz.decay_factor(0.0) == 1.0
    assert hz.decay_factor(24.0, 24.0) == pytest.approx(0.5)
    assert hz.decay_factor(48.0, 24.0) == pytest.approx(0.25)
    assert hz.decay_factor(1.0, 0.0) == 0.0  # immediate decay


def test_boost_saturation() -> None:
    assert hz.boost_from_score(0.0) == 1.0
    # score=1 maps near max influence (hotzone_manager.cpp:55-56)
    assert hz.boost_from_score(1.0) == pytest.approx(2.0)
    assert hz.boost_from_score(100.0, max_boost=2.0) == 2.0
    b = hz.boost_from_score(0.5)
    assert 1.0 < b < 2.0


def test_fold_events_reference_recurrence() -> None:
    events = [(T0, 1.0), (T0 + timedelta(hours=24), 3.0)]
    score, last = hz.fold_events(events)
    assert score == pytest.approx(1.0 * 0.5 + 3.0)
    assert last == T0 + timedelta(hours=24)
    # non-positive weights ignored (record() guard)
    score2, _ = hz.fold_events([(T0, 1.0), (T0 + timedelta(hours=1), 0.0)])
    assert score2 == pytest.approx(1.0)
    # minute truncation like duration_cast<minutes>
    score3, _ = hz.fold_events([(T0, 1.0), (T0 + timedelta(seconds=90), 1.0)])
    assert score3 == pytest.approx(1.0 * hz.decay_factor(1 / 60.0) + 1.0)


def test_hotzone_batch(spark) -> None:
    rows = [
        ("a", T0.replace(tzinfo=None), 1.0),
        ("a", (T0 + timedelta(hours=24)).replace(tzinfo=None), 3.0),
        ("b", T0.replace(tzinfo=None), 2.0),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, weight double")
    got = {r["key"]: r for r in hz.hotzone_batch(df).collect()}
    assert got["a"]["score"] == pytest.approx(3.5)
    assert got["b"]["score"] == pytest.approx(2.0)
    assert got["a"]["boost"] == pytest.approx(hz.boost_from_score(3.5))


def test_hotzone_stateful_across_batches(spark, tmp_path) -> None:
    """Two micro-batches through applyInPandasWithState: state carries the
    decayed score between batches."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    b1 = spark.createDataFrame(
        [("a", T0.replace(tzinfo=None), 1.0)], "key string, ts timestamp, weight double"
    )
    b1.coalesce(1).write.mode("append").parquet(in_dir)
    b2 = spark.createDataFrame(
        [("a", (T0 + timedelta(hours=24)).replace(tzinfo=None), 3.0)],
        "key string, ts timestamp, weight double",
    )
    b2.coalesce(1).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema("key string, ts timestamp, weight double").option(
        "maxFilesPerTrigger", "1"
    ).parquet(in_dir)
    out = hz.hotzone_stateful(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("hotzone_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select * from hotzone_out order by last_ts"
    ).collect()
    assert len(rows) >= 1
    final = rows[-1]
    assert final["key"] == "a"
    # folding depends on file->batch assignment; final score is either the
    # cross-batch fold (1*0.5+3=3.5) or, if both files landed in one batch,
    # the same value — the recurrence is order-deterministic
    assert final["score"] == pytest.approx(3.5)


def test_fold_events_out_of_order_never_amplifies() -> None:
    """A late event older than the stored last_ts must only add weight —
    never inflate via 0.5^(negative) > 1 inverse decay (the reference decays
    against wall-clock now, which can't run backwards)."""
    late = T0 - timedelta(hours=48)
    score, last = hz.fold_events([(late, 1.0)], initial_score=2.0, initial_ts=T0)
    assert score == pytest.approx(3.0)  # decay factor clamped to 1.0, not 4.0
    assert last == T0  # state timestamp never moves backwards
