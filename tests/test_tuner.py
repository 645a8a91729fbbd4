"""UCB1 tuner (tuner_mab.cpp replica + batch reward aggregation)."""

from __future__ import annotations

import math

import pytest

from yams_spark.operators.tuner import SQRT2, TunerMAB, mab_stats


def test_ucb1_selection_sequence() -> None:
    t = TunerMAB()
    assert t.select_arm() is None
    t.set_arms([("b", 1.0), ("a", 2.0)])
    # each arm sampled once before UCB1 (index order)
    assert t.select_arm() == 0
    t.record_reward(0, 0.2)
    assert t.select_arm() == 1
    t.record_reward(1, 0.9)
    # UCB: arm1 mean .9 beats arm0 mean .2 (equal exploration terms)
    assert t.select_arm() == 1
    t.record_reward(1, 0.0)
    # arm1 mean .45 n=2 vs arm0 mean .2 n=1: exploration lifts arm0
    # score0 = .2 + sqrt(2*ln3); score1 = .45 + sqrt(2)*sqrt(ln3/2)
    s0 = 0.2 + SQRT2 * math.sqrt(math.log(3.0) / 1.0)
    s1 = 0.45 + SQRT2 * math.sqrt(math.log(3.0) / 2.0)
    assert s0 > s1 and t.select_arm() == 0
    # reward clamping
    t.record_reward(0, 5.0)
    assert t.arms[0]["reward_sum"] == pytest.approx(1.2)  # 0.2 + clamp(5)=1
    # best arm by mean, deterministic id tie-break
    t2 = TunerMAB()
    t2.set_arms([("z", 0.0), ("a", 0.0)])
    t2.record_reward(0, 0.5)
    t2.record_reward(1, 0.5)
    assert t2.best_arm_id() == "a"


def test_json_roundtrip_and_arm_reshape() -> None:
    t = TunerMAB()
    t.set_arms([("a", 1.0), ("b", 2.0)])
    t.record_reward(0, 0.4)
    t.record_reward(1, 0.6)
    payload = t.to_json()

    # restore into a reshaped arm set: 'b' kept, 'a' gone, 'c' new
    u = TunerMAB()
    u.set_arms([("b", 2.0), ("c", 3.0)])
    assert u.from_json(payload)
    arms = {a["id"]: a for a in u.arms}
    assert arms["b"]["pulls"] == 1 and arms["b"]["reward_sum"] == pytest.approx(0.6)
    assert arms["c"]["pulls"] == 0
    assert u.total_pulls == 1  # only restored arms count
    # schema mismatch -> start fresh signal
    assert not u.from_json('{"schema_version": 99, "arms": []}')
    assert not u.from_json("not json")


def test_mab_stats_equals_sequential_fold(spark) -> None:
    events = [("a", 0.4), ("b", 0.9), ("a", 2.0), ("b", -1.0), ("a", 0.1)]
    t = TunerMAB()
    t.set_arms([("a", 0.0), ("b", 0.0)])
    idx = {"a": 0, "b": 1}
    for arm, r in events:
        t.record_reward(idx[arm], r)

    df = spark.createDataFrame(events, "arm_id string, reward double")
    rows = {r["arm_id"]: r for r in mab_stats(df).collect()}
    for a in t.arms:
        got = rows[a["id"]]
        assert got["pulls"] == a["pulls"]
        assert got["reward_sum"] == pytest.approx(a["reward_sum"])
        assert got["mean_reward"] == pytest.approx(a["reward_sum"] / a["pulls"])
        want_ucb = a["reward_sum"] / a["pulls"] + SQRT2 * math.sqrt(
            math.log(max(1.0, t.total_pulls)) / a["pulls"]
        )
        assert got["ucb_score"] == pytest.approx(want_ucb)
    assert rows[t.best_arm_id()]["is_best"]
    assert sum(1 for r in rows.values() if r["is_best"]) == 1
