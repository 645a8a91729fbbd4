"""Adaptive search tuner (search_tuner.cpp core loop replica): EWMA
folding, warmup/cooldown gating, KG pressure/recovery adjustments,
similarity-threshold hysteresis, JSON round-trip."""

from __future__ import annotations

import pytest

from yams_spark.operators.search_tuner import (
    QueryTelemetry,
    SearchTuner,
    TunedParams,
)


def _kg_slow_useless(n=1):
    """Telemetry where KG eats latency and contributes nothing."""
    return [
        QueryTelemetry(latency_ms=100.0, kg_duration_ms=60.0,
                       kg_fusion_enabled=True, kg_contributed_to_final=False,
                       kg_final_score_mass=0.0, graph_enabled=True,
                       graph_skipped=True)
        for _ in range(n)
    ]


def _kg_healthy(n=1):
    return [
        QueryTelemetry(latency_ms=100.0, kg_duration_ms=5.0,
                       kg_fusion_enabled=True, kg_contributed_to_final=True,
                       kg_final_score_mass=0.8, kg_final_top_doc_count=4,
                       graph_enabled=True, graph_contributed=True)
        for _ in range(n)
    ]


def test_warmup_and_cooldown_gating() -> None:
    t = SearchTuner()
    # observations 1-3: both gates closed; 4: only warmup remains
    for tel in _kg_slow_useless(3):
        assert t.observe(tel) == "warming_up,cooldown_active"
    assert t.observe(_kg_slow_useless(1)[0]) == "warming_up"
    # 5th observation: warmed up, adjustment fires
    d = t.observe(_kg_slow_useless(1)[0])
    assert "kg_latency_pressure" in d and d.endswith("+changed")
    # cooldown holds for the next 3 observations
    for tel in _kg_slow_useless(3):
        assert t.observe(tel) == "cooldown_active"
    d = t.observe(_kg_slow_useless(1)[0])
    assert "kg_latency_pressure" in d


def test_latency_pressure_adjustments_hand_computed() -> None:
    t = SearchTuner(params=TunedParams(kg_max_results=100, graph_budget_ms=10,
                                       graph_rerank_top_n=30, rrf_k=12,
                                       kg_weight=0.04))
    for tel in _kg_slow_useless(5):
        t.observe(tel)
    p = t.params
    assert p.kg_max_results == 80      # 100*4//5
    assert p.graph_budget_ms == 8      # -2
    assert p.graph_rerank_top_n == 26  # -4
    assert p.rrf_k == 14               # +2
    # graph mostly skipping -> weight steps down
    assert p.kg_weight == pytest.approx(0.03)
    # floors hold under sustained pressure
    for _ in range(40):
        for tel in _kg_slow_useless(4):
            t.observe(tel)
    assert p.kg_max_results >= 12 and p.graph_budget_ms >= 3
    assert p.graph_rerank_top_n >= 10 and p.rrf_k <= 80
    assert p.kg_weight >= 0.02 - 1e-9


def test_utility_recovery_adjustments() -> None:
    t = SearchTuner()
    for tel in _kg_healthy(5):
        d = t.observe(tel)
    assert "kg_utility_recovery" in d
    p = t.params
    assert p.kg_max_results == 108 and p.graph_budget_ms == 11
    assert p.graph_rerank_top_n == 32 and p.rrf_k == 11
    assert p.kg_weight == pytest.approx(0.045)


def test_similarity_threshold_hysteresis() -> None:
    # empty vector pools lower the threshold (and clamp to max-sim/2)
    t = SearchTuner(has_knowledge_graph=False)
    empty = QueryTelemetry(latency_ms=10.0, vector_attempted=True,
                           vector_has_scores=False)
    for _ in range(5):
        d = t.observe(empty)
    assert "vector_empty_pool_streak" in d
    assert t.params.similarity_threshold == pytest.approx(0.35)
    assert t.vector_stage_empty_streak == 0  # streak reset on adjust

    # headroom raises: steady high max-sim well above threshold
    t2 = SearchTuner(has_knowledge_graph=False)
    rich = QueryTelemetry(latency_ms=10.0, vector_attempted=True,
                          vector_has_scores=True, vector_max_score=0.9)
    for _ in range(5):
        d = t2.observe(rich)
    assert "vector_sim_headroom" in d
    assert t2.params.similarity_threshold == pytest.approx(0.42)

    # pinned threshold never moves
    t3 = SearchTuner(has_knowledge_graph=False,
                     params=TunedParams(similarity_pinned=True))
    for _ in range(10):
        t3.observe(rich)
    assert t3.params.similarity_threshold == pytest.approx(0.40)


def test_ewma_seeding_and_json_roundtrip() -> None:
    t = SearchTuner()
    t.observe(QueryTelemetry(latency_ms=50.0))
    assert t.ewma_latency_ms == pytest.approx(50.0)  # first sample seeds
    t.observe(QueryTelemetry(latency_ms=100.0))
    assert t.ewma_latency_ms == pytest.approx(50.0 + 0.2 * 50.0)

    payload = t.to_json()
    u = SearchTuner.from_json(payload)
    assert u.observations == t.observations
    assert u.ewma_latency_ms == pytest.approx(t.ewma_latency_ms)
    assert vars(u.params) == vars(t.params)


def test_relevance_reward_loop(spark) -> None:
    """End-to-end labels channel: ranked results + qrels -> per-query
    nDCG rewards -> tuner EWMA and bandit arm stats."""
    from yams_spark.operators.relevance import relevance_rewards
    from yams_spark.operators.tuner import TunerMAB

    results = spark.createDataFrame(
        [("q1", 1, 1), ("q1", 2, 2), ("q2", 3, 1), ("q2", 1, 2)],
        "query_id string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", 1, 2), ("q2", 1, 1)], "query_id string, doc_id long, rel int"
    )
    rewards = {r["query_id"]: r["reward"] for r in
               relevance_rewards(results, qrels).collect()}
    assert rewards["q1"] == pytest.approx(1.0)       # relevant doc at rank 1
    assert 0.0 < rewards["q2"] < 1.0                  # at rank 2

    t = SearchTuner()
    t.observe_relevance(rewards.values(), timestamp="2026-08-17")
    assert t.relevance_sessions == 1 and t.relevance_queries == 2
    # first sample seeds, second folds at alpha 0.2 (dict order q1, q2)
    vals = list(rewards.values())
    want = vals[0] + 0.2 * (vals[1] - vals[0])
    assert t.ewma_relevance_reward == pytest.approx(want)
    # state survives the JSON round-trip
    u = SearchTuner.from_json(t.to_json())
    assert u.ewma_relevance_reward == pytest.approx(t.ewma_relevance_reward)
    # empty session is a no-op
    t.observe_relevance([])
    assert t.relevance_sessions == 1

    # the same rewards drive the bandit's labels channel
    m = TunerMAB()
    m.set_arms([("hybrid", 0.0), ("lexical", 0.0)])
    m.record_reward(0, rewards["q1"], source="labels")
    assert m.last_reward_source == "labels"
    assert m.best_arm_id() == "hybrid"


def test_has_converged() -> None:
    t = SearchTuner(has_knowledge_graph=False)
    assert not t.has_converged()
    for _ in range(9):
        t.observe(QueryTelemetry(latency_ms=5.0))
    # steady band, no adjustments -> converged once warm + cooled
    assert t.has_converged()


def _pressured(**kw):
    base = dict(latency_ms=10.0, adaptive_fusion_enabled=True,
                pre_fusion_unique_doc_count=100)
    base.update(kw)
    return QueryTelemetry(**base)


def test_fusion_lexical_pressure_guardrail() -> None:
    """drop 0.40 + anchored 0.20: tie-break on, floor topN 0->6, boost
    +0.04, vector-only penalty raised to 0.85."""
    t = SearchTuner(has_knowledge_graph=False)
    tel = _pressured(fusion_dropped_doc_count=40,
                     anchored_fusion_dropped_doc_count=20,
                     anchored_pre_fusion_doc_count=100)
    for _ in range(5):
        d = t.observe(tel)
    assert "fusion_lexical_pressure" in d
    p = t.params
    assert p.enable_lexical_tie_break
    assert p.lexical_tie_break_epsilon == pytest.approx(0.0025)
    assert p.lexical_floor_top_n == 6
    assert p.lexical_floor_boost == pytest.approx(0.04)
    assert p.vector_only_penalty == pytest.approx(0.85)
    # sustained pressure walks the floor up but respects caps
    for _ in range(60):
        t.observe(tel)
    assert p.lexical_floor_top_n <= 24
    assert p.lexical_floor_boost <= 0.35 + 1e-9
    assert p.lexical_tie_break_epsilon <= 0.015 + 1e-9


def test_vector_only_guardrail_and_pool_resize() -> None:
    """No lexical pressure but vector-only share 0.35 with 50% below
    threshold: vector-only threshold drops 0.05; rescue slots grow only
    when seeded > 0 and saturated; pool resize fires on the same signal
    (share>=0.30, drop>=0.20)."""
    t = SearchTuner(has_knowledge_graph=False)
    t.params.semantic_rescue_slots = 2
    t.params.semantic_rescue_min_vector_score = 0.60
    tel = _pressured(fusion_dropped_doc_count=20,
                     vector_only_doc_count=35,
                     vector_only_below_threshold_count=20,
                     semantic_rescue_final_count=9,
                     semantic_rescue_target=10,
                     post_fusion_doc_count=50)
    for _ in range(5):
        d = t.observe(tel)
    assert "vector_only_pressure" in d and "result_pool_resize" in d
    p = t.params
    assert p.vector_only_threshold == pytest.approx(0.85)
    assert p.semantic_rescue_slots == 3
    assert p.semantic_rescue_min_vector_score == pytest.approx(0.55)
    assert p.vector_max_results == 166 and p.text_max_results == 275


def test_reranker_widen() -> None:
    t = SearchTuner(has_knowledge_graph=False)
    tel = _pressured(fusion_dropped_doc_count=30,
                     anchored_fusion_dropped_doc_count=5,
                     post_fusion_doc_count=100)
    for _ in range(5):
        d = t.observe(tel)
    assert "reranker_widen" in d
    assert t.params.rerank_top_k == 7
    # cap at 30 under sustained pressure
    for _ in range(80):
        t.observe(tel)
    assert t.params.rerank_top_k <= 30
