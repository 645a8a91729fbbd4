"""Adaptive search tuner: the runtime controller that retunes fusion
parameters from per-query telemetry.

Replica of the reference's core adaptive loop
(``reference src/search/search_tuner.cpp``): per query the tuner updates
EWMAs (α = 0.20, first observation seeds the average — :119-124,
:774-858) of KG latency share, KG utility (0.55·score-mass +
0.30·contribution + 0.15·final-doc-share, clamped — :806-808), graph-
rerank skip/contribution rates, and vector max-similarity with an
empty-pool streak; after a 5-observation warmup and a 4-observation
cooldown (:64-65,:864-877) it applies bounded adjustments:

* **KG latency pressure** (latency share > 0.33 and utility < 0.18,
  :921-960): shrink kgMaxResults ×4/5 (floor 12), graph budget −2 ms
  (floor 3), rerank topN −4 (floor 10), rrfK +2 (cap 80); when the
  graph reranker is also mostly skipping (skip > 0.70, contribution
  < 0.25) the kg weight steps −0.01 (floor 0.02).
* **KG utility recovery** (utility > 0.26, latency share < 0.22,
  :962-989): kgMaxResults +8 (cap 160), budget +1 (cap 25), topN +2
  (cap 60), rrfK −1 (floor 8), kg weight +0.005 (cap 0.22).
* **Similarity-threshold hysteresis** (:993-1029): after ≥5 vector
  observations, a streak of ≥5 empty vector pools lowers the threshold
  by 0.05 (and to ≤ observed-max-sim/2 when known), clamped to
  [0.05, 0.70], resetting the streak; a zero streak with EWMA max-sim
  more than 0.20 above the threshold raises it by 0.02.

The fusion-guardrail sub-controllers are modeled too (gated on the
``adaptiveFusionEnabled`` telemetry flag, :882-891): lexical drop
pressure (drop ≥ 0.35 with anchored ≥ 0.18 or top-text ≥ 0.12) enables
the lexical tie-break and grows the floor topN/boost (:513-571);
otherwise vector-only pressure (share ≥ 0.25, below-threshold ≥ 0.40)
lowers the vector-only threshold and grows rescue slots (:400-445);
result-pool resize (vector-dominant ≥ 0.30 + drop ≥ 0.20 → vectorMax
+16/≤500, textMax −25/≥50, :452-484) and reranker widen (drop ≥ 0.25 +
rerank-drop ≥ 0.10 → topK +2/≤30, :488-511). Simplification, stated
once: the overlay-stats short-circuits and corpus-profile dead-source
gates are not modeled; state persists through JSON like the MAB
(``operators/tuner``).

This is driver-side session state like the reference daemon's — batch
jobs feed it observed telemetry (e.g. stage timings from the lineage
metrics table) and read back the tuned rrfK / weights for the next
query wave.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

EWMA_ALPHA = 0.20
WARMUP_OBSERVATIONS = 5
COOLDOWN_OBSERVATIONS = 4
VECTOR_EMPTY_STREAK_THRESHOLD = 5
MIN_KG_WEIGHT = 0.02
MAX_KG_WEIGHT = 0.22
MIN_KG_MAX_RESULTS = 12
MAX_KG_MAX_RESULTS = 160
MIN_GRAPH_BUDGET_MS = 3
MAX_GRAPH_BUDGET_MS = 25
MIN_GRAPH_RERANK_TOP_N = 10
MAX_GRAPH_RERANK_TOP_N = 60
MIN_RRF_K = 8
MAX_RRF_K = 80
MIN_SIMILARITY_THRESHOLD = 0.05
MAX_SIMILARITY_THRESHOLD = 0.70
SIM_LOWER_STEP = 0.05
SIM_RAISE_STEP = 0.02
SIM_RAISE_MARGIN = 0.20
#: fusion-guardrail thresholds/steps (search_tuner.cpp:93-113,446-455)
FUSION_DROP_PRESSURE = 0.35
ANCHORED_DROP_PRESSURE = 0.18
TOP_TEXT_DROP_PRESSURE = 0.12
MAX_LEXICAL_FLOOR_TOP_N = 24
MAX_LEXICAL_FLOOR_BOOST = 0.35
LEXICAL_FLOOR_BOOST_STEP = 0.04
MAX_TIE_BREAK_EPSILON = 0.015
TIE_BREAK_EPSILON_STEP = 0.0025
MIN_VECTOR_ONLY_PENALTY = 0.85
VECTOR_ONLY_PRESSURE_SHARE = 0.25
VECTOR_ONLY_PRESSURE_DROP = 0.40
SEMANTIC_RESCUE_SATURATION = 0.80
VECTOR_ONLY_THRESHOLD_LOWER_STEP = 0.05
MIN_VECTOR_ONLY_THRESHOLD = 0.65
MAX_SEMANTIC_RESCUE_SLOTS = 12
SEMANTIC_RESCUE_MIN_SCORE_LOWER_STEP = 0.05
MIN_SEMANTIC_RESCUE_MIN_SCORE = 0.45
MAX_VECTOR_MAX_RESULTS = 500
VECTOR_MAX_RESULTS_STEP = 16
MIN_TEXT_MAX_RESULTS = 50
TEXT_MAX_RESULTS_STEP = 25
MAX_RERANK_TOP_K = 30
RERANK_TOP_K_STEP = 2


@dataclass
class QueryTelemetry:
    """One query's runtime signals (RuntimeTelemetry subset)."""

    latency_ms: float = 0.0
    kg_duration_ms: float = 0.0
    vector_attempted: bool = False
    vector_has_scores: bool = False
    vector_max_score: float = 0.0
    graph_enabled: bool = False
    graph_skipped: bool = False
    graph_contributed: bool = False
    kg_fusion_enabled: bool = False
    kg_contributed_to_final: bool = False
    kg_final_score_mass: float = 0.0
    kg_final_top_doc_count: int = 0
    top_window: int = 10
    # fusion-guardrail counters (RuntimeTelemetry drop/pool signals)
    adaptive_fusion_enabled: bool = False
    fusion_dropped_doc_count: int = 0
    pre_fusion_unique_doc_count: int = 0
    anchored_fusion_dropped_doc_count: int = 0
    anchored_pre_fusion_doc_count: int = 0
    top_text_fusion_dropped_doc_count: int = 0
    top_text_pre_fusion_doc_count: int = 0
    post_fusion_doc_count: int = 0
    vector_only_doc_count: int = 0
    vector_only_below_threshold_count: int = 0
    semantic_rescue_final_count: int = 0
    semantic_rescue_target: int = 0


@dataclass
class TunedParams:
    kg_max_results: int = 100  # search_engine_config.h:371
    graph_budget_ms: int = 10
    graph_rerank_top_n: int = 30
    rrf_k: int = 12  # search_engine_config.h:283
    kg_weight: float = 0.04  # search_engine_config.h:82
    similarity_threshold: float = 0.40
    similarity_pinned: bool = False
    # guardrail-tuned params (defaults: search_engine_config.h:85-86,
    # :300-305, :369-384)
    enable_lexical_tie_break: bool = False
    lexical_tie_break_epsilon: float = 0.0
    lexical_floor_top_n: int = 0
    lexical_floor_boost: float = 0.0
    vector_only_penalty: float = 0.8
    vector_only_threshold: float = 0.90
    semantic_rescue_slots: int = 0
    semantic_rescue_min_vector_score: float = 0.0
    text_max_results: int = 300
    vector_max_results: int = 150
    rerank_top_k: int = 5


def _ewma(current: float, sample: float, observations: int) -> float:
    if observations <= 1:
        return sample
    return current + EWMA_ALPHA * (sample - current)


def _share(part: float, total: float) -> float:
    return 0.0 if total <= 1e-9 else min(max(part / total, 0.0), 1.0)


@dataclass
class SearchTuner:
    params: TunedParams = field(default_factory=TunedParams)
    has_knowledge_graph: bool = True

    observations: int = 0
    last_adjustment_observation: int = 0
    vector_stage_observations: int = 0
    vector_stage_empty_streak: int = 0
    ewma_latency_ms: float = 0.0
    ewma_kg_latency_share: float = 0.0
    ewma_kg_utility: float = 0.0
    ewma_graph_skip_rate: float = 0.0
    ewma_graph_contribution_rate: float = 0.0
    ewma_vector_max_similarity: float = 0.0
    relevance_queries: int = 0
    relevance_sessions: int = 0
    ewma_relevance_reward: float = 0.0
    last_relevance_timestamp: str | None = None
    last_decision: str = ""

    def observe(self, t: QueryTelemetry) -> str:
        """Fold one query's telemetry in, maybe adjust; returns the
        decision string (reason list, '+changed' suffix on change)."""
        self.observations += 1
        if t.vector_attempted:
            self.vector_stage_observations += 1
            if t.vector_has_scores:
                self.ewma_vector_max_similarity = _ewma(
                    self.ewma_vector_max_similarity, t.vector_max_score,
                    self.vector_stage_observations,
                )
                self.vector_stage_empty_streak = 0
            else:
                self.vector_stage_empty_streak += 1

        latency = max(0.0, t.latency_ms)
        kg_share = _share(max(0.0, t.kg_duration_ms), latency)
        kg_contrib = (
            1.0 if (t.kg_fusion_enabled and t.kg_contributed_to_final) else 0.0
        )
        kg_mass = min(max(t.kg_final_score_mass, 0.0), 1.0) if t.kg_fusion_enabled else 0.0
        kg_doc_share = (
            _share(float(t.kg_final_top_doc_count), float(max(t.top_window, 1)))
            if t.kg_fusion_enabled
            else 0.0
        )
        kg_utility = min(max(0.55 * kg_mass + 0.30 * kg_contrib + 0.15 * kg_doc_share, 0.0), 1.0)
        graph_skip = 1.0 if (t.graph_enabled and t.graph_skipped) else 0.0
        graph_contrib = 1.0 if (t.graph_enabled and t.graph_contributed) else 0.0

        n = self.observations
        self.ewma_latency_ms = _ewma(self.ewma_latency_ms, latency, n)
        self.ewma_kg_latency_share = _ewma(self.ewma_kg_latency_share, kg_share, n)
        self.ewma_kg_utility = _ewma(self.ewma_kg_utility, kg_utility, n)
        self.ewma_graph_skip_rate = _ewma(self.ewma_graph_skip_rate, graph_skip, n)
        self.ewma_graph_contribution_rate = _ewma(
            self.ewma_graph_contribution_rate, graph_contrib, n
        )
        return self._adjust(t)

    def _fusion_guardrails(self, t: QueryTelemetry, reasons: list[str]) -> bool:
        """applyFusionGuardrailAdjustments (search_tuner.cpp:513-571):
        lexical drop pressure turns on tie-break + grows the lexical
        floor; otherwise the vector-only guardrail (:400-445) may lower
        the vector-only threshold / grow rescue slots."""
        p = self.params
        drop = _share(t.fusion_dropped_doc_count, max(t.pre_fusion_unique_doc_count, 1))
        anchored = _share(t.anchored_fusion_dropped_doc_count, t.anchored_pre_fusion_doc_count)
        top_text = _share(t.top_text_fusion_dropped_doc_count, t.top_text_pre_fusion_doc_count)
        lexical_pressure = drop >= FUSION_DROP_PRESSURE and (
            anchored >= ANCHORED_DROP_PRESSURE or top_text >= TOP_TEXT_DROP_PRESSURE
        )
        if not lexical_pressure:
            return self._vector_only_guardrails(t, reasons)
        changed = False
        if not p.enable_lexical_tie_break:
            p.enable_lexical_tie_break = True
            changed = True
        nxt = min(MAX_TIE_BREAK_EPSILON,
                  max(p.lexical_tie_break_epsilon, TIE_BREAK_EPSILON_STEP))
        if nxt > p.lexical_tie_break_epsilon + 1e-6:
            p.lexical_tie_break_epsilon = nxt
            changed = True
        desired = (min(6, MAX_LEXICAL_FLOOR_TOP_N) if p.lexical_floor_top_n == 0
                   else min(MAX_LEXICAL_FLOOR_TOP_N, p.lexical_floor_top_n + 2))
        if desired > p.lexical_floor_top_n:
            p.lexical_floor_top_n = desired
            changed = True
        nxt = min(MAX_LEXICAL_FLOOR_BOOST,
                  max(p.lexical_floor_boost + LEXICAL_FLOOR_BOOST_STEP,
                      LEXICAL_FLOOR_BOOST_STEP))
        if nxt > p.lexical_floor_boost + 1e-6:
            p.lexical_floor_boost = nxt
            changed = True
        if p.vector_only_penalty < MIN_VECTOR_ONLY_PENALTY:
            p.vector_only_penalty = MIN_VECTOR_ONLY_PENALTY
            changed = True
        if changed:
            reasons.append("fusion_lexical_pressure")
        return changed

    def _vector_only_guardrails(self, t: QueryTelemetry, reasons: list[str]) -> bool:
        p = self.params
        vo_drop = _share(t.vector_only_below_threshold_count, t.vector_only_doc_count)
        vo_share = _share(t.vector_only_doc_count, t.pre_fusion_unique_doc_count)
        if not (vo_share >= VECTOR_ONLY_PRESSURE_SHARE and vo_drop >= VECTOR_ONLY_PRESSURE_DROP):
            return False
        changed = False
        nxt = max(MIN_VECTOR_ONLY_THRESHOLD,
                  p.vector_only_threshold - VECTOR_ONLY_THRESHOLD_LOWER_STEP)
        if nxt + 1e-5 < p.vector_only_threshold:
            p.vector_only_threshold = nxt
            changed = True
        rescue_rate = _share(t.semantic_rescue_final_count, t.semantic_rescue_target)
        if (p.semantic_rescue_slots > 0
                and rescue_rate >= SEMANTIC_RESCUE_SATURATION
                and p.semantic_rescue_slots < MAX_SEMANTIC_RESCUE_SLOTS):
            p.semantic_rescue_slots += 1
            changed = True
        nxt = max(MIN_SEMANTIC_RESCUE_MIN_SCORE,
                  p.semantic_rescue_min_vector_score - SEMANTIC_RESCUE_MIN_SCORE_LOWER_STEP)
        if nxt + 1e-6 < p.semantic_rescue_min_vector_score:
            p.semantic_rescue_min_vector_score = nxt
            changed = True
        if changed:
            reasons.append("vector_only_pressure")
        return changed

    def _pool_and_reranker(self, t: QueryTelemetry, reasons: list[str]) -> bool:
        """applyResultPoolAdjustments (:452-484) + applyRerankerAdjustments
        (:488-511)."""
        p = self.params
        changed = False
        drop = _share(t.fusion_dropped_doc_count, max(t.pre_fusion_unique_doc_count, 1))
        vo_share = _share(t.vector_only_doc_count, t.pre_fusion_unique_doc_count)
        if vo_share >= 0.30 and drop >= 0.20:
            nxt = min(MAX_VECTOR_MAX_RESULTS, p.vector_max_results + VECTOR_MAX_RESULTS_STEP)
            if nxt > p.vector_max_results:
                p.vector_max_results = nxt
                changed = True
            if p.text_max_results > MIN_TEXT_MAX_RESULTS + TEXT_MAX_RESULTS_STEP:
                p.text_max_results = max(
                    MIN_TEXT_MAX_RESULTS, p.text_max_results - TEXT_MAX_RESULTS_STEP
                )
                changed = True
            if changed:
                reasons.append("result_pool_resize")
        rerank_drop = _share(
            max(0, t.fusion_dropped_doc_count - t.anchored_fusion_dropped_doc_count),
            max(t.post_fusion_doc_count, 1),
        )
        if drop >= 0.25 and rerank_drop >= 0.10:
            nxt = min(MAX_RERANK_TOP_K, p.rerank_top_k + RERANK_TOP_K_STEP)
            if nxt > p.rerank_top_k:
                p.rerank_top_k = nxt
                changed = True
                reasons.append("reranker_widen")
        return changed

    def _adjust(self, t: QueryTelemetry | None = None) -> str:
        warmed = self.observations >= WARMUP_OBSERVATIONS
        cooled = (
            self.observations
            >= self.last_adjustment_observation + COOLDOWN_OBSERVATIONS
        )
        if not warmed or not cooled:
            reasons = ([] if warmed else ["warming_up"]) + (
                [] if cooled else ["cooldown_active"]
            )
            self.last_decision = ",".join(reasons)
            return self.last_decision

        p = self.params
        changed = False
        reasons: list[str] = []

        # fusion-guardrail / pool / reranker families run first, gated on
        # adaptiveFusionEnabled telemetry (:882-891)
        if t is not None and t.adaptive_fusion_enabled:
            changed = self._fusion_guardrails(t, reasons) or changed
            changed = self._pool_and_reranker(t, reasons) or changed

        if not self.has_knowledge_graph:
            reasons.append("steady_no_kg")
        else:
            latency_pressure = (
                self.ewma_kg_latency_share > 0.33 and self.ewma_kg_utility < 0.18
            )
            healthy_utility = (
                self.ewma_kg_utility > 0.26 and self.ewma_kg_latency_share < 0.22
            )
            graph_mostly_skipping = (
                self.ewma_graph_skip_rate > 0.70
                and self.ewma_graph_contribution_rate < 0.25
            )
            if latency_pressure:
                nxt = max(MIN_KG_MAX_RESULTS, p.kg_max_results * 4 // 5)
                changed |= nxt != p.kg_max_results
                p.kg_max_results = nxt
                nxt = max(MIN_GRAPH_BUDGET_MS, p.graph_budget_ms - 2)
                changed |= nxt != p.graph_budget_ms
                p.graph_budget_ms = nxt
                nxt = max(
                    MIN_GRAPH_RERANK_TOP_N,
                    p.graph_rerank_top_n - 4 if p.graph_rerank_top_n > 4 else p.graph_rerank_top_n,
                )
                changed |= nxt != p.graph_rerank_top_n
                p.graph_rerank_top_n = nxt
                nxt = min(MAX_RRF_K, p.rrf_k + 2)
                changed |= nxt != p.rrf_k
                p.rrf_k = nxt
                if graph_mostly_skipping:
                    w = max(MIN_KG_WEIGHT, p.kg_weight - 0.01)
                    changed |= abs(w - p.kg_weight) > 1e-6
                    p.kg_weight = w
                    reasons.append("graph_skip_pressure")
                reasons.insert(0, "kg_latency_pressure")
            elif healthy_utility:
                nxt = min(MAX_KG_MAX_RESULTS, p.kg_max_results + 8)
                changed |= nxt != p.kg_max_results
                p.kg_max_results = nxt
                nxt = min(MAX_GRAPH_BUDGET_MS, p.graph_budget_ms + 1)
                changed |= nxt != p.graph_budget_ms
                p.graph_budget_ms = nxt
                nxt = min(MAX_GRAPH_RERANK_TOP_N, p.graph_rerank_top_n + 2)
                changed |= nxt != p.graph_rerank_top_n
                p.graph_rerank_top_n = nxt
                nxt = max(MIN_RRF_K, p.rrf_k - 1)
                changed |= nxt != p.rrf_k
                p.rrf_k = nxt
                w = min(MAX_KG_WEIGHT, p.kg_weight + 0.005)
                changed |= abs(w - p.kg_weight) > 1e-6
                p.kg_weight = w
                reasons.append("kg_utility_recovery")
            else:
                reasons.append("steady_band")

        if not p.similarity_pinned and self.vector_stage_observations >= WARMUP_OBSERVATIONS:
            cur = p.similarity_threshold
            observed = self.ewma_vector_max_similarity
            if self.vector_stage_empty_streak >= VECTOR_EMPTY_STREAK_THRESHOLD:
                nxt = cur - SIM_LOWER_STEP
                if observed > 0.0:
                    nxt = min(nxt, observed * 0.5)
                nxt = min(max(nxt, MIN_SIMILARITY_THRESHOLD), MAX_SIMILARITY_THRESHOLD)
                if nxt + 1e-5 < cur:
                    p.similarity_threshold = nxt
                    changed = True
                    reasons.append("vector_empty_pool_streak")
                    self.vector_stage_empty_streak = 0
            elif self.vector_stage_empty_streak == 0 and observed > cur + SIM_RAISE_MARGIN:
                nxt = min(
                    max(cur + SIM_RAISE_STEP, MIN_SIMILARITY_THRESHOLD),
                    MAX_SIMILARITY_THRESHOLD,
                )
                if nxt > cur + 1e-5:
                    p.similarity_threshold = nxt
                    changed = True
                    reasons.append("vector_sim_headroom")

        if changed:
            self.last_adjustment_observation = self.observations
        self.last_decision = ",".join(reasons) + ("+changed" if changed else "")
        return self.last_decision

    def observe_relevance(self, rewards, timestamp: str | None = None) -> None:
        """Fold a labeled relevance session in
        (observeRelevanceFeedback, search_tuner.cpp:707-741): each
        per-query reward clamps to [0,1] and updates its own EWMA keyed
        by the relevance-query counter (comparable cadence to the
        telemetry channel; a fresh tuner seeds on the first sample)."""
        rewards = list(rewards)
        if not rewards:
            return
        for r in rewards:
            self.relevance_queries += 1
            self.ewma_relevance_reward = _ewma(
                self.ewma_relevance_reward, min(max(float(r), 0.0), 1.0),
                self.relevance_queries,
            )
        self.relevance_sessions += 1
        self.last_relevance_timestamp = timestamp

    def has_converged(self, min_observations: int = WARMUP_OBSERVATIONS) -> bool:
        """True once warmed and a full cooldown has passed with no
        adjustment (search_tuner.cpp:743-750)."""
        if self.observations < min_observations:
            return False
        return (
            self.observations - self.last_adjustment_observation
            >= COOLDOWN_OBSERVATIONS
        )

    def to_json(self) -> str:
        return json.dumps(
            {
                "observations": self.observations,
                "last_adjustment_observation": self.last_adjustment_observation,
                "vector_stage_observations": self.vector_stage_observations,
                "vector_stage_empty_streak": self.vector_stage_empty_streak,
                "ewma_latency_ms": self.ewma_latency_ms,
                "ewma_kg_latency_share": self.ewma_kg_latency_share,
                "ewma_kg_utility": self.ewma_kg_utility,
                "ewma_graph_skip_rate": self.ewma_graph_skip_rate,
                "ewma_graph_contribution_rate": self.ewma_graph_contribution_rate,
                "ewma_vector_max_similarity": self.ewma_vector_max_similarity,
                "relevance_queries": self.relevance_queries,
                "relevance_sessions": self.relevance_sessions,
                "ewma_relevance_reward": self.ewma_relevance_reward,
                "params": vars(self.params),
            }
        )

    @classmethod
    def from_json(cls, payload: str, has_knowledge_graph: bool = True) -> "SearchTuner":
        j = json.loads(payload)
        t = cls(
            params=TunedParams(**j.get("params", {})),
            has_knowledge_graph=has_knowledge_graph,
        )
        for k in (
            "observations", "last_adjustment_observation",
            "vector_stage_observations", "vector_stage_empty_streak",
            "ewma_latency_ms", "ewma_kg_latency_share", "ewma_kg_utility",
            "ewma_graph_skip_rate", "ewma_graph_contribution_rate",
            "ewma_vector_max_similarity", "relevance_queries",
            "relevance_sessions", "ewma_relevance_reward",
        ):
            setattr(t, k, j.get(k, getattr(t, k)))
        return t
