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

Simplifications, stated once: the fusion-guardrail / result-pool /
reranker sub-controllers (:884-890, three more rule families over drop-
pressure EWMAs) and the overlay-stats short-circuits are not modeled;
state persists through JSON like the MAB (``operators/tuner``).

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


@dataclass
class TunedParams:
    kg_max_results: int = 100  # search_engine_config.h:371
    graph_budget_ms: int = 10
    graph_rerank_top_n: int = 30
    rrf_k: int = 12  # search_engine_config.h:283
    kg_weight: float = 0.04  # search_engine_config.h:82
    similarity_threshold: float = 0.40
    similarity_pinned: bool = False


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
        return self._adjust()

    def _adjust(self) -> str:
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
