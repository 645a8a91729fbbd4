"""Topology input extraction + the Phase V feature composer, and the
protected relation cover — the last uncovered topology-build surfaces.

Reference:

* ``src/topology/topology_input_extractor.cpp`` — turns the corpus into
  ``TopologyDocumentInput`` rows (doc hash, composed feature vector,
  capped semantic-neighbor list, metadata):

  - ``aggregateEmbedding`` (:397-430): a DOCUMENT-level vector record
    wins outright (first non-empty in record order); otherwise the mean
    of the chunk records whose dimension matches the FIRST non-empty
    record's dimension.
  - ``collectNeighborsForDocument`` (:432-506): bidirectional
    ``semantic_neighbor`` edges, outgoing max-weight dedup per
    destination, ``reciprocal`` = an incoming edge from that
    destination exists, score-desc / hash-asc order, capped at
    ``maxNeighborsPerDocument``. (The reference additionally bounds the
    edge FETCH at ``max(4*maxN, maxN)`` rows in store order —
    ``scan_cap``/``scan_order_col`` reproduce that bound when wanted.)
  - ``computeVarianceWeights`` (:114-165): per-dimension population
    variance over the first ≤4096 sample embeddings, top-``targetDim``
    dims by variance, weight = sqrt(var) in a dense full-dim vector
    (zeros elsewhere). The C++ ``partial_sort`` is unstable on exact
    variance ties; we break ties by dimension index ascending (stated
    divergence — fixtures keep variances distinct).
  - ``applyMatryoshkaCoarse`` (:167-187): keep the weighted dims in
    index order, scale by weight, L2-normalize.
  - ``bucketCountSketch`` (:192-203): MinHash signature → ``sig[i] %
    sketchDim`` bucket counts, L2-normalized; empty signature → empty.
  - ``buildEntityTypeIndex`` (:218-299): corpus top-K canonical
    (lowercased) entity types by document frequency — each type counts
    once per doc — after dropping the uninformative types
    date/time/number/percentage/ordinal (:92-96) and entities below
    ``entityMinConfidence``; ties break lexicographically (:287-291).
  - ``buildEntityTypeSignature`` (:302-341): per-doc confidence-weighted
    type histogram over the top-K axes (missing confidence contributes
    1.0), L2-normalized; no contributing entity → empty.
  - ``composeFeatureVector`` (:344-388): weighted concat
    ``[α_d·dense | α_e·entity_sig | α_m·minhash_sketch]`` with
    ``α_d = max(0, 1-α_e-α_m)``; every branch a no-op when disabled or
    empty, all-off reproduces the dense-only V0 baseline.
  - ``featureProjectionFingerprint`` / ``composedCoordinateSpaceIdentity``
    (:39-87): FNV-1a-64 identity of the composed coordinate space.

* ``src/topology/protected_relation_cover.cpp`` —
  ``protectedRelationConstructionIdentity`` (:13-63): the undirected
  max-score observation set (in-corpus, non-self, optionally
  reciprocal-only, ``score >= minEdgeScore``; TopologyBuildConfig
  defaults reciprocalOnly=true / minEdgeScore=0,
  topology_artifacts.h:78-83), serialized lhs-asc/rhs-asc into an
  FNV-1a-64 fingerprint; ``buildProtectedRelationCoverIndex`` (:65-121):
  fiber table keyed by cluster id with the six validation error cases.

Float discipline: the C++ runs float32 with double accumulators for the
L2 norms. Spark computes in double and casts to float at exactly the
points the C++ truncates (after each scaled multiply, after each
normalize division, after the mean division) — a single correctly
rounded operation matches float32 arithmetic bit-for-bit whenever the
inputs are float-representable, which the tests' numpy float32 twins
assert. Everything per-row is Catalyst higher-order functions; the only
driver-resident state is the full-dim weight vector (≤ embedding dim
floats) and the bounded observation gather behind ``max_observations``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from yams_spark.operators.topo_routing import _FNV_OFFSET, _FNV_PRIME, _MASK64

__all__ = [
    "FeatureComposition",
    "FILTERED_ENTITY_TYPES",
    "aggregate_doc_embeddings",
    "collect_topology_neighbors",
    "variance_weights",
    "matryoshka_coarse_col",
    "minhash_bucket_sketch_col",
    "entity_type_index",
    "entity_type_signatures",
    "compose_features",
    "l2_normalize_col",
    "feature_projection_fingerprint",
    "composed_space_identity",
    "protected_relation_observations",
    "protected_relation_identity",
    "build_protected_relation_cover",
]

#: topology_input_extractor.cpp:92-96 — types uninformative for topical
#: clustering (matched against the canonicalized kg_nodes.type).
FILTERED_ENTITY_TYPES = ("date", "time", "number", "percentage", "ordinal")


@dataclass(frozen=True)
class FeatureComposition:
    """topology_input_extractor.h FeatureComposition (defaults verbatim)."""

    enable_entity_fusion: bool = False
    entity_signature_k: int = 16
    entity_fusion_alpha: float = 0.25
    entity_min_confidence: float = 0.45
    enable_matryoshka: bool = False
    matryoshka_target_dim: int = 1024
    enable_minhash_sketch: bool = False
    minhash_sketch_dim: int = 16
    minhash_alpha: float = 0.10


def _f32(c: Column) -> Column:
    return c.cast("float")


def l2_normalize_col(v: Column) -> Column:
    """l2NormalizeInPlace (:98-110): double sum of squares, float norm,
    float division; sumSq <= 0 leaves the vector unchanged."""
    sumsq = F.aggregate(
        v, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
    )
    norm = _f32(F.sqrt(sumsq)).cast("double")
    return F.when(sumsq <= 0.0, v).otherwise(
        F.transform(v, lambda x: _f32(x.cast("double") / norm))
    )


def aggregate_doc_embeddings(
    vectors: DataFrame,
    doc_col: str = "doc_hash",
    level_col: str = "level",
    emb_col: str = "embedding",
    seq_col: str = "seq",
) -> DataFrame:
    """aggregateEmbedding (:397-430) over a vector-record table.

    Record order is ``seq_col`` (the store's retrieval order). The first
    non-empty DOCUMENT-level record wins; otherwise chunk records are
    averaged, where the first non-empty record fixes the dimension and
    mismatched records are skipped. Mean = sum/contributing — computed
    as a double average over position-exploded rows (one shuffle keyed
    by (doc, pos); map-side combined), cast to float at the division
    point like the C++.
    """
    nonempty = vectors.where(F.size(emb_col) > 0)
    doclvl = (
        nonempty.where(F.col(level_col) == "document")
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy(doc_col).orderBy(F.col(seq_col).asc())
            ),
        )
        .where(F.col("_rk") == 1)
        .select(doc_col, F.col(emb_col).alias("embedding"))
    )
    # Chunk aggregate for docs with no document-level record.
    rest = nonempty.join(doclvl.select(doc_col), on=doc_col, how="left_anti")
    ref_dim = rest.groupBy(doc_col).agg(
        F.min_by(F.size(emb_col), F.col(seq_col)).alias("_dim")
    )
    contrib = rest.join(ref_dim, on=doc_col).where(
        F.size(emb_col) == F.col("_dim")
    )
    pos = contrib.select(
        doc_col, F.posexplode(emb_col).alias("_pos", "_val")
    )
    means = (
        pos.groupBy(doc_col, "_pos")
        .agg(_f32(F.avg(F.col("_val").cast("double"))).alias("_mean"))
        .groupBy(doc_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_pos", "_mean"))
            ).alias("_pm")
        )
        .select(
            doc_col,
            F.transform(F.col("_pm"), lambda s: s["_mean"]).alias(
                "embedding"
            ),
        )
    )
    return doclvl.unionByName(means)


def collect_topology_neighbors(
    edges: DataFrame,
    nodes: DataFrame,
    max_neighbors: int = 32,
    scan_cap: int | None = None,
    scan_order_col: str = "edge_id",
) -> DataFrame:
    """collectNeighborsForDocument (:432-506) for every document at once.

    ``edges``: (src_node_id, dst_node_id, weight[, edge_id]) —
    semantic_neighbor rows. ``nodes``: (node_id, node_key). Only
    ``doc:``-prefixed destinations survive (:479-481). When ``scan_cap``
    is given, the per-node bidirectional fetch bound
    ``max(4*maxN, maxN)`` (:436-438) is reproduced by ranking touched
    edges per anchor node on ``scan_order_col`` (the store's scan order)
    before the dedup — omitted by default, where the whole edge set is
    the scan.
    """
    touched = edges.select(
        F.col("src_node_id"),
        F.col("dst_node_id"),
        F.col("weight"),
        *([F.col(scan_order_col)] if scan_cap is not None else []),
        F.explode(
            F.array_distinct(
                F.array(F.col("src_node_id"), F.col("dst_node_id"))
            )
        ).alias("anchor"),
    )
    if scan_cap is not None:
        w = Window.partitionBy("anchor").orderBy(F.col(scan_order_col).asc())
        touched = (
            touched.withColumn("_srk", F.row_number().over(w))
            .where(F.col("_srk") <= scan_cap)
            .drop("_srk", scan_order_col)
        )
    outgoing = (
        touched.where(F.col("anchor") == F.col("src_node_id"))
        .groupBy(F.col("anchor"), F.col("dst_node_id"))
        .agg(F.max("weight").alias("score"))
    )
    incoming = (
        touched.where(F.col("anchor") == F.col("dst_node_id"))
        .select("anchor", F.col("src_node_id").alias("in_id"))
        .distinct()
    )
    doc_nodes = nodes.where(F.col("node_key").startswith("doc:")).select(
        F.col("node_id"),
        F.expr("substring(node_key, 5)").alias("n_doc_hash"),
    )
    scored = (
        outgoing.join(
            doc_nodes, outgoing["dst_node_id"] == doc_nodes["node_id"]
        )
        .join(
            incoming.withColumnRenamed("anchor", "a2"),
            (F.col("anchor") == F.col("a2"))
            & (F.col("dst_node_id") == F.col("in_id")),
            "left",
        )
        .select(
            F.col("anchor").alias("src_node_id"),
            F.col("n_doc_hash").alias("neighbor_doc_hash"),
            "score",
            F.col("in_id").isNotNull().alias("reciprocal"),
        )
    )
    w = Window.partitionBy("src_node_id").orderBy(
        F.col("score").desc(), F.col("neighbor_doc_hash").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= max_neighbors)
        .withColumnRenamed("_rk", "neighbor_rank")
    )


def variance_weights(
    embeddings: DataFrame,
    emb_col: str = "embedding",
    target_dim: int = 0,
    sample_cap: int = 4096,
    order_col: str = "doc_hash",
) -> list[float]:
    """computeVarianceWeights (:114-165): dense full-dim weight vector,
    sqrt(population variance) on the top-``target_dim`` variance dims,
    zeros elsewhere; empty when disabled or target >= full dim.

    Sample = first ``sample_cap`` non-empty embeddings by ``order_col``
    (the C++ takes the first 4096 in document order, :596-606); the
    full dimension is the first sample row's (:119). Returns a plain
    Python list — it is by construction at most one embedding's worth
    of floats, the one piece of driver-resident state the composer
    needs (the C++ holds the same vector in memory).
    """
    if target_dim <= 0:
        return []
    sample = (
        embeddings.where(F.size(emb_col) > 0)
        .orderBy(F.col(order_col).asc())
        .limit(sample_cap)
    )
    first = sample.select(F.size(emb_col).alias("d")).head(1)
    if not first:
        return []
    full_dim = first[0]["d"]
    if target_dim >= full_dim:
        return []
    stats = (
        sample.where(F.size(emb_col) == full_dim)
        .select(F.posexplode(emb_col).alias("pos", "val"))
        .groupBy("pos")
        .agg(
            F.avg(F.col("val").cast("double")).alias("mean"),
            F.avg(
                F.col("val").cast("double") * F.col("val").cast("double")
            ).alias("meansq"),
        )
        .select("pos", (F.col("meansq") - F.col("mean") * F.col("mean")).alias("var"))
        .collect()
    )
    if not stats:
        return []
    var = {r["pos"]: max(r["var"], 0.0) for r in stats}
    ranked = sorted(var.items(), key=lambda kv: (-kv[1], kv[0]))
    weights = [0.0] * full_dim
    import math

    import numpy as np

    for pos, v in ranked[:target_dim]:
        weights[pos] = float(np.float32(math.sqrt(v)))
    return weights


def matryoshka_coarse_col(
    emb: Column, weights: list[float], target_dim: int
) -> Column:
    """applyMatryoshkaCoarse (:167-187): keep the positive-weight dims in
    index order, scale, L2-normalize; shape mismatches return the dense
    vector unchanged."""
    if not weights or target_dim <= 0 or target_dim >= len(weights):
        return emb
    wlit = F.array(*[F.lit(float(w)).cast("double") for w in weights])
    scaled = F.zip_with(
        emb, wlit, lambda x, w: F.struct(
            _f32(x.cast("double") * w).alias("v"), (w > 0.0).alias("keep")
        )
    )
    coarse = F.transform(
        F.filter(scaled, lambda s: s["keep"]), lambda s: s["v"]
    )
    return F.when(
        F.size(emb) == len(weights), l2_normalize_col(coarse)
    ).otherwise(emb)


def minhash_bucket_sketch_col(sig: Column, sketch_dim: int) -> Column:
    """bucketCountSketch (:192-203): sig[i] % dim bucket counts over a
    uint32 MinHash signature, L2-normalized; empty sig → empty array."""
    if sketch_dim <= 0:
        return F.array().cast("array<float>")
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(sketch_dim - 1)),
        lambda b: _f32(
            F.size(F.filter(sig, lambda s: s % sketch_dim == b.cast("bigint")))
        ),
    )
    return F.when(
        F.size(sig) == 0, F.array().cast("array<float>")
    ).otherwise(l2_normalize_col(counts))


def entity_type_index(
    doc_entities: DataFrame,
    kg_nodes: DataFrame,
    k: int,
    min_confidence: float = 0.45,
) -> DataFrame:
    """buildEntityTypeIndex (:218-299): corpus top-K canonical entity
    types by document frequency (once per doc), low-confidence and
    filtered types dropped, count-desc / type-asc, 0-based axis index.

    ``doc_entities``: (doc_id, node_id, confidence). ``kg_nodes``:
    (node_id, type). Returns (entity_type, axis_idx, n_docs).
    """
    typed = kg_nodes.select(
        "node_id", F.lower(F.col("type")).alias("entity_type")
    ).where(
        F.col("entity_type").isNotNull()
        & (F.col("entity_type") != "")
        & ~F.col("entity_type").isin(*FILTERED_ENTITY_TYPES)
    )
    kept = doc_entities.where(
        F.col("node_id").isNotNull()
        & (
            F.col("confidence").isNull()
            | (F.col("confidence") >= F.lit(min_confidence))
        )
    )
    counts = (
        kept.join(typed, on="node_id")
        .select("doc_id", "entity_type")
        .distinct()
        .groupBy("entity_type")
        .agg(F.count("*").alias("n_docs"))
    )
    from yams_spark.operators.search import global_rank

    ranked = global_rank(
        counts,
        [F.col("n_docs").desc(), F.col("entity_type").asc()],
        "_rk",
    )
    return (
        ranked.where(F.col("_rk") <= k)
        .select(
            "entity_type", (F.col("_rk") - 1).alias("axis_idx"), "n_docs"
        )
    )


def entity_type_signatures(
    doc_entities: DataFrame,
    kg_nodes: DataFrame,
    index: DataFrame,
    min_confidence: float = 0.45,
    k: int | None = None,
) -> DataFrame:
    """buildEntityTypeSignature (:302-341) for every document at once:
    confidence-weighted axis histogram (missing confidence = 1.0),
    L2-normalized; docs with no contributing entity get NO row (the C++
    returns the empty vector)."""
    axes = index.select("entity_type", "axis_idx")
    n_axes = k if k is not None else axes.count()
    typed = kg_nodes.select(
        "node_id", F.lower(F.col("type")).alias("entity_type")
    )
    kept = doc_entities.where(
        F.col("node_id").isNotNull()
        & (
            F.col("confidence").isNull()
            | (F.col("confidence") >= F.lit(min_confidence))
        )
    )
    buckets = (
        kept.join(typed, on="node_id")
        .join(axes, on="entity_type")
        .groupBy("doc_id", "axis_idx")
        .agg(
            F.sum(
                F.coalesce(F.col("confidence").cast("double"), F.lit(1.0))
            ).alias("mass")
        )
    )
    dense = (
        buckets.groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("axis_idx", "mass"))
            ).alias("m")
        )
        .select(
            "doc_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_axes - 1)),
                lambda i: _f32(
                    F.coalesce(
                        F.element_at(F.col("m"), i.cast("int")), F.lit(0.0)
                    )
                ),
            ).alias("raw_sig"),
        )
    )
    return dense.select(
        "doc_id", l2_normalize_col(F.col("raw_sig")).alias("entity_sig")
    )


def compose_features(
    df: DataFrame,
    cfg: FeatureComposition,
    emb_col: str = "embedding",
    entity_col: str | None = "entity_sig",
    sketch_col: str | None = "minhash_sketch",
    weights: list[float] | None = None,
    out_col: str = "composed",
) -> DataFrame:
    """composeFeatureVector (:344-388): the weighted concat. NULL/empty
    branch columns are no-ops, exactly like the C++ empty vectors; an
    empty dense embedding short-circuits (:349-351)."""
    import numpy as np

    dense: Column = F.col(emb_col)
    if (
        cfg.enable_matryoshka
        and weights
        and cfg.matryoshka_target_dim > 0
        and cfg.matryoshka_target_dim < len(weights)
    ):
        # Per-row gate (:353-354): rows whose dense dim the target does
        # not undercut fall back to the plain L2-normalize branch.
        dense = F.when(
            F.lit(cfg.matryoshka_target_dim) < F.size(dense),
            matryoshka_coarse_col(dense, weights, cfg.matryoshka_target_dim),
        ).otherwise(l2_normalize_col(dense))
    else:
        dense = l2_normalize_col(dense)

    ent = (
        F.coalesce(F.col(entity_col), F.array().cast("array<float>"))
        if entity_col is not None and cfg.enable_entity_fusion
        else F.array().cast("array<float>")
    )
    mh = (
        F.coalesce(F.col(sketch_col), F.array().cast("array<float>"))
        if sketch_col is not None and cfg.enable_minhash_sketch
        else F.array().cast("array<float>")
    )
    entity_on = F.size(ent) > 0
    minhash_on = F.size(mh) > 0
    a_e32 = np.float32(cfg.entity_fusion_alpha)
    a_m32 = np.float32(cfg.minhash_alpha)
    alpha_e = F.when(entity_on, F.lit(float(a_e32))).otherwise(F.lit(0.0))
    alpha_m = F.when(minhash_on, F.lit(float(a_m32))).otherwise(F.lit(0.0))
    # alphaD = max(0, 1 - αE - αM) in float32 (:368-370).
    alpha_d = _f32(
        F.greatest(F.lit(0.0), _f32(F.lit(1.0) - alpha_e - alpha_m))
    ).cast("double")
    composed = F.concat(
        F.transform(dense, lambda x: _f32(x.cast("double") * alpha_d)),
        F.transform(ent, lambda x: _f32(x.cast("double") * alpha_e)),
        F.transform(mh, lambda x: _f32(x.cast("double") * alpha_m)),
    )
    out = (
        F.when(F.size(F.col(emb_col)) == 0, F.col(emb_col).cast("array<float>"))
        .when(~entity_on & ~minhash_on, dense)
        .otherwise(composed)
    )
    return df.withColumn(out_col, out)


# ---------------------------------------------------------------------------
# Coordinate-space / protected-relation identities (FNV-1a-64)
# ---------------------------------------------------------------------------


def _fmt_f32(v: float) -> str:
    """ostringstream << float under setprecision(max_digits10=9) —
    %.9g over the float32 value (:43,76)."""
    import numpy as np

    return f"{float(np.float32(v)):.9g}"


def _fnv_hex(descriptor: str) -> str:
    """Raw-byte FNV-1a-64 fold (appendFingerprintBytes, :27-32) — unlike
    the routing session's length-prefixed field folds."""
    h = _FNV_OFFSET
    for b in descriptor.encode("utf-8"):
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return f"{h:016x}"


def feature_projection_fingerprint(
    cfg: FeatureComposition,
    matryoshka_weights: list[float],
    entity_axes: list[str],
) -> str:
    """featureProjectionFingerprint (:39-65), byte-faithful descriptor."""
    parts = [
        "schema=v1",
        f";entity={int(cfg.enable_entity_fusion)}",
        f";entity_k={cfg.entity_signature_k}",
        f";entity_alpha={_fmt_f32(cfg.entity_fusion_alpha)}",
        f";entity_min_confidence={_fmt_f32(cfg.entity_min_confidence)}",
        f";matryoshka={int(cfg.enable_matryoshka)}",
        f";matryoshka_dim={cfg.matryoshka_target_dim}",
        f";minhash={int(cfg.enable_minhash_sketch)}",
        f";minhash_dim={cfg.minhash_sketch_dim}",
        f";minhash_alpha={_fmt_f32(cfg.minhash_alpha)}",
    ]
    parts.extend(f";w={_fmt_f32(w)}" for w in matryoshka_weights)
    parts.extend(f";entity_axis={len(a)}:{a}" for a in entity_axes)
    return _fnv_hex("".join(parts))


def composed_space_identity(
    raw_identity: str,
    cfg: FeatureComposition,
    raw_dim: int,
    composed_dim: int,
    matryoshka_weights: list[float],
    entity_axes: list[str],
) -> str:
    """composedCoordinateSpaceIdentity (:67-87): raw identity passes
    through untouched when empty or when no branch is enabled."""
    has_composition = (
        cfg.enable_entity_fusion
        or cfg.enable_matryoshka
        or cfg.enable_minhash_sketch
    )
    if not raw_identity or not has_composition:
        return raw_identity
    fp = feature_projection_fingerprint(cfg, matryoshka_weights, entity_axes)
    return (
        f"topology-coordinate:v1;raw={raw_identity};raw_dim={raw_dim}"
        f";composed_dim={composed_dim}"
        f";entity={int(cfg.enable_entity_fusion)}"
        f";entity_k={cfg.entity_signature_k}"
        f";entity_alpha={_fmt_f32(cfg.entity_fusion_alpha)}"
        f";entity_min_confidence={_fmt_f32(cfg.entity_min_confidence)}"
        f";matryoshka={int(cfg.enable_matryoshka)}"
        f";matryoshka_dim={cfg.matryoshka_target_dim}"
        f";minhash={int(cfg.enable_minhash_sketch)}"
        f";minhash_dim={cfg.minhash_sketch_dim}"
        f";minhash_alpha={_fmt_f32(cfg.minhash_alpha)}"
        f";projection=fnv1a64:{fp}"
    )


def protected_relation_observations(
    neighbors: DataFrame,
    doc_col: str = "doc_hash",
    neighbor_col: str = "neighbor_doc_hash",
    score_col: str = "score",
    reciprocal_col: str = "reciprocal",
    reciprocal_only: bool = True,
    min_edge_score: float = 0.0,
) -> DataFrame:
    """protectedRelationConstructionIdentity's observation set
    (protected_relation_cover.cpp:22-40): gate (non-empty, non-self,
    neighbor present as a document row, reciprocal when configured,
    score >= minEdgeScore as float), fold to undirected max-score pairs
    (lhs < rhs). One semi-join + one keyed max — fully distributed."""
    import numpy as np

    corpus = neighbors.select(F.col(doc_col).alias("_h")).distinct()
    gated = neighbors.where(
        (F.col(doc_col) != "")
        & (F.col(neighbor_col) != "")
        & (F.col(doc_col) != F.col(neighbor_col))
        & (
            F.col(score_col)
            >= F.lit(float(np.float32(min_edge_score))).cast("float")
        )
    )
    if reciprocal_only:
        gated = gated.where(F.col(reciprocal_col))
    gated = gated.join(
        corpus, gated[neighbor_col] == corpus["_h"], "left_semi"
    )
    return (
        gated.select(
            F.least(F.col(doc_col), F.col(neighbor_col)).alias("lhs"),
            F.greatest(F.col(doc_col), F.col(neighbor_col)).alias("rhs"),
            F.col(score_col).alias("score"),
        )
        .groupBy("lhs", "rhs")
        .agg(F.max("score").alias("score"))
    )


def protected_relation_identity(
    observations: DataFrame, max_observations: int = 1_000_000
) -> str:
    """protectedRelationConstructionIdentity (:42-62): the lhs-asc /
    rhs-asc descriptor stream through FNV-1a-64. The byte stream is
    inherently sequential, so the (already deduped) observation table is
    gathered behind an explicit gate — the reference computes this
    identity per build region, never over an unbounded corpus."""
    rows = (
        observations.orderBy(F.col("lhs").asc(), F.col("rhs").asc())
        .limit(max_observations + 1)
        .collect()
    )
    if len(rows) > max_observations:
        raise ValueError(
            "protected_relation_identity: observation set exceeds the "
            f"{max_observations}-row gather gate; fingerprint a bounded "
            "build region instead"
        )
    parts = [
        "relation=semantic_neighbor;provenance=topology_input;version=1;"
        "split=construction"
    ]
    for r in rows:
        parts.append(
            f";lhs={len(r['lhs'])}:{r['lhs']}"
            f";rhs={len(r['rhs'])}:{r['rhs']}"
            f";score={_fmt_f32(r['score'])}"
        )
    return (
        "semantic_neighbor:v1:construction:fnv1a64:"
        + _fnv_hex("".join(parts))
    )


def build_protected_relation_cover(
    clusters: DataFrame,
    memberships: DataFrame,
    cluster_col: str = "cluster_id",
    members_col: str = "member_doc_hashes",
    member_doc_col: str = "doc_hash",
) -> dict[str, DataFrame]:
    """buildProtectedRelationCoverIndex (:65-121): fibers ordered by
    cluster id with sorted member lists, the doc→fiber index, and the
    six validation errors raised as one bounded aggregation pass.

    ``clusters``: (cluster_id, member_doc_hashes array). ``memberships``:
    rows whose ``doc_hash`` must appear in some fiber.
    """
    checks = clusters.agg(
        F.sum((F.col(cluster_col) == "").cast("int")).alias("empty_ids"),
        (F.count("*") - F.countDistinct(cluster_col)).alias("dup_ids"),
        F.sum((F.size(members_col) == 0).cast("int")).alias("empty_fibers"),
        F.sum(
            (
                F.size(members_col)
                > F.size(F.array_distinct(F.col(members_col)))
            ).cast("int")
        ).alias("dup_members"),
        F.sum(
            (F.size(F.array_remove(F.col(members_col), "")) <
             F.size(F.col(members_col))).cast("int")
        ).alias("empty_members"),
    ).head()
    if checks["empty_ids"]:
        raise ValueError("protected relation fiber has no id")
    if checks["dup_ids"]:
        raise ValueError("protected relation cover has duplicate fiber id")
    if checks["dup_members"]:
        raise ValueError(
            "protected relation fiber has duplicate document membership"
        )
    if checks["empty_fibers"]:
        raise ValueError("protected relation fiber is empty")
    if checks["empty_members"]:
        raise ValueError("protected relation fiber has an empty document")

    from yams_spark.operators.search import global_rank

    fibers = global_rank(
        clusters.select(
            F.col(cluster_col).alias("fiber_id"),
            F.array_sort(F.col(members_col)).alias("doc_hashes"),
        ),
        [F.col("fiber_id").asc()],
        "_rk",
    ).select(
        "fiber_id", "doc_hashes", (F.col("_rk") - 1).alias("fiber_index")
    )
    by_doc = fibers.select(
        F.explode("doc_hashes").alias("doc_hash"), "fiber_index", "fiber_id"
    )
    orphans = (
        memberships.select(F.col(member_doc_col).alias("doc_hash"))
        .where(F.col("doc_hash") != "")
        .join(by_doc.select("doc_hash"), on="doc_hash", how="left_anti")
        .limit(1)
        .count()
    )
    empties = memberships.where(F.col(member_doc_col) == "").limit(1).count()
    if orphans or empties:
        raise ValueError(
            "protected relation membership is absent from the cover"
        )
    return {"fibers": fibers, "fibers_by_doc": by_doc}
