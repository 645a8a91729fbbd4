"""Transitive clustering: distributed connected components + canonical
selection + group publication.

The reference closes accepted pairs with an in-memory union-find
(dedupe.cpp:135-155) and, in the topology engine, BFS components
(topology_baseline.cpp:266-333). At 10^12 documents that becomes the
iterative **large-star / small-star** algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond") over self-joined edge DataFrames:
each iteration is two shuffles, converges in O(log n) rounds, and the
lineage is truncated every round with ``localCheckpoint`` so plans don't
blow up. Node ids are urls; the component label is the lexicographic min
url, which makes results deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ALGORITHM_VERSION = "semantic-dedupe-v1"  # dedupe.cpp:291


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every neighbor v > u to min(N(u) ∪ {u})."""
    bidir = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    mins = bidir.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.withColumn("mn", F.least(F.col("mn"), F.col("u")))
    return (
        bidir.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("mn").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect all neighbors v ≤ u (and u) to the min."""
    directed = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("mn"))
    relinked = (
        directed.join(mins, "u")
        .select(F.col("v").alias("src"), F.col("mn").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    self_edges = mins.select(F.col("u").alias("src"), F.col("mn").alias("dst"))
    return relinked.unionAll(self_edges).distinct()


def connected_components(
    edges: DataFrame, src: str = "url_a", dst: str = "url_b", max_iter: int = 50
) -> DataFrame:
    """edges -> (url, component) where component = min url in the component.

    Includes only nodes that appear in at least one edge (singletons are
    handled by the caller via a left join).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col("src") != F.col("dst")
    ).distinct()
    e = e.localCheckpoint(eager=True)

    prev_sig = None
    for _ in range(max_iter):
        e = _large_star(e)
        e = _small_star(e)
        e = e.localCheckpoint(eager=True)
        sig_row = e.agg(
            F.count("*").alias("cnt"),
            F.coalesce(F.expr("bit_xor(xxhash64(src, dst))"), F.lit(0)).alias("chk"),
        ).collect()[0]
        sig = (sig_row["cnt"], sig_row["chk"])
        if sig == prev_sig:
            break
        prev_sig = sig

    # converged star edges: src node -> dst root; roots label themselves
    labels = e.select(F.col("src").alias("url"), F.col("dst").alias("component"))
    roots = e.select(F.col("dst").alias("url")).distinct().withColumn(
        "component", F.col("url")
    )
    return labels.unionByName(roots).groupBy("url").agg(
        F.min("component").alias("component")
    )


def clusters_stage(
    signatures: DataFrame,
    accepted_pairs: DataFrame,
    threshold: float = 0.92,
    strategy: str = "keep-newest",
) -> tuple[DataFrame, DataFrame]:
    """Publish (clusters, members) mirroring semantic_duplicate_groups /
    _members (migration.cpp:2598-2663; trace dedupe.cpp:217-350)."""
    labels = connected_components(accepted_pairs)

    sig_slim = signatures.select("url", "warc_ts", "size", "doc_hash")
    labeled = sig_slim.join(labels, "url", "inner")  # only linked nodes form groups

    sizes = labeled.groupBy("component").agg(F.count("*").alias("member_count"))
    labeled = labeled.join(sizes.where(F.col("member_count") >= 2), "component")

    # canonical selection windows (dedupe.cpp:223-240), url asc tie-break
    if strategy == "keep-oldest":
        order = [F.col("warc_ts").asc(), F.col("url").asc()]
    elif strategy == "keep-largest":
        order = [F.col("size").desc(), F.col("url").asc()]
    else:
        order = [F.col("warc_ts").desc(), F.col("url").asc()]
    w = Window.partitionBy("component").orderBy(*order)
    ranked = labeled.withColumn("rk", F.row_number().over(w))

    # group_key: sorted member doc hashes (dedupe.cpp:279-287)
    group_keys = (
        ranked.groupBy("component")
        .agg(F.array_join(F.array_sort(F.collect_list("doc_hash")), ",").alias("hash_list"))
        .select(
            "component",
            F.concat(
                F.lit(f"semantic:{strategy}:{threshold:.3f}:"), F.col("hash_list")
            ).alias("group_key"),
        )
    )

    # max accepted pair score within the group (dedupe.cpp:269-277)
    pair_comp = (
        accepted_pairs.join(labels.withColumnRenamed("url", "url_a"), "url_a")
        .withColumnRenamed("component", "comp_a")
        .join(labels.withColumnRenamed("url", "url_b"), "url_b")
        .where(F.col("comp_a") == F.col("component"))
        .select(F.col("comp_a").alias("component"), "url_a", "url_b",
                "cosine", "title_overlap", "path_overlap", "pair_score")
    )
    max_scores = pair_comp.groupBy("component").agg(
        F.max("pair_score").alias("max_pair_score")
    )

    canon = ranked.where(F.col("rk") == 1).select(
        "component", F.col("url").alias("canonical_url")
    )

    clusters = (
        group_keys.join(canon, "component")
        .join(sizes.where(F.col("member_count") >= 2), "component")
        .join(max_scores, "component", "left")
        .select(
            "group_key",
            F.lit(ALGORITHM_VERSION).alias("algorithm_version"),
            "canonical_url",
            F.col("member_count").cast("long").alias("member_count"),
            F.coalesce("max_pair_score", F.lit(0.0)).alias("max_pair_score"),
            F.lit(threshold).alias("threshold"),
            "component",
        )
    )

    # members with direct-canonical pair metrics (dedupe.cpp:324-337)
    canon_pairs = (
        pair_comp.join(canon, "component")
        .where(
            (F.col("url_a") == F.col("canonical_url"))
            | (F.col("url_b") == F.col("canonical_url"))
        )
        .select(
            "component",
            F.when(F.col("url_a") == F.col("canonical_url"), F.col("url_b"))
            .otherwise(F.col("url_a"))
            .alias("url"),
            F.col("cosine").alias("similarity_to_canonical"),
            "title_overlap",
            "path_overlap",
            F.col("pair_score").alias("direct_pair_score"),
        )
    )
    members = (
        ranked.join(group_keys, "component")
        .join(canon, "component")
        .join(canon_pairs, ["component", "url"], "left")
        .select(
            "group_key",
            "url",
            F.when(F.col("url") == F.col("canonical_url"), F.lit("canonical"))
            .otherwise(F.lit("duplicate"))
            .alias("role"),
            "similarity_to_canonical",
            "title_overlap",
            "path_overlap",
            F.col("direct_pair_score").alias("pair_score"),
            "component",
        )
    )
    return clusters, members
