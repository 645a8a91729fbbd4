"""ER evaluation: labeled pairs + pairwise precision/recall/F1.

FIXTURES.md §2: ``labeled_pairs`` are pairs sharing ≥1 blocking key (the
north rule scores F1 "on labeled pairs at the same blocking key"), labeled
by ground-truth family ids. Prediction = both urls in the same published
cluster. Everything is DataFrame-side so the evaluation itself scales with
the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def labeled_pairs(candidate_pairs: DataFrame, truth: DataFrame) -> DataFrame:
    """(url_a, url_b, is_match) for every candidate pair; truth = (url,
    family_id)."""
    ta = truth.select(F.col("url").alias("url_a"), F.col("family_id").alias("fam_a"))
    tb = truth.select(F.col("url").alias("url_b"), F.col("family_id").alias("fam_b"))
    return (
        candidate_pairs.select("url_a", "url_b")
        .join(ta, "url_a")
        .join(tb, "url_b")
        .select(
            "url_a", "url_b", (F.col("fam_a") == F.col("fam_b")).alias("is_match")
        )
    )


def pairwise_f1(labeled: DataFrame, members: DataFrame) -> DataFrame:
    """One row: tp/fp/fn/tn + precision/recall/f1. ``members`` must carry
    (url, group_key); pairs outside any group predict non-match."""
    ca = members.select(F.col("url").alias("url_a"), F.col("group_key").alias("g_a"))
    cb = members.select(F.col("url").alias("url_b"), F.col("group_key").alias("g_b"))
    scored = (
        labeled.join(ca, "url_a", "left")
        .join(cb, "url_b", "left")
        .withColumn(
            "pred",
            F.col("g_a").isNotNull()
            & F.col("g_b").isNotNull()
            & (F.col("g_a") == F.col("g_b")),
        )
    )
    agg = scored.agg(
        F.sum(((F.col("is_match")) & (F.col("pred"))).cast("long")).alias("tp"),
        F.sum(((~F.col("is_match")) & (F.col("pred"))).cast("long")).alias("fp"),
        F.sum(((F.col("is_match")) & (~F.col("pred"))).cast("long")).alias("fn"),
        F.sum(((~F.col("is_match")) & (~F.col("pred"))).cast("long")).alias("tn"),
    )
    return agg.select(
        "tp", "fp", "fn", "tn",
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))).alias("precision"),
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))).alias("recall"),
        (
            2.0 * F.col("tp")
            / F.greatest(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(1))
        ).alias("f1"),
    )
