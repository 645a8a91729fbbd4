"""Vectorized pairwise scoring stage.

Computes the reference pair features and acceptance gates
(dedupe.cpp:191-204) for every candidate pair, plus the extra north-star
features (Jaro-Winkler on normalized titles, Levenshtein on urls, SimHash
Hamming distance). All Python work is Arrow-batched ``mapInPandas`` with
numpy matrix math for the cosine — no per-row Python UDF calls.

score     = 0.8·cosine + 0.15·title_overlap + 0.05·path_overlap  (:197)
accepted  = cosine ≥ threshold AND
            (title_overlap>0 OR path_overlap>0 OR cosine ≥ 0.975) (:199-204)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yams_spark.functions.similarity import (
    cosine_matrix,
    hamming64_array,
    jaro_winkler,
    levenshtein_batch,
)
from yams_spark.functions.textnorm import jaccard_token_sets

SCORED_SCHEMA = (
    "url_a string, url_b string, cosine double, title_overlap double, "
    "path_overlap double, jaro_winkler_title double, levenshtein_url int, "
    "simhash_hamming int, pair_score double, accepted boolean"
)

PAIR_SIDE_COLS = ["url", "title_norm", "url_norm", "simhash64", "embedding"]


def attach_pair_features(pairs: DataFrame, signatures: DataFrame) -> DataFrame:
    """Join both endpoints' feature columns onto the pair table."""
    slim = signatures.select(*PAIR_SIDE_COLS)
    a = slim.select([F.col(c).alias(f"{c}_a") for c in PAIR_SIDE_COLS])
    b = slim.select([F.col(c).alias(f"{c}_b") for c in PAIR_SIDE_COLS])
    return pairs.join(a, "url_a").join(b, "url_b")


def scored_pairs_stage(
    pairs_with_features: DataFrame,
    threshold: float = 0.92,
    with_extra_features: bool = True,
) -> DataFrame:
    def score(iterator):
        for pdf in iterator:
            n = len(pdf)
            if n == 0:
                continue
            emb_a = np.stack(pdf["embedding_a"].to_numpy()).astype(np.float32)
            emb_b = np.stack(pdf["embedding_b"].to_numpy()).astype(np.float32)
            cosine = cosine_matrix(emb_a, emb_b)

            ta = pdf["title_norm_a"].to_numpy()
            tb = pdf["title_norm_b"].to_numpy()
            ua = pdf["url_norm_a"].to_numpy()
            ub = pdf["url_norm_b"].to_numpy()
            title_overlap = np.fromiter(
                (
                    jaccard_token_sets(frozenset(x.split()), frozenset(y.split()))
                    for x, y in zip(ta, tb)
                ),
                dtype=np.float64,
                count=n,
            )
            path_overlap = np.fromiter(
                (
                    jaccard_token_sets(frozenset(x.split()), frozenset(y.split()))
                    for x, y in zip(ua, ub)
                ),
                dtype=np.float64,
                count=n,
            )
            score_v = cosine * 0.8 + title_overlap * 0.15 + path_overlap * 0.05
            accepted = (cosine >= threshold) & (
                (title_overlap > 0.0) | (path_overlap > 0.0) | (cosine >= 0.975)
            )
            # extra (non-gating) features: computed only for accepted pairs —
            # the quadratic-DP Levenshtein over every rejected candidate would
            # dominate the stage at scale
            jw = np.zeros(n)
            lev = np.zeros(n, dtype=np.int32)
            if with_extra_features and accepted.any():
                idx = np.nonzero(accepted)[0]
                ua_v = pdf["url_a"].to_numpy()
                ub_v = pdf["url_b"].to_numpy()
                lev[idx] = levenshtein_batch(
                    [ua_v[i] for i in idx], [ub_v[i] for i in idx]
                )
                for i in idx:
                    jw[i] = jaro_winkler(ta[i], tb[i])
            ham = hamming64_array(
                pdf["simhash64_a"].to_numpy().astype(np.int64),
                pdf["simhash64_b"].to_numpy().astype(np.int64),
            )
            yield pd.DataFrame(
                {
                    "url_a": pdf["url_a"],
                    "url_b": pdf["url_b"],
                    "cosine": cosine,
                    "title_overlap": title_overlap,
                    "path_overlap": path_overlap,
                    "jaro_winkler_title": jw,
                    "levenshtein_url": lev,
                    "simhash_hamming": ham,
                    "pair_score": score_v,
                    "accepted": accepted,
                }
            )

    return pairs_with_features.mapInPandas(score, schema=SCORED_SCHEMA)
