"""Similarity search over embedding columns.

Brute-force cosine top-k is the exactness baseline the reference uses for
small candidate sets (exact all-pairs fallback when |sources|x|corpus| <=
250k, EmbeddingService.cpp:556-558); the Spark-scale pattern here is
*broadcast matmul*: the smaller side is shipped to every executor as a
numpy matrix and each Arrow batch of the larger side computes a dense
(batch x corpus) cosine block, pruning to top-k locally before the global
top-k — no per-row JVM lambda evaluation, no quadratic shuffle.

An LSH-bucketed variant (minhash/simhash bands from the signature stage)
covers the >250k regime: candidates only within shared bands.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def round_half_away(x, decimals: int):
    """Round half away from zero — matches DuckDB ROUND and Spark F.round
    (HALF_UP); numpy's np.round is banker's rounding and can flip ranks on
    exact .xxxx5 boundaries across engines."""
    s = 10.0 ** decimals
    return np.copysign(np.floor(np.abs(x) * s + 0.5), x) / s


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str):
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    return ids, mat


def cosine_topk(
    spark: SparkSession,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    round_to: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self id), broadcast matmul.

    Returns (query_id, vec_id, cosine, rk); cosine rounded for stable
    cross-engine comparison; ties broken by vec_id asc.
    """
    ids, mat = _collect_matrix(corpus, id_col, vec_col)
    norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def compute(iterator):
        c_ids, c_mat, c_norms = bc.value
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            q = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            qn = np.sqrt(np.einsum("ij,ij->i", q, q))
            denom = np.outer(qn, c_norms)
            denom[denom == 0.0] = np.inf
            cos = round_half_away((q @ c_mat.T) / denom, round_to)
            out_rows = []
            qids = pdf[query_id_col].to_numpy()
            for r in range(len(pdf)):
                mask = c_ids != qids[r]
                cand_cos = cos[r][mask]
                cand_ids = c_ids[mask]
                # top-k by (cosine desc, id asc)
                order = np.lexsort((cand_ids, -cand_cos))[:k]
                for rank, j in enumerate(order, start=1):
                    out_rows.append((int(qids[r]), int(cand_ids[j]), float(cand_cos[j]), rank))
            if out_rows:
                yield pd.DataFrame(
                    out_rows, columns=[query_id_col, id_col, "cosine", "rk"]
                )

    q_in = queries.select(
        F.col(query_id_col).cast("long"), F.col(vec_col)
    )
    return q_in.mapInPandas(
        compute, schema=f"{query_id_col} long, {id_col} long, cosine double, rk int"
    )


def near_dup_pairs_topn(
    spark: SparkSession,
    corpus: DataFrame,
    n: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 5,
) -> DataFrame:
    """Global top-n most-similar pairs (id_a < id_b), exact.

    Per Arrow batch: dense (batch x corpus) cosine, local top-n prune,
    then a global top-n — exact because every pair is seen by exactly
    the batch holding its smaller... (either) side, and local prune keeps
    n candidates ordered identically to the global ordering.
    """
    ids, mat = _collect_matrix(corpus, id_col, vec_col)
    norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def compute(iterator):
        c_ids, c_mat, c_norms = bc.value
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            q = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            qn = np.sqrt(np.einsum("ij,ij->i", q, q))
            a_ids = pdf[id_col].to_numpy()
            denom = np.outer(qn, c_norms)
            denom[denom == 0.0] = np.inf
            cos = round_half_away((q @ c_mat.T) / denom, round_to)
            # keep only id_a < id_b
            keep = a_ids[:, None] < c_ids[None, :]
            ra, rb = np.nonzero(keep)
            flat = pd.DataFrame(
                {
                    "id_a": a_ids[ra].astype(np.int64),
                    "id_b": c_ids[rb].astype(np.int64),
                    "cosine": cos[ra, rb],
                }
            )
            flat = flat.sort_values(
                ["cosine", "id_a", "id_b"], ascending=[False, True, True]
            ).head(n)
            if len(flat):
                yield flat

    out = corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        compute, schema="id_a long, id_b long, cosine double"
    )
    return out.orderBy(
        F.col("cosine").desc(), F.col("id_a").asc(), F.col("id_b").asc()
    ).limit(n)


def lsh_candidate_pairs(signatures: DataFrame, band_col: str = "minhash_bands") -> DataFrame:
    """LSH-bucketed candidate pairs for the >250k regime: explode band keys,
    self-join within band (the scale path used by the ER blocking stage)."""
    b = signatures.select("url", F.explode(band_col).alias("band"))
    left = b.select("band", F.col("url").alias("url_a"))
    right = b.select("band", F.col("url").alias("url_b"))
    return (
        left.join(right, "band")
        .where(F.col("url_a") < F.col("url_b"))
        .select("url_a", "url_b")
        .dropDuplicates(["url_a", "url_b"])
    )
