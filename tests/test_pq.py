"""PQ/ADC compressed ANN (vector_types.h:60-99 config; Jégou et al. 2011):
codebook determinism, compression sanity, ADC+rerank recall."""

from __future__ import annotations

import numpy as np
import pytest

from yams_spark.operators.pq import pq_adc_topk, pq_encode, train_pq


@pytest.fixture(scope="module")
def clustered_corpus(spark):
    """10 families x 5 near-identical 32-dim vectors (m=8 -> dsub=4)."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(10, 32)).astype(np.float64)
    rows = []
    vid = 0
    for b in base:
        for _ in range(5):
            v = b + rng.normal(scale=1e-2, size=32)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), rows


def test_train_encode_deterministic_and_compact(spark, clustered_corpus) -> None:
    corpus, rows = clustered_corpus
    corpus = corpus.orderBy("vec_id")
    books1 = train_pq(corpus, m=8, k=16, train_limit=50, iters=5)
    books2 = train_pq(corpus, m=8, k=16, train_limit=50, iters=5)
    assert len(books1) == 8
    for a, b in zip(books1, books2):
        assert np.array_equal(a, b)  # fixed seed + sorted sample => identical

    codes = pq_encode(corpus, books1).collect()
    assert len(codes) == 50
    for r in codes:
        assert len(r["codes"]) == 8  # 8 bytes vs 32 floats = 16x compression
        assert all(0 <= c < 16 for c in r["codes"])

    # reconstruction error is small relative to vector norm on clustered data
    by_id = {r["vec_id"]: r["codes"] for r in codes}
    x0 = np.array(rows[0][1])
    recon = np.concatenate([books1[j][by_id[0][j]] for j in range(8)])
    assert np.linalg.norm(x0 - recon) < 0.5 * np.linalg.norm(x0)


def test_adc_topk_recall_with_rerank(spark, clustered_corpus) -> None:
    corpus, rows = clustered_corpus
    corpus = corpus.orderBy("vec_id")
    books = train_pq(corpus, m=8, k=16, train_limit=50, iters=5)
    codes = pq_encode(corpus, books)

    q = np.array(rows[0][1])  # member of family 0 (ids 0..4)
    out = pq_adc_topk(codes, corpus, books, q, k=5, rerank_factor=2).collect()
    assert [r["rk"] for r in out] == [1, 2, 3, 4, 5]
    got_ids = {r["vec_id"] for r in out}
    # all 5 family members (incl. the query itself) are the true top-5 and
    # must survive the compressed scan + exact rerank
    assert got_ids == {0, 1, 2, 3, 4}
    assert out[0]["vec_id"] == 0 and out[0]["cosine"] == pytest.approx(1.0)
    # exact rerank: cosines ordered desc
    cosines = [r["cosine"] for r in out]
    assert cosines == sorted(cosines, reverse=True)
