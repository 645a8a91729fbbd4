"""embed_fn adapters (functions/embed_models.py): adaptive sub-batching,
retry/halving, normalization, and the signatures_stage integration
(embedding_generator.cpp:386-447 semantics)."""

from __future__ import annotations

import numpy as np
import pytest

from yams_spark.functions.embed_models import (
    EmbeddingError,
    batched_embed_fn,
    batched_embed_fn as _bef,
)


class RecordingModel:
    """Deterministic mock model: 2-dim vectors [len(text), 1]; can be
    told to fail the first ``fail_first`` calls or any batch larger than
    ``fail_over`` with a retryable error."""

    def __init__(self, fail_first: int = 0, fail_over: int | None = None):
        self.calls: list[int] = []
        self.fail_first = fail_first
        self.fail_over = fail_over

    def __call__(self, texts):
        self.calls.append(len(texts))
        if self.fail_first > 0:
            self.fail_first -= 1
            raise TimeoutError("flaky")
        if self.fail_over is not None and len(texts) > self.fail_over:
            raise MemoryError("batch too large")
        return np.array([[float(len(t)), 1.0] for t in texts], dtype=np.float32)


def test_sub_batching_and_shapes() -> None:
    m = RecordingModel()
    fn = batched_embed_fn(m, batch_size=4, normalize=False)
    out = fn([f"t{i}" for i in range(10)])
    assert len(out) == 10 and all(v.shape == (2,) for v in out)
    assert m.calls == [4, 4, 2]  # 10 texts in sub-batches of 4


def test_retry_with_backoff_and_halving() -> None:
    sleeps: list[float] = []
    m = RecordingModel(fail_first=2)
    fn = batched_embed_fn(m, batch_size=16, min_batch=4, sleep_fn=sleeps.append)
    out = fn([f"text{i}" for i in range(16)])
    assert len(out) == 16
    # attempts: 16 (fail) -> halve to 8 (fail) -> halve to 4 (ok), then
    # the remaining texts continue at the reduced size
    assert m.calls == [16, 8, 4, 4, 4, 4]
    assert sleeps == [pytest.approx(0.1), pytest.approx(0.2)]


def test_oversized_batch_adapts_down() -> None:
    # model only accepts <= 4 texts: wrapper must converge to min_batch
    m = RecordingModel(fail_over=4)
    fn = batched_embed_fn(m, batch_size=32, min_batch=4, sleep_fn=lambda s: None)
    out = fn([f"x{i}" for i in range(12)])
    assert len(out) == 12
    # halving: 12 (cap 32, fail) -> 12 (cap 16, fail) -> 8 -> 4 (ok),
    # remaining texts continue at the adapted size
    assert m.calls == [12, 12, 8, 4, 4, 4]


def test_exhausted_attempts_and_nonretryable() -> None:
    m = RecordingModel(fail_first=99)
    fn = batched_embed_fn(m, batch_size=4, sleep_fn=lambda s: None)
    with pytest.raises(EmbeddingError, match="failed after 4 attempts"):
        fn(["a", "b"])

    def bad(texts):
        raise ValueError("not retryable")

    with pytest.raises(ValueError, match="not retryable"):
        batched_embed_fn(bad)(["a"])

    def wrong_shape(texts):
        return np.zeros((1, 3), dtype=np.float32)

    with pytest.raises(EmbeddingError, match="shape"):
        batched_embed_fn(wrong_shape, batch_size=4)(["a", "b"])


def test_normalization_unit_rows_zero_safe() -> None:
    def enc(texts):
        return np.array([[3.0, 4.0], [0.0, 0.0]], dtype=np.float32)

    out = batched_embed_fn(enc, batch_size=2)(["a", "b"])
    assert np.allclose(out[0], [0.6, 0.8])
    assert np.allclose(out[1], [0.0, 0.0])  # zero vector passes through


def test_signatures_stage_with_adapter(spark) -> None:
    """End-to-end: the wrapped mock model replaces the feature-hash
    embedding inside the Arrow pass (the seam changes the vector, not
    the plan)."""
    from datetime import datetime

    from yams_spark.operators.signatures import signatures_stage

    pages = spark.createDataFrame(
        [
            ("http://a/1", datetime(2024, 1, 1), b"<html><body>alpha beta</body></html>",
             "alpha beta", "en"),
            ("http://a/2", datetime(2024, 1, 2), b"<html><body>gamma</body></html>",
             "gamma", "en"),
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    fn = _bef(lambda texts: np.array([[float(len(t)), 1.0] for t in texts],
                                     dtype=np.float32), batch_size=8)
    got = {r["url"]: r for r in signatures_stage(pages, embed_fn=fn).collect()}
    for url, r in got.items():
        v = np.asarray(r["embedding"], dtype=np.float32)
        assert v.shape == (2,)
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-6)


def test_sentence_transformer_import_guard() -> None:
    """Without the library installed, the adapter raises the guarded
    ImportError lazily — at encode time, not at construction."""
    from yams_spark.functions import embed_models

    fn = embed_models.sentence_transformer_embed_fn("any-model")
    try:
        import sentence_transformers  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="sentence-transformers"):
            fn(["hello"])
