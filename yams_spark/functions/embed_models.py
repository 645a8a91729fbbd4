"""Real-model adapters for the pipeline's ``embed_fn`` seam.

``signatures_stage(embed_fn=...)`` accepts any picklable
``list[str] -> vectors`` callable (operators/signatures.py:146). The
default stays the deterministic feature-hash stand-in the correctness
oracles share; this module supplies the production adapters mirroring
the reference's daemon-backed generator
(``reference src/vector/embedding_generator.cpp:386-447``):

* ``batched_embed_fn`` — the adaptive sub-batching wrapper: split the
  Arrow batch into sub-batches, retry a failed sub-batch up to 4
  attempts, halving the sub-batch size on retryable failures (floor 4,
  :442-444), optional L2 normalization (``req.normalize``, :387).
* ``sentence_transformer_embed_fn`` — an import-guarded example binding
  a public sentence-transformers model into that contract with lazy
  per-executor model loading (models are not picklable; the returned
  closure carries only the model NAME and loads/caches on first call
  inside each worker).

Executors each hold one model instance; inference cost is spread across
partitions exactly like the stand-in — the seam changes WHAT computes
the vector, never the Spark plan around it.
"""

from __future__ import annotations

import time

import numpy as np

#: reference defaults (embedding_generator.cpp:392-394,439-444)
DEFAULT_BATCH_SIZE = 32
MAX_ATTEMPTS = 4
MIN_BATCH = 4


class EmbeddingError(RuntimeError):
    """A sub-batch failed all retry attempts."""


def batched_embed_fn(
    model_encode,
    batch_size: int = DEFAULT_BATCH_SIZE,
    max_attempts: int = MAX_ATTEMPTS,
    min_batch: int = MIN_BATCH,
    normalize: bool = True,
    retryable=(TimeoutError, ConnectionError, MemoryError),
    sleep_fn=time.sleep,
):
    """Wrap a ``list[str] -> vectors`` model call into the embed_fn
    contract with the reference's adaptive sub-batching
    (embedding_generator.cpp:398-447): texts are fed in sub-batches of
    ``batch_size``; a sub-batch hitting a ``retryable`` error is retried
    up to ``max_attempts`` with exponential backoff (100·2^k ms) and the
    sub-batch size halved each retry (floor ``min_batch``);
    non-retryable errors propagate immediately. ``normalize`` L2-unit-
    normalizes rows (zero vectors pass through). The wrapper is
    picklable as long as ``model_encode`` is."""
    if batch_size < 1 or min_batch < 1 or max_attempts < 1:
        raise ValueError("batch_size, min_batch, max_attempts must be >= 1")

    def embed(texts):
        out: list[np.ndarray] = []
        i = 0
        current = batch_size
        while i < len(texts):
            chunk = texts[i : i + current]
            attempt = 0
            while True:
                attempt += 1
                try:
                    vecs = np.asarray(model_encode(list(chunk)), dtype=np.float32)
                    break
                except retryable as exc:
                    if attempt >= max_attempts:
                        raise EmbeddingError(
                            f"sub-batch of {len(chunk)} failed after "
                            f"{max_attempts} attempts: {exc}"
                        ) from exc
                    sleep_fn(0.1 * (1 << (attempt - 1)))
                    if current > min_batch:
                        current = max(min_batch, current // 2)
                    chunk = texts[i : i + current]
            if vecs.ndim != 2 or vecs.shape[0] != len(chunk):
                raise EmbeddingError(
                    f"model returned shape {vecs.shape} for {len(chunk)} texts"
                )
            if normalize:
                norms = np.linalg.norm(vecs, axis=1, keepdims=True)
                vecs = np.where(norms > 0, vecs / np.where(norms > 0, norms, 1.0), vecs)
            out.extend(vecs)
            i += len(chunk)
        return out

    return embed


_MODEL_CACHE: dict = {}


def _load_sentence_transformer(model_name: str):
    """Per-executor lazy model load (one instance per worker process)."""
    if model_name not in _MODEL_CACHE:
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise ImportError(
                "sentence-transformers is not installed; install it (and a "
                "torch backend) to use sentence_transformer_embed_fn, or "
                "keep the default feature-hash embedding"
            ) from exc
        _MODEL_CACHE[model_name] = SentenceTransformer(model_name)
    return _MODEL_CACHE[model_name]


def sentence_transformer_embed_fn(
    model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
    batch_size: int = DEFAULT_BATCH_SIZE,
    normalize: bool = True,
):
    """embed_fn bound to a public sentence-transformers model. Usage::

        cfg = PipelineConfig(embed_fn=sentence_transformer_embed_fn())
        run_pipeline(spark, pages, cfg)

    The closure ships only the model name; each executor loads and
    caches its own instance on first batch. Import of the library is
    deferred to the worker, so the driver needs nothing installed."""

    def encode(texts, _name=model_name):
        model = _load_sentence_transformer(_name)
        return model.encode(list(texts), batch_size=batch_size, convert_to_numpy=True)

    return batched_embed_fn(encode, batch_size=batch_size, normalize=normalize)


# ---------------------------------------------------------------------------
# Embedding-dimension resolution (src/vector/dim_resolver.cpp)
# ---------------------------------------------------------------------------

#: dim_resolver.cpp:21-43 — substring table in the reference's check
#: order (the first match wins: a name containing several markers
#: resolves to the earliest row).
MODEL_DIM_TABLE = (
    ("minilm", 384),
    ("mpnet", 768),
    ("jina", 768),
    ("nomic", 768),
    ("bge-small", 384),
    ("bge-base", 768),
    ("bge-large", 1024),
    ("e5-small", 384),
    ("e5-base", 768),
    ("e5-large", 1024),
    ("embeddinggemma", 768),
)


def dim_from_model_name(model_name: str) -> int | None:
    """dim_from_model_name (dim_resolver.cpp:11-45): case-folded
    substring lookup; None for unknown models (caller queries the
    model)."""
    if not model_name:
        return None
    name = model_name.lower()
    for marker, dim in MODEL_DIM_TABLE:
        if marker in name:
            return dim
    return None


def dim_from_model_config(config_json: str | None) -> int | None:
    """dim_from_model_config (:47-72) over the config's JSON content
    (the file read is the caller's concern in a dataflow engine):
    hidden_size > output_embedding_size > dim, integers only."""
    if not config_json:
        return None
    import json

    try:
        j = json.loads(config_json)
    except ValueError:
        return None
    for key in ("hidden_size", "output_embedding_size", "dim"):
        v = j.get(key) if isinstance(j, dict) else None
        if isinstance(v, int) and not isinstance(v, bool):
            return v
    return None


def resolve_dim(
    sentinel_dim: int | None, generator_dim: int, default_dim: int
) -> int:
    """resolve_dim (:94-101): persisted sentinel wins, then the live
    generator, then the configured default."""
    if sentinel_dim is not None:
        return sentinel_dim
    if generator_dim > 0:
        return generator_dim
    return default_dim


def dim_from_model_name_col(name_col):
    """The name lookup as one Catalyst CASE chain (zero exchanges)."""
    from pyspark.sql import functions as F

    c = F.col(name_col) if isinstance(name_col, str) else name_col
    lower = F.lower(c)
    expr = F.when(F.lit(False), F.lit(None).cast("int"))
    for marker, dim in MODEL_DIM_TABLE:
        expr = expr.when(lower.contains(marker), F.lit(dim))
    return expr.otherwise(F.lit(None).cast("int"))


def dim_from_model_config_col(json_col):
    """The config-JSON cascade via get_json_object (JVM-side)."""
    from pyspark.sql import functions as F

    c = F.col(json_col) if isinstance(json_col, str) else json_col
    # try_cast: ANSI-safe NULL for non-integer JSON values (the C++
    # is_number_integer gate rejects floats/bools the same way).
    return F.coalesce(
        F.get_json_object(c, "$.hidden_size").try_cast("int"),
        F.get_json_object(c, "$.output_embedding_size").try_cast("int"),
        F.get_json_object(c, "$.dim").try_cast("int"),
    )


def resolve_dim_col(sentinel_col, generator_col, default_dim: int):
    """resolve_dim (:94-101) as a column cascade."""
    from pyspark.sql import functions as F

    s = F.col(sentinel_col) if isinstance(sentinel_col, str) else sentinel_col
    g = F.col(generator_col) if isinstance(generator_col, str) else generator_col
    return F.coalesce(
        s, F.when(g > 0, g), F.lit(default_dim)
    ).cast("int")
