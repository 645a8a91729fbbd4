"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested, while the actual codec work is stubbed —
the decode libraries aren't available in this environment, so each
extractor either raises ``NotImplementedError`` (strict mode) or produces
a deterministic fake feature (test mode). This mirrors the reference's
plugin extractor boundary (src/extraction/external_plugin_extractor.cpp):
the engine defines the dataflow, the codec is a pluggable worker-side
function.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, mime string, "
    "width int, height int, duration_ms long"
)

FEATURE_DIM = 64


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder+featurizer: hash-seeded
    pseudo-features, L2-normalized. Replace with a real codec via
    ``decode_fn`` when the libraries exist."""
    digest = hashlib.blake2b(payload, digest_size=32).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


def extract_media_features(
    media: DataFrame,
    decode_fn=None,
    strict: bool = False,
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """(media_id, kind, feature array<float>, payload_sha256, n_bytes) via
    one Arrow-batched mapInPandas pass. ``decode_fn(payload: bytes) ->
    np.ndarray`` plugs in the real decoder."""
    if strict and decode_fn is None:
        raise NotImplementedError(
            "no media decoder available in this environment; pass decode_fn"
        )
    fn = decode_fn or _fake_decode_features

    def compute(iterator):
        for pdf in iterator:
            rows = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                rows.append(
                    (
                        mid,
                        kind,
                        fn(data).tolist() if len(data) else [0.0] * dim,
                        hashlib.sha256(data).hexdigest(),
                        len(data),
                    )
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "kind", "feature", "payload_sha256", "n_bytes"],
                )

    return media.mapInPandas(
        compute,
        schema="media_id string, kind string, feature array<float>, "
        "payload_sha256 string, n_bytes long",
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: (media_id, frame_ts_ms) rows from the
    duration metadata — the schedule is real; frame decode is the stubbed
    step."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def synth_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (binary payload +
    typed metadata, no external data)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.blake2b(f"media{i}".encode(), digest_size=16).digest() * (
            4 + i % 5
        )
        rows.append(
            (
                f"m{i:04d}", kind, payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i if kind == "image" else None,
                64 + i if kind == "image" else None,
                (i + 1) * 750 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
