"""Integrity verification (chunk_validator.cpp / verifier.h) and
magic-byte file-type detection (file_type_detector.cpp)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from yams_spark.functions.filetype import detect_file_type, is_valid_utf8_text
from yams_spark.operators.integrity import (
    integrity_report,
    validate_chunks,
    verification_priority,
    verification_schedule,
)


def test_validate_chunks_statuses(spark):
    chunks = {"a": b"alpha", "b": b"beta", "c": b"gamma"}
    man = spark.createDataFrame(
        [("f1", hashlib.sha256(v).hexdigest(), i * 5, len(v))
         for i, v in enumerate(chunks.values())],
        "file_hash string, chunk_hash string, offset long, size long",
    )
    # store: 'a' intact, 'b' corrupted, 'c' missing
    store = spark.createDataFrame(
        [(hashlib.sha256(b"alpha").hexdigest(), bytearray(b"alpha")),
         (hashlib.sha256(b"beta").hexdigest(), bytearray(b"betX"))],
        "chunk_hash string, data binary",
    )
    got = {r["chunk_hash"]: r["status"]
           for r in validate_chunks(man, store).collect()}
    assert got[hashlib.sha256(b"alpha").hexdigest()] == "valid"
    assert got[hashlib.sha256(b"beta").hexdigest()] == "corrupt"
    assert got[hashlib.sha256(b"gamma").hexdigest()] == "missing"
    rep = integrity_report(validate_chunks(man, store)).collect()[0]
    assert (rep["blocks_verified"], rep["blocks_passed"],
            rep["blocks_failed"], rep["blocks_missing"]) == (3, 1, 1, 1)
    assert rep["success_rate"] == pytest.approx(1 / 3)
    assert rep["error_rate"] == pytest.approx(2 / 3)
    assert not rep["overall_success"]


def test_verification_priority_formula(spark):
    """verifier.h:95-99: failures*1000 + age_hours/24 + access/10,
    integer floor arithmetic."""
    now = 1_705_000_000
    blocks = spark.createDataFrame(
        [("h1", now - 49 * 3600, 2, 10, 25),  # age 49h -> 2 days
         ("h2", now - 1 * 3600, 0, 99, 9)],
        "block_hash string, last_verified_epoch long, failure_count int, "
        "size long, access_count int",
    )
    got = {r["block_hash"]: r["priority"] for r in blocks.withColumn(
        "priority", verification_priority(blocks, now)).collect()}
    assert got["h1"] == 2 * 1000 + 49 // 24 + 25 // 10  # 2004
    assert got["h2"] == 0 + 0 + 0
    # single-factor strategies
    by_size = verification_schedule(blocks, 1, now, "by_size").collect()[0]
    assert by_size["block_hash"] == "h2"
    by_age = verification_schedule(blocks, 1, now, "by_age").collect()[0]
    assert by_age["block_hash"] == "h1"
    with pytest.raises(ValueError, match="strategy"):
        verification_schedule(blocks, 1, now, "nope")


def test_detect_file_type_magic_and_fallbacks():
    from yams_spark.functions.media_codecs import encode_ppm, encode_wav
    from yams_spark.functions.mpeg_audio import encode_layer2

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    assert detect_file_type(encode_ppm(img))["mime"] == "image/x-portable-pixmap"
    wav = encode_wav(np.zeros(64), rate=8000)
    assert detect_file_type(wav) == {
        "mime": "audio/wav", "file_type": "audio",
        "confidence": 1.0, "method": "magic"}
    t = np.arange(1152) / 44100.0
    mp2 = encode_layer2(0.1 * np.sin(2 * np.pi * 440 * t), 44100, 192)
    assert detect_file_type(mp2)["mime"] == "audio/mpeg"
    from yams_spark.functions.mp4_meta import build_mp4

    assert detect_file_type(build_mp4())["mime"] == "video/mp4"
    # extension fallback, utf8 text, binary fallback
    assert detect_file_type(b"", "x.json")["method"] == "extension"
    assert detect_file_type("héllo wörld".encode())["mime"] == "text/plain"
    got = detect_file_type(bytes([0, 1, 2, 3]))
    assert got["mime"] == "application/octet-stream"
    # utf8 validator: invalid continuation rejected, NUL rejected
    assert not is_valid_utf8_text(b"\xc2\x20")
    assert not is_valid_utf8_text(b"ab\x00cd")
    assert is_valid_utf8_text("日本語テキスト".encode())


def test_multimodal_infers_missing_mime(spark):
    from yams_spark.functions.media_codecs import encode_ppm
    from yams_spark.operators.multimodal import extract_media_features

    img = (np.arange(48, dtype=np.int64) % 256).astype(np.uint8).reshape(4, 4, 3)
    media = spark.createDataFrame(
        [("x", "image", bytearray(encode_ppm(img)), None, 4, 4, None)],
        "media_id string, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )
    row = extract_media_features(media).collect()[0]
    assert row["decoded"] and row["mime"] == "image/x-portable-pixmap"


def test_repair_chunks_verifies_candidates_and_orders_strategies(spark):
    """repair_manager.cpp:116-170: candidates are accepted only if they
    hash back to the expected block; the lowest-priority verifying
    strategy wins; chunks without a verifying candidate stay broken."""
    from yams_spark.operators.integrity import (
        integrity_report_with_repairs,
        repair_chunks,
    )

    h = lambda b: hashlib.sha256(b).hexdigest()
    man = spark.createDataFrame(
        [("f", h(b"alpha"), 0, 5), ("f", h(b"beta"), 5, 4),
         ("f", h(b"gamma"), 9, 5)],
        "file_hash string, chunk_hash string, offset long, size long",
    )
    store = spark.createDataFrame(
        [(h(b"alpha"), bytearray(b"ALPHA"))],  # corrupt; beta/gamma missing
        "chunk_hash string, data binary",
    )
    from yams_spark.operators.integrity import validate_chunks

    validated = validate_chunks(man, store)
    source = spark.createDataFrame(
        [
            # decoy for alpha (priority 0, wrong bytes) must be REJECTED
            (h(b"alpha"), bytearray(b"nope!"), "parity", 0),
            (h(b"alpha"), bytearray(b"alpha"), "backup", 1),
            # two verifying candidates for beta: lower priority wins
            (h(b"beta"), bytearray(b"beta"), "manifest", 2),
            (h(b"beta"), bytearray(b"beta"), "backup", 1),
            # no candidate for gamma
        ],
        "chunk_hash string, data binary, strategy string, priority int",
    )
    got = {r["chunk_hash"]: r for r in
           repair_chunks(validated, source).collect()}
    assert got[h(b"alpha")]["repaired"]
    assert got[h(b"alpha")]["repair_strategy"] == "backup"  # decoy rejected
    assert got[h(b"beta")]["repair_strategy"] == "backup"  # priority order
    assert not got[h(b"gamma")]["repaired"]
    rep = integrity_report_with_repairs(
        validated, repair_chunks(validated, source)).collect()[0]
    assert (rep["blocks_repaired"], rep["blocks_passed"]) == (2, 0)
    assert rep["success_rate"] == pytest.approx(2 / 3)
    assert not rep["fully_repaired"]


def test_monitor_metrics_windows_and_alert_gate(spark):
    """verification_monitor.cpp: tumbling windows, per-second rates, and
    the two-part alert gate (activity >= 1/s AND ratio > threshold)."""
    from datetime import datetime, timezone

    from yams_spark.operators.integrity import monitor_metrics

    base = datetime(2024, 1, 1, tzinfo=timezone.utc)

    def ev(sec, status, repaired=None):
        return (datetime.fromtimestamp(base.timestamp() + sec, timezone.utc),
                status, repaired)

    rows = (
        # window 0: 70 valid + 10 corrupt -> vps>1, ratio 0.125 -> ALERT
        [ev(i % 60, "valid") for i in range(70)]
        + [ev(i, "corrupt") for i in range(10)]
        # window 1: 80 valid + 2 corrupt -> ratio 0.0244 -> no alert
        + [ev(60 + i % 60, "valid") for i in range(80)]
        + [ev(61, "corrupt"), ev(62, "corrupt", True)]
        # window 2: sparse (activity gate blocks the alert despite ratio 1.0)
        + [ev(120, "corrupt"), ev(121, "corrupt", False)]
    )
    events = spark.createDataFrame(
        rows, "ts timestamp, status string, repaired boolean"
    )
    got = {r["window_start"].second + r["window_start"].minute * 60: r
           for r in monitor_metrics(events, 60, 0.1).collect()}
    w0, w1, w2 = got[0], got[60], got[120]
    assert (w0["total_verifications"], w0["total_errors"]) == (80, 10)
    assert w0["should_alert"] and w0["error_rate"] == pytest.approx(0.125)
    assert not w1["should_alert"] and w1["repair_attempts"] == 1
    assert w1["successful_repairs"] == 1
    assert w2["error_rate"] == pytest.approx(1.0) and not w2["should_alert"]
    assert w2["repair_attempts"] == 1 and w2["successful_repairs"] == 0
