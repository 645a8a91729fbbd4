"""FLAC codec (functions/flac_codec.py): bit-exact round-trips across
subframe types, CRC verification, stereo, rice boundaries — stdlib only."""

from __future__ import annotations

import numpy as np
import pytest

from yams_spark.functions.flac_codec import (
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
)


def test_crc_vectors() -> None:
    # CRC-8 poly 0x07 / CRC-16 poly 0x8005, standard check values
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8  # CRC-16/BUYPASS


def _roundtrip(x, **kw):
    dec, rate = decode_flac(encode_flac(x, **kw))
    want = np.asarray(x)[:, None] if np.asarray(x).ndim == 1 else np.asarray(x)
    assert np.array_equal(dec, want), (dec.shape, want.shape)
    return rate


def test_lossless_roundtrips_all_orders() -> None:
    rng = np.random.default_rng(2)
    sine = (2000 * np.sin(2 * np.pi * 440 * np.arange(3000) / 8000)).astype(np.int32)
    noise = rng.integers(-30000, 30000, size=2500).astype(np.int32)
    for x in (sine, noise):
        for order in range(5):
            _roundtrip(x, fixed_order=order)
    assert _roundtrip(sine, rate=44100) == 44100


def test_stereo_constant_and_edges() -> None:
    rng = np.random.default_rng(3)
    stereo = np.stack(
        [(1500 * np.sin(2 * np.pi * 220 * np.arange(2048) / 8000)).astype(np.int32),
         rng.integers(-1000, 1000, size=2048).astype(np.int32)], axis=1)
    _roundtrip(stereo)
    _roundtrip(np.full(1500, 123, dtype=np.int32))  # constant-ish residuals
    _roundtrip(rng.integers(-100, 100, size=7).astype(np.int32))  # < blocksize
    _roundtrip(np.zeros(10, dtype=np.int32))
    with pytest.raises(ValueError, match="range"):
        encode_flac(np.array([40000], dtype=np.int32), bps=16)


def test_corruption_detected() -> None:
    x = (1000 * np.sin(np.arange(600) / 3)).astype(np.int32)
    good = bytearray(encode_flac(x))
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"XXXX" + bytes(good[4:]))
    # flip a bit inside the first frame's data: one of the CRCs must fire
    bad = bytearray(good)
    bad[len(bad) // 2] ^= 0x10
    with pytest.raises(ValueError, match="CRC|sync|truncated|reserved"):
        decode_flac(bytes(bad))


def test_media_dispatch_flac() -> None:
    from yams_spark.functions.media_codecs import REAL_DECODABLE, decode_features

    assert "audio/flac" in REAL_DECODABLE
    t = np.arange(8000) / 8000.0
    tone = (0.5 * 32767 * np.sin(2 * np.pi * 440 * t)).astype(np.int32)
    feats = decode_features(encode_flac(tone, rate=8000), "audio/flac")
    assert feats is not None and feats.shape == (11,)
    # 440 Hz tone: band energy concentrated, RMS of a half-scale sine
    assert feats[3] > 0.9
    assert abs(feats[0] - 0.5 / np.sqrt(2)) < 2e-3
