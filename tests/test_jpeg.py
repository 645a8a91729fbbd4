"""Baseline JPEG codec (functions/jpeg_codec.py): round-trips with
lossy-bounded error, quality convergence, sampling modes, marker-level
errors — no external image libraries anywhere."""

from __future__ import annotations

import numpy as np
import pytest

from yams_spark.functions.jpeg_codec import (
    ZIGZAG,
    _build_decode_table,
    _build_encode_table,
    decode_jpeg,
    encode_jpeg,
)


def _grad_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(128 + 60 * np.sin(yy / 9)).astype(np.uint8),
         (128 + 50 * np.cos(xx / 11)).astype(np.uint8),
         ((yy + xx) % 200 + 20).astype(np.uint8)],
        axis=2,
    )


def test_zigzag_is_permutation() -> None:
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec spot checks: the first diagonal walk
    assert ZIGZAG[:8].tolist() == [0, 1, 8, 16, 9, 2, 3, 10]


def test_huffman_tables_roundtrip() -> None:
    from yams_spark.functions.jpeg_codec import STD_AC_LUMA, STD_DC_LUMA

    dec = _build_decode_table(*STD_AC_LUMA)
    enc = _build_encode_table(*STD_AC_LUMA)
    # canonical codes are prefix-free and bijective
    assert len(dec) == len(STD_AC_LUMA[1])
    for sym, (code, ln) in enc.items():
        assert dec[(ln, code)] == sym
    assert len(_build_decode_table(*STD_DC_LUMA)) == 12


def test_flat_block_near_exact() -> None:
    for v in (0, 130, 255):
        flat = np.full((24, 16), v, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(flat, quality=95))
        assert out.shape == (24, 16)
        assert np.abs(out.astype(int) - v).max() <= 1


def test_quality_convergence_and_lossiness() -> None:
    img = _grad_rgb(48, 40)
    errs = []
    for q in (50, 85, 100):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        errs.append(np.abs(out.astype(int) - img.astype(int)).max())
    # error shrinks with quality; q100 is near-lossless on smooth content
    assert errs[0] >= errs[1] >= errs[2]
    assert errs[2] <= 3
    # and it IS lossy: random noise at q50 has real error
    noise = np.random.default_rng(1).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(noise, quality=50))
    assert np.abs(out.astype(int) - noise.astype(int)).mean() > 5


def test_sampling_modes_and_odd_dims() -> None:
    img = _grad_rgb(29, 19)  # non-multiple of 8/16 exercises padding+crop
    for sub in (False, True):
        out = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 12
    gray = img[:, :, 0]
    out = decode_jpeg(encode_jpeg(gray, quality=90))
    assert out.shape == gray.shape and out.ndim == 2


def test_marker_errors() -> None:
    img = _grad_rgb(16, 16)
    good = encode_jpeg(img, quality=85)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x00" + good[2:])
    # flip SOF0 to SOF2 (progressive) -> honest NotImplementedError
    sof_at = good.index(b"\xff\xc0")
    prog = good[:sof_at + 1] + b"\xc2" + good[sof_at + 2:]
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(prog)
    with pytest.raises(ValueError):
        decode_jpeg(good[:40])  # truncated before any scan


def test_media_dispatch_jpeg() -> None:
    from yams_spark.functions.media_codecs import REAL_DECODABLE, decode_features

    assert "image/jpeg" in REAL_DECODABLE
    feats = decode_features(encode_jpeg(_grad_rgb(16, 16)), "image/jpeg")
    assert feats is not None and feats.shape == (30,)
