"""Rabin CDC chunker tests, modeled on the reference's own invariants
(tests/unit/chunking/chunking_test.cpp:108-230): empty input, size
constraints, total coverage, sequential offsets, determinism, and
vectorized ≡ sequential equivalence (the analog of its streaming ≡
in-memory equivalence test).
"""

from __future__ import annotations

import hashlib
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from yams_spark.functions import chunker as ck

SMALL = ck.ChunkingConfig(
    min_chunk_size=16, target_chunk_size=64, max_chunk_size=256, chunk_mask=0x3F
)


def test_out_table_matches_reference_construction() -> None:
    table = ck.make_out_table()
    # spot-check a few entries computed by hand from the poly
    poly = ck.K_DEFAULT_RABIN_POLYNOMIAL
    assert table[0] == 0
    assert table[1] == poly
    assert table[2] == (poly << 1) & 0xFFFFFFFFFFFFFFFF
    assert table[3] == (poly ^ (poly << 1)) & 0xFFFFFFFFFFFFFFFF


def test_empty_input() -> None:
    assert ck.chunk_boundaries(b"", SMALL) == []
    assert ck.chunk_data(b"", SMALL) == []


def test_coverage_and_monotonicity() -> None:
    rng = random.Random(42)
    data = bytes(rng.randrange(256) for _ in range(5000))
    chunks = ck.chunk_boundaries(data, SMALL)
    assert chunks[0][0] == 0
    pos = 0
    for off, size in chunks:
        assert off == pos
        assert size > 0
        pos = off + size
    assert pos == len(data)


def test_size_constraints() -> None:
    rng = random.Random(7)
    data = bytes(rng.randrange(256) for _ in range(20000))
    chunks = ck.chunk_boundaries(data, SMALL)
    for off, size in chunks[:-1]:
        assert SMALL.min_chunk_size <= size <= SMALL.max_chunk_size
    assert chunks[-1][1] <= SMALL.max_chunk_size


def test_determinism() -> None:
    rng = random.Random(3)
    data = bytes(rng.randrange(256) for _ in range(8000))
    assert ck.chunk_data(data, SMALL) == ck.chunk_data(data, SMALL)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=3000))
def test_vectorized_equals_sequential(data: bytes) -> None:
    assert ck.chunk_boundaries(data, SMALL) == ck.chunk_boundaries_sequential(data, SMALL)


def test_vectorized_equals_sequential_default_config_window_span() -> None:
    # exercise the real 48-byte window + 0x1FFF mask across min-size spans
    cfg = ck.ChunkingConfig(min_chunk_size=1024, target_chunk_size=4096,
                            max_chunk_size=16384, chunk_mask=0x1FF)
    rng = random.Random(11)
    data = bytes(rng.randrange(256) for _ in range(60000))
    assert ck.chunk_boundaries(data, cfg) == ck.chunk_boundaries_sequential(data, cfg)


def test_chunk_hashes_are_sha256() -> None:
    data = b"hello world" * 10
    chunks = ck.chunk_data(data, SMALL)
    for off, size, digest in chunks:
        assert digest == hashlib.sha256(data[off : off + size]).hexdigest()


def test_content_defined_shift_stability() -> None:
    """Inserting a prefix should leave most boundaries (relative to content)
    intact after the window re-synchronizes — the whole point of CDC."""
    rng = random.Random(99)
    base = bytes(rng.randrange(256) for _ in range(30000))
    shifted = b"PREFIX-BYTES!" + base
    h_base = {
        hashlib.sha256(base[o : o + s]).hexdigest() for o, s in ck.chunk_boundaries(base, SMALL)
    }
    h_shift = {
        hashlib.sha256(shifted[o : o + s]).hexdigest()
        for o, s in ck.chunk_boundaries(shifted, SMALL)
    }
    overlap = len(h_base & h_shift) / len(h_base)
    assert overlap > 0.5
