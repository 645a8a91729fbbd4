"""Deterministic signature sketches used as blocking keys and pair features.

These recast the reference's content-addressed dedup machinery (chunk-hash
identity, ``content_store_impl.cpp:199-204``) plus its vector similarity
stage (``EmbeddingService.cpp:555-610``) into Spark-friendly fixed-seed
sketches:

* MinHash (128 permutations over 5-gram word shingles) banded into LSH keys,
* SimHash-64 over token multisets (+ Hamming distance as a pair feature),
* a deterministic feature-hash embedding (dim 384, L2-normalized) standing
  in for the all-MiniLM-L6-v2 model the reference seeds
  (``src/metadata/migration.cpp:1117-1143``): we need a deterministic
  embedding *function* shared by the pipeline and the oracle, not a real
  model — the F1 target is defined on the reference's pair gates re-run
  with the same embeddings.

All hashing is via BLAKE2b-64 (stdlib, keyed by fixed seeds), so every
worker/partition/run computes identical signatures.
"""

from __future__ import annotations

import hashlib

import numpy as np

NUM_PERM = 128
MINHASH_BANDS = 32
MINHASH_ROWS = 4  # 32 bands x 4 rows = 128
SHINGLE_SIZE = 5
EMBEDDING_DIM = 384
_MERSENNE61 = (1 << 61) - 1
_SEED = 0x5EED_CAFE_F00D

# Fixed-seed affine permutations on Z/2^64: x -> a*x + b with a odd is a
# bijection, so min over a shingle set is a proper MinHash permutation and
# the whole signature vectorizes as native uint64 wraparound arithmetic.
_rng = np.random.default_rng(_SEED)
_PERM_A = _rng.integers(0, 1 << 63, size=NUM_PERM, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
_PERM_B = _rng.integers(0, 1 << 63, size=NUM_PERM, dtype=np.uint64)

_HASH_CACHE: dict[str, int] = {}


def token_hash64(token: str) -> int:
    """Deterministic 64-bit hash of a token (BLAKE2b-8)."""
    h = _HASH_CACHE.get(token)
    if h is None:
        h = int.from_bytes(
            hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "little"
        )
        if len(_HASH_CACHE) < 1_000_000:
            _HASH_CACHE[token] = h
    return h


def hash_tokens(tokens: list[str]) -> np.ndarray:
    return np.fromiter((token_hash64(t) for t in tokens), dtype=np.uint64, count=len(tokens))


def shingles(tokens: list[str], k: int = SHINGLE_SIZE) -> list[str]:
    """k-gram word shingles; short docs fall back to one whole-doc shingle."""
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def minhash_signature(tokens: list[str]) -> np.ndarray:
    """128 fixed-seed min-hashes over 5-gram shingles (uint64)."""
    sh = shingles(tokens)
    if not sh:
        return np.full(NUM_PERM, 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)
    x = np.unique(hash_tokens(sh))
    with np.errstate(over="ignore"):
        permuted = x[:, None] * _PERM_A[None, :] + _PERM_B[None, :]
    return permuted.min(axis=0)


def minhash_band_keys(sig: np.ndarray) -> list[str]:
    """LSH band keys: hash of each 4-row band, prefixed by band index."""
    keys = []
    for band in range(MINHASH_BANDS):
        chunk = sig[band * MINHASH_ROWS : (band + 1) * MINHASH_ROWS]
        digest = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
        keys.append(f"mh{band}:{digest}")
    return keys


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over the token multiset (signed, fits LongType)."""
    if not tokens:
        return 0
    hashes = hash_tokens(tokens)
    vals, counts = np.unique(hashes, return_counts=True)
    bits = np.unpackbits(vals.view(np.uint8).reshape(len(vals), 8), axis=1, bitorder="little")
    weights = counts.astype(np.int64)
    acc = (bits.astype(np.int64) * 2 - 1) * weights[:, None]
    sums = acc.sum(axis=0)
    out = 0
    for bit in range(64):
        if sums[bit] >= 0:
            out |= 1 << bit
    # represent as signed 64-bit for Spark LongType
    if out >= 1 << 63:
        out -= 1 << 64
    return out


def simhash_band_keys(sim: int, bands: int = 4) -> list[str]:
    """Split the 64-bit simhash into 16-bit bands as blocking keys."""
    u = sim & 0xFFFFFFFFFFFFFFFF
    width = 64 // bands
    mask = (1 << width) - 1
    return [f"sh{i}:{(u >> (i * width)) & mask:04x}" for i in range(bands)]


def feature_hash_embedding(tokens: list[str], dim: int = EMBEDDING_DIM) -> np.ndarray:
    """Deterministic L2-normalized feature-hash embedding (float32)."""
    vec = np.zeros(dim, dtype=np.float64)
    if tokens:
        hashes = hash_tokens(tokens)
        vals, counts = np.unique(hashes, return_counts=True)
        idx = (vals % np.uint64(dim)).astype(np.int64)
        sign = np.where((vals >> np.uint64(60)) & np.uint64(1) == 1, -1.0, 1.0)
        np.add.at(vec, idx, sign * counts.astype(np.float64))
        norm = np.sqrt(np.dot(vec, vec))
        if norm > 0:
            vec /= norm
    return vec.astype(np.float32)
