"""Content-defined chunking: faithful re-implementation of the reference
Rabin chunker (``/root/reference/src/chunking/rabin_chunker.cpp:45-152``,
table ``src/chunking/rabin_fingerprint_table.h:11-27``, defaults
``include/yams/chunking/chunker.h:44-51`` + ``include/yams/core/types.h:280-285``).

The rolling hash is ``h = ((h - OUT[old]) << 8) ^ OUT[new]`` over a 48-byte
ring that persists across chunk boundaries within a document; a boundary is
declared at ``pos + 1`` when ``(h & mask) == mask`` for positions at least
``min_size`` into the current chunk, and chunks are force-cut at
``max_size``.

Key vectorization insight (scale path): because ``<< 8`` discards the top
byte each step, ``h`` at position ``i`` depends only on bytes
``i-7..i`` (inserted) and ``i-55..i-48`` (evicted). The whole per-byte hash
sequence is therefore computed with 8 numpy passes instead of a Python
loop, then boundaries are resolved with searchsorted over the positions
where the mask fires. Output is identical to the sequential algorithm
(property-tested against a literal port).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

K_DEFAULT_RABIN_POLYNOMIAL = 0x3DA3358B4DC173  # rabin_fingerprint_table.h:11

# include/yams/core/types.h:280-285
MIN_CHUNK_SIZE = 16 * 1024
DEFAULT_CHUNK_SIZE = 256 * 1024
MAX_CHUNK_SIZE = 1024 * 1024
WINDOW_SIZE = 48  # chunker.h:45
CHUNK_MASK = 0x1FFF  # chunker.h:50

_U64 = np.uint64


def make_out_table(polynomial: int = K_DEFAULT_RABIN_POLYNOMIAL) -> np.ndarray:
    """rabin_fingerprint_table.h:16-27 — per-byte XOR of poly << bit."""
    table = np.zeros(256, dtype=_U64)
    for byte in range(256):
        h = 0
        for bit in range(8):
            if byte & (1 << bit):
                h ^= (polynomial << bit) & 0xFFFFFFFFFFFFFFFF
        table[byte] = h
    return table


@dataclass(frozen=True)
class ChunkingConfig:
    min_chunk_size: int = MIN_CHUNK_SIZE
    target_chunk_size: int = DEFAULT_CHUNK_SIZE
    max_chunk_size: int = MAX_CHUNK_SIZE
    window_size: int = WINDOW_SIZE
    chunk_mask: int = CHUNK_MASK
    polynomial: int = K_DEFAULT_RABIN_POLYNOMIAL


#: scaled-down config for web pages: same algorithm, small chunks so that a
#: few-KB page still yields multiple blocking keys (the reference's own unit
#: tests scale the sizes down the same way, tests/unit/chunking/chunking_test.cpp:116-144)
PAGE_CHUNKING = ChunkingConfig(
    min_chunk_size=64, target_chunk_size=256, max_chunk_size=1024, chunk_mask=0xFF
)

_TABLE_CACHE: dict[int, np.ndarray] = {}


def _table(poly: int) -> np.ndarray:
    t = _TABLE_CACHE.get(poly)
    if t is None:
        t = make_out_table(poly)
        _TABLE_CACHE[poly] = t
    return t


def rolling_hash_sequence(data: bytes, cfg: ChunkingConfig = ChunkingConfig()) -> np.ndarray:
    """h_i after inserting byte i (window zero-initialized), vectorized.

    Exactly reproduces the sequential recurrence because any influence older
    than 8 steps has been shifted out of the 64-bit hash.
    """
    n = len(data)
    out_table = _table(cfg.polynomial)
    arr = np.frombuffer(data, dtype=np.uint8)
    w = cfg.window_size
    # 8-zero-padded OUT[new]/OUT[old] arrays: each of the 8 simulation
    # steps below slices a shifted VIEW of these instead of allocating
    # shifted copies, and the hash updates run in-place on one buffer —
    # zero allocations inside the loop (~30% on the whole hash kernel).
    # OUT[0] == 0, so positions < w keep old 0 (zero-initialized ring).
    pad_new = np.zeros(n + 8, dtype=_U64)
    pad_new[8:] = out_table[arr]
    pad_old = np.zeros(n + 8, dtype=_U64)
    if n > w:
        pad_old[8 + w :] = pad_new[8 : 8 + n - w]

    h = np.zeros(n, dtype=_U64)
    eight = _U64(8)
    # simulate the last 8 steps for every position simultaneously; one
    # errstate scope for the whole loop — entering/leaving it per step was
    # ~15% of the kernel (seterr is surprisingly expensive per call)
    with np.errstate(over="ignore"):
        for k in range(7, -1, -1):
            # step inserting byte (i - k): the arrays shifted right by k
            nv = pad_new[8 - k : 8 - k + n]
            ov = pad_old[8 - k : 8 - k + n]
            h -= ov
            h <<= eight
            h ^= nv
    return h


def chunk_boundaries(data: bytes, cfg: ChunkingConfig = ChunkingConfig()) -> list[tuple[int, int]]:
    """(offset, size) list, identical to RabinChunker::chunkData ordering."""
    n = len(data)
    if n == 0:
        return []
    h = rolling_hash_sequence(data, cfg)
    mask = _U64(cfg.chunk_mask)
    match_pos = np.nonzero((h & mask) == mask)[0]

    chunks: list[tuple[int, int]] = []
    pos = 0
    while pos < n:
        min_boundary = min(pos + cfg.min_chunk_size, n)
        max_boundary = min(pos + cfg.max_chunk_size, n)
        # first mask match at i in [min_boundary, max_boundary) -> end = i+1
        lo = np.searchsorted(match_pos, min_boundary, side="left")
        end = max_boundary
        if lo < len(match_pos) and match_pos[lo] < max_boundary:
            end = int(match_pos[lo]) + 1
        chunks.append((pos, end - pos))
        pos = end
    return chunks


def chunk_data(
    data: bytes, cfg: ChunkingConfig = ChunkingConfig()
) -> list[tuple[int, int, str]]:
    """(offset, size, sha256-hex) per chunk — mirrors Chunk{offset,size,hash}
    (rabin_chunker.cpp:133-141; hash via crypto::SHA256Hasher lowercase hex)."""
    return [
        (off, size, hashlib.sha256(data[off : off + size]).hexdigest())
        for off, size in chunk_boundaries(data, cfg)
    ]


# --- literal sequential port, used only to property-test the vectorized path ---


def chunk_boundaries_sequential(
    data: bytes, cfg: ChunkingConfig = ChunkingConfig()
) -> list[tuple[int, int]]:
    """Byte-at-a-time port of findChunkBoundary/chunkDataImpl (:63-148)."""
    out_table = _table(cfg.polynomial)
    n = len(data)
    ring = [0] * cfg.window_size
    ring_pos = 0
    h = 0
    mask64 = 0xFFFFFFFFFFFFFFFF
    chunks: list[tuple[int, int]] = []
    pos = 0
    while pos < n:
        start = pos
        min_boundary = min(start + cfg.min_chunk_size, n)
        max_boundary = min(start + cfg.max_chunk_size, n)
        i = start
        found_end = None
        while i < min_boundary:
            new = data[i]
            old = ring[ring_pos]
            ring[ring_pos] = new
            ring_pos = (ring_pos + 1) % cfg.window_size
            h = (((h - int(out_table[old])) & mask64) << 8) & mask64
            h ^= int(out_table[new])
            i += 1
        while i < max_boundary:
            new = data[i]
            old = ring[ring_pos]
            ring[ring_pos] = new
            ring_pos = (ring_pos + 1) % cfg.window_size
            h = (((h - int(out_table[old])) & mask64) << 8) & mask64
            h ^= int(out_table[new])
            if (h & cfg.chunk_mask) == cfg.chunk_mask:
                found_end = i + 1
                break
            i += 1
        end = found_end if found_end is not None else max_boundary
        chunks.append((start, end - start))
        pos = end
    return chunks
