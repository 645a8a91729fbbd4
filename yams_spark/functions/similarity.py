"""Pairwise similarity kernels.

* ``cosine_similarity`` — exact port of
  ``/root/reference/src/vector/vector_database.cpp:1786-1810``: double
  accumulation over float32 inputs, 0.0 on length mismatch or zero norm.
* ``cosine_matrix`` — the same math vectorized over a batch (float64
  accumulation, fixed operand order ⇒ bit-stable across partitions).
* ``levenshtein`` / ``jaro_winkler`` — standard definitions (additions
  required by the north star; the reference has SymSpell edit distance,
  src/search/symspell_search.cpp:25-29, which bounds distance ≤2 — our
  full DP is a superset used for pair features).
* ``hamming64`` — bit distance between 64-bit SimHash signatures.
"""

from __future__ import annotations

import numpy as np


def cosine_similarity(a, b) -> float:
    """vector_database.cpp:1786-1810, double accumulation.

    Delegates to ``cosine_matrix`` with a 1-row batch so the scalar and the
    batched pipeline path share one summation order (einsum is per-row
    batch-size-invariant) — pair scores are bit-identical either way.
    """
    a = np.asarray(a, dtype=np.float32)
    b = np.asarray(b, dtype=np.float32)
    if a.size != b.size:
        return 0.0
    return float(cosine_matrix(a.reshape(1, -1), b.reshape(1, -1))[0])


def cosine_matrix(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Row-wise cosine between two (n, d) float32 batches, float64 math.

    The result is truncated through float32 before being returned: the
    reference trace's cosineSimilarity returns ``float``
    (static_cast<float> in dedupe.cpp) before the 0.92/0.975 gates, so the
    near-gate accept/reject decisions here match the C++ bit-for-bit.
    Both the Spark scoring stage and the pure-Python oracle go through this
    one kernel, so pipeline/oracle parity is preserved by construction.
    """
    # dtype=float64 makes einsum upcast per cache-sized block instead of
    # materializing full float64 copies of both operands first — bit-equal
    # to the astype path (fuzz + 100k real-embedding pairs verified) and
    # ~12x faster on float32 input; float64 input passes through unchanged.
    dots = np.einsum("ij,ij->i", left, right, dtype=np.float64)
    na = np.sqrt(np.einsum("ij,ij->i", left, left, dtype=np.float64))
    nb = np.sqrt(np.einsum("ij,ij->i", right, right, dtype=np.float64))
    denom = na * nb
    out = np.zeros(len(left), dtype=np.float64)
    nz = denom != 0.0
    out[nz] = dots[nz] / denom[nz]
    return out.astype(np.float32).astype(np.float64)


def levenshtein(a: str, b: str) -> int:
    """Classic DP edit distance (two-row)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) > len(b):
        a, b = b, a
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, start=1):
        cur = [j] + [0] * len(a)
        for i, ca in enumerate(a, start=1):
            cost = 0 if ca == cb else 1
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + cost)
        prev = cur
    return prev[-1]


def jaro(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    match_window = max(la, lb) // 2 - 1
    if match_window < 0:
        match_window = 0
    a_flags = [False] * la
    b_flags = [False] * lb
    matches = 0
    for i in range(la):
        lo = max(0, i - match_window)
        hi = min(lb, i + match_window + 1)
        for j in range(lo, hi):
            if not b_flags[j] and a[i] == b[j]:
                a_flags[i] = b_flags[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(la):
        if a_flags[i]:
            while not b_flags[j]:
                j += 1
            if a[i] != b[j]:
                transpositions += 1
            j += 1
    transpositions //= 2
    m = matches
    return (m / la + m / lb + (m - transpositions) / m) / 3.0


def jaro_winkler(a: str, b: str, prefix_scale: float = 0.1, max_prefix: int = 4) -> float:
    base = jaro(a, b)
    prefix = 0
    for ca, cb in zip(a, b):
        if ca != cb or prefix >= max_prefix:
            break
        prefix += 1
    return base + prefix * prefix_scale * (1.0 - base)


def hamming64(x: int, y: int) -> int:
    return int(bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1"))


def hamming64_array(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit Hamming distance over int64/uint64 arrays."""
    z = (x.astype(np.uint64) ^ y.astype(np.uint64)).view(np.uint8)
    return np.unpackbits(z.reshape(len(x), 8), axis=1).sum(axis=1).astype(np.int32)


def levenshtein_batch(a_list, b_list) -> np.ndarray:
    """Levenshtein distance for a batch of string pairs, vectorized across
    the batch: the DP's (i, j) loops stay in Python but every cell update
    is one numpy op over the whole batch. Before the DP, the shared prefix
    and suffix of each pair are stripped (edit distance is invariant under
    both — the aligned common run costs 0 and no alignment does better),
    which collapses the DP grid to the edit region only: near-duplicate
    url pairs share most of their bytes, so the stripped grid is a few
    cells where the naive grid is thousands (~3x measured on real accepted
    pairs, equality fuzz-tested against the scalar DP). Byte-wise over
    UTF-8 (identical to the per-pair DP for ASCII inputs, and consistent
    either way since both sides use the same encoding)."""
    n = len(a_list)
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    a_bytes = [s.encode("utf-8") for s in a_list]
    b_bytes = [s.encode("utf-8") for s in b_list]
    la = np.fromiter((len(x) for x in a_bytes), dtype=np.int32, count=n)
    lb = np.fromiter((len(x) for x in b_bytes), dtype=np.int32, count=n)
    w = int(max(int(la.max()), int(lb.max()), 1))
    A = np.zeros((n, w), dtype=np.uint8)
    B = np.zeros((n, w), dtype=np.uint8)
    for k, s in enumerate(a_bytes):
        A[k, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    for k, s in enumerate(b_bytes):
        B[k, : len(s)] = np.frombuffer(s, dtype=np.uint8)

    ar = np.arange(w, dtype=np.int32)
    mn = np.minimum(la, lb)
    # common-prefix length per pair
    neq = (A != B) | (ar[None, :] >= mn[:, None])
    any_neq = neq.any(axis=1)
    p = np.where(any_neq, np.argmax(neq, axis=1), mn).astype(np.int32)
    # common-suffix length of the remainder, via reversed-padded views
    rows = np.arange(n)[:, None]
    ridx_a = la[:, None] - 1 - ar[None, :]
    Ar = np.where(ridx_a >= 0, A[rows, np.clip(ridx_a, 0, w - 1)], 0)
    ridx_b = lb[:, None] - 1 - ar[None, :]
    Br = np.where(ridx_b >= 0, B[rows, np.clip(ridx_b, 0, w - 1)], 0)
    rem = mn - p
    neq_s = (Ar != Br) | (ar[None, :] >= rem[:, None])
    any_s = neq_s.any(axis=1)
    s_ = np.where(any_s, np.argmax(neq_s, axis=1), rem).astype(np.int32)

    la2 = la - p - s_
    lb2 = lb - p - s_
    out = np.zeros(n, dtype=np.int32)
    act = (la2 > 0) & (lb2 > 0)
    # one stripped side empty -> distance is the other side's length
    out[~act] = np.maximum(la2, lb2)[~act]
    if act.any():
        la3 = la2[act]
        lb3 = lb2[act]
        p3 = p[act]
        m = int(act.sum())
        wa = int(la3.max())
        wb = int(lb3.max())
        arows = np.arange(m)[:, None]
        idx = p3[:, None] + np.arange(wa, dtype=np.int32)[None, :]
        A2 = np.where(
            np.arange(wa)[None, :] < la3[:, None],
            A[act][arows, np.clip(idx, 0, w - 1)], 0,
        )
        idxb = p3[:, None] + np.arange(wb, dtype=np.int32)[None, :]
        B2 = np.where(
            np.arange(wb)[None, :] < lb3[:, None],
            B[act][arows, np.clip(idxb, 0, w - 1)], 0,
        )
        res = np.zeros(m, dtype=np.int32)
        prev = np.broadcast_to(
            np.arange(wb + 1, dtype=np.int32), (m, wb + 1)
        ).copy()
        cur = np.empty((m, wb + 1), dtype=np.int32)
        for i in range(1, wa + 1):
            cur[:, 0] = i
            ai = A2[:, i - 1]
            for j in range(1, wb + 1):
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1, out=cur[:, j])
                np.minimum(
                    cur[:, j], prev[:, j - 1] + (ai != B2[:, j - 1]),
                    out=cur[:, j],
                )
            done = la3 == i
            if done.any():
                res[done] = cur[done, lb3[done]]
            prev, cur = cur, prev
        out[act] = res
    return out
