"""Suffix-array and rolling-hash kernels for exact-substring containment.

Everything here is driver/worker-local numpy; the distributed plumbing
lives in ``doppel_ray.stages.substring``. Algorithms are public classics:
prefix-doubling suffix array construction (Manber-Myers 1990) fully
vectorized with ``np.lexsort``, O(n log^2 n); binary-search substring
lookup over the suffix array; and an invertible polynomial rolling hash
(mod 2^64, odd multiplier) for content-defined anchor grams in the style
of content-defined chunking (Rabin fingerprinting / FastCDC).
"""

from __future__ import annotations

import numpy as np

# Odd 64-bit multiplier (golden-ratio constant | 1) — invertible mod 2^64,
# so window hashes come from prefix sums with no sequential dependency.
_R = 0x9E3779B97F4A7C15 | 1
_R_INV = pow(_R, -1, 1 << 64)


def suffix_array(data: bytes | np.ndarray) -> np.ndarray:
    """Suffix array of ``data`` by prefix doubling (Manber-Myers).

    Returns int64 positions such that the suffixes data[sa[0]:] <
    data[sa[1]:] < ... Fully vectorized: each doubling round is one
    ``np.lexsort`` + one ranks recompute; terminates early once all
    ranks are distinct.
    """
    b = np.frombuffer(data, dtype=np.uint8) if isinstance(data, bytes) else data
    n = len(b)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = b.astype(np.int64)
    k = 1
    while True:
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        r_ord = rank[order]
        s_ord = second[order]
        changed = (r_ord[1:] != r_ord[:-1]) | (s_ord[1:] != s_ord[:-1])
        new_vals = np.concatenate(([0], np.cumsum(changed.astype(np.int64))))
        if new_vals[-1] == n - 1:
            return order
        rank = np.empty(n, dtype=np.int64)
        rank[order] = new_vals
        k *= 2


def _cmp_at(data: bytes, pos: int, probe: bytes) -> int:
    """-1/0/+1 comparison of data[pos:pos+len(probe)] vs probe."""
    seg = data[pos : pos + len(probe)]
    if seg < probe:
        return -1
    if seg > probe:
        return 1
    return 0


def sa_find_all(data: bytes, sa: np.ndarray, probe: bytes) -> np.ndarray:
    """All start offsets of ``probe`` in ``data``: two O(m log n) binary
    searches bound the suffix-array range whose suffixes start with
    ``probe``."""
    m = len(probe)
    if m == 0 or len(sa) == 0:
        return np.empty(0, dtype=np.int64)
    lo, hi = 0, len(sa)
    while lo < hi:  # lower bound: first suffix >= probe
        mid = (lo + hi) // 2
        if _cmp_at(data, int(sa[mid]), probe) < 0:
            lo = mid + 1
        else:
            hi = mid
    start = lo
    hi = len(sa)
    while lo < hi:  # upper bound: first suffix whose prefix > probe
        mid = (lo + hi) // 2
        if _cmp_at(data, int(sa[mid]), probe) <= 0:
            lo = mid + 1
        else:
            hi = mid
    return np.sort(sa[start:lo])


def window_hashes(data: bytes | np.ndarray, w: int) -> np.ndarray:
    """Polynomial hash of every w-byte window, vectorized via invertible
    prefix sums: H[i] = sum_{j<w} data[i+j] * R^(w-1-j) mod 2^64.

    Content-only: the hash of a window depends on its bytes alone, so the
    same window content hashes identically at any offset in any document
    — the property that makes content-defined anchors align between a
    contained document and its container.
    """
    b = np.frombuffer(data, dtype=np.uint8) if isinstance(data, bytes) else data
    n = len(b)
    if n < w:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        j = np.arange(n, dtype=np.uint64)
        rinv_pow = np.empty(n, dtype=np.uint64)
        rinv_pow[0] = 1
        if n > 1:
            np.cumprod(np.full(n - 1, _R_INV, dtype=np.uint64), out=rinv_pow[1:])
        terms = b.astype(np.uint64) * rinv_pow
        q = np.zeros(n + 1, dtype=np.uint64)
        np.cumsum(terms, out=q[1:])
        # H[i] = (Q[i+w] - Q[i]) * R^(i+w-1)
        r_pow = np.empty(n - w + 1, dtype=np.uint64)
        r_pow[0] = pow(_R, w - 1, 1 << 64)
        if n - w > 0:
            np.cumprod(
                np.full(n - w, _R, dtype=np.uint64), out=r_pow[1:]
            )
            r_pow[1:] *= r_pow[0]
        return (q[w:] - q[:-w]) * r_pow


def anchor_grams(data: bytes, w: int, p: int) -> np.ndarray:
    """Content-defined anchor gram hashes: window hashes at positions
    where ``hash % p == p - 1`` (expected one anchor per ``p`` bytes).
    Selection depends only on window content, so every anchor of a
    contained document recurs verbatim as an anchor of its container.
    Returns the (possibly repeated) uint64 gram hashes; empty for
    documents shorter than ``w`` or with no qualifying window.
    """
    wh = window_hashes(data, w)
    if len(wh) == 0:
        return wh
    sel = wh % np.uint64(p) == np.uint64(p - 1)
    return np.unique(wh[sel])
