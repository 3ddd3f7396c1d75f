"""HyperLogLog distinct-count sketch (Flajolet-Fuchs-Gandouet-Meunier
2007, with the small-range linear-counting correction) — the "novel
sketch" custom-operator slot of the build brief.

Why a sketch at 100 TB: COUNT(DISTINCT text) exactly requires an
all-to-all shuffle of every key; the HLL register array is 2^p bytes
(16 KiB at p=14, ~0.8% relative error), each block folds its rows into
registers locally, and the merge is an elementwise max — associative,
commutative, driver-trivial. Distinct-count ACCURACY is pinned by tests
(tests/test_sketch.py), not a SQL oracle — approximate by design, like
``ivf_topk``.

All register math is vectorized numpy over 64-bit sip hashes. The
leading-zero rank uses float64 log2, exact because the remaining
(64-p)-bit suffix is < 2^53 for p >= 11 (doc'd guard below).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from doppel_ray.functions.hashing import sip64


def empty_registers(p: int = 14) -> np.ndarray:
    if not 11 <= p <= 18:
        # p >= 11 keeps the (64-p)-bit suffix < 2^53 (exact in float64);
        # p <= 18 bounds the register array (256 KiB)
        raise ValueError("p must be in [11, 18]")
    return np.zeros(1 << p, dtype=np.uint8)


def add_hashes(reg: np.ndarray, h: np.ndarray, p: int = 14) -> np.ndarray:
    """Fold uint64 hashes into the register array (in place, returned)."""
    if len(h) == 0:
        return reg
    h = h.astype(np.uint64, copy=False)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)  # low 64-p suffix bits
    # rho = leading-zero count of the (64-p)-bit suffix + 1
    #     = (64 - p) - floor(log2(w)) for w > 0, else (64 - p) + 1
    rho = np.empty(len(w), dtype=np.uint8)
    nz = w > 0
    rho[~nz] = 64 - p + 1
    with np.errstate(divide="ignore"):
        rho[nz] = (64 - p) - np.floor(np.log2(w[nz].astype(np.float64))).astype(
            np.int64
        )
    np.maximum.at(reg, idx, rho)
    return reg


def add_values(reg: np.ndarray, values, p: int = 14) -> np.ndarray:
    """Fold a string/bytes column (pandas Series / numpy / list)."""
    return add_hashes(reg, sip64(pd.Series(values)), p=p)


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Associative, commutative register merge."""
    return np.maximum(a, b)


def estimate(reg: np.ndarray) -> float:
    """Cardinality estimate with the standard small-range correction."""
    m = len(reg)
    alpha = 0.7213 / (1 + 1.079 / m)  # the paper's alpha_m for m >= 128
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros > 0:
        return m * np.log(m / zeros)  # linear counting
    return float(est)


class BloomFilter:
    """Vectorized Bloom filter over 64-bit sip hashes — the documented
    drop-in for the broadcast dup-key set when distinct keys outgrow
    driver memory (exact.py module scale note: ~10 bits/key vs 8 B/key,
    an ~6x broadcast shrink with FP rate ~1%).

    NO false negatives ever (a member always tests true), so it is safe
    exactly where the dedup cascade uses key sets: a false positive lets
    a non-duplicate row through to the next (exact) stage — extra work,
    never a wrong answer. It must NOT back an anti-join that drops rows
    terminally.

    k index functions are derived from one 64-bit hash by the standard
    double-hashing construction h1 + i*h2 (Kirsch-Mitzenmacher 2006),
    vectorized over the whole key array.
    """

    def __init__(self, n_keys: int, bits_per_key: int = 10):
        self.m = int(max(64, n_keys * bits_per_key))
        self.k = max(1, round(0.693 * bits_per_key))  # ln2 * m/n
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    #: keys processed per chunk — bounds peak extra memory at O(chunk)
    #: regardless of key-array size (the >50M-key regime is the whole
    #: point of this filter; a (k x n) position matrix there is ~3 GB)
    _CHUNK = 4_000_000

    def _h1h2(self, h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = h.astype(np.uint64, copy=False)
        with np.errstate(over="ignore"):
            h2 = (h ^ (h >> np.uint64(33))) * np.uint64(
                0xFF51AFD7ED558CCD
            ) | np.uint64(1)
        return h, h2

    def add_hashes(self, h: np.ndarray) -> None:
        for lo in range(0, len(h), self._CHUNK):
            h1, h2 = self._h1h2(h[lo : lo + self._CHUNK])
            for i in range(self.k):
                with np.errstate(over="ignore"):
                    pos = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
                np.bitwise_or.at(
                    self.bits,
                    (pos >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (pos & np.uint64(63)),
                )

    def add_values(self, values) -> None:
        self.add_hashes(sip64(pd.Series(values)))

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        out = np.empty(len(h), dtype=bool)
        for lo in range(0, len(h), self._CHUNK):
            h1, h2 = self._h1h2(h[lo : lo + self._CHUNK])
            ok = np.ones(len(h1), dtype=bool)
            for i in range(self.k):
                with np.errstate(over="ignore"):
                    pos = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
                word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
                ok &= ((word >> (pos & np.uint64(63))) & np.uint64(1)).astype(bool)
            out[lo : lo + len(h1)] = ok
        return out

    def contains_values(self, values) -> np.ndarray:
        return self.contains_hashes(sip64(pd.Series(values)))


class BottomKSample:
    """Deterministic bottom-k row sample — the mergeable quantile/
    distribution sketch (KMV-style: Bar-Yossef et al. 2002 on distinct
    elements, applied here to ROW sampling by hashing a unique row key).

    Keeping the ``k`` rows with the smallest ``sip64(row_key)`` yields a
    uniform random sample of the rows that is (a) a pure function of
    the row SET — identical at any block layout, cluster size, or merge
    order, (b) mergeable by concat + re-prune (associative/commutative),
    and (c) 16 B/row of state. Any quantile estimated from the sample
    carries rank error O(sqrt(p(1-p)/k)) with high probability —
    ~0.008 std at the median for k = 4096 — vs the exact path's full
    value histogram exchange (stages/quantiles.py).
    """

    def __init__(self, k: int = 4096):
        if k < 16:
            raise ValueError("k must be >= 16")
        self.k = k
        self.hashes = np.empty(0, dtype=np.uint64)
        self.values = np.empty(0, dtype=np.float64)

    def add(self, h: np.ndarray, v: np.ndarray) -> "BottomKSample":
        """Fold (hash, value) rows; keeps the k smallest hashes."""
        if len(h):
            self.hashes = np.concatenate([self.hashes, h.astype(np.uint64)])
            self.values = np.concatenate(
                [self.values, v.astype(np.float64)]
            )
            self._prune()
        return self

    def merge(self, other: "BottomKSample") -> "BottomKSample":
        return self.add(other.hashes, other.values)

    def _prune(self) -> None:
        if len(self.hashes) > self.k:
            idx = np.argpartition(self.hashes, self.k)[: self.k]
            self.hashes = self.hashes[idx]
            self.values = self.values[idx]

    def to_bytes(self) -> bytes:
        return self.hashes.tobytes() + self.values.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes, k: int = 4096) -> "BottomKSample":
        n = len(buf) // 16
        out = cls(k)
        out.hashes = np.frombuffer(buf[: 8 * n], dtype=np.uint64).copy()
        out.values = np.frombuffer(buf[8 * n :], dtype=np.float64).copy()
        out._prune()
        return out

    def quantile(self, p: float) -> float:
        """quantile_disc rule over the sample (same index arithmetic as
        stages/quantiles.py, so sketch -> exact comparisons are
        apples-to-apples)."""
        import math

        if len(self.values) == 0:
            raise ValueError("empty sketch")
        v = np.sort(self.values)
        idx = max(math.ceil(p * len(v)) - 1, 0)
        return float(v[idx])
