"""Vectorized text kernels: normalization, shingle hashing, MinHash
signatures, SimHash. Pure numpy/pandas/pyarrow — no Ray.

These stages have no counterpart in the reference (a whole-file hasher);
they generalize its cheap-invariant -> cheap-hash -> full-hash cascade
(reference internal/finder/finder.go:44-146) to *near*-duplicate detection
as mandated by the north rule. Algorithms are the published standards:
MinHash (Broder 1997, "On the resemblance and containment of documents"),
LSH banding (Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets" ch.3),
SimHash (Charikar 2002).

Design notes (hot path, called from map_batches):
- Shingling + MinHash is ONE numpy pass over the batch's concatenated
  UTF-8 bytes: docs are joined with 0xFF separators (0xFF never occurs in
  valid UTF-8), char-n-gram windows come from ``sliding_window_view``, a
  polynomial rolling hash vectorizes over all windows, and per-doc minima
  use ``np.minimum.reduceat`` — no Python loop over rows or shingles.
- Permutations are multiply-add maps x -> a*x + b (mod 2^64) with odd
  ``a``: exact bijections of Z_2^64, the textbook MinHash permutation
  family, computed with natural uint64 wraparound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_POLY = np.uint64(1099511628211)  # FNV-64 prime as rolling-hash base
_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def normalize_texts(arr: pa.Array | pa.ChunkedArray) -> pd.Series:
    """Dedup-normalization: lowercase + collapse whitespace runs + strip.

    Used ONLY for shingling/signatures; the corpus ``text`` column itself
    passes through byte-identical (north-rule invariant).

    The whitespace class is spelled as RE2's ASCII-only ``\\s`` =
    ``[\\t\\n\\f\\r ]`` and the strip is space-only, so the DuckDB
    oracles' ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))``
    reproduces this rule EXACTLY on non-ASCII whitespace too (Python's
    Unicode ``\\s`` would also collapse NBSP etc. and diverge).
    """
    low = pc.utf8_lower(arr)
    s = low.to_pandas()
    return s.str.replace(r"[\t\n\f\r ]+", " ", regex=True).str.strip(" ")


def make_permutations(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) multiply-add permutation parameters; ``a`` odd (bijective)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    return a, b


def _concat_docs(byte_docs: list[bytes], n: int) -> tuple[np.ndarray, np.ndarray]:
    """Join docs (each padded to >= n bytes) with n 0xFF separator bytes.

    Returns (buffer uint8 array, per-doc padded lengths)."""
    padded = [d if len(d) >= n else d.ljust(n, b"\x00") for d in byte_docs]
    lens = np.fromiter((len(d) for d in padded), count=len(padded), dtype=np.int64)
    blob = (b"\xff" * n).join(padded)
    return np.frombuffer(blob, dtype=np.uint8), lens


def shingle_hashes(byte_docs: list[bytes], n: int) -> tuple[np.ndarray, np.ndarray]:
    """64-bit rolling hashes of every char-n-gram of every doc.

    Returns (hashes, doc_offsets): ``hashes`` is the concatenation of each
    doc's shingle hashes (multiset, not deduped — min() is unaffected);
    ``doc_offsets[i]`` is the start of doc i's slice (len == n_docs,
    offsets[i+1] or len(hashes) ends it). Empty/short docs are padded to
    one shingle.
    """
    if not byte_docs:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    buf, lens = _concat_docs(byte_docs, n)
    if len(buf) < n:
        buf = np.pad(buf, (0, n - len(buf)))
    # Horner's rule across window columns: h_i = ((b[i]*P + b[i+1])*P + ...)
    # — n fused passes over a 1-D array instead of materializing an
    # (n_windows x n) matrix (measured ~50x faster than the matmul form).
    n_windows = len(buf) - n + 1
    hashes_all = np.zeros(n_windows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(n):
            hashes_all *= _POLY
            hashes_all += buf[j : j + n_windows]
    # Windows overlapping a separator are invalid — and separator positions
    # are KNOWN from the doc lengths (no byte scan needed): doc i's valid
    # windows start at cat_start_i = sum(lens[:i]) + i*n and number
    # lens[i]-n+1. One ragged gather extracts them.
    counts = lens - n + 1  # valid windows per doc (>=1 by padding)
    offsets = np.concatenate([[0], np.cumsum(counts, dtype=np.int64)[:-1]])
    cat_starts = np.concatenate(
        [[0], np.cumsum(lens + n, dtype=np.int64)[:-1]]
    )
    total = int(offsets[-1] + counts[-1])
    idx = (
        np.arange(total, dtype=np.int64)
        - np.repeat(offsets, counts)
        + np.repeat(cat_starts, counts)
    )
    valid = hashes_all[idx]
    return valid, offsets


def minhash_from_shingles(
    hashes: np.ndarray, offsets: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signature matrix (n_docs x num_perm, uint64) via
    ``np.minimum.reduceat`` per permutation — vectorized across all docs."""
    num_perm = len(a)
    n_docs = len(offsets)
    sigs = np.empty((n_docs, num_perm), dtype=np.uint64)
    if n_docs == 0:
        return sigs
    with np.errstate(over="ignore"):
        for j in range(num_perm):
            y = a[j] * hashes + b[j]
            sigs[:, j] = np.minimum.reduceat(y, offsets)
    return sigs


def minhash_signatures(
    byte_docs: list[bytes], n: int, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    hashes, offsets = shingle_hashes(byte_docs, n)
    return minhash_from_shingles(hashes, offsets, a, b)


def oph_signatures(
    hashes: np.ndarray, offsets: np.ndarray, num_perm: int, seed: int
) -> np.ndarray:
    """One-permutation MinHash (Li/Owen/Zhang, NIPS 2012) with circular
    rotation densification (Shrivastava/Li, ICML 2014).

    ONE mixed-hash pass replaces the classic kernel's ``num_perm``
    multiply-add passes: each shingle lands in bin ``h % num_perm``, the
    per-(doc, bin) minimum is one vectorized ``np.minimum.at`` (numpy's
    fast path for integer minimum scatter), and empty bins borrow the
    nearest filled bin's value to their left (circularly), keeping the
    collision probability of aligned bins at the Jaccard similarity.
    ~30x cheaper than the classic kernel at the bench shingle rate;
    capture statistics are re-pinned by the recall harness
    (tests/test_minhash.py: recall >= 0.99 at the default config).
    """
    P = num_perm
    n_docs = len(offsets)
    MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
    sig = np.full(n_docs * P, MAX, dtype=np.uint64)
    if len(hashes) and n_docs:
        counts = np.diff(np.concatenate([offsets, [len(hashes)]]))
        doc_ids = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        with np.errstate(over="ignore"):
            h = (hashes + np.uint64(seed)) * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(33)
        if P & (P - 1) == 0:  # power-of-two num_perm: mask beats modulo 10x
            bins = (h & np.uint64(P - 1)).astype(np.int64)
        else:
            bins = (h % np.uint64(P)).astype(np.int64)
        np.minimum.at(sig, doc_ids * P + bins, h)
    sig = sig.reshape(n_docs, P)
    filled = sig != MAX
    if filled.all():
        return sig
    any_f = filled.any(axis=1)
    ar = np.arange(P)
    # circular forward-fill of the last filled bin index: duplicate the
    # index row, running-max, keep the right half (wraps around)
    idx = np.where(filled, ar[None, :], -1)
    idx2 = np.concatenate(
        [idx, np.where(filled, ar[None, :] + P, -1)], axis=1
    )
    ff = np.maximum.accumulate(idx2, axis=1)[:, P:]
    src = np.maximum(ff, 0) % P
    out = np.take_along_axis(sig, src, axis=1)
    out[~any_f] = 0  # shingle-less docs: all-zero signature (as classic)
    return out


def band_keys(sigs: np.ndarray, bands: int, seed: int = 0) -> np.ndarray:
    """Fold each signature band into one int64 LSH key (n_docs x bands).

    The band index is mixed into the key, so a single-column groupby on the
    flattened keys partitions by (band_id, band_hash) jointly.
    """
    n_docs, num_perm = sigs.shape
    rows = num_perm // bands
    assert bands * rows == num_perm, "num_perm must be divisible by bands"
    view = sigs[:, : bands * rows].reshape(n_docs, bands, rows)
    mult = np.uint64(0x9E3779B97F4A7C15)
    acc = np.zeros((n_docs, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for r in range(rows):
            acc = (acc ^ view[:, :, r]) * mult
            acc ^= acc >> np.uint64(29)
        band_ids = (np.arange(bands, dtype=np.uint64) + np.uint64(seed)) * mult
        acc = (acc ^ band_ids[None, :]) * mult
        acc ^= acc >> np.uint64(31)
    return acc.view(np.int64)


def exact_jaccard(set_a: np.ndarray, set_b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique shingle-hash arrays."""
    if len(set_a) == 0 and len(set_b) == 0:
        return 1.0
    inter = np.intersect1d(set_a, set_b, assume_unique=True).size
    union = set_a.size + set_b.size - inter
    return inter / union if union else 1.0


def unique_shingles(byte_docs: list[bytes], n: int) -> list[np.ndarray]:
    """Sorted-unique shingle-hash set per doc (for exact verification)."""
    hashes, offsets = shingle_hashes(byte_docs, n)
    ends = np.concatenate([offsets[1:], [len(hashes)]])
    return [np.unique(hashes[s:e]) for s, e in zip(offsets, ends)]


# ---------------------------------------------------------------- SimHash

_TOKEN_RE = r"\S+"


def md5_token_hash64(tokens: np.ndarray) -> np.ndarray:
    """uint64 token hash = little-endian first 8 bytes of md5(utf-8 token)
    — exactly DuckDB's ``md5_number_upper``, making SimHash fingerprints
    SQL-oracle-reproducible. Unique-token caching keeps the Python md5
    loop off the hot path (corpus tokens are highly repetitive)."""
    import hashlib

    uniq, inv = np.unique(tokens, return_inverse=True)
    h = np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
            for t in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    return h[inv]


def simhash_signatures(
    texts: pd.Series,
    hash_key: str = "doppelray.simh.!",
    token_hash: str = "pandas",
) -> np.ndarray:
    """64-bit SimHash per doc (Charikar 2002): token-hash bit votes weighted
    by token frequency; vectorized via one exploded token Series + reduceat.

    ``token_hash="md5"`` swaps the default pandas token hash for the
    md5-derived one (``md5_token_hash64``) so the fingerprint — and hence
    the whole near-dup pair set — can be recomputed verbatim by a DuckDB
    SQL oracle (md5_number_upper + bit arithmetic). Same signer, same
    majority-vote rule; only the per-token hash function changes.
    """
    toks = texts.str.findall(_TOKEN_RE)
    counts = toks.str.len().fillna(0).astype(np.int64).to_numpy()
    flat = toks.explode().dropna()
    n_docs = len(texts)
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(flat) == 0:
        return out.view(np.int64)
    if token_hash == "md5":
        th = md5_token_hash64(flat.to_numpy())
    else:
        th = pd.util.hash_pandas_object(flat, index=False, hash_key=hash_key).to_numpy()
    nonzero = counts > 0
    # segmented bit-count per doc via per-BYTE integer histograms: for
    # each of the 8 hash bytes, one unweighted bincount over the key
    # (doc_id << 8 | byte_value) gives a (docs x 256) byte-value
    # histogram, and a tiny (256 x 8) bit-table matmul folds it into the
    # 8 bit positions. Measured 2.05s vs 7.4s for 64 per-bit weighted
    # bincounts vs ~30s for axis-0 reduceat (2.4M tokens, 20k docs) —
    # integer bincount beats the float-weights path and 8 passes beat
    # 64. Bit b of the signature is set iff more than half the tokens
    # vote 1: sum(2*bit-1) > 0  <=>  2*bitsum > count.
    doc_ids = np.repeat(np.arange(n_docs), counts)
    hash_bytes = th.view(np.uint8).reshape(-1, 8)
    bit_table = np.unpackbits(
        np.arange(256, dtype=np.uint8)[:, None], axis=1, bitorder="little"
    ).astype(np.int64)
    bitsums = np.empty((n_docs, 64), dtype=np.int64)
    base = doc_ids << 8
    for b in range(8):
        hist = np.bincount(
            base | hash_bytes[:, b], minlength=n_docs * 256
        ).reshape(n_docs, 256)
        bitsums[:, b * 8 : (b + 1) * 8] = hist @ bit_table
    sig_bits = (2 * bitsums > counts[:, None]).astype(np.uint8)
    packed = np.packbits(sig_bits, axis=1, bitorder="little").view(np.uint64).ravel()
    packed = np.where(nonzero, packed, np.uint64(0))
    return packed.view(np.int64)


def hamming_distance64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of XOR for int64/uint64 arrays."""
    x = (a.view(np.uint64) ^ b.view(np.uint64)).view(np.uint8).reshape(-1, 8)
    return np.unpackbits(x, axis=1).sum(axis=1).astype(np.int64)
