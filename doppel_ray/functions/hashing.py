"""Vectorized content-hashing kernels (pure functions, no Ray).

Reimplements the semantics of the reference's two-stage hash cascade
(reference internal/scanner/hasher.go:22-92) with libraries available in
this environment:

* **quick hash** — the reference samples the first 8 KiB + last 8 KiB of a
  file and XXH3-64s them (hasher.go:46-92, ``quickHashSize`` at
  hasher.go:12). We sample the same byte windows of the document ``text``
  and hash with SipHash-64 via ``pandas.util.hash_pandas_object``
  (deterministic, vectorized C). Semantic contract preserved exactly
  (pinned by reference hasher_test.go:148-317):
    - size <= 0            -> hash 0                  (hasher.go:47-49)
    - size <  16 KiB       -> hash of first min(size, 8 KiB) bytes only —
      NOTE files in (8 KiB, 16 KiB) hash ONLY their first 8 KiB
      (hasher.go:70-75)
    - size >= 16 KiB       -> hash of (first 8 KiB || last 8 KiB)
* **full hash** — the reference streams the whole file through BLAKE3-256
  (hasher.go:22-42). We hash the whole ``text`` bytes with BLAKE2b-128
  (hashlib, C speed; blake3 is not installed here) and carry the hex digest
  as a string grouping key.

Both operate on a ``pyarrow`` string/binary array and return results
aligned row-for-row; they are called from ``map_batches`` stages with
``batch_format="pyarrow"`` so the byte windows are sliced zero-copy by
Arrow compute kernels before any Python-object materialization.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

QUICK_HASH_SIZE = 8 * 1024  # reference hasher.go:12 (quickHashSize)
_SIP_KEY_QUICK = "doppelray.quick!"  # 16 bytes, fixed -> deterministic across procs


def _as_large_binary(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Cast a string/large_string column to large_binary (zero-copy view)."""
    typ = arr.type
    if pa.types.is_large_string(typ) or pa.types.is_string(typ):
        target = pa.large_binary() if pa.types.is_large_string(typ) else pa.binary()
        return pc.cast(arr, target)
    return arr


def byte_lengths(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """UTF-8 byte length per row (int64). The corpus analog of file size."""
    data = _as_large_binary(arr)
    return pc.binary_length(data).to_numpy(zero_copy_only=False).astype(np.int64)


def quick_hash(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Sampled 64-bit quick hash of each row's bytes (see module docstring).

    Returns uint64 ndarray aligned with ``arr``.
    """
    data = _as_large_binary(arr)
    n = pc.binary_length(data).to_numpy(zero_copy_only=False).astype(np.int64)
    # First window: min(size, 8 KiB) bytes. Arrow slices without copying the
    # full payload; only <=8 KiB/row reaches Python object land.
    prefix = pc.binary_slice(data, 0, QUICK_HASH_SIZE).to_pandas()
    # Reference branch at hasher.go:70: `size < quickHashSize*2` hashes only
    # the first read; >= 16 KiB hashes first 8 KiB + last 8 KiB.
    big = n >= 2 * QUICK_HASH_SIZE
    if bool(big.any()):
        suffix = pc.binary_slice(data, -QUICK_HASH_SIZE, None).to_pandas()
        # elementwise bytes concat only for the big rows
        sampled = prefix.copy()
        sampled[big] = prefix[big] + suffix[big]
    else:
        sampled = prefix
    h = pd.util.hash_pandas_object(
        sampled, index=False, hash_key=_SIP_KEY_QUICK
    ).to_numpy()
    h = h.copy()
    h[n <= 0] = 0  # reference hasher.go:47-49
    return h


def content_hash(arr: pa.Array | pa.ChunkedArray) -> list[str]:
    """Full-content 128-bit BLAKE2b hex digest per row.

    The full-hash analog of reference hasher.go:22-42 (BLAKE3-256 there);
    128 bits keeps collision probability negligible at 10^12 docs
    (~5e-15 birthday bound) while halving shuffle bytes vs 256-bit.
    """
    data = _as_large_binary(arr)
    if isinstance(data, pa.ChunkedArray):
        chunks = data.chunks
    else:
        chunks = [data]
    out: list[str] = []
    for chunk in chunks:
        # buffers()[2] is the data buffer; iterate per-row memoryviews
        # without concatenating. as_py() copies, but hashing dominates.
        out.extend(
            hashlib.blake2b(v.as_py(), digest_size=16).hexdigest()
            if v.is_valid
            else ""
            for v in chunk
        )
    return out


def sip64(values: pd.Series | np.ndarray | list, key: str = _SIP_KEY_QUICK) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a string/bytes series."""
    s = values if isinstance(values, pd.Series) else pd.Series(values)
    return pd.util.hash_pandas_object(s, index=False, hash_key=key).to_numpy()


# Odd multiplier for 64-bit multiply-shift mixing (splitmix64 constant).
_MIX_MULT = np.uint64(0x9E3779B97F4A7C15)


def mix_columns_u64(cols: list[np.ndarray]) -> np.ndarray:
    """Combine several uint64 columns into one (for band keys etc.)."""
    acc = np.zeros_like(cols[0], dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in cols:
            acc = (acc ^ c.astype(np.uint64)) * _MIX_MULT
            acc ^= acc >> np.uint64(29)
    return acc
