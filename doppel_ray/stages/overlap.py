"""K-way pairwise distinct-set overlap — the corpus-audit matrix
"how much does each source's vocabulary / n-gram set overlap with each
other source's" for ALL k*(k-1)/2 pairs in ONE pass, without running
the 2-side set operation (stages/setops.py) k^2 times.

Shape: each row is tagged with a ``uint32`` side BITMASK (bit i = the
value occurs in side i; k <= 32). Batches fold to their distinct
(value, ORed mask) pairs, ONE bucketed hash shuffle co-locates equal
values, each bucket ORs masks per distinct value and then collapses to
``(mask, count)`` rows — so what reaches the driver is bounded by
``num_buckets x distinct-masks``, never the value stream. Every
pairwise statistic is then pure arithmetic over the tiny mask
histogram:

    |A_i|          = sum counts where bit i set
    |A_i ∩ A_j|    = sum counts where bits i and j both set
    |A_i ∪ A_j|    = |A_i| + |A_j| - |A_i ∩ A_j|

This is the same mergeable-summary trick as setops' 2-side uint8 fold
generalized to k sides; the histogram is exact (no sketch), and its
size is bounded by min(2^k, distinct values) — in practice a few
thousand masks for corpus vocabulary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from doppel_ray.stages.exact import bucketed_group_apply

#: uint32 masks
MAX_SIDES = 32


def _or_by_value(
    values: pd.Series, bits: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """OR the side masks per distinct value: hash-based factorize (no
    object-array sort) + one ``np.bitwise_or.at`` scatter."""
    codes, uniques = pd.factorize(values, sort=False)
    mask = np.zeros(len(uniques), dtype=np.uint32)
    np.bitwise_or.at(mask, codes, bits)
    return np.asarray(uniques), mask


def mask_histogram(
    tagged: Dataset,
    *,
    value_col: str = "v",
    mask_col: str = "m",
    num_buckets: int = 64,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact (mask -> distinct-value count) histogram of a tagged
    relation. Returns (masks uint32, counts int64), masks ascending."""

    def fold(batch: pa.Table) -> pa.Table:
        u, mask = _or_by_value(
            batch[value_col].to_pandas(),
            batch[mask_col].to_numpy(zero_copy_only=False).astype(np.uint32),
        )
        return pa.table(
            {
                "v": pa.array(u, type=batch.schema.field(value_col).type),
                "m": pa.array(mask, type=pa.uint32()),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        _, mask = _or_by_value(
            g["v"].to_pandas(),
            g["m"].to_numpy(zero_copy_only=False),
        )
        masks, counts = np.unique(mask, return_counts=True)
        return pa.table(
            {
                "mask": pa.array(masks, type=pa.uint32()),
                "n": pa.array(counts.astype(np.int64), type=pa.int64()),
            }
        )

    folded = tagged.map_batches(fold, batch_format="pyarrow")
    rows = bucketed_group_apply(
        folded, "v", per_bucket, num_buckets=num_buckets
    ).take_all()
    if not rows:
        return np.array([], dtype=np.uint32), np.array([], dtype=np.int64)
    m = np.array([r["mask"] for r in rows], dtype=np.uint32)
    n = np.array([r["n"] for r in rows], dtype=np.int64)
    masks, inv = np.unique(m, return_inverse=True)
    counts = np.zeros(len(masks), dtype=np.int64)
    np.add.at(counts, inv, n)
    return masks, counts


def pairwise_overlap(
    masks: np.ndarray, counts: np.ndarray, n_sides: int
) -> list[tuple[int, int, int, int, int]]:
    """All (i, j, |A_i|, |A_j|, |A_i ∩ A_j|) for i < j from the mask
    histogram — pure driver arithmetic on <= min(2^k, values) rows."""
    if n_sides > MAX_SIDES:
        raise ValueError(f"at most {MAX_SIDES} sides (uint32 masks)")
    bit = [
        (masks >> np.uint32(i)) & np.uint32(1) == 1 for i in range(n_sides)
    ]
    card = [int(counts[b].sum()) for b in bit]
    out = []
    for i in range(n_sides):
        for j in range(i + 1, n_sides):
            inter = int(counts[bit[i] & bit[j]].sum())
            out.append((i, j, card[i], card[j], inter))
    return out
