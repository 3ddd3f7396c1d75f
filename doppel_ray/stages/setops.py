"""Distributed set algebra over distinct value sets: INTERSECT / EXCEPT
rows and overlap cardinalities (|A|, |B|, |A intersect B|, |A union B|,
Jaccard) between two slices of a corpus.

Shape (the only scale-safe one): each batch reduces to its DISTINCT
(value, side-bit) pairs with an in-batch OR of the side bits — a doc
contributes each value once per side no matter how often it repeats —
then ONE bucketed hash shuffle on the value co-locates every occurrence,
and the per-bucket pass ORs the bits per distinct value at C speed. The
exchange carries distinct (value, int8) pairs, never the exploded
stream; cardinality mode reduces further to ONE row of counts per
bucket, so the driver sums num_buckets tiny rows.

This is the engine primitive behind SQL INTERSECT/EXCEPT [DISTINCT] and
corpus-overlap diagnostics (vocabulary overlap between sources, shared
n-grams between two snapshots)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from doppel_ray.stages.exact import bucketed_group_apply

#: side-bit values: A = 1, B = 2, both = 3
_A, _B = 1, 2


def _or_by_value(
    values: pd.Series, bits: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """OR the side bits per distinct value: hash-based ``pd.factorize``
    (C speed, no object-array sort) + one ``np.bitwise_or.at`` scatter."""
    codes, uniques = pd.factorize(values, sort=False)
    mask = np.zeros(len(uniques), dtype=np.uint8)
    np.bitwise_or.at(mask, codes, bits)
    return np.asarray(uniques), mask


def _fold_batch(batch: pa.Table, value_col: str, side_col: str) -> pa.Table:
    """Batch-local reduction to distinct (value, ORed side bits)."""
    u, mask = _or_by_value(
        batch[value_col].to_pandas(),
        batch[side_col].to_numpy(zero_copy_only=False).astype(np.uint8),
    )
    return pa.table(
        {
            "v": pa.array(u, type=batch.schema.field(value_col).type),
            "m": pa.array(mask, type=pa.uint8()),
        }
    )


def _mask_per_value(g: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Per-bucket OR of side bits per distinct value (vectorized)."""
    return _or_by_value(
        g["v"].to_pandas(), g["m"].to_numpy(zero_copy_only=False)
    )


def tag_side(ds: Dataset, side: int, *, value_col: str, side_col: str = "side") -> Dataset:
    """Append the constant side bit (A=1, B=2) and prune to the value
    column — do this BEFORE the union so only narrow rows shuffle."""
    if side not in (_A, _B):
        raise ValueError("side must be 1 (A) or 2 (B)")

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                value_col: batch[value_col],
                side_col: pa.array(
                    np.full(batch.num_rows, side, dtype=np.uint8), type=pa.uint8()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def set_op_rows(
    tagged: Dataset,
    mode: str,
    *,
    value_col: str = "v",
    side_col: str = "side",
    num_buckets: int = 64,
) -> Dataset:
    """Distinct values of the requested set operation over a tagged
    union (see ``tag_side``): ``intersect`` = A & B, ``except`` = A - B,
    ``union`` = A | B. Output streams per bucket; each value appears
    exactly once."""
    want = {"intersect": ("eq", 3), "except": ("eq", _A), "union": ("ge", 1)}
    if mode not in want:
        raise ValueError(f"mode must be one of {sorted(want)}")
    op, target = want[mode]

    folded = tagged.map_batches(
        lambda b: _fold_batch(b, value_col, side_col), batch_format="pyarrow"
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        out_type = g.schema.field("v").type
        if g.num_rows == 0:
            return pa.table({value_col: pa.array([], type=out_type)})
        u, mask = _mask_per_value(g)
        keep = mask == target if op == "eq" else mask >= target
        return pa.table({value_col: pa.array(u[keep], type=out_type)})

    return bucketed_group_apply(folded, "v", per_bucket, num_buckets=num_buckets)


def set_cardinalities(
    tagged: Dataset,
    *,
    value_col: str = "v",
    side_col: str = "side",
    num_buckets: int = 64,
) -> dict[str, int]:
    """|A|, |B|, |A intersect B|, |A union B| of the distinct value sets
    in one pass: the per-bucket output is ONE row of four counts, so the
    driver reduces num_buckets rows regardless of corpus size."""
    folded = tagged.map_batches(
        lambda b: _fold_batch(b, value_col, side_col), batch_format="pyarrow"
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            z = pa.array([0], type=pa.int64())
            return pa.table({"n_a": z, "n_b": z, "n_common": z, "n_union": z})
        _, mask = _mask_per_value(g)
        return pa.table(
            {
                "n_a": pa.array([int((mask & _A).astype(bool).sum())]),
                "n_b": pa.array([int((mask & _B).astype(bool).sum())]),
                "n_common": pa.array([int((mask == 3).sum())]),
                "n_union": pa.array([len(mask)]),
            }
        )

    parts = bucketed_group_apply(folded, "v", per_bucket, num_buckets=num_buckets)
    df = parts.to_pandas()
    return {c: int(df[c].sum()) for c in ("n_a", "n_b", "n_common", "n_union")}
