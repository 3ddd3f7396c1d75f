"""Distributed SQL window functions: row_number/rank per partition,
lag deltas, and bounded-axis rolling sums.

Ray Data has no window operator; each is the composition the platform
does support (SURVEY.md custom-operator rule, same shape as
stages/windows.py sessionization):

* ``row_number() OVER (PARTITION BY k ORDER BY ...)`` — ONE bucketed
  hash shuffle on the partition key (every row of a key co-locates in
  exactly one bucket), then a per-bucket pandas sort + ``cumcount`` at
  C speed. The optional ``limit`` prunes to the top-N rows per key
  INSIDE the bucket, so the downstream exchange carries at most
  N x distinct-keys rows.
* ``lag(ts) OVER (PARTITION BY k ORDER BY ts, id)`` deltas — the same
  bucketed shuffle, then a vectorized ``groupby(k).diff()``.
* rolling sums — driver-side numpy cumsum, valid ONLY for axes whose
  cardinality is bounded by something other than the corpus (calendar
  days, hours): the input must already be an aggregated relation.

Partitioning assumption (documented, mirrors sessionize): one key's
rows fit a bucket's memory. A pathological mega-key would need salting
+ a merge pass, deliberately not done — rank semantics don't survive a
split without a second exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from doppel_ray.stages.exact import bucketed_group_apply


def window_rank(
    ds: Dataset,
    key: str,
    order_cols: list[str],
    *,
    ascending: list[bool] | None = None,
    out_col: str = "rnk",
    limit: int | None = None,
    num_buckets: int = 64,
) -> Dataset:
    """Append ``row_number() OVER (PARTITION BY key ORDER BY order_cols)``
    as ``out_col`` (1-based). ``order_cols`` must totally order rows
    within a key (include a unique id as the last column) or the rank of
    tied rows is engine-dependent. ``limit`` keeps only rows with rank
    <= limit (top-N per group), pruned inside the bucket."""
    asc = ascending if ascending is not None else [True] * len(order_cols)
    if len(asc) != len(order_cols):
        raise ValueError("ascending must match order_cols length")

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g.append_column(out_col, pa.array([], type=pa.int64()))
        df = g.to_pandas()
        df = df.sort_values([key, *order_cols], ascending=[True, *asc],
                            kind="mergesort")
        rnk = df.groupby(key, sort=False).cumcount().to_numpy() + 1
        df[out_col] = rnk
        if limit is not None:
            df = df[df[out_col] <= limit]
        return pa.Table.from_pandas(df, preserve_index=False)

    return bucketed_group_apply(ds, key, per_bucket, num_buckets=num_buckets)


def lag_delta_us(
    ds: Dataset,
    key: str,
    ts_col: str,
    id_col: str,
    *,
    out_col: str = "gap_us",
    keep_first: bool = False,
    num_buckets: int = 32,
) -> Dataset:
    """Per-key inter-row gap in microseconds:
    ``epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY key
    ORDER BY ts, id)``. Each key's first row has no predecessor and is
    dropped unless ``keep_first`` (then gap is null). ``ts_col`` must be
    timestamp[us] (cast to int64 is the epoch-us value)."""

    def per_bucket(g: pa.Table) -> pa.Table:
        schema = g.schema.append(pa.field(out_col, pa.int64()))
        if g.num_rows == 0:
            return schema.empty_table()
        df = g.to_pandas()
        us = df[ts_col].astype("int64")
        order = np.lexsort((df[id_col].to_numpy(), us.to_numpy(),
                            df[key].to_numpy()))
        df = df.iloc[order]
        gaps = df[ts_col].astype("int64").groupby(
            df[key].to_numpy(), sort=False
        ).diff()
        if keep_first:
            df[out_col] = gaps.astype("Int64")  # nullable, null = first row
        else:
            df = df[gaps.notna()]
            df[out_col] = gaps[gaps.notna()].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False, schema=schema)

    return bucketed_group_apply(ds, key, per_bucket, num_buckets=num_buckets)


def rolling_sum_rows(values: np.ndarray, window: int) -> np.ndarray:
    """``sum(v) OVER (ORDER BY ... ROWS BETWEEN window-1 PRECEDING AND
    CURRENT ROW)`` over an ALREADY-SORTED bounded axis (calendar days /
    hours — never corpus-sized; callers aggregate first). Pure int64
    cumsum difference, O(n)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    c = np.cumsum(values.astype(np.int64))
    out = c.copy()
    out[window:] -= c[:-window]
    return out


def global_topk(
    ds: Dataset,
    order_cols: list[str],
    *,
    ascending: list[bool] | None = None,
    k: int = 10,
) -> Dataset:
    """Global ORDER BY ... LIMIT k WITHOUT a full sort: each block is
    pruned to its own top-k (a vectorized lexsort head — at most k rows
    per block survive), the bounded survivor set collapses to one block,
    and a final prune emits exactly the global top-k row SET (callers
    needing display order sort the k-row result).

    Shuffle volume is k x blocks rows instead of the corpus; at 100 TB
    the survivor union is a few MB for any reasonable k. ``order_cols``
    must totally order rows (append a unique id) or the tail of the
    result is engine-dependent under ties.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    asc = ascending if ascending is not None else [True] * len(order_cols)
    if len(asc) != len(order_cols):
        raise ValueError("ascending must match order_cols length")

    def prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        keys = []
        # np.lexsort sorts by the LAST key first; feed reversed, negate
        # descending numeric keys, argsort-rank non-numeric descending
        for col, a in zip(reversed(order_cols), reversed(asc)):
            v = batch[col].to_numpy(zero_copy_only=False)
            if not a:
                if v.dtype.kind in "iuf":
                    v = -v
                else:
                    # rank-encode: descending order == ascending ranks
                    order = np.argsort(v, kind="stable")[::-1]
                    r = np.empty(len(v), dtype=np.int64)
                    r[order] = np.arange(len(v))
                    v = r
            keys.append(v)
        idx = np.lexsort(keys)[:k]
        return batch.take(pa.array(idx))

    return (
        ds.map_batches(prune, batch_format="pyarrow")
        .repartition(1)
        .map_batches(prune, batch_format="pyarrow")
    )
