"""Distributed total-order sort with exact global rank assignment —
the relational ``ROW_NUMBER() OVER (ORDER BY key, id)`` over a corpus
that never fits one machine, and the physical layout primitive behind
"sort the crawl by SURT so each site is contiguous" (web-archive
practice; cf. the CDX/SURT ordering convention).

Shape (sample-partitioned range sort, the classic TeraSort layout):

1. a DETERMINISTIC hash sample of rows (membership a pure function of
   the row id via sip64, so boundaries are identical at any block
   layout) is collected and sorted on the driver; ``num_buckets - 1``
   evenly-spaced splitters become range boundaries. Boundary QUALITY
   only affects balance — correctness never depends on the sample.
2. a COUNT pass assigns each row its range bucket via one vectorized
   ``searchsorted`` against the broadcast boundaries and reduces to
   per-batch ``(bucket, n)`` partials -> ONE narrow groupby; the
   driver prefix-sums ``num_buckets`` tiny rows into bucket offsets.
3. the RANK pass shuffles rows ONCE on the bucket id (equal keys can
   never straddle a boundary: splitters are key values and
   ``side='right'`` sends every row equal to a splitter left), sorts
   each bucket locally by ``(key, id)`` at C speed, and emits
   ``offset[bucket] + local_index`` — exact 1-based global row
   numbers, bit-identical to the SQL window at any layout.

The shuffled relation is the narrow ``(key, id)`` projection — payload
columns never move; join ranks back by id downstream if needed. Skewed
key distributions degrade exactly like any range partition (a single
hot KEY VALUE must land in one bucket to keep ranks exact); the sample
adapts splitters to skewed key REGIONS automatically.

Reference tie-in: the engine-level analog of the reference's
deterministic output ordering contract (duplicate groups sorted by
their minimum id, /root/reference/internal/finder/finder.go:114-146) —
a stable, layout-independent total order over results.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

#: driver-side cap on collected sample rows; the sample thins
#: deterministically (modulus doubling) rather than failing.
SAMPLE_LIMIT = 1_000_000


def _np_keys(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Key column -> a numpy array with C-speed comparisons: native
    dtype for numerics, fixed-width unicode (NOT object) for strings —
    ``np.searchsorted``/``np.lexsort`` over object arrays fall back to
    per-element Python compares, which would put a Python loop in the
    hot path."""
    v = col.to_numpy(zero_copy_only=False)
    if v.dtype.kind in "iuf":
        return v
    return v.astype(str)


def _sample_keys(
    ds: Dataset, key_col: str, id_col: str, sample_mod: int
) -> list:
    """Deterministic ~1/sample_mod row sample of key values, thinned on
    the driver (by doubling the modulus over the ALREADY-collected
    hashes — still a pure function of the id) while it exceeds
    SAMPLE_LIMIT."""
    import pandas as pd

    from doppel_ray.functions.hashing import sip64

    def pick(batch: pa.Table) -> pa.Table:
        h = sip64(pd.Series(batch[id_col].to_pylist()).astype(str))
        keep = h % np.uint64(sample_mod) == 0
        t = batch.select([key_col]).filter(pa.array(keep))
        return t.append_column("h", pa.array(h[keep], type=pa.uint64()))

    rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    keys = [r[key_col] for r in rows]
    hs = np.array([r["h"] for r in rows], dtype=np.uint64)
    mod = sample_mod
    while len(keys) > SAMPLE_LIMIT:
        mod *= 2
        keep = hs % np.uint64(mod) == 0
        keys = [k for k, m in zip(keys, keep) if m]
        hs = hs[keep]
    return keys


def _boundaries(sample: list, num_buckets: int) -> np.ndarray:
    """Evenly-spaced splitters from the sorted sample (deduplicated —
    duplicate splitters would only create guaranteed-empty buckets)."""
    if not sample:
        return np.array([], dtype=object)
    s = np.sort(np.asarray(sample))
    idx = (np.arange(1, num_buckets) * len(s)) // num_buckets
    return np.unique(s[idx])


def total_order_ranks(
    ds: Dataset,
    key_col: str,
    id_col: str,
    *,
    num_buckets: int = 64,
    sample_mod: int = 256,
    rank_col: str = "rank",
) -> Dataset:
    """Exact global 1-based row numbers under ``ORDER BY key_col,
    id_col`` (ids must be unique and neither column null — the same
    precondition as every dedup key in this repo). Returns the narrow
    ``(id_col, key_col, rank_col)`` relation.

    Cost: one sample scan + one count scan + ONE row shuffle of the
    narrow key relation. The input should already be projected to the
    two columns; this function projects defensively.
    """
    if num_buckets <= 0:
        raise ValueError("num_buckets must be positive")
    if key_col == id_col:
        raise ValueError("key_col and id_col must differ")

    narrow = ds.select_columns([key_col, id_col]).materialize()

    bounds = _boundaries(
        _sample_keys(narrow, key_col, id_col, sample_mod), num_buckets
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = _np_keys(batch[key_col])
        if len(bounds):
            # numpy promotes mixed-width '<U' operands itself; an astype
            # to the batch's key width could TRUNCATE longer splitters
            b = np.searchsorted(bounds, keys, side="right").astype(np.int64)
        else:
            b = np.zeros(len(keys), dtype=np.int64)
        if batch[key_col].null_count or batch[id_col].null_count:
            raise ValueError("total_order_ranks: null key or id")
        return batch.append_column("bucket", pa.array(b))

    def count_partial(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy(zero_copy_only=False)
        cnt = np.bincount(b, minlength=len(bounds) + 1)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "bucket": pa.array(nz, type=pa.int64()),
                "n": pa.array(cnt[nz], type=pa.int64()),
            }
        )

    bucketed = narrow.map_batches(add_bucket, batch_format="pyarrow")
    counts = (
        bucketed.map_batches(count_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n"))
        .take_all()
    )
    per_bucket = np.zeros(len(bounds) + 1, dtype=np.int64)
    for r in counts:
        per_bucket[r["bucket"]] = r["sum(n)"]
    offsets = np.concatenate(([0], np.cumsum(per_bucket)[:-1]))

    def rank_bucket(g: pa.Table) -> pa.Table:
        b = int(g["bucket"][0].as_py())
        keys = _np_keys(g[key_col])
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, keys))
        ranks = offsets[b] + 1 + np.arange(len(order), dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(ids[order], type=g.schema.field(id_col).type),
                key_col: pa.array(
                    keys[order], type=g.schema.field(key_col).type
                ),
                rank_col: pa.array(ranks, type=pa.int64()),
            }
        )

    return bucketed.groupby("bucket").map_groups(
        rank_bucket, batch_format="pyarrow"
    )
