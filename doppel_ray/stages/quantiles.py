"""Exact distributed quantiles over a numeric column.

Two regimes, auto-selected by a HyperLogLog cardinality pre-check
(``stages.hashes.approx_distinct`` — one narrow projection pass, no
shuffle):

* **discrete** (distinct values <= ``driver_limit``): one
  ``groupby(col).count()`` shuffle builds the value histogram — the only
  thing that ever leaves the workers — then the (small) histogram is
  sorted and walked cumulatively. Exactness costs one exchange of
  ``distinct-values`` rows instead of a full sort of the dataset.
* **continuous / near-unique** (distinct values > ``driver_limit``):
  a distributed cumulative walk. One Min/Max pass bounds the range; each
  refinement level bins every row of the current selection into
  ``resolution`` buckets (counts + per-bucket min/max in one
  ``map_batches`` pass, merged on the driver as ``resolution``-length
  arrays), the target rank's bucket becomes the next selection, and only
  when a bucket's row count fits ``driver_limit`` are its values
  collected and indexed. Bucket membership is re-derived from the SAME
  clip-of-floor expression at every level (the selection is a chain of
  ``(lo, width, bucket)`` assignments, not a value-range filter), so a
  float boundary can never be counted in one pass and filtered out in
  the next — the result is EXACT, the same element the discrete path
  would return. Because a bucket's exact min/max seed the child grid,
  ``min < max`` guarantees the child splits (min lands in bucket 0, max
  in bucket resolution-1), and a constant bucket (min == max) resolves
  immediately — heavy skew terminates instead of looping. Driver memory
  is bounded by ``max(resolution, driver_limit)`` regardless of column
  cardinality; at 100 TB each level is a narrow column scan plus a
  ``resolution``-row exchange, and levels are O(log_resolution(span)),
  in practice <= 6 for float64.

Quantile rule matches DuckDB's ``quantile_disc``: the element at sorted
index ``max(ceil(p*n) - 1, 0)`` (verified empirically for n in {4,5,10}
across p in {0, .25, .5, .75, .9, .99, 1}), with ``p*n`` computed in
IEEE doubles on both sides so the index arithmetic cannot drift.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count

#: distinct values above which the driver value-histogram path is refused
#: and the bucketed cumulative walk runs instead. Sized so the histogram
#: (~16 B/row x limit) stays well inside a driver heap; the HLL estimate
#: carries ~1% error, so keep an order of magnitude of slack vs. what the
#: driver could physically hold.
DRIVER_HIST_LIMIT = 1_000_000

#: buckets per refinement level of the continuous path. 4096 localises a
#: rank to 1/4096 of the remaining span per level while the per-level
#: exchange stays a few-KB table.
BUCKET_RESOLUTION = 4096


def exact_quantiles(
    ds: Dataset,
    col: str,
    ps: list[float],
    *,
    driver_limit: int = DRIVER_HIST_LIMIT,
    resolution: int = BUCKET_RESOLUTION,
) -> list[tuple[float, int]]:
    """[(p, value)] exact quantiles of ``ds[col]`` (discrete rule above).

    Safe for any column cardinality: the driver histogram is gated on an
    ``approx_distinct`` pre-check; near-unique columns (float scores,
    doc ids) take the bucketed cumulative walk automatically.
    """
    from doppel_ray.stages.hashes import approx_distinct

    ds = ds.select_columns([col])
    if approx_distinct(ds, col) <= driver_limit:
        return _histogram_quantiles(ds, col, ps)
    return _bucketed_quantiles(ds, col, ps, driver_limit, resolution)


def _histogram_quantiles(ds: Dataset, col: str, ps: list[float]) -> list:
    hist = ds.groupby(col).aggregate(Count(alias_name="cnt")).take_all()
    hist.sort(key=lambda r: r[col])
    n = sum(r["cnt"] for r in hist)
    if n == 0:
        return []
    out = []
    for p in ps:
        idx = max(math.ceil(p * n) - 1, 0)
        acc = 0
        for r in hist:
            acc += r["cnt"]
            if acc > idx:
                out.append((p, r[col]))
                break
    return out


# --------------------------------------------- continuous cumulative walk

# a selection is a tuple of levels (lo, width, resolution, bucket); a row
# belongs when _assign(v, lo, width, resolution) == bucket at EVERY level


def _assign(v: np.ndarray, lo: float, width: float, res: int) -> np.ndarray:
    return np.clip(((v - lo) / width).astype(np.int64), 0, res - 1)


def _select(v: np.ndarray, levels: tuple) -> np.ndarray:
    for lo, width, res, bucket in levels:
        v = v[_assign(v, lo, width, res) == bucket]
    return v


def _col_f64(batch: pa.Table, col: str) -> np.ndarray:
    v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
    return v[~np.isnan(v)]


def _bucket_stats(
    ds: Dataset, col: str, levels: tuple, lo: float, width: float, res: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(counts, mins, maxs) per bucket over the current selection — one
    narrow map_batches pass; each block ships three res-length arrays."""

    def partial(batch: pa.Table) -> pa.Table:
        v = _select(_col_f64(batch, col), levels)
        b = _assign(v, lo, width, res)
        cnt = np.bincount(b, minlength=res).astype(np.int64)
        mins = np.full(res, np.inf)
        maxs = np.full(res, -np.inf)
        np.minimum.at(mins, b, v)
        np.maximum.at(maxs, b, v)
        return pa.table(
            {
                "cnt": pa.array([cnt.tobytes()], type=pa.large_binary()),
                "mn": pa.array([mins.tobytes()], type=pa.large_binary()),
                "mx": pa.array([maxs.tobytes()], type=pa.large_binary()),
            }
        )

    counts = np.zeros(res, dtype=np.int64)
    mins = np.full(res, np.inf)
    maxs = np.full(res, -np.inf)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for c, mn, mx in zip(
            b["cnt"].to_pylist(), b["mn"].to_pylist(), b["mx"].to_pylist()
        ):
            counts += np.frombuffer(c, dtype=np.int64)
            mins = np.minimum(mins, np.frombuffer(mn, dtype=np.float64))
            maxs = np.maximum(maxs, np.frombuffer(mx, dtype=np.float64))
    return counts, mins, maxs


def _bucket_values(
    ds: Dataset, col: str, levels: tuple, lo: float, width: float, res: int, bucket: int
) -> np.ndarray:
    """Collect (sorted) the values of one bucket — called only when its
    count is <= driver_limit."""

    def fn(batch: pa.Table) -> pa.Table:
        v = _select(_col_f64(batch, col), levels)
        v = v[_assign(v, lo, width, res) == bucket]
        return pa.table({"v": pa.array(v, type=pa.float64())})

    parts = [
        b["v"].to_numpy(zero_copy_only=False)
        for b in ds.map_batches(fn, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ]
    vals = np.concatenate(parts) if parts else np.array([], dtype=np.float64)
    vals.sort()
    return vals


def _global_stats(ds: Dataset, col: str) -> tuple[int, float, float]:
    """(n, min, max) over non-NaN values — the same value set the walk
    bins, so ranks can never run past the selection."""

    def partial(batch: pa.Table) -> pa.Table:
        v = _col_f64(batch, col)
        mn = float(v.min()) if len(v) else np.inf
        mx = float(v.max()) if len(v) else -np.inf
        return pa.table({"n": [len(v)], "mn": [mn], "mx": [mx]})

    n, mn, mx = 0, np.inf, -np.inf
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        n += sum(b["n"].to_pylist())
        mn = min(mn, min(b["mn"].to_pylist()))
        mx = max(mx, max(b["mx"].to_pylist()))
    return n, mn, mx


def _bucketed_quantiles(
    ds: Dataset, col: str, ps: list[float], driver_limit: int, resolution: int
) -> list:
    n, lo, hi = _global_stats(ds, col)
    if n == 0:
        return []
    sch = ds.schema()
    col_type = dict(zip(sch.names, sch.types))[col]
    is_int = pa.types.is_integer(col_type)

    # per-call memo: all ps share the level-0 histogram (and usually the
    # deeper levels too), so each distinct selection is scanned once
    cache: dict = {}
    out = []
    for p in ps:
        idx = max(math.ceil(p * n) - 1, 0)
        val = _resolve_rank(ds, col, idx, lo, hi, driver_limit, resolution, cache=cache)
        out.append((p, int(val) if is_int else val))
    return out


def _resolve_rank(
    ds: Dataset,
    col: str,
    rank: int,
    lo: float,
    hi: float,
    driver_limit: int,
    resolution: int,
    levels: tuple = (),
    cache: dict | None = None,
) -> float:
    """Value at sorted index ``rank`` within the current selection (rank
    is RELATIVE to the selection: each level subtracts the cumulative
    count of earlier buckets)."""
    cache = cache if cache is not None else {}
    while True:
        if lo == hi:
            return lo
        width = (hi - lo) / resolution
        if width <= 0 or not np.isfinite(width):
            return lo
        key = (levels, lo, width, resolution)
        if key not in cache:
            cache[key] = _bucket_stats(ds, col, levels, lo, width, resolution)
        counts, mins, maxs = cache[key]
        cum = np.cumsum(counts)
        b = int(np.searchsorted(cum, rank + 1))
        if b >= resolution:
            raise RuntimeError(
                f"rank {rank} exceeds selection size {int(cum[-1])} "
                f"(inconsistent refinement state)"
            )
        rank -= int(cum[b - 1]) if b > 0 else 0
        if counts[b] <= driver_limit:
            vals = _bucket_values(ds, col, levels, lo, width, resolution, b)
            return float(vals[rank])
        if mins[b] == maxs[b]:
            # constant hot bucket (heavy skew): every element IS the value
            return float(mins[b])
        if len(levels) > 64:
            raise RuntimeError("quantile refinement failed to converge")
        # recurse into the bucket; its exact min/max seed the child grid,
        # so min<max guarantees the child splits into >=2 buckets
        levels = levels + ((lo, width, resolution, b),)
        lo, hi = float(mins[b]), float(maxs[b])


# --------------------------------------------------- per-group quantiles


def grouped_quantiles(
    ds: Dataset,
    group_col: str,
    value_col: str,
    ps: list[float],
    out_cols: list[str],
    *,
    num_buckets: int = 32,
) -> Dataset:
    """Exact per-group quantiles: one row per group with a column per
    requested p (``out_cols`` names them), DuckDB ``quantile_disc`` rule.

    Shape: per-batch ``(group, value) -> count`` combiner partials, ONE
    narrow groupby sum over distinct (group, value) pairs, then the
    bounded histogram relation is bucketed by group and each group's
    cumulative walk runs vectorized inside the bucket (sort + cumsum +
    first-row-past-rank selection — no per-group Python dispatch).
    Nothing ever lands on the driver; shuffle volume is distinct
    (group, value) pairs, not rows.

    Partitioning assumption (same as rank/sessionize): one group's
    VALUE HISTOGRAM fits a bucket's memory — fine for discrete columns
    (token counts, sizes) at any corpus scale; a near-unique float
    column inside a single mega-group would need the per-group
    cumulative walk (see ``exact_quantiles``'s continuous path).
    """
    from ray.data.aggregate import Sum

    if len(ps) != len(out_cols):
        raise ValueError("out_cols must match ps length")
    if not ps:
        raise ValueError("ps must be non-empty")

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "g": batch[group_col].to_pandas(),
                "v": batch[value_col].to_pandas(),
            }
        )
        cnt = df.groupby(["g", "v"], sort=False, dropna=True).size()
        frame = cnt.reset_index()
        return pa.table(
            {
                group_col: pa.array(frame["g"]),
                value_col: pa.array(frame["v"]),
                "_cnt": pa.array(frame[0].to_numpy(), type=pa.int64()),
            }
        )

    hist = (
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, value_col])
        .aggregate(Sum("_cnt", alias_name="_cnt"))
    )

    value_type = dict(zip(ds.schema().names, ds.schema().types))[value_col]

    def per_bucket(g: pa.Table) -> pa.Table:
        import pandas as pd

        schema = pa.schema(
            [(group_col, g.schema.field(group_col).type)]
            + [(c, value_type) for c in out_cols]
        )
        if g.num_rows == 0:
            return schema.empty_table()
        df = g.to_pandas().sort_values([group_col, value_col])
        cum = df.groupby(group_col, sort=False)["_cnt"].cumsum().to_numpy()
        n = df.groupby(group_col, sort=False)["_cnt"].transform("sum").to_numpy()
        cols = {}
        for p, name in zip(ps, out_cols):
            # quantile_disc index: element at sorted position
            # max(ceil(p*n)-1, 0); p*n in IEEE doubles on both engines
            idx = np.maximum(np.ceil(p * n.astype(np.float64)) - 1, 0)
            sel = df[cum > idx]
            cols[name] = sel.groupby(group_col, sort=False)[value_col].first()
        frame = pd.DataFrame(cols).reset_index()
        arrays = [pa.array(frame[group_col])] + [
            pa.array(frame[c], type=value_type) for c in out_cols
        ]
        return pa.Table.from_arrays(arrays, schema=schema)

    from doppel_ray.stages.exact import bucketed_group_apply

    return bucketed_group_apply(hist, group_col, per_bucket, num_buckets=num_buckets)


def mad_outliers(
    ds,
    col: str,
    *,
    c: int = 3,
    id_col: str = "doc_id",
    driver_limit: int = DRIVER_HIST_LIMIT,
):
    """Robust outlier detection by median absolute deviation (the
    quality cut that survives heavy-tailed web-corpus length/score
    distributions where mean/stddev don't): flag rows with
    ``|x - median| > c * MAD`` where ``MAD = median(|x - median|)``.

    All-INTEGER for integer columns — both medians are `exact_quantiles`
    elements (quantile_disc rule), the deviation is integer arithmetic,
    and the threshold is an integer multiply — so the flagged SET is
    bit-identical at any layout and SQL-recomputable with nested
    ``quantile_disc``.

    Scale shape: two distributed quantile passes (each HLL-gated driver
    histogram or bucketed cumulative walk — never a corpus-sized driver
    collect) + one zero-shuffle filter map. Returns ``(id_col, col,
    abs_dev)`` rows for the outliers.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if c < 1:
        raise ValueError(f"c must be >= 1, got {c}")

    med = exact_quantiles(ds, col, [0.5], driver_limit=driver_limit)
    if not med:
        schema = pa.schema(
            [(id_col, pa.int64()), (col, pa.int64()), ("abs_dev", pa.int64())]
        )
        import ray.data

        return ray.data.from_arrow(schema.empty_table())
    m = med[0][1]

    def add_dev(batch: pa.Table) -> pa.Table:
        dev = pc.abs(pc.subtract(batch[col], m))
        if "abs_dev" in batch.column_names:
            batch = batch.drop_columns(["abs_dev"])
        return batch.append_column("abs_dev", dev)

    devds = ds.select_columns([id_col, col]).map_batches(
        add_dev, batch_format="pyarrow"
    )
    mad = exact_quantiles(devds, "abs_dev", [0.5], driver_limit=driver_limit)
    thresh = c * mad[0][1]
    return devds.filter(expr=f"abs_dev > {thresh}")
