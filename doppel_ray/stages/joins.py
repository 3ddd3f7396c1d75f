"""Time-keyed joins Ray Data lacks: as-of join and bounded range join.

Both are named custom operators of the build brief (SURVEY.md §7.3's
custom-operator rule): when the Dataset API has no native form, express
the semantics as a composition of ``map_batches`` + one bucketed hash
shuffle. Both joins co-locate the two sides with a SINGLE shuffle of a
tagged union (one pass, one exchange — not one shuffle per side), then
resolve matches per bucket with vectorized kernels:

* **as-of join** (``asof_join``): for each left row, the latest right
  row of the same ``by`` key with ``on`` <= left's ``on`` (backward
  direction, exact matches allowed) — ``pd.merge_asof`` per bucket, the
  C-speed standard kernel.
* **range join** (``range_join``): all (left, right) pairs of the same
  ``by`` key with ``right.on - left.on`` in ``(lower_us, upper_us]`` —
  per-bucket segment-offset ``searchsorted`` (two binary searches per
  left row, pair emission by vectorized repeat/cumsum scatter; no
  Python loop over rows).

Partitioning assumption (documented, same as ``windows.sessionize``):
one ``by`` key's rows fit in a bucket worker's memory. Skewed keys cost
time, not correctness; salting would break join completeness and is
deliberately not done.

No reference counterpart (the Go tool has no joins); the DuckDB oracles
(`events_asof`, `events_range_join`) pin exact semantics including tie
and boundary rules.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from doppel_ray.stages.exact import bucketed_group_apply

_SIDE_COL = "__side"


def _arrow_type(ds: Dataset, name: str) -> pa.DataType:
    """Column's Arrow type regardless of block format (pandas-block
    datasets report numpy dtypes; object dtype means string here)."""
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return base.field(name).type
    t = base.types[base.names.index(name)]
    if isinstance(t, pa.DataType):
        return t
    dt = np.dtype(t)
    return pa.string() if dt == object else pa.from_numpy_dtype(dt)


def _tagged_union(
    left: Dataset,
    right: Dataset,
    by: str,
    on: str,
    left_cols: list[str],
    right_cols: list[str],
) -> tuple[Dataset, pa.Schema]:
    """Union the two sides under one schema: (by, on, side, left
    payload..., right payload...) with nulls on the absent side — so ONE
    bucketed shuffle on ``by`` co-locates both sides of every key."""
    fields = [
        (by, _arrow_type(left, by)),
        (on, _arrow_type(left, on)),
        (_SIDE_COL, pa.int8()),
    ]
    fields += [(c, _arrow_type(left, c)) for c in left_cols]
    fields += [(c, _arrow_type(right, c)) for c in right_cols]
    union_schema = pa.schema(fields)

    def conform(side: int, own_cols: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            arrays = []
            for f in union_schema:
                if f.name == _SIDE_COL:
                    arrays.append(pa.array([side] * n, type=pa.int8()))
                elif f.name in (by, on) or f.name in own_cols:
                    arrays.append(batch[f.name].cast(f.type))
                else:
                    arrays.append(pa.nulls(n, type=f.type))
            return pa.table(dict(zip(union_schema.names, arrays)))

        return fn

    lt = left.map_batches(conform(0, left_cols), batch_format="pyarrow")
    rt = right.map_batches(conform(1, right_cols), batch_format="pyarrow")
    return lt.union(rt), union_schema


def asof_join(
    left: Dataset,
    right: Dataset,
    *,
    by: str = "user_id",
    on: str = "ts",
    left_cols: list[str],
    right_cols: list[str],
    inner: bool = True,
    num_buckets: int = 32,
) -> Dataset:
    """Backward as-of join: each left row picks the right row of the same
    ``by`` key with the greatest ``on`` <= the left row's ``on``.

    ``left_cols`` / ``right_cols`` are the payload columns carried from
    each side (they must not collide — rename the right side first).
    Tie rule: among right rows sharing (by, on), the LAST under a stable
    sort by (on, *right_cols) wins — callers wanting well-defined
    semantics should pre-dedupe the right side to one row per (by, on),
    as the ``events_asof`` query does. ``inner=True`` drops unmatched
    left rows (DuckDB ``ASOF JOIN`` semantics).
    """
    union, schema = _tagged_union(left, right, by, on, left_cols, right_cols)
    out_fields = [schema.field(by), schema.field(on)]
    out_fields += [schema.field(c) for c in left_cols]
    out_fields += [schema.field(c) for c in right_cols]
    out_schema = pa.schema(out_fields)
    match_probe = right_cols[0]

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        df = g.to_pandas()
        side = df[_SIDE_COL].to_numpy()
        ldf = df.loc[side == 0, [by, on, *left_cols]]
        rdf = df.loc[side == 1, [by, on, *right_cols]]
        if ldf.empty or (rdf.empty and inner):
            return out_schema.empty_table()
        ldf = ldf.sort_values([on, by, *left_cols], kind="mergesort")
        rdf = rdf.sort_values([on, *right_cols], kind="mergesort")
        merged = pd.merge_asof(
            ldf, rdf, on=on, by=by, direction="backward",
            allow_exact_matches=True,
        )
        if inner:
            merged = merged[merged[match_probe].notna()]
        return pa.Table.from_pandas(merged, preserve_index=False).cast(
            out_schema
        )

    return bucketed_group_apply(union, by, per_bucket, num_buckets=num_buckets)


def range_join(
    left: Dataset,
    right: Dataset,
    *,
    by: str = "user_id",
    on: str = "ts",
    left_id: str,
    right_id: str,
    lower_us: int = 0,
    upper_us: int,
    num_buckets: int = 32,
) -> Dataset:
    """Bounded range join: all (left, right) pairs of the same ``by`` key
    with ``right.on - left.on`` strictly greater than ``lower_us`` and at
    most ``upper_us`` (microseconds) — "purchase within an hour AFTER the
    click" shapes. Exact; output is (by, left_id, right_id).

    Per bucket the right side is sorted by (key, time) once, and each
    left row finds its window with two binary searches on a
    segment-offset time axis; pairs materialize via vectorized
    repeat/cumsum scatter.
    """
    assert lower_us < upper_us, "empty range"
    out_schema = pa.schema(
        [
            (by, pa.int64()),
            (left_id, pa.int64()),
            (right_id, pa.int64()),
        ]
    )
    union, _ = _tagged_union(left, right, by, on, [left_id], [right_id])

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        df = g.to_pandas()
        df["_us"] = df[on].astype("int64")
        side = df[_SIDE_COL].to_numpy()
        ldf = df.loc[side == 0].sort_values([by, "_us", left_id], kind="mergesort")
        rdf = df.loc[side == 1].sort_values([by, "_us", right_id], kind="mergesort")
        if ldf.empty or rdf.empty:
            return out_schema.empty_table()
        ru = rdf[by].to_numpy()
        rt = rdf["_us"].to_numpy()
        rid = rdf[right_id].to_numpy()
        lu = ldf[by].to_numpy()
        lt = ldf["_us"].to_numpy()
        lid = ldf[left_id].to_numpy()
        # segment-offset axis: shift each key's (sorted) times into its
        # own disjoint int64 range so ONE global searchsorted answers
        # per-key window queries. rel in [0, span-2]; query offsets are
        # clipped to [-1, span-1], which stays strictly between the
        # neighbouring segments' occupied ranges.
        uniq, seg_start = np.unique(ru, return_index=True)
        seg_len = np.diff(np.append(seg_start, len(ru)))
        base = rt.min()
        rel = rt - base
        span = int(rel.max()) + 2
        if len(uniq) * span >= 2**62:
            raise OverflowError(
                "range_join segment axis overflow: key-cardinality x time-span "
                "too large for one bucket — raise num_buckets"
            )
        seg_id = np.repeat(np.arange(len(uniq), dtype=np.int64), seg_len)
        shifted = seg_id * span + rel
        li = np.searchsorted(uniq, lu)
        li_c = np.minimum(li, len(uniq) - 1)
        valid = uniq[li_c] == lu
        lo_off = np.clip(lt + lower_us - base, -1, span - 1)
        hi_off = np.clip(lt + upper_us - base, -1, span - 1)
        lo = np.searchsorted(shifted, li_c * span + lo_off, side="right")
        hi = np.searchsorted(shifted, li_c * span + hi_off, side="right")
        counts = np.where(valid, hi - lo, 0)
        total = int(counts.sum())
        if total == 0:
            return out_schema.empty_table()
        l_take = np.repeat(np.arange(len(lu)), counts)
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        r_take = np.repeat(lo, counts) + (np.arange(total) - np.repeat(offs, counts))
        return pa.table(
            {
                by: pa.array(lu[l_take], type=pa.int64()),
                left_id: pa.array(lid[l_take], type=pa.int64()),
                right_id: pa.array(rid[r_take], type=pa.int64()),
            },
            schema=out_schema,
        )

    return bucketed_group_apply(union, by, per_bucket, num_buckets=num_buckets)


def hash_join(
    left: Dataset,
    right: Dataset,
    *,
    on: str,
    left_cols: list[str],
    right_cols: list[str],
    how: str = "inner",
    num_buckets: int = 32,
) -> Dataset:
    """Plain equi-join on ``on`` (Ray Data has no native Dataset.join):
    ONE bucketed shuffle of the tagged union co-locates both sides of
    every key, then a pandas merge resolves each bucket at C speed.

    ``how`` is 'inner', 'left', or 'outer' (full outer: unmatched rows
    of BOTH sides survive with null payloads from the other — the ``on``
    key itself is never null because every union row carries it).
    Payload columns must not collide (rename first). Unlike the dedup
    stages, a general join must move both payloads through the exchange
    — when one side is small, prefer the broadcast semi-join
    (``exact.semi_filter``) or pre-aggregate; this operator is for the
    genuinely large-x-large case. Skewed keys cost time, not
    correctness (one bucket per worker heap, the module's standing
    partitioning assumption).
    """
    if how not in ("inner", "left", "outer"):
        raise ValueError(f"unsupported how={how!r}")
    fields = [(on, _arrow_type(left, on)), (_SIDE_COL, pa.int8())]
    fields += [(c, _arrow_type(left, c)) for c in left_cols]
    fields += [(c, _arrow_type(right, c)) for c in right_cols]
    union_schema = pa.schema(fields)

    def conform(side: int, own_cols: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            arrays = []
            for f in union_schema:
                if f.name == _SIDE_COL:
                    arrays.append(pa.array([side] * n, type=pa.int8()))
                elif f.name == on or f.name in own_cols:
                    arrays.append(batch[f.name].cast(f.type))
                else:
                    arrays.append(pa.nulls(n, type=f.type))
            return pa.table(dict(zip(union_schema.names, arrays)))

        return fn

    union = left.map_batches(
        conform(0, left_cols), batch_format="pyarrow"
    ).union(right.map_batches(conform(1, right_cols), batch_format="pyarrow"))

    out_schema = pa.schema(
        [union_schema.field(on)]
        + [union_schema.field(c) for c in left_cols]
        + [union_schema.field(c) for c in right_cols]
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        # Arrow-backed dtypes through the merge: the plain-numpy path
        # promotes int columns to float64 for unmatched-left NaNs, which
        # silently corrupts int64 payloads above 2^53. ArrowDtype keeps
        # ints nullable and exact end-to-end.
        df = g.to_pandas(types_mapper=pd.ArrowDtype)
        side = df[_SIDE_COL].to_numpy()
        ldf = df.loc[side == 0, [on, *left_cols]]
        rdf = df.loc[side == 1, [on, *right_cols]]
        if (how == "inner" and (ldf.empty or rdf.empty)) or (
            how == "left" and ldf.empty
        ):
            return out_schema.empty_table()
        merged = ldf.merge(rdf, on=on, how=how)
        return pa.Table.from_pandas(merged, preserve_index=False).cast(
            out_schema
        )

    return bucketed_group_apply(union, on, per_bucket, num_buckets=num_buckets)


#: rows above which a "small" join side is refused for broadcast — at
#: ~32 B/row of key + a few payload columns this is a few hundred MB in
#: every worker heap, the practical ceiling for a replicated table
BROADCAST_ROW_LIMIT = 5_000_000


def broadcast_join(
    big: Dataset,
    small,
    *,
    on: str,
    small_cols: list[str],
    how: str = "inner",
    limit: int = BROADCAST_ROW_LIMIT,
) -> Dataset:
    """Map-side equi-join against a SMALL unique-keyed side (the star-
    schema dimension-lookup regime): the small side is materialized once,
    ``ray.put`` once, and every batch of the big side resolves matches
    with one vectorized ``pc.index_in`` + take — ZERO shuffles, the big
    side streams through untouched. This is the join to reach for at
    100 TB whenever one side is a dimension table; ``hash_join`` (one
    tagged-union exchange) is for the genuinely large-x-large case.

    ``small`` is a Dataset or a pyarrow Table with column ``on`` +
    ``small_cols``. Keys on the small side must be UNIQUE (it is a
    lookup, not a multiplying join) — duplicated keys raise. ``how`` is
    'inner' (non-matching big rows dropped) or 'left' (kept, small cols
    null). Row-count guard: > ``limit`` rows raises rather than silently
    replicating a table that should have gone through ``hash_join``.
    """
    import ray

    from doppel_ray.stages.util import cached_get, collect_table

    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    if isinstance(small, Dataset):
        small_tbl = collect_table(small.select_columns([on, *small_cols]))
    else:
        small_tbl = small.select([on, *small_cols])
    if small_tbl.num_rows > limit:
        raise ValueError(
            f"broadcast_join: small side has {small_tbl.num_rows} rows "
            f"(> limit {limit}); use hash_join"
        )
    small_tbl = small_tbl.combine_chunks()
    keys = small_tbl[on]
    if pa.compute.count_distinct(keys).as_py() != small_tbl.num_rows:
        raise ValueError(
            "broadcast_join: small-side keys are not unique; this is a "
            "lookup join — pre-aggregate or use hash_join"
        )
    ref = ray.put(small_tbl)

    def per_batch(batch: pa.Table) -> pa.Table:
        tbl: pa.Table = cached_get(ref)
        idx = pa.compute.index_in(batch[on], value_set=tbl[on])
        if how == "inner":
            sel = pa.compute.is_valid(idx)
            batch = batch.filter(sel)
            idx = idx.filter(sel)
        out = batch
        for c in small_cols:
            out = out.append_column(c, tbl[c].take(idx))
        return out

    return big.map_batches(per_batch, batch_format="pyarrow")
