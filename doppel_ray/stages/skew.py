"""Skew-mitigated aggregation: two-stage salted groupby.

A hash-partitioned groupby sends ALL rows of a key to one reduce task,
so a hot key (Zipf head, a viral URL's events, the empty-string token)
turns the exchange into a single straggler — the classic skew failure
mode of MapReduce-era engines (cf. Scarlett EUROSYS'11 / FP-Hadoop
VLDB'15, which mitigate with replication / intermediate-result
parallelism). For DECOMPOSABLE aggregates the fix is purely algebraic
and costs one extra narrow shuffle stage:

1. **salt** — append ``salt = row_hash % n_salts`` so a hot key's rows
   spread over ``n_salts`` distinct (key, salt) groups;
2. **partial** — groupby (key, salt): each partial is bounded by
   1/n_salts of the hot key, and the stage-1 exchange carries the same
   rows a plain groupby would;
3. **merge** — groupby (key) over the partials: at most ``n_salts``
   rows per key, a trivially balanced second shuffle.

count/sum/min/max merge losslessly (count merges by SUM); mean ships as
(sum, count). Non-decomposable aggregates (exact median, collect-list)
cannot be salted this way — use the quantile/bucketed machinery instead.

This is the generic form of the salting the MinHash band shuffle
(stages/minhash.py ring-capped salted bands) applies to its own hot
buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum

#: stage-1 fan-out per key; bounds the hot key's largest partial at
#: ~1/n_salts of its rows. Size ~= cluster CPUs so a mega-key's partials
#: can occupy every core.
DEFAULT_SALTS = 32

_MERGE = {"count": Sum, "sum": Sum, "min": Min, "max": Max}
_STAGE1 = {"count": Count, "sum": Sum, "min": Min, "max": Max}


def salted_aggregate(
    ds: Dataset,
    key: str,
    aggs: dict[str, tuple[str, str]],
    *,
    n_salts: int = DEFAULT_SALTS,
) -> Dataset:
    """Groupby ``key`` with per-key-bounded reduce tasks.

    ``aggs`` maps output column -> (kind, value_col) with kind in
    {count, sum, min, max}; for count the value_col is ignored. Results
    are identical to the plain single-stage groupby (pinned in
    tests/test_skew.py on a Zipf-head corpus); the difference is purely
    the exchange shape.
    """
    for out, (kind, _) in aggs.items():
        if kind not in _STAGE1:
            raise ValueError(
                f"{out}: {kind!r} is not decomposable here; "
                f"supported: {sorted(_STAGE1)}"
            )

    def add_salt(batch: pa.Table) -> pa.Table:
        # row-position hash is enough: salting needs any spread that is
        # independent of the key, not determinism across layouts — the
        # AGGREGATE is layout-invariant either way
        n = batch.num_rows
        salt = np.arange(n, dtype=np.int64) % n_salts
        if "_salt" in batch.column_names:
            batch = batch.drop_columns(["_salt"])
        return batch.append_column("_salt", pa.array(salt, type=pa.int64()))

    stage1_aggs = []
    for out, (kind, col) in aggs.items():
        cls = _STAGE1[kind]
        stage1_aggs.append(
            cls(alias_name=out) if kind == "count" else cls(col, alias_name=out)
        )
    partials = (
        ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby([key, "_salt"])
        .aggregate(*stage1_aggs)
    )

    merge_aggs = [
        _MERGE[kind](out, alias_name=out) for out, (kind, _) in aggs.items()
    ]
    merged = partials.groupby(key).aggregate(*merge_aggs)
    keep = [key, *aggs.keys()]
    return merged.map_batches(
        lambda b: b.select([c for c in keep if c in b.column_names]),
        batch_format="pyarrow",
    )


#: left-side rows of a key above which the key takes the broadcast path
DEFAULT_HOT_THRESHOLD = 2_000_000

#: hot right-side rows above which skew_join refuses to broadcast
HOT_BROADCAST_LIMIT = 5_000_000


def skew_join(
    left: Dataset,
    right: Dataset,
    *,
    on: str,
    left_cols: list[str],
    right_cols: list[str],
    how: str = "inner",
    hot_threshold: int = DEFAULT_HOT_THRESHOLD,
    broadcast_limit: int = HOT_BROADCAST_LIMIT,
    num_buckets: int = 32,
) -> Dataset:
    """Hot-key-split equi-join — `joins.hash_join` semantics with the
    straggler removed: keys whose LEFT-side row count exceeds
    ``hot_threshold`` would pin one reduce task's heap and wall-clock
    (hash_join's documented partitioning assumption), so their rows skip
    the exchange entirely — the matching RIGHT rows broadcast once
    (``ray.put``, guarded by ``broadcast_limit``) and the hot left rows
    merge map-side with zero shuffle. Cold keys take the ordinary
    bucketed hash join; the two result streams union.

    Same split-by-frequency idea as the salted aggregate above, applied
    to joins (Spark AQE's skew-join mitigation shape). Cost: one extra
    key-only count pass (combiner-first, bucketed reduction). ``how`` is
    'inner' or 'left' — full outer needs unmatched-RIGHT accounting
    across the split and is refused toward plain hash_join.
    """
    import ray

    from doppel_ray.stages.exact import bucketed_group_apply
    from doppel_ray.stages.joins import hash_join
    from doppel_ray.stages.util import collect_table

    if how not in ("inner", "left"):
        raise ValueError(f"skew_join supports inner/left, got {how!r}")
    if hot_threshold < 1:
        raise ValueError("hot_threshold must be >= 1")

    def count_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by([on]).aggregate([([], "count_all")])
        # select by NAME (pyarrow emits the count as "count_all"), not by
        # position — keys-first output order is not a stable contract
        return g.select([on, "count_all"]).rename_columns([on, "c"])

    def per_bucket_hot(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        tot = df.groupby(on, sort=False)["c"].sum()
        hot = tot[tot > hot_threshold]
        return pa.table(
            {on: pa.array(hot.index.to_numpy(), type=t.schema.field(on).type)}
        )

    counts = left.select_columns([on]).map_batches(
        count_partial, batch_format="pyarrow"
    )
    hot_tbl = collect_table(
        bucketed_group_apply(
            counts, on, per_bucket_hot, materialize_input=True
        )
    )
    if hot_tbl.num_rows == 0:
        return hash_join(
            left, right,
            on=on, left_cols=left_cols, right_cols=right_cols,
            how=how, num_buckets=num_buckets,
        )

    hot_keys = hot_tbl[on]

    def is_hot(batch: pa.Table, invert: bool = False) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(batch[on], value_set=hot_keys)
        if invert:
            mask = pc.invert(mask)
        return batch.filter(mask)

    right_hot = collect_table(
        right.map_batches(
            lambda b: is_hot(b), batch_format="pyarrow"
        ).select_columns([on] + right_cols)
    )
    if right_hot.num_rows > broadcast_limit:
        raise ValueError(
            f"skew_join: {right_hot.num_rows} hot right rows exceed "
            f"broadcast_limit {broadcast_limit}; the 'hot' side is not "
            "dimension-shaped — use hash_join and accept the straggler"
        )
    right_ref = ray.put(right_hot)

    cold = hash_join(
        left.map_batches(
            lambda b: is_hot(b, invert=True), batch_format="pyarrow"
        ),
        right.map_batches(
            lambda b: is_hot(b, invert=True), batch_format="pyarrow"
        ),
        on=on, left_cols=left_cols, right_cols=right_cols,
        how=how, num_buckets=num_buckets,
    )

    from doppel_ray.stages.joins import _arrow_type

    out_cols = [on] + left_cols + right_cols
    out_schema = pa.schema(
        [(on, _arrow_type(left, on))]
        + [(c, _arrow_type(left, c)) for c in left_cols]
        + [(c, _arrow_type(right, c)) for c in right_cols]
    )

    def hot_merge(batch: pa.Table) -> pa.Table:
        import pandas as pd

        from doppel_ray.stages.util import cached_get

        lb = is_hot(batch).select([on] + left_cols)
        if lb.num_rows == 0:
            return out_schema.empty_table()
        # ArrowDtype through the merge: the numpy path promotes ints to
        # float64 for unmatched-left NaNs (hash_join's 2^53 hazard)
        rdf = cached_get(right_ref)
        merged = lb.to_pandas(types_mapper=pd.ArrowDtype).merge(
            rdf.to_pandas(types_mapper=pd.ArrowDtype), on=on, how=how
        )
        return pa.Table.from_pandas(
            merged[out_cols], preserve_index=False
        ).cast(out_schema)

    hot_joined = left.map_batches(hot_merge, batch_format="pyarrow")

    def conform(batch: pa.Table) -> pa.Table:
        # union requires bit-identical schemas
        return batch.select(out_cols).cast(out_schema)

    return cold.map_batches(conform, batch_format="pyarrow").union(
        hot_joined.map_batches(conform, batch_format="pyarrow")
    )
