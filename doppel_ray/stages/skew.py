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
