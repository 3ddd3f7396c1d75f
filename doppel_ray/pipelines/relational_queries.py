"""Relational benchmark queries over the TPC-H-ish tables — the classic
scan-aggregate and join-aggregate-topk shapes a data engine must cover
alongside the dedup/LLM operators (reference framing: these generalize
doppel's single groupby report, internal/duplicates/finder.go:47-106,
to multi-table analytics over the same engine primitives).

Float-money columns are scaled to integers INSIDE the first map_batches
(floor(x*100), the events_queries.py idiom): both sides compute the same
IEEE double product then floor, so every downstream sum is exact int64
arithmetic — order-invariant under any block layout, hash-identical to
DuckDB. At 100 TB the int64 headroom note: per-row charge_c10000 is
<= ~1e11, so ~9e7 rows per group saturate int64 — wide-corpus callers
should drop to c100 units or split groups; the guard below raises rather
than wrapping silently.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Sum

from doppel_ray.pipelines import finalize, query
from doppel_ray.sources.parquet import read_table

#: lineitem money scaling — per-group int64 overflow guard threshold
_SUM_GUARD = np.iinfo(np.int64).max // 4


def _cents(arr: pa.ChunkedArray | pa.Array, factor: int = 100) -> np.ndarray:
    """floor(x * factor) as int64 — deterministic on both engines because
    the double product is computed identically before the floor."""
    x = arr.to_numpy(zero_copy_only=False)
    return np.floor(x * factor).astype(np.int64)


@query(
    "pricing_summary",
    """
    SELECT l_returnflag,
           l_linestatus,
           CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_base_c,
           CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(floor(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS sum_disc_c100,
           CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(floor(l_discount * 100) AS BIGINT))
                    * (100 + CAST(floor(l_tax * 100) AS BIGINT)))
                AS BIGINT) AS sum_charge_c10000,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(sf_dir: str):
    """TPC-H Q1-flavor pricing summary: one column-pruned scan, per-batch
    integer scaling, combiner-first multi-key groupby — the narrow
    aggregate shuffle carries only (flag, status, 5 int64s) partials."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        ],
    )

    def prep(batch: pa.Table) -> pa.Table:
        base_c = _cents(batch["l_extendedprice"])
        disc_bp = _cents(batch["l_discount"])
        tax_bp = _cents(batch["l_tax"])
        disc_c100 = base_c * (100 - disc_bp)
        charge = disc_c100 * (100 + tax_bp)
        if len(charge) and np.abs(charge).max() > _SUM_GUARD:
            raise ValueError(
                "pricing_summary: charge_c10000 near int64 range; "
                "rescale units before summing"
            )
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pa.array(_cents(batch["l_quantity"], 1), type=pa.int64()),
                "base_c": pa.array(base_c, type=pa.int64()),
                "disc_c100": pa.array(disc_c100, type=pa.int64()),
                "charge_c10000": pa.array(charge, type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("base_c", alias_name="sum_base_c"),
            Sum("disc_c100", alias_name="sum_disc_c100"),
            Sum("charge_c10000", alias_name="sum_charge_c10000"),
            Count(alias_name="n_rows"),
        )
    )
    return finalize(
        agg,
        pa.schema(
            [
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("sum_qty", pa.int64()),
                ("sum_base_c", pa.int64()),
                ("sum_disc_c100", pa.int64()),
                ("sum_charge_c10000", pa.int64()),
                ("n_rows", pa.int64()),
            ]
        ),
    )


_Q3_SEGMENT = "BUILDING"
_Q3_CUT = "1998-06-01"


@query(
    "shipping_priority",
    f"""
    SELECT l_orderkey,
           CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(floor(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_c100,
           epoch_us(o_orderdate) AS orderdate_us,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = '{_Q3_SEGMENT}'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '{_Q3_CUT}'
      AND l_shipdate > TIMESTAMP '{_Q3_CUT}'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue_c100 DESC, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority(sf_dir: str):
    """TPC-H Q3-flavor shipping priority: filtered customer semi-joins
    orders (broadcast of matching custkeys would also do — the hash join
    keeps it general), the survivors join lineitem on orderkey, revenue
    is an exact int64 sum per order, and the top 10 come off a sort over
    the already-aggregated (orders-bounded) relation. Predicates are
    applied at the first touch of each table so payloads never survive
    a join they can't contribute to."""
    from doppel_ray.stages.joins import hash_join

    cut = np.datetime64(_Q3_CUT, "us")

    cust = (
        read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .map_batches(
            lambda b: b.filter(pc.equal(b["c_mktsegment"], _Q3_SEGMENT))
            .select(["c_custkey"]),
            batch_format="pyarrow",
        )
    )
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda b: b.filter(
            pc.less(b["o_orderdate"], pa.scalar(cut.item(), type=pa.timestamp("us")))
        ).rename_columns(["o_orderkey", "c_custkey", "o_orderdate", "o_orderpriority"]),
        batch_format="pyarrow",
    )
    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def li_prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.greater(batch["l_shipdate"], pa.scalar(cut.item(), type=pa.timestamp("us")))
        )
        rev = _cents(t["l_extendedprice"]) * (100 - _cents(t["l_discount"]))
        return pa.table(
            {
                "o_orderkey": t["l_orderkey"],
                "rev_c100": pa.array(rev, type=pa.int64()),
            }
        )

    cust_orders = hash_join(
        cust,
        orders,
        on="c_custkey",
        left_cols=[],
        right_cols=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        # re-key the join output on orderkey for the lineitem join
        lambda b: b.select(["o_orderkey", "o_orderdate", "o_orderpriority"]),
        batch_format="pyarrow",
    )
    joined = hash_join(
        cust_orders,
        li.map_batches(li_prep, batch_format="pyarrow"),
        on="o_orderkey",
        left_cols=["o_orderdate", "o_orderpriority"],
        right_cols=["rev_c100"],
    )

    def post(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch["o_orderkey"],
                "rev_c100": batch["rev_c100"],
                "orderdate_us": pc.cast(batch["o_orderdate"], pa.int64()),
                "o_orderpriority": batch["o_orderpriority"],
            }
        )

    per_order = (
        joined.map_batches(post, batch_format="pyarrow")
        .groupby(["l_orderkey", "orderdate_us", "o_orderpriority"])
        .aggregate(Sum("rev_c100", alias_name="revenue_c100"))
    )
    top = per_order.sort(
        key=["revenue_c100", "l_orderkey"], descending=[True, False]
    ).limit(10)
    return finalize(
        top.map_batches(
            lambda b: b.select(
                ["l_orderkey", "revenue_c100", "orderdate_us", "o_orderpriority"]
            ),
            batch_format="pyarrow",
        ),
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("revenue_c100", pa.int64()),
                ("orderdate_us", pa.int64()),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )
