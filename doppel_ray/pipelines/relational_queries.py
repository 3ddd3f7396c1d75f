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


_Q6_LO, _Q6_HI = "1997-01-01", "1998-01-01"


@query(
    "revenue_forecast",
    f"""
    SELECT CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
                    * CAST(floor(l_discount * 100) AS BIGINT)) AS BIGINT)
             AS revenue_c10000,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{_Q6_LO}'
      AND l_shipdate <  TIMESTAMP '{_Q6_HI}'
      AND CAST(floor(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def revenue_forecast(sf_dir: str):
    """TPC-H Q6-flavor forecast-revenue-change: the pure scan-filter-
    aggregate shape — one column-pruned streaming pass, per-batch int64
    partial sums, a global aggregate, ZERO shuffles. The discount window
    compares floor(d*100) integers on both engines so no float boundary
    can disagree."""
    from ray.data.aggregate import Count, Sum

    lo = np.datetime64(_Q6_LO, "us").item()
    hi = np.datetime64(_Q6_HI, "us").item()

    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(
                    batch["l_shipdate"], pa.scalar(lo, type=pa.timestamp("us"))
                ),
                pc.less(batch["l_shipdate"], pa.scalar(hi, type=pa.timestamp("us"))),
            ),
            pc.less(batch["l_quantity"], 24.0),
        )
        t = batch.filter(mask)
        disc = _cents(t["l_discount"])
        t = t.filter(pa.array((disc >= 5) & (disc <= 7)))
        disc = disc[(disc >= 5) & (disc <= 7)]
        rev = _cents(t["l_extendedprice"]) * disc
        return pa.table({"rev_c10000": pa.array(rev, type=pa.int64())})

    agg = ds.map_batches(prep, batch_format="pyarrow").aggregate(
        Sum("rev_c10000", alias_name="revenue_c10000"), Count(alias_name="n_rows")
    )
    return pa.table(
        {
            "revenue_c10000": pa.array(
                [agg["revenue_c10000"] or 0], type=pa.int64()
            ),
            "n_rows": pa.array([agg["n_rows"] or 0], type=pa.int64()),
        }
    )


_Q5_REGION = "ASIA"
_Q5_LO, _Q5_HI = "1997-01-01", "1998-01-01"


@query(
    "regional_supplier_volume",
    f"""
    SELECT n_name,
           CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(floor(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_c100,
           count(*) AS n_rows
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = '{_Q5_REGION}'
      AND o_orderdate >= TIMESTAMP '{_Q5_LO}'
      AND o_orderdate <  TIMESTAMP '{_Q5_HI}'
    GROUP BY n_name
    """,
)
def regional_supplier_volume(sf_dir: str):
    """TPC-H Q5-flavor local-supplier volume: the star-schema join mix.
    nation x region resolve to a driver key set (tiny); supplier is a
    dimension -> ``broadcast_join`` onto lineitem (map-side, zero
    shuffle); customer x orders and the orderkey join are the genuinely
    large-x-large legs -> ``hash_join`` (one tagged-union exchange
    each). The same-nation predicate filters AFTER the joins, exactly
    as written; revenue is exact int64."""
    from ray.data.aggregate import Count, Sum

    from doppel_ray.stages.joins import broadcast_join, hash_join
    from doppel_ray.stages.util import collect_table

    lo = np.datetime64(_Q5_LO, "us").item()
    hi = np.datetime64(_Q5_HI, "us").item()

    nation = collect_table(
        read_table(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"])
    )
    region = collect_table(
        read_table(sf_dir, "region", columns=["r_regionkey", "r_name"])
    )
    region_keys = region.filter(pc.equal(region["r_name"], _Q5_REGION))[
        "r_regionkey"
    ]
    nation = nation.filter(pc.is_in(nation["n_regionkey"], value_set=region_keys))
    nation_keys = nation["n_nationkey"]

    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    supp_slim = supp.map_batches(
        lambda b: b.filter(pc.is_in(b["s_nationkey"], value_set=nation_keys)),
        batch_format="pyarrow",
    )

    cust = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda b: b.filter(pc.is_in(b["c_nationkey"], value_set=nation_keys)),
        batch_format="pyarrow",
    )
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(
                    b["o_orderdate"], pa.scalar(lo, type=pa.timestamp("us"))
                ),
                pc.less(b["o_orderdate"], pa.scalar(hi, type=pa.timestamp("us"))),
            )
        ).select(["o_orderkey", "o_custkey"]).rename_columns(
            ["o_orderkey", "c_custkey"]
        ),
        batch_format="pyarrow",
    )
    cust_orders = hash_join(
        cust, orders, on="c_custkey", left_cols=["c_nationkey"],
        right_cols=["o_orderkey"],
    ).map_batches(
        lambda b: b.select(["o_orderkey", "c_nationkey"]), batch_format="pyarrow"
    )

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b["l_orderkey"],
                "s_suppkey": b["l_suppkey"],
                "rev_c100": pa.array(
                    _cents(b["l_extendedprice"]) * (100 - _cents(b["l_discount"])),
                    type=pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    li_supp = broadcast_join(
        li, supp_slim, on="s_suppkey", small_cols=["s_nationkey"]
    )
    joined = hash_join(
        cust_orders,
        li_supp,
        on="o_orderkey",
        left_cols=["c_nationkey"],
        right_cols=["s_nationkey", "rev_c100"],
    ).map_batches(
        lambda b: b.filter(
            pc.equal(
                pc.cast(b["c_nationkey"], pa.int32()),
                pc.cast(b["s_nationkey"], pa.int32()),
            )
        ).select(["s_nationkey", "rev_c100"]),
        batch_format="pyarrow",
    )
    agg = joined.groupby("s_nationkey").aggregate(
        Sum("rev_c100", alias_name="revenue_c100"), Count(alias_name="n_rows")
    )
    out = finalize(
        agg,
        pa.schema(
            [
                ("s_nationkey", pa.int32()),
                ("revenue_c100", pa.int64()),
                ("n_rows", pa.int64()),
            ]
        ),
    )
    # attach the nation name from the (driver-resident, <= 25-row) dim
    idx = pc.index_in(out["s_nationkey"], value_set=nation["n_nationkey"])
    return pa.table(
        {
            "n_name": nation["n_name"].take(idx),
            "revenue_c100": out["revenue_c100"],
            "n_rows": out["n_rows"],
        }
    )


_Q10_LO, _Q10_HI = "1997-01-01", "1997-07-01"
_Q10_K = 20


@query(
    "returned_top_customers",
    f"""
    SELECT c_custkey,
           c_name,
           CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(floor(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_c100
    FROM customer, orders, lineitem
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '{_Q10_LO}'
      AND o_orderdate <  TIMESTAMP '{_Q10_HI}'
    GROUP BY c_custkey, c_name
    ORDER BY revenue_c100 DESC, c_custkey
    LIMIT {_Q10_K}
    """,
)
def returned_top_customers(sf_dir: str):
    """TPC-H Q10-flavor returned-item report: lineitem pre-reduces to
    (orderkey, revenue) partials BEFORE the join (the combiner-first
    rule — the exchange carries one row per surviving order line, no
    payloads), one hash join against the date-windowed orders, a narrow
    custkey groupby, top-20 off the aggregated relation, and the
    customer names come from a 20-key broadcast filter over the
    customer stream — the big dim never ships anywhere."""
    from ray.data.aggregate import Sum

    from doppel_ray.stages.joins import hash_join
    from doppel_ray.stages.util import collect_table

    lo = np.datetime64(_Q10_LO, "us").item()
    hi = np.datetime64(_Q10_HI, "us").item()

    li = read_table(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda b: (
            lambda t: pa.table(
                {
                    "o_orderkey": t["l_orderkey"],
                    "rev_c100": pa.array(
                        _cents(t["l_extendedprice"])
                        * (100 - _cents(t["l_discount"])),
                        type=pa.int64(),
                    ),
                }
            )
        )(b.filter(pc.equal(b["l_returnflag"], "R"))),
        batch_format="pyarrow",
    )
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(
                    b["o_orderdate"], pa.scalar(lo, type=pa.timestamp("us"))
                ),
                pc.less(b["o_orderdate"], pa.scalar(hi, type=pa.timestamp("us"))),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    joined = hash_join(
        orders, li, on="o_orderkey", left_cols=["o_custkey"],
        right_cols=["rev_c100"],
    )
    per_cust = joined.groupby("o_custkey").aggregate(
        Sum("rev_c100", alias_name="revenue_c100")
    )
    top = finalize(
        per_cust.sort(
            key=["revenue_c100", "o_custkey"], descending=[True, False]
        ).limit(_Q10_K),
        pa.schema([("o_custkey", pa.int64()), ("revenue_c100", pa.int64())]),
    )
    keys = top["o_custkey"]
    names = collect_table(
        read_table(sf_dir, "customer", columns=["c_custkey", "c_name"]).map_batches(
            lambda b: b.filter(pc.is_in(b["c_custkey"], value_set=keys)),
            batch_format="pyarrow",
        ),
        pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string())]),
    )
    idx = pc.index_in(keys, value_set=names["c_custkey"])
    return pa.table(
        {
            "c_custkey": keys,
            "c_name": names["c_name"].take(idx),
            "revenue_c100": top["revenue_c100"],
        }
    )


_Q4_LO, _Q4_HI = "1997-01-01", "1997-04-01"
_Q4_QTY = 45.0


@query(
    "priority_order_counts",
    f"""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{_Q4_LO}'
      AND o_orderdate <  TIMESTAMP '{_Q4_HI}'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity >= {_Q4_QTY})
    GROUP BY o_orderpriority
    """,
)
def priority_order_counts(sf_dir: str):
    """TPC-H Q4-flavor priority check: the EXISTS big-big semi-join
    shape. The lineitem side reduces to DISTINCT qualifying orderkeys
    (in-batch dedupe first, then one narrow key-only groupby — the
    exchange carries keys, never lineitem payloads), the date-windowed
    orders inner-join that key relation (a semi-join because the keys
    are distinct), and the priority rollup is a second, tiny shuffle."""
    from ray.data.aggregate import Count

    from doppel_ray.stages.joins import hash_join

    lo = np.datetime64(_Q4_LO, "us").item()
    hi = np.datetime64(_Q4_HI, "us").item()

    li_keys = (
        read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
        .map_batches(
            # in-batch dedupe shrinks the exchange before the groupby
            lambda b: pa.table(
                {
                    "o_orderkey": pa.compute.unique(
                        b.filter(
                            pa.compute.greater_equal(b["l_quantity"], _Q4_QTY)
                        )["l_orderkey"]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("o_orderkey")
        .aggregate(Count(alias_name="__n"))
        .map_batches(
            lambda b: b.select(["o_orderkey"]), batch_format="pyarrow"
        )
    )
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(
                    b["o_orderdate"], pa.scalar(lo, type=pa.timestamp("us"))
                ),
                pc.less(b["o_orderdate"], pa.scalar(hi, type=pa.timestamp("us"))),
            )
        ).select(["o_orderkey", "o_orderpriority"]),
        batch_format="pyarrow",
    )
    hit = hash_join(
        orders, li_keys, on="o_orderkey", left_cols=["o_orderpriority"],
        right_cols=[],
    )
    agg = hit.groupby("o_orderpriority").aggregate(Count(alias_name="n_orders"))
    return finalize(
        agg,
        pa.schema([("o_orderpriority", pa.string()), ("n_orders", pa.int64())]),
    )


@query(
    "top_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, price_c, rnk FROM (
      SELECT o_custkey, o_orderkey,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c,
             CAST(row_number() OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT) DESC,
                          o_orderkey) AS BIGINT) AS rnk
      FROM orders)
    WHERE rnk <= 3
    """,
)
def top_orders_per_customer(sf_dir: str):
    """``row_number() OVER (PARTITION BY custkey ORDER BY price DESC)``
    with a top-3-per-customer prune — the distributed window-function
    shape (stages/rank.py): ONE bucketed shuffle on the partition key,
    per-bucket C-speed sort + cumcount, the N-per-key prune applied
    INSIDE the bucket so the exchange out is bounded by 3 x customers.
    Money floored to cents on both engines so ordering ties match."""
    from doppel_ray.stages.rank import window_rank

    ds = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    ).map_batches(
        lambda b: pa.table(
            {
                "o_custkey": b["o_custkey"],
                "o_orderkey": b["o_orderkey"],
                "price_c": pa.array(_cents(b["o_totalprice"]), type=pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    ranked = window_rank(
        ds,
        "o_custkey",
        ["price_c", "o_orderkey"],
        ascending=[False, True],
        out_col="rnk",
        limit=3,
    )
    return finalize(
        ranked,
        pa.schema(
            [
                ("o_custkey", pa.int64()),
                ("o_orderkey", pa.int64()),
                ("price_c", pa.int64()),
                ("rnk", pa.int64()),
            ]
        ),
    )


_INACTIVE_CUTOFF = "1998-01-01"


@query(
    "inactive_customers",
    f"""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '{_INACTIVE_CUTOFF}')
    """,
)
def inactive_customers(sf_dir: str):
    """NOT EXISTS anti-join: customers with no recent order. The fact
    side reduces to DISTINCT qualifying custkeys (in-batch unique, then
    a narrow key-only groupby — the exchange carries keys only), and
    the customer stream anti-filters against the broadcast key set
    (semi_filter invert=True — exact is_in/searchsorted, NEVER the
    Bloom path: a Bloom FP would wrongly drop a customer). Broadcast is
    bounded by the active-customer dimension, the same class as the
    dimension-lookup joins; past that, the exact fallback is the
    tagged-union bucketed anti-join (stages/joins.py shape)."""
    from doppel_ray.stages.exact import semi_filter
    from doppel_ray.stages.util import collect_table

    cutoff = np.datetime64(_INACTIVE_CUTOFF, "us").item()
    active = (
        read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
        .map_batches(
            lambda b: pa.table(
                {
                    "k": pc.unique(
                        b.filter(
                            pc.greater_equal(
                                b["o_orderdate"],
                                pa.scalar(cutoff, type=pa.timestamp("us")),
                            )
                        )["o_custkey"]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("k")
        .aggregate(Count(alias_name="__n"))
    )
    keys = collect_table(
        active.map_batches(lambda b: b.select(["k"]), batch_format="pyarrow"),
        pa.schema([("k", pa.int64())]),
    )["k"].combine_chunks()
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    out = semi_filter(cust, "c_custkey", keys, invert=True)
    return finalize(
        out,
        pa.schema([("c_custkey", pa.int64()), ("c_mktsegment", pa.string())]),
    )


_ROLL_LO, _ROLL_HI = "1997-01-01", "1997-07-01"


@query(
    "rolling_daily_revenue",
    f"""
    SELECT day_us, rev_c,
           CAST(sum(rev_c) OVER (ORDER BY day_us
                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rev7_c
    FROM (
      SELECT CAST(epoch_us(date_trunc('day', o_orderdate)) AS BIGINT) AS day_us,
             CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '{_ROLL_LO}'
        AND o_orderdate <  TIMESTAMP '{_ROLL_HI}'
      GROUP BY 1)
    """,
)
def rolling_daily_revenue(sf_dir: str):
    """Trailing-7-row rolling revenue over daily totals: the corpus
    reduces to one row per calendar day (a narrow distributed groupby —
    the only stage that sees data volume), and the rolling window runs
    on the driver over the CALENDAR-BOUNDED aggregate via one int64
    cumsum difference (stages/rank.py rolling_sum_rows) — the axis is
    bounded by days in the date window, never by corpus size, the same
    bounded-finalize class as every other oracle-paired aggregate."""
    from doppel_ray.stages.rank import rolling_sum_rows

    lo = np.datetime64(_ROLL_LO, "us").item()
    hi = np.datetime64(_ROLL_HI, "us").item()

    def prep(batch: pa.Table) -> pa.Table:
        b = batch.filter(
            pc.and_(
                pc.greater_equal(
                    batch["o_orderdate"], pa.scalar(lo, type=pa.timestamp("us"))
                ),
                pc.less(
                    batch["o_orderdate"], pa.scalar(hi, type=pa.timestamp("us"))
                ),
            )
        )
        day = pc.cast(pc.floor_temporal(b["o_orderdate"], unit="day"), pa.int64())
        return pa.table(
            {
                "day_us": day,
                "rev_c": pa.array(_cents(b["o_totalprice"]), type=pa.int64()),
            }
        )

    daily = finalize(
        read_table(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("day_us")
        .aggregate(Sum("rev_c", alias_name="rev_c")),
        pa.schema([("day_us", pa.int64()), ("rev_c", pa.int64())]),
    )
    order = np.argsort(daily["day_us"].to_numpy(), kind="stable")
    day_us = daily["day_us"].to_numpy()[order]
    rev = daily["rev_c"].to_numpy()[order]
    return pa.table(
        {
            "day_us": pa.array(day_us, type=pa.int64()),
            "rev_c": pa.array(rev, type=pa.int64()),
            "rev7_c": pa.array(rolling_sum_rows(rev, 7), type=pa.int64()),
        }
    )


@query(
    "acctbal_band_coverage",
    """
    WITH c AS (SELECT CAST(floor(c_acctbal / 100) AS BIGINT) AS band,
                      count(*) AS n_cust
               FROM customer GROUP BY 1),
         s AS (SELECT CAST(floor(s_acctbal / 100) AS BIGINT) AS band,
                      count(*) AS n_supp
               FROM supplier GROUP BY 1)
    SELECT COALESCE(c.band, s.band) AS band,
           CAST(COALESCE(n_cust, 0) AS BIGINT) AS n_cust,
           CAST(COALESCE(n_supp, 0) AS BIGINT) AS n_supp
    FROM c FULL OUTER JOIN s ON c.band = s.band
    """,
)
def acctbal_band_coverage(sf_dir: str):
    """FULL OUTER JOIN: account-balance band histogram of customers vs
    suppliers, keeping bands present on either side (unmatched side
    null -> 0). Both inputs pre-reduce to narrow per-band counts before
    the join, so the exchange carries band histograms, never rows."""
    from ray.data.aggregate import Count

    from doppel_ray.stages.joins import hash_join

    def banded(table: str, col: str, out: str):
        return (
            read_table(sf_dir, table, columns=[col])
            .map_batches(
                lambda b: pa.table(
                    {
                        "band": pa.array(
                            np.floor(
                                b[col].to_numpy(zero_copy_only=False) / 100.0
                            ).astype(np.int64),
                            type=pa.int64(),
                        )
                    }
                ),
                batch_format="pyarrow",
            )
            .groupby("band")
            .aggregate(Count(alias_name=out))
        )

    joined = hash_join(
        banded("customer", "c_acctbal", "n_cust"),
        banded("supplier", "s_acctbal", "n_supp"),
        on="band",
        left_cols=["n_cust"],
        right_cols=["n_supp"],
        how="outer",
    )
    filled = joined.map_batches(
        lambda b: pa.table(
            {
                "band": b["band"],
                "n_cust": pc.fill_null(b["n_cust"], 0),
                "n_supp": pc.fill_null(b["n_supp"], 0),
            }
        ),
        batch_format="pyarrow",
    )
    return finalize(
        filled,
        pa.schema(
            [("band", pa.int64()), ("n_cust", pa.int64()), ("n_supp", pa.int64())]
        ),
    )


@query(
    "returnflag_corr_moments",
    """
    SELECT l_returnflag,
           count(*) AS n,
           CAST(sum(q) AS BIGINT) AS sum_q,
           CAST(sum(p) AS BIGINT) AS sum_p,
           CAST(sum(q * q) AS BIGINT) AS sum_qq,
           CAST(sum(p * p) AS BIGINT) AS sum_pp,
           CAST(sum(q * p) AS BIGINT) AS sum_qp
    FROM (SELECT l_returnflag,
                 CAST(floor(l_quantity) AS BIGINT) AS q,
                 CAST(floor(l_extendedprice) AS BIGINT) AS p
          FROM lineitem)
    GROUP BY l_returnflag
    """,
)
def returnflag_corr_moments(sf_dir: str):
    """Decomposable second-moment aggregates (the covariance/correlation
    base: n, sum x, sum y, sum x^2, sum y^2, sum xy) per return flag —
    Pearson's r and variances derive from these six numbers, so shipping
    them as exact int64 partials is the scale-correct way to compute
    correlation: one column-pruned pass, narrow combiner-first groupby,
    no float accumulation order anywhere. Price floored to whole units
    so the squared sums stay inside int64 (~6e15 at sf0.1; the guard
    raises long before wrap)."""
    ds = read_table(
        sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        q = _cents(batch["l_quantity"], 1)
        p = _cents(batch["l_extendedprice"], 1)
        pp = p * p
        if len(pp) and pp.max() > _SUM_GUARD // max(len(pp), 1):
            raise ValueError(
                "returnflag_corr_moments: p^2 partials near int64 range; "
                "rescale units before summing"
            )
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "q": pa.array(q, type=pa.int64()),
                "p": pa.array(p, type=pa.int64()),
                "qq": pa.array(q * q, type=pa.int64()),
                "pp": pa.array(pp, type=pa.int64()),
                "qp": pa.array(q * p, type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Count(alias_name="n"),
            Sum("q", alias_name="sum_q"),
            Sum("p", alias_name="sum_p"),
            Sum("qq", alias_name="sum_qq"),
            Sum("pp", alias_name="sum_pp"),
            Sum("qp", alias_name="sum_qp"),
        )
    )
    return finalize(
        agg,
        pa.schema(
            [
                ("l_returnflag", pa.string()),
                ("n", pa.int64()),
                ("sum_q", pa.int64()),
                ("sum_p", pa.int64()),
                ("sum_qq", pa.int64()),
                ("sum_pp", pa.int64()),
                ("sum_qp", pa.int64()),
            ]
        ),
    )


@query(
    "order_count_distribution",
    """
    SELECT c_count, count(*) AS n_cust
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
)
def order_count_distribution(sf_dir: str):
    """TPC-H Q13-flavor distribution of orders-per-customer WITHOUT the
    left join: orders reduce to a narrow (custkey, count) groupby
    (bounded by customers), the distribution is a second tiny groupby
    over that aggregate, and zero-order customers come from plain
    cardinality arithmetic (total customers minus customers with
    orders) instead of shuffling the customer payload at all."""
    orders = read_table(sf_dir, "orders", columns=["o_custkey"])
    per_cust = orders.groupby("o_custkey").aggregate(Count(alias_name="c_count"))
    dist = (
        per_cust.groupby("c_count").aggregate(Count(alias_name="n_cust")).take_all()
    )
    n_customers = read_table(sf_dir, "customer", columns=["c_custkey"]).count()
    n_with_orders = sum(r["n_cust"] for r in dist)
    rows = [
        {"c_count": int(r["c_count"]), "n_cust": int(r["n_cust"])} for r in dist
    ]
    if n_customers - n_with_orders > 0:
        rows.append({"c_count": 0, "n_cust": n_customers - n_with_orders})
    return pa.Table.from_pylist(
        rows, schema=pa.schema([("c_count", pa.int64()), ("n_cust", pa.int64())])
    )


_Q18_MIN_QTY = 250


@query(
    "large_orders",
    f"""
    SELECT o.o_orderkey, o.o_custkey,
           epoch_us(o.o_orderdate) AS orderdate_us,
           CAST(floor(o.o_totalprice * 100) AS BIGINT) AS totalprice_c,
           t.sum_qty
    FROM orders o
    JOIN (SELECT l_orderkey,
                 CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum_qty > {_Q18_MIN_QTY}) t
      ON o.o_orderkey = t.l_orderkey
    """,
)
def large_orders(sf_dir: str):
    """TPC-H Q18-flavor large-volume orders: lineitem reduces to a
    narrow (orderkey, qty-sum) groupby FIRST, the HAVING filter shrinks
    it to the heavy tail, and only then does a hash join attach the
    order payload — the aggregate-before-join shape that keeps the
    exchange at key-width regardless of line-item fanout."""
    from doppel_ray.stages.joins import hash_join

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["l_orderkey"],
                "qty": pa.array(_cents(batch["l_quantity"], 1), type=pa.int64()),
            }
        )

    sums = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Sum("qty", alias_name="sum_qty"))
        .filter(expr=f"sum_qty > {_Q18_MIN_QTY}")
    )

    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )

    def oprep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_custkey": batch["o_custkey"],
                "orderdate_us": pc.cast(batch["o_orderdate"], pa.int64()),
                "totalprice_c": pa.array(
                    _cents(batch["o_totalprice"]), type=pa.int64()
                ),
            }
        )

    joined = hash_join(
        orders.map_batches(oprep, batch_format="pyarrow"),
        sums,
        on="o_orderkey",
        left_cols=["o_custkey", "orderdate_us", "totalprice_c"],
        right_cols=["sum_qty"],
    )
    return finalize(
        joined,
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("orderdate_us", pa.int64()),
                ("totalprice_c", pa.int64()),
                ("sum_qty", pa.int64()),
            ]
        ),
    )


@query(
    "pricing_rollup",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def pricing_rollup(sf_dir: str):
    """GROUP BY ROLLUP: the hierarchy of subtotals (flag x status, per
    flag, grand total) derived from ONE narrow two-key groupby — the
    finest aggregate is bounded (flags x statuses rows), so coarser
    levels are driver arithmetic over it, never a second corpus pass.
    NULL group markers match SQL ROLLUP's."""
    ds = read_table(
        sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty": pa.array(_cents(batch["l_quantity"], 1), type=pa.int64()),
            }
        )

    base = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Count(alias_name="n"), Sum("qty", alias_name="sum_qty"))
        .take_all()
    )
    rows = [
        {
            "l_returnflag": r["l_returnflag"],
            "l_linestatus": r["l_linestatus"],
            "n": int(r["n"]),
            "sum_qty": int(r["sum_qty"]),
        }
        for r in base
    ]
    per_flag: dict[str, dict] = {}
    total = {"n": 0, "sum_qty": 0}
    for r in rows:
        f = per_flag.setdefault(
            r["l_returnflag"], {"n": 0, "sum_qty": 0}
        )
        f["n"] += r["n"]
        f["sum_qty"] += r["sum_qty"]
        total["n"] += r["n"]
        total["sum_qty"] += r["sum_qty"]
    out = list(rows)
    out += [
        {"l_returnflag": k, "l_linestatus": None, **v}
        for k, v in per_flag.items()
    ]
    out.append({"l_returnflag": None, "l_linestatus": None, **total})
    return pa.Table.from_pylist(
        out,
        schema=pa.schema(
            [
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("n", pa.int64()),
                ("sum_qty", pa.int64()),
            ]
        ),
    )
