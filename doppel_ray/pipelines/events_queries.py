"""Windowed-aggregate, sessionization, and time-keyed join queries over
the ``events`` table — the streaming-style operators of a training-data
pipeline, expressed as groupby/bucketed-shuffle compositions with exact
SQL oracles (integer-only outputs: epoch micros, ids, and
scaled-integer sums, so no float hash drift).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Min, Sum

from doppel_ray.pipelines import finalize, query
from doppel_ray.sources.parquet import read_events
from doppel_ray.stages import windows


@query(
    "events_hourly",
    """
    SELECT epoch_us(date_trunc('hour', ts)) AS window_us,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly(sf_dir: str):
    """Tumbling 1-hour window aggregate: window key via Arrow
    floor_temporal, then a plain groupby shuffle — a window IS a
    group-by on floor(ts). value summed in scaled integers so the
    oracle compare is exact."""
    ds = read_events(sf_dir, columns=["ts", "event_type", "value"])
    ds = windows.add_tumbling_window(ds, every="hour")

    def prep(batch: pa.Table) -> pa.Table:
        w_us = pc.cast(batch["window_start"], pa.int64())
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "window_us": w_us,
                "event_type": batch["event_type"],
                "value_cents": pa.array(cents, type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["window_us", "event_type"])
        .aggregate(Count(alias_name="n"), Sum("value_cents", alias_name="value_cents"))
    )
    return finalize(
        agg,
        pa.schema(
            [
                ("window_us", pa.int64()),
                ("event_type", pa.string()),
                ("n", pa.int64()),
                ("value_cents", pa.int64()),
            ]
        ),
    )


@query(
    "events_hopping",
    # window w covers ts iff w = hopfloor(ts) - j*hop for j in 0..k-1,
    # so the oracle is the same replicate-then-group in integer epoch
    # arithmetic (hop = 15 min = 9e8 us, length = 1 h, k = 4)
    """
    SELECT (epoch_us(ts) // 900000000) * 900000000 - j * 900000000 AS window_us,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events, LATERAL (SELECT unnest(generate_series(0, 3)) AS j)
    GROUP BY 1, 2
    """,
)
def events_hopping(sf_dir: str):
    """Hopping-window aggregate (1-hour windows every 15 minutes): each
    event fans out to its 4 covering windows via one vectorized take,
    then the same groupby shuffle as the tumbling case."""
    ds = read_events(sf_dir, columns=["ts", "event_type", "value"])
    ds = windows.add_hopping_windows(ds, length_minutes=60, hop_minutes=15)

    def prep(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "window_us": batch["window_us"],
                "event_type": batch["event_type"],
                "value_cents": pa.array(cents, type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["window_us", "event_type"])
        .aggregate(Count(alias_name="n"), Sum("value_cents", alias_name="value_cents"))
    )
    return finalize(
        agg,
        pa.schema(
            [
                ("window_us", pa.int64()),
                ("event_type", pa.string()),
                ("n", pa.int64()),
                ("value_cents", pa.int64()),
            ]
        ),
    )


@query(
    "user_sessions",
    """
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, event_id, ts,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT
                   ) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) AS session_end_us
    FROM numbered GROUP BY 1, 2
    """,
)
def user_sessions(sf_dir: str):
    """Gap-based session windows (30-min timeout): bucketed shuffle on
    user_id + vectorized per-user cumsum — matches the SQL lag/cumsum
    formulation row for row."""
    ds = read_events(sf_dir, columns=["user_id", "event_id", "ts"])
    return finalize(
        windows.sessionize(ds, gap_minutes=30.0), windows.SESSION_SCHEMA
    )


@query(
    "events_asof",
    # DuckDB's native ASOF JOIN is the oracle: for each click, the
    # latest at-or-before purchase of the same user. The right side is
    # pre-deduped to one row per (user, ts) — max event_id — so the tie
    # rule is well-defined on both sides.
    """
    WITH l AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    r AS (
      SELECT user_id, ts, max(event_id) AS match_id
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    )
    SELECT l.event_id, r.match_id, epoch_us(r.ts) AS match_ts_us
    FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def events_asof(sf_dir: str):
    """As-of join (stages/joins.py): each click event picks the same
    user's most recent purchase at-or-before it — one tagged-union
    bucketed shuffle, per-bucket ``merge_asof``. Integer-only output
    (ids + epoch micros)."""
    from ray.data.aggregate import Max

    from doppel_ray.stages.joins import asof_join

    ds = read_events(sf_dir, columns=["event_id", "user_id", "ts", "event_type"])

    def to_us(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
            }
        )

    left = ds.filter(expr="event_type == 'click'").map_batches(
        to_us, batch_format="pyarrow"
    )
    right = (
        ds.filter(expr="event_type == 'purchase'")
        .map_batches(to_us, batch_format="pyarrow")
        .groupby(["user_id", "ts_us"])
        .aggregate(Max("event_id", alias_name="match_id"))
    )

    def carry_ts(batch: pa.Table) -> pa.Table:
        return batch.append_column("match_ts_us", batch["ts_us"])

    right = right.map_batches(carry_ts, batch_format="pyarrow")
    joined = asof_join(
        left,
        right,
        by="user_id",
        on="ts_us",
        left_cols=["event_id"],
        right_cols=["match_id", "match_ts_us"],
        inner=True,
    ).select_columns(["event_id", "match_id", "match_ts_us"])
    return finalize(
        joined,
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("match_id", pa.int64()),
                ("match_ts_us", pa.int64()),
            ]
        ),
    )


@query(
    "events_range_join",
    """
    SELECT l.user_id, l.event_id AS click_id, r.event_id AS purchase_id
    FROM events l JOIN events r
      ON r.user_id = l.user_id
     AND l.event_type = 'click' AND r.event_type = 'purchase'
     AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR
    """,
)
def events_range_join(sf_dir: str):
    """Bounded range join (stages/joins.py): every (click, purchase)
    pair of the same user with the purchase strictly after the click
    and within one hour — per-bucket segment searchsorted, exact."""
    from doppel_ray.stages.joins import range_join

    ds = read_events(sf_dir, columns=["event_id", "user_id", "ts", "event_type"])

    def rename(new: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    new: batch["event_id"],
                    "user_id": batch["user_id"],
                    "ts": batch["ts"],
                }
            )

        return fn

    left = ds.filter(expr="event_type == 'click'").map_batches(
        rename("click_id"), batch_format="pyarrow"
    )
    right = ds.filter(expr="event_type == 'purchase'").map_batches(
        rename("purchase_id"), batch_format="pyarrow"
    )
    pairs = range_join(
        left,
        right,
        by="user_id",
        on="ts",
        left_id="click_id",
        right_id="purchase_id",
        lower_us=0,
        upper_us=3_600_000_000,
    )
    return finalize(
        pairs,
        pa.schema(
            [
                ("user_id", pa.int64()),
                ("click_id", pa.int64()),
                ("purchase_id", pa.int64()),
            ]
        ),
    )


@query(
    "event_type_stats",
    """
    SELECT event_type, count(*) AS n,
           min(event_id) AS first_id, max(event_id) AS last_id
    FROM events GROUP BY 1
    """,
)
def event_type_stats(sf_dir: str):
    """Plain grouped aggregate over events (shuffle smoke check)."""
    ds = read_events(sf_dir, columns=["event_type", "event_id"])
    agg = ds.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Min("event_id", alias_name="first_id"),
        Max("event_id", alias_name="last_id"),
    )
    return finalize(
        agg,
        pa.schema(
            [
                ("event_type", pa.string()),
                ("n", pa.int64()),
                ("first_id", pa.int64()),
                ("last_id", pa.int64()),
            ]
        ),
    )


@query(
    "nation_order_stats",
    # Plain large-x-large equi-join (stages/joins.py hash_join: ONE
    # bucketed shuffle of the tagged union, per-bucket pandas merge) +
    # grouped aggregate. Only order-independent aggregates (count, max)
    # are compared — a float SUM would hash-mismatch on summation order.
    """
    SELECT c.c_nationkey AS nationkey,
           count(*) AS n_orders,
           max(o.o_totalprice) AS max_price
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1
    """,
)
def nation_order_stats(sf_dir: str):
    """TPC-H-style customer x orders join rolled up per nation."""
    from doppel_ray.sources.parquet import read_table
    from doppel_ray.stages.joins import hash_join

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda b: b.rename_columns(["c_custkey", "o_totalprice"]),
        batch_format="pyarrow",
    )
    joined = hash_join(
        cust,
        orders,
        on="c_custkey",
        left_cols=["c_nationkey"],
        right_cols=["o_totalprice"],
    )
    out = (
        joined.groupby("c_nationkey")
        .aggregate(
            Count(alias_name="n_orders"),
            Max("o_totalprice", alias_name="max_price"),
        )
        .rename_columns({"c_nationkey": "nationkey"})
    )
    return finalize(
        out,
        pa.schema(
            [
                ("nationkey", pa.int64()),
                ("n_orders", pa.int64()),
                ("max_price", pa.float64()),
            ]
        ),
    )


@query(
    "event_lag_gaps",
    """
    SELECT event_id, user_id, gap_us FROM (
      SELECT event_id, user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events)
    WHERE gap_us IS NOT NULL
    """,
)
def event_lag_gaps(sf_dir: str):
    """``lag() OVER (PARTITION BY user ORDER BY ts, id)`` inter-event
    gaps (stages/rank.py lag_delta_us): one bucketed shuffle on user_id
    co-locates each user's events, then a vectorized lexsort +
    groupby-diff per bucket. Ties on ts break by event_id on both
    engines, so the predecessor of every row is identical. Each user's
    first event (no predecessor) is dropped, matching the oracle's
    IS NOT NULL."""
    from doppel_ray.stages.rank import lag_delta_us

    ds = read_events(sf_dir, columns=["event_id", "ts", "user_id"])
    out = lag_delta_us(ds, "user_id", "ts", "event_id").map_batches(
        lambda b: b.select(["event_id", "user_id", "gap_us"]),
        batch_format="pyarrow",
    )
    return finalize(
        out,
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("user_id", pa.int64()),
                ("gap_us", pa.int64()),
            ]
        ),
    )


@query(
    "event_value_extremes",
    """
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_c,
           CAST(min(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS min_c,
           CAST(max(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS max_c
    FROM events GROUP BY event_type
    """,
)
def event_value_extremes(sf_dir: str):
    """Hot-key rollup via the skew-mitigated two-stage salted groupby
    (stages/skew.py): event_type has a handful of distinct values, so a
    plain hash groupby lands the whole corpus on a handful of reduce
    tasks — the textbook skew straggler. Salting bounds every stage-1
    partial at ~1/n_salts of a key and the merge shuffle at n_salts rows
    per key. Values floored to cents so the oracle compare is exact."""
    from doppel_ray.stages.skew import salted_aggregate

    ds = read_events(sf_dir, columns=["event_type", "value"]).map_batches(
        lambda b: pa.table(
            {
                "event_type": b["event_type"],
                "v_c": pa.array(
                    np.floor(
                        b["value"].to_numpy(zero_copy_only=False) * 100
                    ).astype(np.int64),
                    type=pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    out = salted_aggregate(
        ds,
        "event_type",
        {
            "n": ("count", ""),
            "total_c": ("sum", "v_c"),
            "min_c": ("min", "v_c"),
            "max_c": ("max", "v_c"),
        },
    )
    return finalize(
        out,
        pa.schema(
            [
                ("event_type", pa.string()),
                ("n", pa.int64()),
                ("total_c", pa.int64()),
                ("min_c", pa.int64()),
                ("max_c", pa.int64()),
            ]
        ),
    )


@query(
    "funnel_counts",
    """
    WITH s0 AS (SELECT user_id, min(ts) t0 FROM events
                WHERE event_type = 'view' GROUP BY 1),
    s1 AS (SELECT e.user_id, min(e.ts) t, any_value(s0.t0) t0
           FROM events e JOIN s0 ON e.user_id = s0.user_id
           WHERE e.event_type = 'click' AND e.ts > s0.t0
             AND e.ts <= s0.t0 + INTERVAL 1 DAY GROUP BY 1),
    s2 AS (SELECT e.user_id, min(e.ts) t
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s1.t
             AND e.ts <= s1.t0 + INTERVAL 1 DAY GROUP BY 1)
    SELECT 1 AS stage, (SELECT count(*) FROM s0) AS n_users
    UNION ALL SELECT 2, (SELECT count(*) FROM s1)
    UNION ALL SELECT 3, (SELECT count(*) FROM s2)
    """,
)
def funnel_counts(sf_dir: str):
    """Windowed conversion funnel (view -> click -> purchase within 1
    day of the first view): per-stage at-least user counts via
    stages/funnel.py — one bucketed shuffle on user_id, pandas stage
    cascade per bucket, then a k-row rollup. Timestamps compared as
    int64 epoch micros so both engines count identically."""
    from doppel_ray.stages.funnel import windowed_funnel

    ds = read_events(sf_dir, columns=["user_id", "event_type", "ts"])
    per_user = windowed_funnel(
        ds,
        user_col="user_id",
        type_col="event_type",
        ts_col="ts",
        sequence=["view", "click", "purchase"],
        window_us=86_400_000_000,
    )
    reached = (
        per_user.groupby("stages_completed")
        .aggregate(Count(alias_name="n"))
        .take_all()
    )
    by_stage = {int(r["stages_completed"]): int(r["n"]) for r in reached}
    n_stages = 3
    rows = [
        {
            "stage": s,
            "n_users": sum(v for k, v in by_stage.items() if k >= s),
        }
        for s in range(1, n_stages + 1)
    ]
    return pa.Table.from_pylist(
        rows, schema=pa.schema([("stage", pa.int64()), ("n_users", pa.int64())])
    )


@query(
    "cohort_retention",
    """
    WITH ud AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        FROM events
    ),
    f AS (
        SELECT day, min(day) OVER (PARTITION BY user_id) AS first_day
        FROM ud
    )
    SELECT first_day AS cohort_day,
           day - first_day AS offset_days,
           count(*) AS n_users
    FROM f
    GROUP BY 1, 2
    """,
)
def cohort_retention(sf_dir: str):
    """Cohort retention triangle: users bucketed by first active day,
    counted per later-active-day offset. Scale shape in
    stages/windows.py:cohort_retention — the shuffle carries distinct
    (user, day) pairs, never the event firehose."""
    ds = read_events(sf_dir, columns=["user_id", "ts"])
    out = windows.cohort_retention(ds, user_col="user_id", ts_col="ts")
    return finalize(
        out,
        pa.schema(
            [
                ("cohort_day", pa.int64()),
                ("offset_days", pa.int64()),
                ("n_users", pa.int64()),
            ]
        ),
    )


@query(
    "segment_event_values",
    # skew-join regime: events x customer on user_id with hot_threshold
    # 80 — the busiest users (>80 events at sf0.01) take the broadcast
    # hot path, the rest the bucketed hash join, so BOTH paths are
    # exercised by the driver run. Values in floor-cents (the
    # pricing_summary integer stance).
    """
    SELECT c.c_mktsegment AS mktsegment, count(*)::BIGINT AS n_events,
           sum(CAST(floor(e.value * 100) AS BIGINT))::BIGINT AS value_cents
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def segment_event_values(sf_dir: str):
    """Per-market-segment event rollup through the HOT-KEY-SPLIT join
    (stages/skew.py skew_join — Spark-AQE-style skew mitigation: keys
    above hot_threshold broadcast their dimension rows and merge
    map-side with zero shuffle; cold keys take the ordinary bucketed
    hash join)."""
    from ray.data.aggregate import Count, Sum

    from doppel_ray.sources.parquet import read_table
    from doppel_ray.stages.skew import skew_join

    events = read_events(sf_dir, columns=["user_id", "value"])

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.multiply(batch["value"], 100.0)), pa.int64()
        )
        return pa.table(
            {"user_id": batch["user_id"], "value_cents": cents}
        )

    left = events.map_batches(to_cents, batch_format="pyarrow")
    cust = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda b: b.rename_columns(["user_id", "c_mktsegment"]),
        batch_format="pyarrow",
    )
    joined = skew_join(
        left, cust,
        on="user_id", left_cols=["value_cents"],
        right_cols=["c_mktsegment"], how="inner", hot_threshold=80,
    )
    agg = joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_events"), Sum("value_cents", alias_name="value_cents")
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "mktsegment": batch["c_mktsegment"],
                "n_events": batch["n_events"],
                "value_cents": batch["value_cents"],
            }
        )

    return finalize(
        agg.map_batches(rename, batch_format="pyarrow"),
        pa.schema(
            [
                ("mktsegment", pa.string()),
                ("n_events", pa.int64()),
                ("value_cents", pa.int64()),
            ]
        ),
    )


@query(
    "value_histogram",
    # equi-width histogram over events.value: bin = floor(value / 50),
    # ONE IEEE division + floor on both engines (exact rounding), then
    # a narrow bounded groupby. Value-range audit before trusting a
    # numeric column.
    """
    SELECT CAST(floor(value / 50) AS BIGINT) AS bin,
           count(*)::BIGINT AS n,
           sum(CAST(floor(value * 100) AS BIGINT))::BIGINT AS value_cents
    FROM events GROUP BY 1
    """,
)
def value_histogram(sf_dir: str):
    """Equi-width histogram of the events value column (the numeric
    profile audit): per-batch vectorized binning + count/sum partials,
    ONE narrow groupby bounded by the bin count."""
    from ray.data.aggregate import Sum

    ds = read_events(sf_dir, columns=["value"])

    def partial(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        bins = np.floor(v / 50.0).astype(np.int64)
        cents = np.floor(v * 100.0).astype(np.int64)
        import pandas as pd

        g = pd.DataFrame({"bin": bins, "c": cents}).groupby(
            "bin", sort=False
        )["c"].agg(["size", "sum"])
        return pa.table(
            {
                "bin": pa.array(g.index.to_numpy(), type=pa.int64()),
                "pn": pa.array(
                    g["size"].to_numpy().astype(np.int64), type=pa.int64()
                ),
                "pc": pa.array(
                    g["sum"].to_numpy().astype(np.int64), type=pa.int64()
                ),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(
            Sum("pn", alias_name="n"), Sum("pc", alias_name="value_cents")
        )
    )
    return finalize(
        agg,
        pa.schema(
            [("bin", pa.int64()), ("n", pa.int64()), ("value_cents", pa.int64())]
        ),
    )


@query(
    "daily_active_users",
    # DAU: distinct users per UTC day — the engagement audit. The
    # shuffle carries DISTINCT (day, user) pairs (combiner-first),
    # never the event firehose.
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           count(DISTINCT user_id)::BIGINT AS dau
    FROM events GROUP BY 1
    """,
)
def daily_active_users(sf_dir: str):
    """Distinct users per day via in-batch (day, user) dedupe partials
    and ONE narrow two-key groupby + per-day pair count (the
    sources_per_lang distinct-pair idiom on the event stream)."""
    from ray.data.aggregate import Count

    ds = read_events(sf_dir, columns=["ts", "user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.cast(
            pc.floor_temporal(batch["ts"], unit="day"), pa.date32()
        )
        t = pa.table({"day": day, "user_id": batch["user_id"]})
        return t.group_by(["day", "user_id"]).aggregate([])

    pairs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["day", "user_id"])
        .count()
        .select_columns(["day", "user_id"])
    )
    agg = pairs.groupby("day").aggregate(Count(alias_name="dau"))
    return finalize(
        agg, pa.schema([("day", pa.date32()), ("dau", pa.int64())])
    )
