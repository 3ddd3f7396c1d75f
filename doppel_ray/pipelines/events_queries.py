"""Windowed-aggregate and sessionization queries over the ``events``
table — the streaming-style operators of a training-data pipeline,
expressed as groupby compositions with exact SQL oracles (integer-only
outputs: epoch micros and scaled-integer sums, so no float hash drift).
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
