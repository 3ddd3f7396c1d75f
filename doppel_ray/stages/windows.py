"""Windowed aggregates and gap-based sessionization over event streams.

Ray Data has no native window operator; both are expressed as the
composition the platform does support (SURVEY.md custom-operator rule):

* tumbling windows: a stateless ``map_batches`` assigns the window key
  (pure Arrow temporal kernel), then an ordinary ``groupby`` shuffle
  aggregates — i.e. a window IS a group-by on floor(ts).
* session windows: bucketed shuffle on ``user_id`` (all of a user's
  events co-locate), then a vectorized per-user pass — sort by
  (ts, id), gaps > timeout start new sessions (cumsum of gap flags).
  Partitioning assumption (documented): one user's events fit a
  bucket's memory; salting a pathological mega-user would split its
  sessions and is deliberately NOT done.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from doppel_ray.stages.exact import bucketed_group_apply

SESSION_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("session_id", pa.int64()),
        ("n_events", pa.int64()),
        ("session_start_us", pa.int64()),
        ("session_end_us", pa.int64()),
    ]
)


def add_tumbling_window(
    ds: Dataset,
    *,
    ts_col: str = "ts",
    every: str = "hour",
    out_col: str = "window_start",
) -> Dataset:
    """Append the tumbling-window start column via Arrow's
    ``floor_temporal`` (zero-copy, no Python per row)."""

    def fn(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch[ts_col], unit=every)
        if out_col in batch.column_names:
            batch = batch.drop_columns([out_col])
        return batch.append_column(out_col, w)

    return ds.map_batches(fn, batch_format="pyarrow")


def add_hopping_windows(
    ds: Dataset,
    *,
    ts_col: str = "ts",
    length_minutes: int = 60,
    hop_minutes: int = 15,
    out_col: str = "window_us",
) -> Dataset:
    """Hopping (sliding) windows: every event row replicates into
    ``length/hop`` rows, one per covering window, with the window start
    (epoch micros) in ``out_col`` — then any plain groupby aggregates
    per window, exactly like the tumbling case.

    Fan-out is the fixed small factor length/hop (vectorized
    ``Table.take`` on repeat indices, no per-row Python); select the
    needed columns BEFORE calling so only narrow rows replicate. An
    event at ts lies in window [w, w+L) iff w = hopfloor(ts) - j*H for
    j in 0..L/H-1, so the replication is exact with no boundary filter.
    """
    assert length_minutes % hop_minutes == 0, "hop must divide length"
    k = length_minutes // hop_minutes
    hop_us = hop_minutes * 60 * 1_000_000

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column(out_col, pa.array([], type=pa.int64()))
        base = pc.floor_temporal(batch[ts_col], multiple=hop_minutes, unit="minute")
        base_us = pc.cast(base, pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(n, dtype=np.int64), k)
        w = np.repeat(base_us, k) - np.tile(
            np.arange(k, dtype=np.int64) * hop_us, n
        )
        taken = batch.take(pa.array(idx))
        return taken.append_column(out_col, pa.array(w, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def sessionize(
    ds: Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: float = 30.0,
    num_buckets: int = 32,
) -> Dataset:
    """events -> one row per (user, session): gap-based session windows.

    ``session_id`` numbers a user's sessions in time order starting at 1;
    ties on ts are broken by ``id_col`` so output is deterministic.
    """
    gap_us = int(gap_minutes * 60 * 1_000_000)

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return SESSION_SCHEMA.empty_table()
        df = g.select([user_col, ts_col, id_col]).to_pandas()
        df["_us"] = df[ts_col].astype("int64")  # datetime64[us] -> micros
        df = df.sort_values([user_col, "_us", id_col], kind="mergesort")
        us = df["_us"].to_numpy()
        uid = df[user_col].to_numpy()
        new_user = np.empty(len(df), dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.empty(len(df), dtype=bool)
        gap[0] = True
        gap[1:] = (us[1:] - us[:-1]) > gap_us
        new_sess = new_user | gap
        # per-user session numbering: global cumsum minus the user's base
        sess_global = np.cumsum(new_sess)
        base = pd.Series(sess_global - 1).where(pd.Series(new_user)).ffill()
        df["_sess"] = sess_global - base.to_numpy().astype(np.int64)
        out = (
            df.groupby([user_col, "_sess"], sort=True)
            .agg(
                n_events=(id_col, "size"),
                session_start_us=("_us", "min"),
                session_end_us=("_us", "max"),
            )
            .reset_index()
            .rename(columns={"_sess": "session_id"})
        )
        return pa.Table.from_pandas(
            out[
                [
                    user_col,
                    "session_id",
                    "n_events",
                    "session_start_us",
                    "session_end_us",
                ]
            ],
            preserve_index=False,
        ).cast(SESSION_SCHEMA)

    return bucketed_group_apply(ds, user_col, per_bucket, num_buckets=num_buckets)


#: micros per day, the cohort bucketing unit
_DAY_US = 86_400_000_000


def cohort_retention(
    ds: Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    num_buckets: int = 64,
) -> Dataset:
    """Cohort retention matrix: users grouped by their FIRST active day
    (the cohort), counted on each later active day as a day offset —
    the standard product-analytics retention triangle, as a relation
    ``(cohort_day, offset_days, n_users)``.

    Scale shape: one ``map_batches`` reduces each batch to its DISTINCT
    (user, epoch-day) pairs (activity, not events — the shuffle carries
    user-days, bounded by users x active days, not the event firehose);
    ONE bucketed shuffle on the user key co-locates each user's days; a
    vectorized per-bucket pass derives first-day + offsets and emits
    (cohort, offset) count partials; a final narrow groupby sums them
    (bounded by days x days).
    """

    def pairs(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.int64())
        day = pc.divide(pc.cast(ts, pa.int64()), _DAY_US)
        t = pa.table({user_col: batch[user_col], "day": day})
        return t.group_by([user_col, "day"]).aggregate([])

    ud = ds.select_columns([user_col, ts_col]).map_batches(
        pairs, batch_format="pyarrow"
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        schema = pa.schema(
            [
                ("cohort_day", pa.int64()),
                ("offset_days", pa.int64()),
                ("_n", pa.int64()),
            ]
        )
        if g.num_rows == 0:
            return schema.empty_table()
        df = g.to_pandas().drop_duplicates([user_col, "day"])
        first = df.groupby(user_col)["day"].transform("min")
        out = (
            pd.DataFrame(
                {"cohort_day": first, "offset_days": df["day"] - first}
            )
            .groupby(["cohort_day", "offset_days"], sort=False)
            .size()
            .reset_index(name="_n")
        )
        return pa.Table.from_pandas(out, preserve_index=False).cast(schema)

    from ray.data.aggregate import Sum

    partials = bucketed_group_apply(ud, user_col, per_bucket, num_buckets=num_buckets)
    return (
        partials.groupby(["cohort_day", "offset_days"])
        .aggregate(Sum("_n", alias_name="n_users"))
    )
