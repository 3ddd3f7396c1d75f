"""Windowed event-sequence funnel: per user, how far through an ordered
stage sequence (e.g. view -> click -> purchase) they progressed, with
every later stage required to land inside a conversion window anchored
at the stage-1 time (ClickHouse ``windowFunnel`` semantics).

Ray Data has no ordered-sequence operator; this is the composition the
platform does support (SURVEY.md custom-operator rule, same shape as
stages/windows.py sessionization): ONE bucketed hash shuffle on the
user key co-locates each user's full event stream, then a per-bucket
pandas cascade resolves the stages at C speed — stage k's time is the
MIN event time of stage-k's type strictly after the stage-(k-1) time
and at most ``window_us`` after the stage-1 time. Rows per user that
never hit stage 1 are dropped inside the bucket, so the output is
bounded by the stage-1 audience, not the corpus.

Partitioning assumption (documented, mirrors sessionize/rank): one
user's events fit a bucket's memory.

Generalizes the reference's single-pass grouped scan (duplicate groups,
/root/reference/internal/duplicates/finder.go:47-106) to ordered
per-entity sequence analytics over the same bucketed-shuffle primitive.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from doppel_ray.stages.exact import bucketed_group_apply


def windowed_funnel(
    ds: Dataset,
    *,
    user_col: str,
    type_col: str,
    ts_col: str,
    sequence: list[str],
    window_us: int,
    num_buckets: int = 64,
) -> Dataset:
    """Per-user funnel progress rows ``(user_col, stages_completed)``.

    ``stages_completed`` is the largest k (1-based) such that stages
    1..k all matched: stage 1 at ``t0 = min ts of sequence[0]``, stage
    k at the min ts of ``sequence[k-1]`` with ``ts > t_{k-1}`` and
    ``ts <= t0 + window_us``. Users who never emit ``sequence[0]`` are
    absent from the output. Timestamps are compared as int64 epoch
    micros, so the result is exact and layout-invariant.
    """
    if len(sequence) < 2:
        raise ValueError("sequence needs at least 2 stages")
    if window_us <= 0:
        raise ValueError("window_us must be positive")
    seq = list(sequence)

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = batch[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.int64())
        # only events whose type participates keep shuffle volume
        # bounded by the funnel's own traffic, not the event firehose
        keep = pc.is_in(batch[type_col], value_set=pa.array(seq))
        t = pa.table(
            {
                user_col: batch[user_col],
                type_col: batch[type_col],
                "_ts_us": pc.cast(ts, pa.int64()),
            }
        )
        return t.filter(keep)

    narrow = ds.map_batches(prep, batch_format="pyarrow")

    def per_bucket(g: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [(user_col, pa.int64()), ("stages_completed", pa.int64())]
        )
        if g.num_rows == 0:
            return out_schema.empty_table()
        df = g.to_pandas()
        first = df[df[type_col] == seq[0]]
        if first.empty:
            return out_schema.empty_table()
        t0 = first.groupby(user_col)["_ts_us"].min()
        reached = pd.Series(np.int64(1), index=t0.index)
        deadline = t0 + np.int64(window_us)
        prev = t0
        for st in seq[1:]:
            ev = df[df[type_col] == st][[user_col, "_ts_us"]]
            ev = ev.join(prev.rename("_prev"), on=user_col, how="inner")
            ev = ev.join(deadline.rename("_dl"), on=user_col)
            ev = ev[(ev["_ts_us"] > ev["_prev"]) & (ev["_ts_us"] <= ev["_dl"])]
            if ev.empty:
                break
            prev = ev.groupby(user_col)["_ts_us"].min()
            reached.loc[prev.index] += 1
        return pa.table(
            {
                user_col: pa.array(reached.index.to_numpy(), type=pa.int64()),
                "stages_completed": pa.array(
                    reached.to_numpy(), type=pa.int64()
                ),
            }
        )

    return bucketed_group_apply(
        narrow, user_col, per_bucket, num_buckets=num_buckets
    )
