"""Unit tests for the distributed window-function stage (stages/rank.py):
row_number per partition, lag deltas, bounded-axis rolling sums."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from doppel_ray.stages.rank import lag_delta_us, rolling_sum_rows, window_rank


def _df(ds) -> pd.DataFrame:
    return ds.to_pandas()


def test_window_rank_matches_pandas(ray_session):
    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 200, n),
            "v": rng.integers(0, 50, n),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    ds = ray.data.from_pandas(df).repartition(8)
    got = _df(
        window_rank(ds, "k", ["v", "id"], ascending=[False, True], out_col="rnk")
    ).sort_values("id", ignore_index=True)
    want = df.sort_values(["k", "v", "id"], ascending=[True, False, True])
    want = want.assign(rnk=want.groupby("k").cumcount() + 1).sort_values(
        "id", ignore_index=True
    )
    assert got["rnk"].tolist() == want["rnk"].tolist()


def test_window_rank_limit_prunes_per_key(ray_session):
    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 40, n),
            "v": rng.integers(0, 1000, n),
            "id": np.arange(n, dtype=np.int64),
        }
    )
    ds = ray.data.from_pandas(df).repartition(5)
    got = _df(window_rank(ds, "k", ["v", "id"], limit=3))
    assert got["rnk"].max() <= 3
    assert got.groupby("k").size().max() <= 3
    # the kept rows are exactly the 3 smallest (v, id) per key
    want = df.sort_values(["k", "v", "id"]).groupby("k").head(3)
    assert sorted(got["id"]) == sorted(want["id"])


def test_window_rank_validates_ascending():
    ds = ray.data.from_items([{"k": 1, "v": 2}])
    with pytest.raises(ValueError):
        window_rank(ds, "k", ["v"], ascending=[True, False])


def test_lag_delta_us_matches_pandas(ray_session):
    rng = np.random.default_rng(11)
    n = 3000
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 10**7, n), unit="us"
    )
    df = pd.DataFrame(
        {
            "user": rng.integers(0, 100, n),
            "ts": ts.astype("datetime64[us]"),
            "eid": np.arange(n, dtype=np.int64),
        }
    )
    ds = ray.data.from_pandas(df).repartition(6)
    got = _df(lag_delta_us(ds, "user", "ts", "eid")).sort_values(
        "eid", ignore_index=True
    )
    w = df.sort_values(["user", "ts", "eid"])
    w["gap_us"] = w["ts"].astype("int64").groupby(w["user"].to_numpy()).diff()
    w = w[w["gap_us"].notna()].sort_values("eid", ignore_index=True)
    assert got["eid"].tolist() == w["eid"].tolist()
    assert got["gap_us"].tolist() == w["gap_us"].astype("int64").tolist()


def test_lag_delta_us_keep_first_has_null_gap(ray_session):
    df = pd.DataFrame(
        {
            "user": [1, 1, 2],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:00:05",
                    "2024-01-01 00:00:00",
                ]
            ).astype("datetime64[us]"),
            "eid": [10, 11, 20],
        }
    )
    ds = ray.data.from_pandas(df)
    got = _df(lag_delta_us(ds, "user", "ts", "eid", keep_first=True))
    assert len(got) == 3
    by_eid = got.set_index("eid")["gap_us"]
    assert pd.isna(by_eid[10]) and pd.isna(by_eid[20])
    assert by_eid[11] == 5_000_000


def test_rolling_sum_rows():
    v = np.array([1, 2, 3, 4, 5], dtype=np.int64)
    assert rolling_sum_rows(v, 2).tolist() == [1, 3, 5, 7, 9]
    assert rolling_sum_rows(v, 7).tolist() == [1, 3, 6, 10, 15]
    with pytest.raises(ValueError):
        rolling_sum_rows(v, 0)
