"""Salted two-stage aggregation (stages/skew.py): results identical to
the plain groupby on a Zipf-head corpus; validation of unsupported
aggregate kinds."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from doppel_ray.stages.skew import salted_aggregate


def _zipf_df(n: int = 20000, seed: int = 13) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    # one mega-key holding ~half the rows + a long tail
    hot = n // 2
    keys = np.concatenate(
        [np.zeros(hot, dtype=np.int64), rng.integers(1, 500, n - hot)]
    )
    return pd.DataFrame(
        {"k": keys, "v": rng.integers(-1000, 1000, n).astype(np.int64)}
    )


def test_salted_matches_plain_groupby(ray_session):
    df = _zipf_df()
    ds = ray.data.from_pandas(df).repartition(8)
    got = (
        salted_aggregate(
            ds,
            "k",
            {
                "n": ("count", ""),
                "total": ("sum", "v"),
                "lo": ("min", "v"),
                "hi": ("max", "v"),
            },
            n_salts=16,
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    want = (
        df.groupby("k")
        .agg(n=("v", "size"), total=("v", "sum"), lo=("v", "min"), hi=("v", "max"))
        .reset_index()
        .sort_values("k", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"), check_dtype=False
    )


def test_salted_layout_invariant(ray_session):
    df = _zipf_df(5000, seed=3)
    aggs = {"n": ("count", ""), "total": ("sum", "v")}
    a = (
        salted_aggregate(ray.data.from_pandas(df).repartition(2), "k", aggs)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    b = (
        salted_aggregate(ray.data.from_pandas(df).repartition(11), "k", aggs)
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_salted_rejects_non_decomposable():
    ds = ray.data.from_items([{"k": 1, "v": 2}])
    with pytest.raises(ValueError, match="median"):
        salted_aggregate(ds, "k", {"m": ("median", "v")})
