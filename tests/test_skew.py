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


class TestSkewJoin:
    def _tables(self, seed=7):
        rng = np.random.default_rng(seed)
        # Zipf-headed left: key 0 is hot; keys 90+ have no right match
        keys = np.minimum((rng.zipf(1.3, 4000) - 1), 99).astype(np.int64)
        left = pd.DataFrame(
            {
                "k": keys,
                "lv": np.arange(len(keys), dtype=np.int64),
            }
        )
        right = pd.DataFrame(
            {
                "k": np.arange(90, dtype=np.int64),
                "rv": np.arange(90, dtype=np.int64) * 10,
            }
        )
        return left, right

    def _run(self, left, right, how, **kw):
        from doppel_ray.stages.skew import skew_join

        out = skew_join(
            ray.data.from_pandas(left).repartition(6),
            ray.data.from_pandas(right).repartition(2),
            on="k", left_cols=["lv"], right_cols=["rv"], how=how, **kw
        ).to_pandas()
        return out.sort_values(["k", "lv"], ignore_index=True).astype(
            {"k": np.int64, "lv": np.int64}
        )

    @pytest.mark.parametrize("how", ["inner", "left"])
    def test_matches_pandas_and_hot_path_taken(self, ray_session, how):
        left, right = self._tables()
        # hot_threshold low enough that the Zipf head goes hot
        got = self._run(left, right, how, hot_threshold=50)
        hot_keys = left.k.value_counts()
        assert (hot_keys > 50).any()  # the hot path is non-vacuous
        want = (
            left.merge(right, on="k", how=how)
            .sort_values(["k", "lv"], ignore_index=True)
        )
        assert got.k.tolist() == want.k.tolist()
        assert got.lv.tolist() == want.lv.tolist()
        pd.testing.assert_series_equal(
            got.rv.astype("float64"), want.rv.astype("float64"), check_names=False
        )

    def test_no_hot_keys_passthrough_equals_hash_join(self, ray_session):
        left, right = self._tables(seed=3)
        a = self._run(left, right, "inner", hot_threshold=10**9)
        b = self._run(left, right, "inner", hot_threshold=50)
        pd.testing.assert_frame_equal(
            a.astype({"rv": "float64"}), b.astype({"rv": "float64"})
        )

    def test_guards(self, ray_session):
        from doppel_ray.stages.skew import skew_join

        left, right = self._tables()
        lds = ray.data.from_pandas(left)
        rds = ray.data.from_pandas(right)
        with pytest.raises(ValueError, match="inner/left"):
            skew_join(lds, rds, on="k", left_cols=["lv"], right_cols=["rv"],
                      how="outer")
        with pytest.raises(ValueError, match="hot_threshold"):
            skew_join(lds, rds, on="k", left_cols=["lv"], right_cols=["rv"],
                      hot_threshold=0)
        with pytest.raises(ValueError, match="broadcast_limit"):
            skew_join(
                lds, rds, on="k", left_cols=["lv"], right_cols=["rv"],
                hot_threshold=5, broadcast_limit=0,
            ).to_pandas()
