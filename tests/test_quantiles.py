"""Exact distributed quantiles (stages/quantiles.py) vs DuckDB."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from doppel_ray.stages.quantiles import exact_quantiles

PS = [0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


class TestExactQuantiles:
    def _check(self, values: np.ndarray):
        import duckdb

        ds = rd.from_pandas(pd.DataFrame({"x": values})).repartition(7)
        got = dict(exact_quantiles(ds, "x", PS))
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"x": values}))
        for p in PS:
            want = con.execute(
                f"SELECT quantile_disc(x, {p}) FROM t"
            ).fetchone()[0]
            assert got[p] == want, (p, got[p], want)

    def test_random_ints(self):
        rng = np.random.default_rng(7)
        self._check(rng.integers(0, 50, 1000).astype(np.int64))

    def test_heavy_duplicates_and_skew(self):
        vals = np.concatenate(
            [np.zeros(900, dtype=np.int64), np.arange(100, dtype=np.int64)]
        )
        self._check(vals)

    def test_single_value(self):
        self._check(np.array([42], dtype=np.int64))

    def test_empty(self):
        ds = rd.from_pandas(pd.DataFrame({"x": np.array([], dtype=np.int64)}))
        assert exact_quantiles(ds, "x", [0.5]) == []


class TestBucketedQuantiles:
    """The continuous/near-unique path: driver_limit forced tiny so the
    HLL gate rejects the driver histogram and the distributed cumulative
    walk runs — results must still be EXACT (same element as DuckDB's
    quantile_disc)."""

    def _check(self, values: np.ndarray, *, driver_limit: int, resolution: int = 64):
        import duckdb

        ds = rd.from_pandas(pd.DataFrame({"x": values})).repartition(7)
        got = dict(
            exact_quantiles(
                ds, "x", PS, driver_limit=driver_limit, resolution=resolution
            )
        )
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"x": values}))
        for p in PS:
            want = con.execute(
                f"SELECT quantile_disc(x, {p}) FROM t"
            ).fetchone()[0]
            assert got[p] == want, (p, got[p], want)

    def test_near_unique_floats(self):
        # the VERDICT r3 trap: a near-unique float column must not build
        # a driver-scale value histogram — and must still be exact
        rng = np.random.default_rng(11)
        vals = rng.normal(0.0, 1e6, 5000)
        self._check(vals, driver_limit=50)

    def test_near_unique_ints_return_int(self):
        rng = np.random.default_rng(13)
        vals = rng.integers(-(2**40), 2**40, 4000).astype(np.int64)
        ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(5)
        got = dict(exact_quantiles(ds, "x", [0.5], driver_limit=50, resolution=64))
        assert isinstance(got[0.5], int)
        assert got[0.5] == int(np.sort(vals)[int(np.ceil(0.5 * len(vals))) - 1])

    def test_constant_hot_bucket_skew(self):
        # 90% of rows are one value -> its bucket exceeds driver_limit at
        # every level; the min==max fast path must terminate
        rng = np.random.default_rng(17)
        vals = np.concatenate([np.full(9000, 3.25), rng.normal(0, 100, 1000)])
        self._check(vals, driver_limit=500)

    def test_nan_ignored(self):
        import duckdb

        rng = np.random.default_rng(19)
        vals = rng.normal(0, 10, 2000)
        with_nan = np.concatenate([vals, np.full(100, np.nan)])
        ds = rd.from_pandas(pd.DataFrame({"x": with_nan})).repartition(3)
        got = dict(exact_quantiles(ds, "x", [0.5], driver_limit=20, resolution=32))
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"x": vals}))
        want = con.execute("SELECT quantile_disc(x, 0.5) FROM t").fetchone()[0]
        assert got[0.5] == want


class TestMADOutliers:
    @staticmethod
    def _brute(vals: "np.ndarray", c: int) -> "np.ndarray":
        # quantile_disc rule: element at ceil(p*n)-1 of the sorted values
        import math

        s = np.sort(vals)
        med = s[max(math.ceil(0.5 * len(s)) - 1, 0)]
        dev = np.abs(vals - med)
        d = np.sort(dev)[max(math.ceil(0.5 * len(dev)) - 1, 0)]
        return dev > c * d

    def test_matches_brute_force_and_layout(self, ray_session):
        import ray.data as rd

        from doppel_ray.stages.quantiles import mad_outliers

        rng = np.random.default_rng(11)
        vals = np.r_[
            rng.integers(90, 110, 400), rng.integers(1000, 5000, 25)
        ].astype(np.int64)
        df = pd.DataFrame(
            {"doc_id": np.arange(len(vals), dtype=np.int64), "x": vals}
        )
        want_mask = self._brute(vals, 3)
        assert want_mask.any()  # planted tail is flagged
        for p in (1, 8):
            got = (
                mad_outliers(
                    rd.from_pandas(df).repartition(p), "x", c=3
                )
                .to_pandas()
                .sort_values("doc_id", ignore_index=True)
            )
            assert got.doc_id.tolist() == df.doc_id[want_mask].tolist()
            assert (got.abs_dev > 0).all()

    def test_bucketed_walk_regime_identical(self, ray_session):
        # driver_limit=0 forces the distributed cumulative-walk quantile
        import ray.data as rd

        from doppel_ray.stages.quantiles import mad_outliers

        rng = np.random.default_rng(5)
        vals = np.r_[rng.integers(0, 50, 200), [900, 950, 1000]].astype(
            np.int64
        )
        df = pd.DataFrame(
            {"doc_id": np.arange(len(vals), dtype=np.int64), "x": vals}
        )
        a = (
            mad_outliers(rd.from_pandas(df), "x", c=2)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        b = (
            mad_outliers(rd.from_pandas(df), "x", c=2, driver_limit=0)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_validation(self, ray_session):
        import pytest as _pytest
        import ray.data as rd

        from doppel_ray.stages.quantiles import mad_outliers

        df = pd.DataFrame({"doc_id": [0], "x": [1]})
        with _pytest.raises(ValueError):
            mad_outliers(rd.from_pandas(df), "x", c=0)
