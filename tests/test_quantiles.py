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
