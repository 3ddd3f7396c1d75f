"""Deterministic hash sampling/splits (stages/sample.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from doppel_ray.stages.sample import hash_sample, hash_split
from doppel_ray.stages import sample


def _ds(n: int = 2000):
    return rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
    )


class TestHashSample:
    def test_deterministic_across_runs_and_blocks(self):
        a = {r["doc_id"] for r in hash_sample(_ds(), "doc_id", num=100).take_all()}
        b = {
            r["doc_id"]
            for r in hash_sample(
                _ds().repartition(17), "doc_id", num=100
            ).take_all()
        }
        assert a == b and len(a) > 0

    def test_split_disjoint_exhaustive(self):
        sample, rest = hash_split(_ds(500), "doc_id", num=200)
        s = {r["doc_id"] for r in sample.take_all()}
        t = {r["doc_id"] for r in rest.take_all()}
        assert s.isdisjoint(t)
        assert s | t == set(range(500))

    def test_rate_near_nominal(self):
        s = hash_sample(_ds(5000), "doc_id", num=100).count()
        assert 0.06 < s / 5000 < 0.14  # ~10% +- binomial noise

    def test_salt_draws_independent_sample(self):
        a = {r["doc_id"] for r in hash_sample(_ds(), "doc_id", num=300).take_all()}
        b = {
            r["doc_id"]
            for r in hash_sample(_ds(), "doc_id", num=300, salt="v2").take_all()
        }
        assert a != b
        # overlap near num/den * |a|, not 0 or |a|
        assert 0 < len(a & b) < min(len(a), len(b))

    def test_matches_duckdb_rule(self):
        import duckdb

        got = sorted(
            r["doc_id"] for r in hash_sample(_ds(800), "doc_id", num=50).take_all()
        )
        con = duckdb.connect()
        want = [
            r[0]
            for r in con.sql(
                "SELECT i FROM range(800) t(i) "
                "WHERE md5_number_upper(CAST(i AS VARCHAR)) % 1000 < 50 ORDER BY i"
            ).fetchall()
        ]
        assert got == want

    def test_sip64_method_deterministic_and_disjoint(self):
        a = {
            r["doc_id"]
            for r in hash_sample(_ds(), "doc_id", num=200, method="sip64").take_all()
        }
        b = {
            r["doc_id"]
            for r in hash_sample(
                _ds().repartition(13), "doc_id", num=200, method="sip64"
            ).take_all()
        }
        c = {
            r["doc_id"]
            for r in hash_sample(
                _ds(), "doc_id", num=200, method="sip64", invert=True
            ).take_all()
        }
        assert a == b and a.isdisjoint(c) and a | c == set(range(2000))
        assert 0.05 < len(a) / 2000 < 0.35


class TestStratifiedSample:
    def _ds(self):
        import ray.data as rd

        n = 2000
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(n), pa.int64()),
                    "lang": pa.array(["en", "de", "fr", "ja"][i % 4] for i in range(n)),
                }
            )
        )

    def test_rates_and_subset_rule(self):
        from doppel_ray.stages.sample import hash_sample, stratified_hash_sample

        ds = self._ds()
        out = stratified_hash_sample(
            ds, "doc_id", "lang", {"en": 200, "de": 800}, default_num=1000
        ).take_all()
        by = {}
        for r in out:
            by.setdefault(r["lang"], set()).add(r["doc_id"])
        # rare strata kept whole
        assert len(by["fr"]) == 500 and len(by["ja"]) == 500
        # downsampled strata approximate their rates (hash-uniformity)
        assert 0.12 < len(by["en"]) / 500 < 0.28
        assert 0.70 < len(by["de"]) / 500 < 0.90
        # NESTING invariant of a shared hash rule: the num=200 sample is
        # a subset of the num=800 sample for the same key/salt
        assert by["en"] <= {
            r["doc_id"]
            for r in hash_sample(ds, "doc_id", num=800).take_all()
        }

    def test_determinism_across_layouts(self):
        from doppel_ray.stages.sample import stratified_hash_sample

        ds = self._ds()
        a = {
            r["doc_id"]
            for r in stratified_hash_sample(
                ds, "doc_id", "lang", {"en": 300}, default_num=500
            ).take_all()
        }
        b = {
            r["doc_id"]
            for r in stratified_hash_sample(
                ds.repartition(16), "doc_id", "lang", {"en": 300}, default_num=500
            ).take_all()
        }
        assert a == b


class TestStratifiedValidation:
    def test_out_of_range_rates_raise(self):
        import pytest as _pytest

        ds = rd.from_arrow(pa.table({"k": ["a"], "s": ["x"]}))
        with _pytest.raises(ValueError):
            sample.stratified_hash_sample(ds, "k", "s", {"x": 2000}, den=1000)
        with _pytest.raises(ValueError):
            sample.stratified_hash_sample(ds, "k", "s", {"x": -1}, den=1000)
        with _pytest.raises(ValueError):
            sample.stratified_hash_sample(
                ds, "k", "s", {"x": 5}, default_num=-3, den=1000
            )


class TestWeightedSample:
    def _df(self, n=300, seed=13):
        rng = np.random.default_rng(seed)
        return pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "w": rng.integers(1, 500, n).astype(np.int64),
            }
        )

    @staticmethod
    def _brute(df, k, salt=""):
        import hashlib

        h = np.array(
            [
                int.from_bytes(
                    hashlib.md5((str(i) + salt).encode()).digest()[:8],
                    "little",
                )
                for i in df.doc_id
            ],
            dtype=np.uint64,
        ).astype(np.float64)
        u = (h + 1.0) / 2.0**64
        skey = np.log(u) / df.w.to_numpy(np.float64)
        out = df.assign(skey=skey).sort_values(
            ["skey", "doc_id"], ascending=[False, True]
        )
        return out.head(k).sort_values("doc_id", ignore_index=True)

    def test_bit_exact_brute_parity_and_layout(self):
        from doppel_ray.stages.sample import weighted_sample

        df = self._df()
        want = self._brute(df, 20)
        for p in (1, 9):
            got = (
                weighted_sample(
                    rd.from_pandas(df).repartition(p), 20, weight_col="w"
                )
                .to_pandas()
                .sort_values("doc_id", ignore_index=True)
            )
            pd.testing.assert_frame_equal(
                got[["doc_id", "w", "skey"]], want[["doc_id", "w", "skey"]]
            )

    def test_weight_proportional_inclusion(self):
        # one row with 100x everyone's weight should be selected in the
        # top-5 for the overwhelming majority of salts
        from doppel_ray.stages.sample import weighted_sample

        df = pd.DataFrame(
            {
                "doc_id": np.arange(100, dtype=np.int64),
                "w": np.r_[np.full(99, 10), 1000].astype(np.int64),
            }
        )
        hits = 0
        for s in range(12):
            got = weighted_sample(
                rd.from_pandas(df), 5, weight_col="w", salt=f"s{s}"
            ).to_pandas()
            hits += int((got.doc_id == 99).any())
        assert hits >= 9

    def test_validation(self):
        import pytest as _pytest

        from doppel_ray.stages.sample import weighted_sample

        df = self._df(n=10)
        with _pytest.raises(ValueError):
            weighted_sample(rd.from_pandas(df), 0, weight_col="w")
        bad = df.assign(w=np.r_[np.zeros(1), np.ones(9)].astype(np.int64))
        with _pytest.raises(Exception, match="finite and > 0"):
            weighted_sample(
                rd.from_pandas(bad), 3, weight_col="w"
            ).to_pandas()

    def test_matches_duckdb(self):
        import duckdb

        from doppel_ray.stages.sample import weighted_sample

        df = self._df(n=200, seed=29)
        got = (
            weighted_sample(rd.from_pandas(df).repartition(4), 15, weight_col="w")
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        want = con.execute(
            """
            SELECT doc_id, w,
                   ln((CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) AS DOUBLE)
                       + 1) / 18446744073709551616.0) / w AS skey
            FROM t ORDER BY skey DESC, doc_id LIMIT 15
            """
        ).df().sort_values("doc_id", ignore_index=True)
        want["doc_id"] = want["doc_id"].astype(np.int64)
        want["w"] = want["w"].astype(np.int64)
        # the SELECTION matches; the skey doubles are engine-local
        # (DuckDB ln differs from libm by 1-2 ULP on these inputs)
        pd.testing.assert_frame_equal(
            got[["doc_id", "w"]], want[["doc_id", "w"]], check_exact=True
        )
        ulp_gap = np.abs(got.skey.to_numpy() - want.skey.to_numpy())
        assert (ulp_gap <= 4 * np.finfo(np.float64).eps * np.abs(want.skey.to_numpy())).all()
