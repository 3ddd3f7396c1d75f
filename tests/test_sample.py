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
