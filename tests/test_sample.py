"""Deterministic hash sampling/splits (stages/sample.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from doppel_ray.stages.sample import hash_sample, hash_split


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
