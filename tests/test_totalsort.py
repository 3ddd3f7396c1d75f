"""Total-order rank assignment (stages/totalsort.py) and the k-way
pairwise overlap histogram (stages/overlap.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from doppel_ray.stages.overlap import (
    mask_histogram,
    pairwise_overlap,
)
from doppel_ray.stages.totalsort import total_order_ranks


def _expected(df: pd.DataFrame, key: str, idc: str) -> pd.DataFrame:
    out = df.sort_values([key, idc], kind="mergesort").reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[[idc, key, "rank"]]


def _ranks(ds, **kw) -> pd.DataFrame:
    t = total_order_ranks(ds, "k", "i", **kw)
    return (
        pd.DataFrame(t.take_all())
        .sort_values("rank")
        .reset_index(drop=True)[["i", "k", "rank"]]
    )


class TestTotalOrderRanks:
    def _corpus(self, n=500, seed=7) -> pd.DataFrame:
        rng = np.random.default_rng(seed)
        # heavy ties: 40 distinct keys over 500 rows
        keys = np.array([f"key{v:03d}" for v in rng.integers(0, 40, n)])
        return pd.DataFrame({"i": np.arange(n, dtype=np.int64), "k": keys})

    def test_matches_global_sort(self):
        df = self._corpus()
        ds = rd.from_pandas(df).repartition(6)
        got = _ranks(ds, num_buckets=8, sample_mod=4)
        exp = _expected(df, "k", "i").rename(columns={"rank": "rank"})
        pd.testing.assert_frame_equal(
            got, exp[["i", "k", "rank"]], check_dtype=False
        )

    def test_layout_invariant(self):
        df = self._corpus(seed=11)
        a = _ranks(rd.from_pandas(df).repartition(1), num_buckets=5, sample_mod=2)
        b = _ranks(rd.from_pandas(df).repartition(9), num_buckets=5, sample_mod=2)
        pd.testing.assert_frame_equal(a, b)

    def test_numeric_key(self):
        rng = np.random.default_rng(3)
        df = pd.DataFrame(
            {
                "i": np.arange(300, dtype=np.int64),
                "k": rng.integers(0, 25, 300).astype(np.int64),
            }
        )
        got = _ranks(rd.from_pandas(df).repartition(4), num_buckets=6, sample_mod=2)
        exp = _expected(df, "k", "i")
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_empty_sample_single_bucket(self):
        # sample_mod far above n: no splitters, everything in bucket 0
        df = self._corpus(n=40, seed=5)
        got = _ranks(rd.from_pandas(df).repartition(3), sample_mod=1 << 40)
        exp = _expected(df, "k", "i")
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_validation(self):
        ds = rd.from_pandas(pd.DataFrame({"k": ["a"], "i": [1]}))
        with pytest.raises(ValueError, match="num_buckets"):
            total_order_ranks(ds, "k", "i", num_buckets=0)
        with pytest.raises(ValueError, match="differ"):
            total_order_ranks(ds, "k", "k")

    def test_null_key_raises(self):
        ds = rd.from_arrow(
            pa.table({"k": pa.array(["a", None]), "i": pa.array([1, 2])})
        )
        with pytest.raises(Exception, match="null key or id"):
            total_order_ranks(ds, "k", "i").take_all()


def _brute(pairs: list[tuple[str, int]], n_sides: int):
    sets = [set() for _ in range(n_sides)]
    for v, s in pairs:
        sets[s].add(v)
    out = []
    for i in range(n_sides):
        for j in range(i + 1, n_sides):
            out.append(
                (i, j, len(sets[i]), len(sets[j]), len(sets[i] & sets[j]))
            )
    return out


class TestPairwiseOverlap:
    def _tagged(self, pairs) -> rd.Dataset:
        t = pa.table(
            {
                "v": pa.array([p[0] for p in pairs], type=pa.string()),
                "m": pa.array(
                    np.uint32(1) << np.array([p[1] for p in pairs], dtype=np.uint32)
                ),
            }
        )
        return rd.from_arrow(t).repartition(5)

    def test_matches_python_sets(self):
        rng = np.random.default_rng(17)
        pairs = [
            (f"t{v}", int(s))
            for v, s in zip(rng.integers(0, 120, 2000), rng.integers(0, 4, 2000))
        ]
        masks, counts = mask_histogram(self._tagged(pairs), num_buckets=7)
        got = pairwise_overlap(masks, counts, 4)
        assert got == _brute(pairs, 4)

    def test_multiplicity_counts_once(self):
        pairs = [("x", 0)] * 50 + [("x", 1)] * 3 + [("y", 1)]
        masks, counts = mask_histogram(self._tagged(pairs), num_buckets=3)
        assert pairwise_overlap(masks, counts, 2) == [(0, 1, 1, 2, 1)]

    def test_layout_invariant(self):
        rng = np.random.default_rng(23)
        pairs = [
            (f"t{v}", int(s))
            for v, s in zip(rng.integers(0, 60, 800), rng.integers(0, 3, 800))
        ]
        t = pa.table(
            {
                "v": pa.array([p[0] for p in pairs], type=pa.string()),
                "m": pa.array(
                    np.uint32(1) << np.array([p[1] for p in pairs], dtype=np.uint32)
                ),
            }
        )
        a = mask_histogram(rd.from_arrow(t).repartition(1), num_buckets=4)
        b = mask_histogram(rd.from_arrow(t).repartition(11), num_buckets=4)
        assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])

    def test_empty(self):
        t = pa.table(
            {"v": pa.array([], type=pa.string()), "m": pa.array([], type=pa.uint32())}
        )
        masks, counts = mask_histogram(rd.from_arrow(t))
        assert len(masks) == 0
        assert pairwise_overlap(masks, counts, 3) == [
            (0, 1, 0, 0, 0),
            (0, 2, 0, 0, 0),
            (1, 2, 0, 0, 0),
        ]

    def test_side_cap(self):
        with pytest.raises(ValueError, match="32"):
            pairwise_overlap(
                np.array([], dtype=np.uint32), np.array([], dtype=np.int64), 33
            )
