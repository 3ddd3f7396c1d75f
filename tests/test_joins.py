"""As-of and range joins (stages/joins.py) vs brute-force references."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from doppel_ray.stages.joins import asof_join, range_join


def _events(seed: int, n: int, users: int):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, users, n).astype(np.int64),
            "ts_us": rng.integers(0, 10_000, n).astype(np.int64),
        }
    )


class TestAsofJoin:
    def _brute(self, ldf: pd.DataFrame, rdf: pd.DataFrame) -> set:
        out = set()
        for _, l in ldf.iterrows():
            cand = rdf[(rdf.user_id == l.user_id) & (rdf.ts_us <= l.ts_us)]
            if cand.empty:
                continue
            best = cand.sort_values(["ts_us", "rid"]).iloc[-1]
            out.add((int(l.lid), int(best.rid)))
        return out

    def test_matches_brute_force(self):
        ldf = _events(1, 120, 7).rename(columns={"id": "lid"})
        rdf = _events(2, 80, 7).rename(columns={"id": "rid"})
        # dedupe right per (user, ts): keep max rid — well-defined ties
        rdf = (
            rdf.sort_values("rid").groupby(["user_id", "ts_us"], as_index=False).last()
        )
        got = asof_join(
            rd.from_pandas(ldf),
            rd.from_pandas(rdf),
            by="user_id",
            on="ts_us",
            left_cols=["lid"],
            right_cols=["rid"],
            num_buckets=4,
        ).take_all()
        got_pairs = {(r["lid"], r["rid"]) for r in got}
        assert got_pairs == self._brute(ldf, rdf)

    def test_exact_match_allowed_and_inner_drops(self):
        ldf = pd.DataFrame(
            {"lid": [0, 1], "user_id": [1, 2], "ts_us": [100, 100]}
        )
        rdf = pd.DataFrame({"rid": [9], "user_id": [1], "ts_us": [100]})
        got = asof_join(
            rd.from_pandas(ldf),
            rd.from_pandas(rdf),
            by="user_id",
            on="ts_us",
            left_cols=["lid"],
            right_cols=["rid"],
            num_buckets=2,
        ).take_all()
        assert {(r["lid"], r["rid"]) for r in got} == {(0, 9)}  # ts==ts matches; user 2 dropped


class TestRangeJoin:
    def _brute(self, ldf, rdf, lower, upper) -> set:
        out = set()
        for _, l in ldf.iterrows():
            m = rdf[
                (rdf.user_id == l.user_id)
                & (rdf.ts_us > l.ts_us + lower)
                & (rdf.ts_us <= l.ts_us + upper)
            ]
            out.update((int(l.lid), int(r)) for r in m.rid)
        return out

    def test_matches_brute_force(self):
        ldf = _events(3, 150, 9).rename(columns={"id": "lid"})
        rdf = _events(4, 150, 9).rename(columns={"id": "rid"})
        got = range_join(
            rd.from_pandas(ldf),
            rd.from_pandas(rdf),
            by="user_id",
            on="ts_us",
            left_id="lid",
            right_id="rid",
            lower_us=0,
            upper_us=500,
            num_buckets=4,
        ).take_all()
        got_pairs = {(r["lid"], r["rid"]) for r in got}
        assert got_pairs == self._brute(ldf, rdf, 0, 500)

    def test_boundaries_exclusive_lower_inclusive_upper(self):
        ldf = pd.DataFrame({"lid": [0], "user_id": [1], "ts_us": [1000]})
        rdf = pd.DataFrame(
            {
                "rid": [10, 11, 12, 13],
                "user_id": [1, 1, 1, 1],
                "ts_us": [1000, 1001, 1500, 1501],  # ==lower excl, in, ==upper incl, out
            }
        )
        got = range_join(
            rd.from_pandas(ldf),
            rd.from_pandas(rdf),
            by="user_id",
            on="ts_us",
            left_id="lid",
            right_id="rid",
            lower_us=0,
            upper_us=500,
            num_buckets=2,
        ).take_all()
        assert sorted(r["rid"] for r in got) == [11, 12]

    def test_missing_key_and_empty_sides(self):
        ldf = pd.DataFrame({"lid": [0], "user_id": [42], "ts_us": [0]})
        rdf = pd.DataFrame({"rid": [1], "user_id": [7], "ts_us": [1]})
        got = range_join(
            rd.from_pandas(ldf),
            rd.from_pandas(rdf),
            by="user_id",
            on="ts_us",
            left_id="lid",
            right_id="rid",
            lower_us=0,
            upper_us=10,
            num_buckets=2,
        ).take_all()
        assert got == []

    def test_timestamp_on_column(self):
        """range_join accepts datetime64 'on' columns (int64-us view)."""
        base = pd.Timestamp("2024-01-01")
        ldf = pd.DataFrame(
            {"lid": [0], "user_id": [1], "ts": [base]}
        )
        rdf = pd.DataFrame(
            {
                "rid": [1, 2],
                "user_id": [1, 1],
                "ts": [base + pd.Timedelta(minutes=30), base + pd.Timedelta(hours=2)],
            }
        )
        for df in (ldf, rdf):
            df["ts"] = df["ts"].astype("datetime64[us]")
        got = range_join(
            rd.from_pandas(ldf),
            rd.from_pandas(rdf),
            by="user_id",
            on="ts",
            left_id="lid",
            right_id="rid",
            lower_us=0,
            upper_us=3_600_000_000,
            num_buckets=2,
        ).take_all()
        assert [r["rid"] for r in got] == [1]
