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


class TestHashJoin:
    def _sides(self):
        import ray.data as rd

        left = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array([1, 1, 2, 3, 5], pa.int64()),
                    "lv": pa.array(["a", "b", "c", "d", "e"]),
                }
            )
        )
        right = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array([1, 2, 2, 4], pa.int64()),
                    "rv": pa.array([10, 20, 21, 40], pa.int64()),
                }
            )
        )
        return left, right

    def _brute(self, how):
        import pandas as pd

        l = pd.DataFrame({"k": [1, 1, 2, 3, 5], "lv": list("abcde")})
        r = pd.DataFrame({"k": [1, 2, 2, 4], "rv": [10, 20, 21, 40]})
        return l.merge(r, on="k", how=how)

    def test_inner_matches_pandas(self):
        from doppel_ray.stages.joins import hash_join

        left, right = self._sides()
        got = hash_join(
            left, right, on="k", left_cols=["lv"], right_cols=["rv"]
        ).take_all()
        want = self._brute("inner")
        assert sorted((r["k"], r["lv"], r["rv"]) for r in got) == sorted(
            map(tuple, want.values.tolist())
        )

    def test_left_keeps_unmatched(self):
        from doppel_ray.stages.joins import hash_join

        left, right = self._sides()
        got = hash_join(
            left, right, on="k", left_cols=["lv"], right_cols=["rv"], how="left"
        ).take_all()
        rows = sorted((r["k"], r["lv"], r["rv"]) for r in got)
        assert (3, "d", None) in rows and (5, "e", None) in rows
        assert len(rows) == len(self._brute("left"))

    def test_empty_right_inner(self):
        import ray.data as rd

        from doppel_ray.stages.joins import hash_join

        left, _ = self._sides()
        right = rd.from_arrow(
            pa.table({"k": pa.array([], pa.int64()), "rv": pa.array([], pa.int64())})
        )
        got = hash_join(
            left, right, on="k", left_cols=["lv"], right_cols=["rv"]
        )
        assert got.count() == 0

    def test_bad_how_raises(self):
        import pytest

        from doppel_ray.stages.joins import hash_join

        left, right = self._sides()
        with pytest.raises(ValueError):
            hash_join(left, right, on="k", left_cols=["lv"], right_cols=["rv"], how="cross")


def test_hash_join_left_preserves_large_int64(ray_session):
    """Unmatched-left NaNs must not round-trip matched int64 payloads
    through float64 (regression: 2^53+1 came back as 2^53)."""
    import ray.data as rd

    from doppel_ray.stages.joins import hash_join

    big = 9007199254740993  # 2^53 + 1, not representable in float64
    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2], pa.int64()), "lv": pa.array(["a", "b"])})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array([1], pa.int64()), "rv": pa.array([big], pa.int64())})
    )
    got = {r["k"]: r["rv"] for r in hash_join(
        left, right, on="k", left_cols=["lv"], right_cols=["rv"], how="left"
    ).take_all()}
    assert got[1] == big
    assert got[2] is None


class TestBroadcastJoin:
    def _sides(self):
        big = rd.from_arrow(
            pa.table(
                {
                    "k": pa.array([1, 1, 2, 3, 5], pa.int64()),
                    "lv": pa.array(list("abcde")),
                }
            )
        )
        small = pa.table(
            {
                "k": pa.array([1, 2, 4], pa.int64()),
                "rv": pa.array([10, 20, 40], pa.int64()),
            }
        )
        return big, small

    def test_inner_matches_pandas(self, ray_session):
        from doppel_ray.stages.joins import broadcast_join

        big, small = self._sides()
        got = broadcast_join(big, small, on="k", small_cols=["rv"]).take_all()
        want = pd.DataFrame({"k": [1, 1, 2, 3, 5], "lv": list("abcde")}).merge(
            small.to_pandas(), on="k", how="inner"
        )
        assert sorted((r["k"], r["lv"], r["rv"]) for r in got) == sorted(
            map(tuple, want.values.tolist())
        )

    def test_left_keeps_unmatched_with_nulls(self, ray_session):
        from doppel_ray.stages.joins import broadcast_join

        big, small = self._sides()
        got = broadcast_join(
            big, small, on="k", small_cols=["rv"], how="left"
        ).take_all()
        rows = sorted((r["k"], r["lv"], r["rv"]) for r in got)
        assert (3, "d", None) in rows and (5, "e", None) in rows
        assert len(rows) == 5

    def test_small_side_dataset_input(self, ray_session):
        from doppel_ray.stages.joins import broadcast_join

        big, small = self._sides()
        got = broadcast_join(
            big, rd.from_arrow(small), on="k", small_cols=["rv"]
        ).take_all()
        assert len(got) == 3

    def test_duplicate_small_keys_raise(self, ray_session):
        import pytest

        from doppel_ray.stages.joins import broadcast_join

        big, _ = self._sides()
        dup = pa.table(
            {"k": pa.array([1, 1], pa.int64()), "rv": pa.array([10, 11], pa.int64())}
        )
        with pytest.raises(ValueError, match="not unique"):
            broadcast_join(big, dup, on="k", small_cols=["rv"])

    def test_row_limit_raises(self, ray_session):
        import pytest

        from doppel_ray.stages.joins import broadcast_join

        big, small = self._sides()
        with pytest.raises(ValueError, match="hash_join"):
            broadcast_join(big, small, on="k", small_cols=["rv"], limit=2)

    def test_bad_how_raises(self, ray_session):
        import pytest

        from doppel_ray.stages.joins import broadcast_join

        big, small = self._sides()
        with pytest.raises(ValueError, match="how"):
            broadcast_join(big, small, on="k", small_cols=["rv"], how="outer")


def test_hash_join_outer_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from doppel_ray.stages.joins import hash_join

    rng = np.random.default_rng(21)
    # key ranges chosen so BOTH sides have unmatched keys
    left = pd.DataFrame(
        {"k": rng.integers(0, 60, 400), "lv": rng.integers(0, 10**12, 400)}
    )
    right = pd.DataFrame(
        {"k": rng.integers(30, 90, 300), "rv": rng.integers(0, 10**12, 300)}
    )
    got = hash_join(
        ray.data.from_pandas(left).repartition(4),
        ray.data.from_pandas(right).repartition(3),
        on="k",
        left_cols=["lv"],
        right_cols=["rv"],
        how="outer",
    ).to_pandas()
    want = left.merge(right, on="k", how="outer")
    assert len(got) == len(want)
    assert set(got["k"]) == set(want["k"])
    # both-sided unmatched rows survive with nulls
    assert got.loc[~got["k"].isin(right["k"]), "rv"].isna().all()
    assert got.loc[~got["k"].isin(left["k"]), "lv"].isna().all()
    assert (~got["k"].isin(right["k"])).sum() > 0
    assert (~got["k"].isin(left["k"])).sum() > 0
    key = ["k", "lv", "rv"]
    g = got[key].astype("float64").sort_values(key, ignore_index=True)
    w = want[key].astype("float64").sort_values(key, ignore_index=True)
    # int64 payloads above 2^53 are exercised elsewhere; here values are
    # < 2^40 so the float64 canonicalization is exact
    pd.testing.assert_frame_equal(g, w)


def test_hash_join_rejects_unknown_how(ray_session):
    import ray.data
    import pytest

    from doppel_ray.stages.joins import hash_join

    ds = ray.data.from_items([{"k": 1, "v": 2}])
    with pytest.raises(ValueError):
        hash_join(ds, ds, on="k", left_cols=["v"], right_cols=[], how="cross")
