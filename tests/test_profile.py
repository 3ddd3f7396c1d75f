"""Table-profiler tests: fold correctness across blocks, null
accounting, exact distinct counts, canonical min/max under the
UNDERLYING column order (ints compare numerically, not as strings),
timestamp handling, and the unsupported-type guard."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pytest
import ray.data as rd

from doppel_ray.stages.profile import profile_table


def _profile_dict(tbl: pa.Table) -> dict[str, dict]:
    return {r["col"]: r for r in tbl.to_pylist()}


class TestProfile:
    def test_basic_counts_nulls_distinct(self, ray_session):
        t = pa.table(
            {
                "k": pa.array([1, 2, 2, None, 3], type=pa.int64()),
                "s": pa.array(["b", None, None, "a", "a"]),
            }
        )
        out = _profile_dict(profile_table(rd.from_arrow(t), ["k", "s"]))
        assert out["k"] == {
            "col": "k", "n": 5, "n_null": 1, "n_distinct": 3,
            "min_s": "1", "max_s": "3",
        }
        assert out["s"] == {
            "col": "s", "n": 5, "n_null": 2, "n_distinct": 2,
            "min_s": "a", "max_s": "b",
        }

    def test_int_order_not_lexicographic(self, ray_session):
        # "10" < "9" lexicographically; the profiler must fold per-block
        # string partials under the underlying integer order.
        t = pa.table({"k": pa.array([9, 10, 2], type=pa.int64())})
        # force multiple blocks so the driver fold actually merges
        ds = rd.from_arrow(t).repartition(3)
        out = _profile_dict(profile_table(ds, ["k"]))
        assert out["k"]["min_s"] == "2"
        assert out["k"]["max_s"] == "10"

    def test_timestamp_profiled_as_epoch_micros(self, ray_session):
        base = dt.datetime(2026, 1, 1)
        ts = [base, base + dt.timedelta(seconds=5), None]
        t = pa.table({"ts": pa.array(ts, type=pa.timestamp("us"))})
        out = _profile_dict(profile_table(rd.from_arrow(t), ["ts"]))
        epoch0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        assert out["ts"]["n_null"] == 1
        assert out["ts"]["n_distinct"] == 2
        assert out["ts"]["min_s"] == str(epoch0)
        assert out["ts"]["max_s"] == str(epoch0 + 5_000_000)

    def test_all_null_column(self, ray_session):
        t = pa.table({"k": pa.array([None, None], type=pa.int64())})
        out = _profile_dict(profile_table(rd.from_arrow(t), ["k"]))
        assert out["k"] == {
            "col": "k", "n": 2, "n_null": 2, "n_distinct": 0,
            "min_s": "", "max_s": "",
        }

    def test_float_column_rejected(self, ray_session):
        t = pa.table({"x": pa.array([1.5, 2.5])})
        with pytest.raises(ValueError, match="unsupported column type"):
            profile_table(rd.from_arrow(t), ["x"])
