"""Sharded training output (stages/output.py): deterministic shard
assignment, partitioned layout, manifest counts, and range-granular
resume semantics."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from doppel_ray.stages import output as O
from doppel_ray.stages.sample import _key_hashes


def _ds(n=200, parts=5):
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array([f"doc {i} body" for i in range(n)]),
        }
    )
    return rd.from_arrow(t).repartition(parts)


def _read_all(out_dir):
    rows = []
    for d in sorted(glob.glob(os.path.join(out_dir, "shard=*"))):
        shard = int(d.rsplit("=", 1)[1])
        t = pq.read_table(d)
        for r in t.to_pylist():
            rows.append((r["doc_id"], shard))
    return sorted(rows)


class TestWrite:
    def test_round_trip_and_assignment(self, ray_session, tmp_path):
        out = str(tmp_path / "shards")
        man = O.write_training_shards(_ds(), out, num_shards=8)
        rows = _read_all(out)
        assert [r[0] for r in rows] == list(range(200))
        # assignment matches the sampler kernel (determinism contract)
        want = _key_hashes(
            pa.array(range(200), pa.int64()), "", "sip64", 8
        ).astype(int)
        assert [r[1] for r in rows] == list(want)
        assert man["total_rows"] == 200
        assert sum(man["rows_per_shard"].values()) == 200
        # manifest counts match the on-disk layout
        from collections import Counter

        disk = Counter(r[1] for r in rows)
        assert {int(k): v for k, v in man["rows_per_shard"].items() if v} == dict(
            disk
        )

    def test_layout_invariance(self, ray_session, tmp_path):
        a = O.write_training_shards(
            _ds(parts=2), str(tmp_path / "a"), num_shards=8
        )
        b = O.write_training_shards(
            _ds(parts=13), str(tmp_path / "b"), num_shards=8
        )
        assert a["rows_per_shard"] == b["rows_per_shard"]
        assert _read_all(str(tmp_path / "a")) == _read_all(str(tmp_path / "b"))

    def test_validation(self, ray_session, tmp_path):
        with pytest.raises(ValueError, match="num_groups"):
            O.write_training_shards(
                _ds(), str(tmp_path / "x"), num_shards=4, num_groups=5
            )


class TestResume:
    def test_completed_ranges_skipped(self, ray_session, tmp_path):
        out = str(tmp_path / "shards")
        O.write_training_shards(_ds(), out, num_shards=8, num_groups=4)
        before = _read_all(out)
        # simulate a crash mid-range: kill one range's marker and corrupt
        # its shard dirs with stale partial files
        os.remove(O._marker(out, 2, 4))
        for k in (2, 3):
            d = os.path.join(out, f"shard={k}")
            pq.write_table(
                pa.table({"doc_id": pa.array([999_999]), "text": ["stale"]}),
                os.path.join(d, "stale.parquet"),
            )
        man = O.write_training_shards(_ds(), out, num_shards=8, num_groups=4)
        assert sorted(man["resumed_skipping"]) == [[0, 2], [4, 6], [6, 8]]
        # the redone range is exactly-once again; others untouched
        assert _read_all(out) == before
        assert all(
            os.path.exists(O._marker(out, lo, hi))
            for lo, hi in [(0, 2), (2, 4), (4, 6), (6, 8)]
        )

    def test_full_rerun_after_complete_is_noop_write(self, ray_session, tmp_path):
        out = str(tmp_path / "shards")
        O.write_training_shards(_ds(), out, num_shards=4, num_groups=2)
        before = _read_all(out)
        man = O.write_training_shards(_ds(), out, num_shards=4, num_groups=2)
        assert sorted(man["resumed_skipping"]) == [[0, 2], [2, 4]]
        assert _read_all(out) == before
