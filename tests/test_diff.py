"""Snapshot-diff tests: status classification, churn-bounded output,
include_unchanged, and the within-side key-uniqueness contract."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from doppel_ray.stages.diff import snapshot_diff


def _tbl(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
        }
    )


class TestSnapshotDiff:
    def test_statuses(self, ray_session):
        old = _tbl([(1, "a"), (2, "b"), (3, "c")])
        new = _tbl([(2, "b"), (3, "c2"), (4, "d")])
        out = snapshot_diff(rd.from_arrow(old), rd.from_arrow(new)).take_all()
        got = {r["key"]: r["status"] for r in out}
        assert got == {1: "removed", 3: "changed", 4: "added"}

    def test_include_unchanged(self, ray_session):
        old = _tbl([(1, "a"), (2, "b")])
        new = _tbl([(1, "a"), (2, "B")])
        out = snapshot_diff(
            rd.from_arrow(old), rd.from_arrow(new), include_unchanged=True
        ).take_all()
        got = {r["key"]: r["status"] for r in out}
        assert got == {1: "unchanged", 2: "changed"}

    def test_identical_snapshots_empty_diff(self, ray_session):
        t = _tbl([(1, "a"), (2, "b")])
        out = snapshot_diff(rd.from_arrow(t), rd.from_arrow(t)).take_all()
        assert out == []

    def test_duplicate_key_within_side_raises(self, ray_session):
        old = _tbl([(1, "a"), (1, "a2")])
        new = _tbl([(1, "a")])
        with pytest.raises(Exception):
            snapshot_diff(rd.from_arrow(old), rd.from_arrow(new)).take_all()


class TestKeepLatest:
    def _ds(self, rows, parts=1):
        import pyarrow as pa
        import ray

        t = pa.table(
            {
                "url": pa.array([r[0] for r in rows], type=pa.string()),
                "warc_ts": pa.array([r[1] for r in rows], type=pa.int64()),
                "doc_id": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )
        ds = ray.data.from_arrow(t)
        return ds.repartition(parts) if parts > 1 else ds

    def test_latest_wins(self, ray_session):
        from doppel_ray.stages.diff import keep_latest

        rows = [("a", 10, 1), ("a", 30, 2), ("a", 20, 3), ("b", 5, 4)]
        got = {
            (r["url"], r["warc_ts"], r["doc_id"])
            for r in keep_latest(
                self._ds(rows), ts_col="warc_ts"
            ).take_all()
        }
        assert got == {("a", 30, 2), ("b", 5, 4)}

    def test_tiebreak_on_id(self, ray_session):
        from doppel_ray.stages.diff import keep_latest

        rows = [("a", 10, 7), ("a", 10, 9), ("a", 10, 8)]
        got = keep_latest(self._ds(rows), ts_col="warc_ts").take_all()
        assert len(got) == 1 and got[0]["doc_id"] == 9

    def test_layout_invariant(self, ray_session):
        from doppel_ray.stages.diff import keep_latest

        rows = [(f"u{i % 11}", (i * 13) % 29, i) for i in range(120)]
        a = sorted(
            map(str, keep_latest(self._ds(rows), ts_col="warc_ts").take_all())
        )
        b = sorted(
            map(
                str,
                keep_latest(
                    self._ds(rows, parts=9), ts_col="warc_ts"
                ).take_all(),
            )
        )
        assert a == b and len(a) == 11
