"""Stall-robust bench protocol (bench.py): persisted per-query minima,
atomic updates, and key scoping — pure-Python, no Ray session needed."""

from __future__ import annotations

import importlib
import json
import os
import sys


def _bench(monkeypatch, tmp_path):
    sys.path.insert(0, "/root/repo")
    import bench

    importlib.reload(bench)
    monkeypatch.setattr(bench, "MINIMA_PATH", str(tmp_path / "minima.json"))
    return bench


class TestMinima:
    def test_update_keeps_minimum(self, monkeypatch, tmp_path):
        b = _bench(monkeypatch, tmp_path)
        assert b._update_minimum("q1", 10.0) == 10.0
        assert b._update_minimum("q1", 12.0) == 10.0  # worse sample ignored
        assert b._update_minimum("q1", 7.5) == 7.5    # better sample folds in
        data = json.load(open(b.MINIMA_PATH))
        assert data[b._minima_key("q1")]["sec"] == 7.5

    def test_keys_scope_by_corpus_cpus_mode(self, monkeypatch, tmp_path):
        b = _bench(monkeypatch, tmp_path)
        k = b._minima_key("near_pages")
        assert "near_pages@" in k
        assert f"docs={b.BENCH_DOCS}" in k
        assert f"cpus={b.NUM_CPUS}" in k
        assert f"scale={int(b.SCALE_MODE)}" in k

    def test_missing_or_corrupt_file_is_empty(self, monkeypatch, tmp_path):
        b = _bench(monkeypatch, tmp_path)
        assert b._load_minima() == {}
        with open(b.MINIMA_PATH, "w") as f:
            f.write("{not json")
        assert b._load_minima() == {}

    def test_atomic_write_no_tmp_left_behind(self, monkeypatch, tmp_path):
        b = _bench(monkeypatch, tmp_path)
        b._update_minimum("q2", 3.0)
        assert not os.path.exists(b.MINIMA_PATH + ".tmp")
        assert os.path.exists(b.MINIMA_PATH)
