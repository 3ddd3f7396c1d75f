"""The stall-robust bench protocol (bench.py): persisted-minima fold,
key scoping, and the scaling report computed from minima — pure JSON
math, no Ray session."""

from __future__ import annotations

import importlib
import json
import sys


def _bench(tmp_path, monkeypatch, minima=None):
    sys.path.insert(0, "/root/repo")
    bench = importlib.import_module("bench")
    path = str(tmp_path / "BENCH_MINIMA.json")
    if minima is not None:
        with open(path, "w") as f:
            json.dump(minima, f)
    monkeypatch.setattr(bench, "MINIMA_PATH", path)
    return bench


class TestMinima:
    def test_update_folds_minimum(self, tmp_path, monkeypatch):
        bench = _bench(tmp_path, monkeypatch)
        assert bench._update_minimum("q", 10.0) == 10.0
        assert bench._update_minimum("q", 12.0) == 10.0  # worse: kept
        assert bench._update_minimum("q", 7.5) == 7.5    # better: folded
        saved = bench._load_minima()
        assert saved[bench._minima_key("q")]["sec"] == 7.5

    def test_key_scopes_by_corpus_cpus_mode(self, tmp_path, monkeypatch):
        bench = _bench(tmp_path, monkeypatch)
        k = bench._minima_key("near_pages")
        assert str(bench.BENCH_DOCS) in k
        assert f"cpus={bench.NUM_CPUS}" in k
        assert f"scale={int(bench.SCALE_MODE)}" in k
        assert bench.SF_DIR in k

    def test_corrupt_minima_file_ignored(self, tmp_path, monkeypatch):
        bench = _bench(tmp_path, monkeypatch)
        with open(bench.MINIMA_PATH, "w") as f:
            f.write("{not json")
        assert bench._load_minima() == {}
        assert bench._update_minimum("q", 3.0) == 3.0


class TestScalingReport:
    def _minima(self, bench_mod=None):
        # legs: 8cpu exactly 3.2x the 32cpu -> per-query eff 0.8
        sf = "/root/testdata/sf0.1"
        names = ["simhash_pages", "decontam_pages", "exact_pages", "near_pages"]
        m = {}
        for q, t32 in zip(names, [10.0, 4.0, 2.0, 40.0]):
            # every leg carries the same 1.0s session-fixed cost; the
            # variable part scales 4x with docs and 3.2x with 8-vs-32
            # CPUs, so headline eff is pulled below 0.8 by the fixed
            # cost while MARGINAL eff recovers exactly 0.8
            m[f"{q}@{sf}|docs=800000|cpus=32|scale=1"] = {"sec": 1.0 + t32}
            m[f"{q}@{sf}|docs=800000|cpus=8|scale=1"] = {"sec": 1.0 + 3.2 * t32}
            m[f"{q}@{sf}|docs=200000|cpus=32|scale=1"] = {"sec": 1.0 + t32 / 4}
            m[f"{q}@{sf}|docs=200000|cpus=8|scale=1"] = {
                "sec": 1.0 + 3.2 * t32 / 4
            }
        return m

    def test_efficiency_from_minima(self, tmp_path, monkeypatch):
        bench = _bench(tmp_path, monkeypatch, minima=self._minima())
        monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.1")
        monkeypatch.setattr(bench, "SCALING_DOCS", 800000)
        monkeypatch.setattr(bench, "BENCH_DOCS", 200000)
        rep = bench.scaling_report()
        assert set(rep["per_query_efficiency"]) == {
            "simhash_pages",
            "decontam_pages",
            "exact_pages",
            "near_pages",
        }
        # headline eff is dragged under 0.8 by the session-fixed second
        assert 0.6 < rep["scaling_efficiency"] < 0.8
        # marginal (big - small differencing) strips it exactly:
        # d_lo/d_hi = 3.2 per leg -> 0.8
        assert rep["marginal_scaling_efficiency"] == 0.8
        assert all(
            v == 0.8 for v in rep["marginal_per_query_efficiency"].values()
        )

    def test_missing_legs_excluded(self, tmp_path, monkeypatch):
        m = self._minima()
        del m["near_pages@/root/testdata/sf0.1|docs=800000|cpus=8|scale=1"]
        bench = _bench(tmp_path, monkeypatch, minima=m)
        monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.1")
        monkeypatch.setattr(bench, "SCALING_DOCS", 800000)
        monkeypatch.setattr(bench, "BENCH_DOCS", 200000)
        rep = bench.scaling_report()
        assert "near_pages" not in rep["per_query_efficiency"]
        assert rep["scaling_efficiency"] is not None
        assert rep["marginal_scaling_efficiency"] == 0.8
