"""Config layering (loader/merger/validator/env — reference
internal/config/*_test.go analogs) and report formatters
(internal/output/*_test.go analogs)."""

from __future__ import annotations

import io
import json
import os

import pytest

from doppel_ray import config as C
from doppel_ray.pipelines import report as R


class TestMerger:
    def test_empty_does_not_override(self):
        base = C.JobConfig()
        base.find.output_format = "pretty"
        override = C.JobConfig()
        override.find.output_format = ""  # zero value
        merged = C.merge(base, override)
        assert merged.find.output_format == "pretty"

    def test_nonzero_overrides(self):
        base = C.JobConfig()
        override = C.JobConfig()
        override.find.workers = 8
        override.log.level = "debug"
        merged = C.merge(base, override)
        assert merged.find.workers == 8 and merged.log.level == "debug"

    def test_false_bool_does_not_override(self):
        base = C.JobConfig()
        base.find.verbose = True
        merged = C.merge(base, C.JobConfig())
        assert merged.find.verbose is True


class TestProviders:
    def test_file_provider_missing_file_empty(self, tmp_path):
        p = C.FileProvider(str(tmp_path / "nope.toml"))
        cfg = p.load()
        assert cfg == C.JobConfig()

    def test_toml_file(self, tmp_path):
        f = tmp_path / "doppel_ray.toml"
        f.write_text('[find]\nworkers = 4\noutput_format = "yaml"\n')
        cfg = C.FileProvider(str(f)).load()
        assert cfg.find.workers == 4 and cfg.find.output_format == "yaml"

    def test_json_file(self, tmp_path):
        f = tmp_path / "doppel_ray.json"
        f.write_text(json.dumps({"log": {"level": "debug"}}))
        cfg = C.FileProvider(str(f)).load()
        assert cfg.log.level == "debug"

    def test_yaml_file(self, tmp_path):
        f = tmp_path / "doppel_ray.yaml"
        f.write_text("dedup:\n  threshold: 0.9\n")
        cfg = C.FileProvider(str(f)).load()
        assert cfg.dedup.threshold == 0.9

    def test_env_provider_typing(self):
        env = {
            "DOPPEL_RAY_FIND_WORKERS": "16",
            "DOPPEL_RAY_FIND_VERBOSE": "yes",
            "DOPPEL_RAY_LOG_LEVEL": "warn",
            "DOPPEL_RAY_DEDUP_THRESHOLD": "0.7",
            "DOPPEL_RAY_FIND_WORKERS_BAD": "x",  # unknown field ignored
            "OTHER": "ignored",
        }
        cfg = C.EnvProvider(environ=env).load()
        assert cfg.find.workers == 16
        assert cfg.find.verbose is True
        assert cfg.log.level == "warn"
        assert cfg.dedup.threshold == 0.7

    def test_env_bad_int_skipped(self):
        cfg = C.EnvProvider(environ={"DOPPEL_RAY_FIND_WORKERS": "abc"}).load()
        assert cfg.find.workers == 0


class TestLayering:
    def test_precedence_yaml_lt_toml_lt_json_lt_env_lt_cli(self, tmp_path):
        (tmp_path / "doppel_ray.yaml").write_text("find:\n  workers: 1\n")
        (tmp_path / "doppel_ray.toml").write_text("[find]\nworkers = 2\n")
        (tmp_path / "doppel_ray.json").write_text('{"find": {"workers": 3}}')
        provs = C.standard_providers(str(tmp_path))
        cfg = C.load_config(provs)
        assert cfg.find.workers == 3  # json beats toml beats yaml
        provs = C.standard_providers(str(tmp_path), cli={"find": {"workers": 9}})
        provs.insert(0, C.DictProvider({"find": {"workers": 5}}, priority=40))
        cfg = C.load_config(provs)
        assert cfg.find.workers == 9  # cli beats all

    def test_failed_provider_continues(self, tmp_path):
        bad = tmp_path / "doppel_ray.json"
        bad.write_text("{invalid json")
        cfg = C.load_config([C.FileProvider(str(bad), priority=30)])
        assert cfg == C.JobConfig()  # defaults survive


class TestValidator:
    def test_bad_log_level(self):
        cfg = C.JobConfig()
        cfg.log.level = "nope"
        with pytest.raises(C.ConfigError):
            C.validate(cfg)

    def test_worker_bounds(self):
        cfg = C.JobConfig()
        cfg.find.workers = C.max_workers() + 1
        with pytest.raises(C.ConfigError):
            C.validate(cfg)
        cfg.find.workers = 1
        C.validate(cfg)

    def test_dedup_divisibility(self):
        cfg = C.JobConfig()
        cfg.dedup.bands = 33
        with pytest.raises(C.ConfigError):
            C.validate(cfg)


GROUPS = [
    {"group_id": "u://0", "count": 3, "size": 4, "wasted_space": 8,
     "files": ["u://0", "u://1", "u://2"]},
    {"group_id": "u://3", "count": 2, "size": 2, "wasted_space": 2,
     "files": ["u://3", "u://4"]},
]


class TestReport:
    def _report(self):
        return R.report_from_groups(
            GROUPS, total_files=6, processed_files=5, duration_s=2.0,
            scan_date="2026-01-01T00:00:00Z",
        )

    def test_assembly(self):
        rep = self._report()
        assert rep.total_wasted_space == 10
        assert rep.stats.duplicate_groups == 2
        assert rep.stats.duplicate_files == 5

    def test_json_roundtrip(self):
        buf = io.StringIO()
        R.format_json(self._report(), buf)
        d = json.loads(buf.getvalue())
        assert d["total_wasted_space"] == 10
        assert d["groups"][0]["id"] == 1
        assert d["groups"][0]["files"] == ["u://0", "u://1", "u://2"]
        assert set(d["stats"]) >= {"total_files", "processed_files",
                                   "duplicate_groups", "duplicate_files"}

    def test_yaml_roundtrip(self):
        import yaml

        buf = io.StringIO()
        R.format_yaml(self._report(), buf)
        d = yaml.safe_load(buf.getvalue())
        assert d["stats"]["duplicate_groups"] == 2

    def test_pretty_rate_line(self):
        buf = io.StringIO()
        R.format_pretty(self._report(), buf)
        text = buf.getvalue()
        assert "Processing rate: 2.5 files/sec" in text
        assert "Group #1: 3 copies" in text

    def test_registry(self):
        reg = R.default_registry()
        assert reg.list() == ["json", "pretty", "yaml"]
        with pytest.raises(KeyError):
            reg.get("xml")

    def test_output_router(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        out, close = R.resolve_output("sub/dir/report.txt")
        assert close
        out.write("x")
        out.close()
        assert (tmp_path / "sub/dir/report.txt").read_text() == "x"
        out, close = R.resolve_output("stdout")
        assert not close
        # "." -> default file name (cmd/find.go:241-244)
        out, close = R.resolve_output(".")
        out.close()
        assert (tmp_path / R.DEFAULT_REPORT_FILE).exists()
        # "./." cleans to "." too (filepath.Clean parity)
        out, close = R.resolve_output("./.")
        out.close()
        assert close
        # stdout/stderr match case-insensitively (strings.ToLower,
        # cmd/find.go:238-240)
        import sys as _sys

        for alias in ("STDOUT", "Stdout"):
            out, close = R.resolve_output(alias)
            assert out is _sys.stdout and not close
        out, close = R.resolve_output("STDERR")
        assert out is _sys.stderr and not close


class TestNearReportMerge:
    def test_near_clusters_merged_kind_tagged(self, ray_session, tmp_path):
        """ADVICE r1 (low): near=True must surface near-dup clusters in
        the report's group list (kind-tagged), not discard them."""
        import pyarrow as pa
        import ray.data as rd

        from doppel_ray.pipelines.dedup import find_duplicates

        base = " ".join(f"token{i:03d}" for i in range(60))
        near = " ".join(
            f"token{i:03d}" if i < 57 else f"altered{i}" for i in range(60)
        )
        t = pa.table(
            {
                "url": ["a", "b", "c", "d", "e"],
                "text": [base, base, near, "totally unrelated doc qqq " * 5,
                         "another unique page zzz " * 5],
            }
        )
        rep, _ = find_duplicates(rd.from_arrow(t), near=True, with_stats=False)
        kinds = {g.get("kind") for g in rep.groups}
        assert "exact" in kinds and "near" in kinds
        near_groups = [g for g in rep.groups if g["kind"] == "near"]
        assert len(near_groups) == 1
        g = near_groups[0]
        assert set(g["files"]) == {"a", "b", "c"}
        assert g["count"] == 3 and g["group_id"] == "a"
        sizes = [len(base.encode()), len(base.encode()), len(near.encode())]
        assert g["size"] == max(sizes)
        assert g["wasted_space"] == sum(sizes) - max(sizes)
        d = R._report_dict(rep)
        assert {x["kind"] for x in d["groups"]} == {"exact", "near"}

    def test_report_cap_keeps_totals_and_top_groups(self, ray_session):
        """VERDICT r2 #6: the in-memory report streams the groups dataset
        and caps the group list at report_cap (largest wasted_space),
        while aggregate stats still cover every group."""
        import pyarrow as pa
        import ray.data as rd

        from doppel_ray.pipelines.dedup import find_duplicates

        # 4 exact-dup groups with distinct wasted_space (text length x 1 dup)
        urls, texts = [], []
        for gi, length in enumerate([10, 20, 30, 40]):
            body = "x" * length + f" group{gi}"
            for ci in range(2):
                urls.append(f"g{gi}c{ci}")
                texts.append(body)
        t = pa.table({"url": urls, "text": texts})

        full, _ = find_duplicates(rd.from_arrow(t), with_stats=False)
        capped, _ = find_duplicates(
            rd.from_arrow(t), with_stats=False, report_cap=2
        )
        assert full.stats.duplicate_groups == 4
        assert capped.stats.duplicate_groups == 4
        assert capped.stats.duplicate_files == full.stats.duplicate_files == 8
        assert capped.total_wasted_space == full.total_wasted_space
        assert len(capped.groups) == 2
        top2 = sorted(
            (int(g["wasted_space"]) for g in full.groups), reverse=True
        )[:2]
        assert sorted(
            (int(g["wasted_space"]) for g in capped.groups), reverse=True
        ) == top2
