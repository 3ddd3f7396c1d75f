"""CLI surface tests (reference cmd/find.go / cmd/preset.go semantics):
argument parsing, IsSet-style flag overlay, and precedence."""

from __future__ import annotations

import argparse

from doppel_ray import cli
from doppel_ray import config as C


class TestParser:
    def test_find_flags(self):
        args = cli.build_parser().parse_args(
            ["find", "/data", "--min-size", "1KB", "--near", "--threshold", "0.7"]
        )
        assert args.command == "find"
        assert args.paths == ["/data"]
        assert args.min_size == "1KB"
        assert args.near and args.threshold == 0.7

    def test_preset_choices(self):
        args = cli.build_parser().parse_args(["preset", "dev", "/data"])
        assert args.preset == "dev"
        import pytest

        with pytest.raises(SystemExit):
            cli.build_parser().parse_args(["preset", "nope", "/data"])

    def test_regex_flags_reach_config(self):
        """The reference's cmd/find.go:70-80 bug (regex flags never reach
        config) is fixed: our flags overlay as intended."""
        args = cli.build_parser().parse_args(
            ["find", "/data", "--exclude-dirs-regex", "^tmp", "--exclude-files-regex", r"\.log$"]
        )
        cfg = cli._overlay(C.default_config(), args)
        assert cfg.find.exclude_dir_regex == "^tmp"
        assert cfg.find.exclude_file_regex == r"\.log$"


class TestOverlay:
    def test_unset_flags_do_not_override(self):
        cfg = C.default_config()
        cfg.find.min_size = "5KB"
        args = cli.build_parser().parse_args(["find", "/data"])
        out = cli._overlay(cfg, args)
        assert out.find.min_size == "5KB"  # None flag left config alone

    def test_set_flag_overrides(self):
        cfg = C.default_config()
        cfg.find.min_size = "5KB"
        args = cli.build_parser().parse_args(["find", "/data", "--min-size", "9KB"])
        assert cli._overlay(cfg, args).find.min_size == "9KB"

    def test_preset_overlay(self):
        args = cli.build_parser().parse_args(["preset", "media", "/data"])
        assert cli._overlay(C.default_config(), args).find.preset == "media"


class TestCliShell:
    def test_default_command_routing(self):
        """Bare invocation routes to find (reference DefaultCommand,
        main.go:99)."""
        assert cli._route_default_command(["/data"]) == ["find", "/data"]
        assert cli._route_default_command(["--near", "/data"]) == [
            "find", "--near", "/data"
        ]
        assert cli._route_default_command(["find", "/data"]) == ["find", "/data"]
        assert cli._route_default_command(["job", "/d", "--checkpoint-dir", "c"]) == [
            "job", "/d", "--checkpoint-dir", "c"
        ]
        assert cli._route_default_command(["--help"]) == ["--help"]
        assert cli._route_default_command([]) == []

    def test_config_flag_routing(self, tmp_path):
        """``--config FILE`` is a value-taking top-level flag: its value
        must not be mistaken for the first positional, and the inserted
        ``find`` must land after the flag pair (ADVICE r2 high)."""
        assert cli._route_default_command(
            ["--config", "cfg.toml", "find", "/data"]
        ) == ["--config", "cfg.toml", "find", "/data"]
        assert cli._route_default_command(["--config", "cfg.toml", "/data"]) == [
            "--config", "cfg.toml", "find", "/data"
        ]
        assert cli._route_default_command(["--config=cfg.toml", "/data"]) == [
            "--config=cfg.toml", "find", "/data"
        ]
        # both shapes must survive argparse end-to-end
        cfgf = tmp_path / "cfg.toml"
        cfgf.write_text("[find]\nworkers = 3\n")
        for argv in (
            ["--config", str(cfgf), "find", "/data"],
            ["--config", str(cfgf), "/data"],
        ):
            args = cli.build_parser().parse_args(
                cli._route_default_command(argv)
            )
            assert args.command == "find"
            assert args.config == str(cfgf)
            assert args.paths == ["/data"]

    def test_version_flag(self, capsys):
        import pytest

        from doppel_ray import __version__

        with pytest.raises(SystemExit) as ei:
            cli.build_parser().parse_args(["--version"])
        assert ei.value.code == 0
        assert __version__ in capsys.readouterr().out
