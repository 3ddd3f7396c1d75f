"""Structured-logger subsystem tests (reference internal/logger/
logger_test.go behaviors: format registry + fallback, output routing,
JSON structure, attrs, level filtering, discard, default swap)."""

from __future__ import annotations

import io
import json
import logging

import pytest

from doppel_ray import logger as L


def _capture(fmt: str, level: str = "debug"):
    lg = L.Logger(L.LoggerConfig(format=fmt, output="stderr", level=level))
    buf = io.StringIO()
    lg._handler.setStream(buf)
    return lg, buf


class TestFormats:
    def test_text_line(self):
        lg, buf = _capture("text")
        lg.info("hello", docs=5)
        line = buf.getvalue().strip()
        assert "INFO" in line and "hello" in line and "docs=5" in line

    def test_json_line(self):
        lg, buf = _capture("json")
        lg.warn("problem", count=3, path="/x")
        obj = json.loads(buf.getvalue())
        assert obj["level"] == "WARNING" and obj["msg"] == "problem"
        assert obj["count"] == 3 and obj["path"] == "/x"

    def test_pretty_colors(self):
        lg, buf = _capture("pretty")
        lg.error("boom", key="v")
        out = buf.getvalue()
        assert "\x1b[" in out and "boom" in out and "key" in out

    def test_pretty_aliases(self):
        for alias in ("color", "terminal", "human"):
            h = L.create_handler(L.LoggerConfig(format=alias, output="stderr"))
            assert isinstance(h.formatter, L.PrettyFormatter)

    def test_discard_is_noop(self):
        h = L.create_handler(L.LoggerConfig(format="discard", output="stdout"))
        assert isinstance(h, logging.NullHandler)
        h2 = L.create_handler(L.LoggerConfig(format="null", output="stdout"))
        assert isinstance(h2, logging.NullHandler)

    def test_unknown_format_falls_back_to_text(self, capsys):
        # reference createHandler default branch (logger.go:199-201)
        h = L.create_handler(L.LoggerConfig(format="xml", output="stderr"))
        assert isinstance(h.formatter, L.TextFormatter)
        assert "Unknown log format 'xml'" in capsys.readouterr().err


class TestRouting:
    def test_stdout_stderr(self):
        import sys

        s, close = L.resolve_writer("stdout")
        assert s is sys.stdout and not close
        s, close = L.resolve_writer("stderr")
        assert s is sys.stderr and not close
        s, close = L.resolve_writer("")
        assert s is sys.stdout

    def test_null_route(self):
        s, close = L.resolve_writer("null")
        assert close
        s.write("x")  # no error
        s.close()

    def test_file_route_creates_dirs(self, tmp_path):
        path = tmp_path / "sub" / "dir" / "app.log"
        lg = L.Logger(
            L.LoggerConfig(format="text", output=str(path), level="info")
        )
        lg.info("to file", n=1)
        lg.close()
        content = path.read_text()
        assert "to file" in content and "n=1" in content

    def test_dot_path_invalid(self):
        # reference NewConfig (logger.go:219-227): "." is invalid
        with pytest.raises(ValueError):
            L.resolve_writer(".")


class TestLevels:
    def test_level_filtering(self):
        lg, buf = _capture("text", level="warn")
        lg.debug("d"); lg.info("i"); lg.warn("w"); lg.error("e")
        out = buf.getvalue()
        assert "d" not in out.split() and "i" not in out.split()
        assert "w" in out and "e" in out


class TestDefault:
    def test_default_swap(self):
        old = L.default()
        lg, buf = _capture("text")
        L.set_default(lg)
        try:
            L.info("via module", x=1)
            assert "via module" in buf.getvalue()
        finally:
            L.reset_default()

    def test_configure_from_logconfig(self):
        from doppel_ray import config as C

        cfg = C.default_config()
        cfg.log.format = "json"
        cfg.log.level = "debug"
        lg = L.configure_from(cfg.log)
        assert isinstance(lg._handler.formatter, L.JSONFormatter)
        L.reset_default()
