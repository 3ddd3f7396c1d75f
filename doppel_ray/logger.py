"""Structured-logger subsystem: pluggable text / json / pretty / discard
handlers over stdlib ``logging``.

Re-expresses the reference's logger package (reference
internal/logger/logger.go:1-310 — an slog wrapper with a handler registry,
pretty_handler.go:1-314 colored terminal output, json_handler.go JSON
lines) for the Ray engine. Python's stdlib ``logging`` plays the role of
``slog``: a Logger carries pluggable Handlers; each format below is a
``logging.Formatter``; handler writes are lock-protected by stdlib
(reference race-hardens with a mutex, pretty_handler.go mu field).

Behavior contracts carried over:
* format registry with case-insensitive names and aliases
  (``createHandler``, logger.go:188-203): text | json | null/discard |
  pretty/color/terminal/human; unknown format warns to stderr and falls
  back to text (logger.go:199-201).
* output routing (``NewConfig``, logger.go:208-246): stdout | stderr |
  null/discard | file path (parent dirs created; "." invalid).
* structured attrs: ``info("msg", key=value, ...)`` — text renders
  ``key=value`` pairs, json emits them as fields, pretty colors them.
* a process-global default logger swap (``SetDefault``/``Default``,
  logger.go analog via module functions).
"""

from __future__ import annotations

import io
import json
import logging
import os
import sys
import threading
import time
from dataclasses import dataclass, field

_LEVELS = {
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warn": logging.WARNING,
    "warning": logging.WARNING,
    "error": logging.ERROR,
}

_ANSI = {
    "reset": "\x1b[0m",
    "dim": "\x1b[2m",
    "bold": "\x1b[1m",
    "debug": "\x1b[35;1m",   # magenta (reference pretty_handler.go:67)
    "info": "\x1b[32;1m",    # green (pretty_handler.go:68)
    "warn": "\x1b[33;1m",    # yellow (pretty_handler.go:69)
    "error": "\x1b[31;1m",   # red (pretty_handler.go:70)
    "key": "\x1b[34m",       # blue attr keys (pretty_handler.go:73)
}


def _attrs_of(record: logging.Record) -> dict:
    return getattr(record, "attrs", None) or {}


class TextFormatter(logging.Formatter):
    """Plain ``time level msg key=value ...`` lines (reference
    text_handler.go semantics)."""

    def format(self, record: logging.LogRecord) -> str:
        ts = time.strftime("%Y-%m-%dT%H:%M:%S", time.localtime(record.created))
        parts = [ts, record.levelname, record.getMessage()]
        for k, v in _attrs_of(record).items():
            parts.append(f"{k}={v}")
        return " ".join(parts)


class JSONFormatter(logging.Formatter):
    """One JSON object per line (reference json_handler.go)."""

    def format(self, record: logging.LogRecord) -> str:
        obj = {
            "time": time.strftime(
                "%Y-%m-%dT%H:%M:%S", time.localtime(record.created)
            ),
            "level": record.levelname,
            "msg": record.getMessage(),
        }
        obj.update(_attrs_of(record))
        return json.dumps(obj, default=str)


class PrettyFormatter(logging.Formatter):
    """Human-friendly colored terminal lines (reference
    pretty_handler.go: timestamp dim, level colored+bold, attr keys
    colored, values dim)."""

    _LEVEL_COLOR = {
        "DEBUG": _ANSI["debug"],
        "INFO": _ANSI["info"],
        "WARNING": _ANSI["warn"],
        "ERROR": _ANSI["error"],
        "CRITICAL": _ANSI["error"],
    }

    def format(self, record: logging.LogRecord) -> str:
        ts = time.strftime("%H:%M:%S", time.localtime(record.created))
        color = self._LEVEL_COLOR.get(record.levelname, "")
        reset = _ANSI["reset"]
        lvl = record.levelname[:4].ljust(4)
        out = [
            f"{_ANSI['dim']}{ts}{reset}",
            f"{color}{lvl}{reset}",
            record.getMessage(),
        ]
        for k, v in _attrs_of(record).items():
            out.append(
                f"{_ANSI['key']}{k}{reset}={_ANSI['dim']}{v}{reset}"
            )
        return " ".join(out)


_FORMATS = {
    "text": TextFormatter,
    "": TextFormatter,
    "json": JSONFormatter,
    "pretty": PrettyFormatter,
    "color": PrettyFormatter,
    "terminal": PrettyFormatter,
    "human": PrettyFormatter,
}


@dataclass
class LoggerConfig:
    """Mirror of reference logger.Config + NewConfig routing inputs."""

    format: str = "text"     # text|json|pretty|null/discard (+aliases)
    output: str = "stderr"   # stdout|stderr|null/discard|<file path>
    level: str = "info"      # debug|info|warn|error


def resolve_writer(output: str):
    """Output name -> (stream, needs_close) — reference logger.go:208-246.

    Files get parent directories created; ``"."`` is invalid.
    """
    name = (output or "").lower()
    if name in ("stdout", ""):
        return sys.stdout, False
    if name == "stderr":
        return sys.stderr, False
    if name in ("null", "discard"):
        return open(os.devnull, "w"), True
    path = os.path.abspath(os.path.normpath(output))
    if os.path.normpath(output) == ".":
        raise ValueError("invalid file path")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    return open(path, "a"), True


def create_handler(cfg: LoggerConfig) -> logging.Handler:
    """Format registry (reference createHandler, logger.go:188-203):
    unknown formats warn on stderr and fall back to text; null/discard
    maps to a no-op handler regardless of output."""
    fmt_name = (cfg.format or "").lower()
    if fmt_name in ("null", "discard"):
        return logging.NullHandler()
    cls = _FORMATS.get(fmt_name)
    if cls is None:
        print(
            f"Unknown log format '{cfg.format}'. Using text format.",
            file=sys.stderr,
        )
        cls = TextFormatter
    stream, needs_close = resolve_writer(cfg.output)
    h = logging.StreamHandler(stream)
    h.setFormatter(cls())
    if needs_close:
        # close the owned stream when the handler is closed
        orig_close = h.close

        def close():
            orig_close()
            try:
                stream.close()
            except Exception:
                pass

        h.close = close
    return h


class Logger:
    """Instance logger with attr-style structured methods (reference
    Logger wrapper, logger.go:40-180): ``log.info("msg", docs=5)``."""

    def __init__(self, cfg: LoggerConfig | None = None, name: str = "doppel_ray"):
        self.cfg = cfg or LoggerConfig()
        self._logger = logging.Logger(name)  # unattached: no root side effects
        self._logger.setLevel(_LEVELS.get(self.cfg.level.lower(), logging.INFO))
        self._handler = create_handler(self.cfg)
        self._logger.addHandler(self._handler)

    def _log(self, level: int, msg: str, attrs: dict):
        self._logger.log(level, msg, extra={"attrs": attrs})

    def debug(self, msg: str, **attrs):
        self._log(logging.DEBUG, msg, attrs)

    def info(self, msg: str, **attrs):
        self._log(logging.INFO, msg, attrs)

    def warn(self, msg: str, **attrs):
        self._log(logging.WARNING, msg, attrs)

    warning = warn

    def error(self, msg: str, **attrs):
        self._log(logging.ERROR, msg, attrs)

    def close(self):
        self._handler.close()


_default_lock = threading.Lock()
_default: Logger | None = None


def set_default(logger: Logger) -> None:
    """Swap the process-global default (reference SetDefault +
    atomic.Pointer, logger.go:25, 148-160)."""
    global _default
    with _default_lock:
        old = _default
        _default = logger
    if old is not None and old is not logger:
        old.close()


def default() -> Logger:
    global _default
    with _default_lock:
        if _default is None:
            _default = Logger()
        return _default


def reset_default() -> None:
    set_default(Logger())


def configure_from(log_cfg) -> Logger:
    """Build + install the default logger from a validated
    ``config.LogConfig`` (cli entry wiring)."""
    lg = Logger(
        LoggerConfig(
            format=log_cfg.format, output=log_cfg.output, level=log_cfg.level
        )
    )
    set_default(lg)
    return lg


def debug(msg: str, **attrs):
    default().debug(msg, **attrs)


def info(msg: str, **attrs):
    default().info(msg, **attrs)


def warn(msg: str, **attrs):
    default().warn(msg, **attrs)


def error(msg: str, **attrs):
    default().error(msg, **attrs)
