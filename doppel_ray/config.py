"""Layered job configuration: defaults < yaml < toml < json < env < CLI.

Re-expresses the reference's config pipeline (SURVEY.md C1-C4):
* priority-ordered providers folded in reverse priority over defaults
  (reference internal/config/loader.go:36-181; default provider priorities
  yaml=10 < toml=20 < json=30 < env=40, loader.go:152-159)
* field-wise merger where an override wins only when non-zero/non-empty/
  true (internal/config/merger.go:8-75)
* validation of log level / formats / worker bounds
  (internal/config/validator.go:19-93)
* env overlay ``DOPPEL_RAY_<SECTION>_<KEY>`` with truthy bool parsing
  (internal/config/env_provider.go:35-99)
* file provider: format from extension, default TOML; a missing file
  yields an empty config, not an error (internal/config/file_provider.go:61-98)

NOTE (C4): the reference's CLI overlay has a flag-name bug — it checks
``exclude-dir-regex`` but registers ``exclude-dirs-regex`` so those flags
never reach the config (cmd/find.go:70-80 vs 127-132). We implement the
*intended* behavior: every CLI flag overrides its config field.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field, fields, replace
from typing import Any

try:
    import tomllib
except ImportError:  # pragma: no cover
    tomllib = None

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


class ConfigError(ValueError):
    pass


@dataclass
class LogConfig:
    # reference config.LogConfig (internal/config/config.go:44-58)
    level: str = "info"        # debug|info|warn|error
    format: str = "text"       # text|json|pretty|discard
    output: str = "stderr"


@dataclass
class FindConfig:
    # reference config.FindConfig (internal/config/config.go:60-96),
    # generalized: workers -> per-stage concurrency; sizes in bytes.
    workers: int = 0           # 0 => default (cluster CPUs)
    output_format: str = "json"  # json|pretty|yaml
    output: str = "stdout"
    exclude_dirs: str = ""
    exclude_files: str = ""
    exclude_dir_regex: str = ""
    exclude_file_regex: str = ""
    min_size: str = ""         # human size strings, parsed at compile time
    max_size: str = ""
    preset: str = ""
    verbose: bool = False


@dataclass
class DedupConfig:
    """Engine-specific section (no reference counterpart): near-dup knobs."""

    num_perm: int = 128
    bands: int = 32
    shingle_n: int = 5
    threshold: float = 0.8
    band_cap: int = 64
    seed: int = 42


@dataclass
class JobConfig:
    log: LogConfig = field(default_factory=LogConfig)
    find: FindConfig = field(default_factory=FindConfig)
    dedup: DedupConfig = field(default_factory=DedupConfig)


_SECTIONS = {"log": LogConfig, "find": FindConfig, "dedup": DedupConfig}


def default_config() -> JobConfig:
    return JobConfig()


# ------------------------------------------------------------- merging


def _is_zero(v: Any) -> bool:
    """Go zero-value semantics: '' / 0 / 0.0 / False are 'unset'."""
    return v == "" or v == 0 or v == 0.0 or v is False


def merge_section(base: Any, override: Any) -> Any:
    """Field-wise: override wins only when non-zero (merger.go:8-75)."""
    updates = {}
    for f in fields(base):
        ov = getattr(override, f.name)
        if not _is_zero(ov):
            updates[f.name] = ov
    return replace(base, **updates)


def merge(base: JobConfig, override: JobConfig) -> JobConfig:
    return JobConfig(
        log=merge_section(base.log, override.log),
        find=merge_section(base.find, override.find),
        dedup=merge_section(base.dedup, override.dedup),
    )


# ------------------------------------------------------------ providers


class Provider:
    priority: int = 0

    def load(self) -> JobConfig:  # pragma: no cover - interface
        raise NotImplementedError


def _config_from_dict(d: dict) -> JobConfig:
    cfg = JobConfig()
    for section, cls in _SECTIONS.items():
        sub = d.get(section, {}) or {}
        if not isinstance(sub, dict):
            raise ConfigError(f"section {section!r} must be a table/mapping")
        valid = {f.name for f in fields(cls)}
        kwargs = {}
        for k, v in sub.items():
            key = k.replace("-", "_")
            if key in valid:
                kwargs[key] = v
        setattr(cfg, section, cls(**kwargs))
    return cfg


class FileProvider(Provider):
    """Format from extension (default TOML); missing file => empty config
    (file_provider.go:61-98)."""

    def __init__(self, path: str, priority: int = 20):
        self.path = path
        self.priority = priority

    def load(self) -> JobConfig:
        if not os.path.exists(self.path):
            return JobConfig()
        ext = os.path.splitext(self.path)[1].lower()
        with open(self.path, "rb") as f:
            raw = f.read()
        if ext in (".yaml", ".yml"):
            if yaml is None:
                raise ConfigError("yaml not available")
            data = yaml.safe_load(raw) or {}
        elif ext == ".json":
            data = json.loads(raw or b"{}")
        else:  # default TOML
            if tomllib is None:
                raise ConfigError("tomllib not available")
            data = tomllib.loads(raw.decode())
        return _config_from_dict(data)


_TRUTHY = {"1", "true", "yes", "on", "t", "y"}


class EnvProvider(Provider):
    """``DOPPEL_RAY_<SECTION>_<KEY>=value`` overlay (env_provider.go:35-99)."""

    PREFIX = "DOPPEL_RAY_"

    def __init__(self, priority: int = 40, environ: dict | None = None):
        self.priority = priority
        self.environ = environ if environ is not None else os.environ

    def load(self) -> JobConfig:
        data: dict[str, dict] = {}
        for key, val in self.environ.items():
            if not key.startswith(self.PREFIX):
                continue
            rest = key[len(self.PREFIX):].lower()
            section, _, fieldname = rest.partition("_")
            if section not in _SECTIONS or not fieldname:
                continue
            cls = _SECTIONS[section]
            valid = {f.name: f for f in fields(cls)}
            if fieldname not in valid:
                continue
            ftype = valid[fieldname].type
            parsed: Any = val
            if ftype in ("int", int):
                try:
                    parsed = int(val)
                except ValueError:
                    continue
            elif ftype in ("float", float):
                try:
                    parsed = float(val)
                except ValueError:
                    continue
            elif ftype in ("bool", bool):
                parsed = val.strip().lower() in _TRUTHY
            data.setdefault(section, {})[fieldname] = parsed
        return _config_from_dict(data)


class DictProvider(Provider):
    """CLI-flag overlay (highest priority): only explicitly-set flags
    override (cmd/find.go:113-184, intended semantics — see module note)."""

    def __init__(self, data: dict, priority: int = 100):
        self.data = data
        self.priority = priority

    def load(self) -> JobConfig:
        return _config_from_dict(self.data)


# -------------------------------------------------------------- loader


def load_config(providers: list[Provider] | None = None) -> JobConfig:
    """Fold providers over defaults in ascending priority (loader.go:103-144:
    reverse-priority fold == lowest priority merged first)."""
    cfg = default_config()
    for p in sorted(providers or [], key=lambda p: p.priority):
        try:
            cfg = merge(cfg, p.load())
        except ConfigError:
            raise
        except Exception as e:  # provider failure logged, load continues
            import logging

            logging.getLogger(__name__).warning("config provider failed: %s", e)
    validate(cfg)
    return cfg


def standard_providers(
    config_dir: str = ".", cli: dict | None = None
) -> list[Provider]:
    """Default provider stack (loader.go:152-159): yaml(10) < toml(20) <
    json(30) < env(40) < cli(100)."""
    base = "doppel_ray"
    out: list[Provider] = [
        FileProvider(os.path.join(config_dir, f"{base}.yaml"), priority=10),
        FileProvider(os.path.join(config_dir, f"{base}.toml"), priority=20),
        FileProvider(os.path.join(config_dir, f"{base}.json"), priority=30),
        EnvProvider(priority=40),
    ]
    if cli:
        out.append(DictProvider(cli, priority=100))
    return out


# ------------------------------------------------------------ validator

_LOG_LEVELS = {"debug", "info", "warn", "error"}
_LOG_FORMATS = {"text", "json", "pretty", "discard"}
_OUTPUT_FORMATS = {"json", "pretty", "yaml"}


def max_workers() -> int:
    ncpu = os.cpu_count() or 1
    return max(64, ncpu)


def validate(cfg: JobConfig) -> None:
    """validator.go:19-93 semantics."""
    if cfg.log.level not in _LOG_LEVELS:
        raise ConfigError(f"invalid log level: {cfg.log.level!r}")
    if cfg.log.format not in _LOG_FORMATS:
        raise ConfigError(f"invalid log format: {cfg.log.format!r}")
    if cfg.find.output_format not in _OUTPUT_FORMATS:
        raise ConfigError(f"invalid output format: {cfg.find.output_format!r}")
    if cfg.find.workers and not (1 <= cfg.find.workers <= max_workers()):
        raise ConfigError(
            f"workers must be in [1, {max_workers()}], got {cfg.find.workers}"
        )
    if cfg.dedup.num_perm <= 0 or cfg.dedup.bands <= 0:
        raise ConfigError("num_perm and bands must be positive")
    if cfg.dedup.num_perm % cfg.dedup.bands != 0:
        raise ConfigError("num_perm must be divisible by bands")
    if not (0.0 < cfg.dedup.threshold <= 1.0):
        raise ConfigError("threshold must be in (0, 1]")


def to_dict(cfg: JobConfig) -> dict:
    return asdict(cfg)
