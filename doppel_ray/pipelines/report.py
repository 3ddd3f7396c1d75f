"""Report model, formatter registry, and output routing (SURVEY.md O1-O5,
G5, G6).

Mirrors the reference's output layer:
* ``Stats`` / ``DuplicateReport``    — internal/model/model.go:18-78
* formatter registry (plugin surface) — internal/output/formatter.go:27-94
* JSON sink (2-space indent)          — internal/output/json_formatter.go:19-24
* YAML sink                           — internal/output/yaml_formatter.go:19-26
* pretty text sink incl. the processing-rate line (files/sec =
  processed/duration) — internal/output/pretty_formatter.go:24-149
* output router: stdout/stderr/path, ``"."`` -> default report file,
  parent dirs created — cmd/find.go:234-266

JSON/YAML field names follow the reference's struct tags (model.go:20-47):
``id, count, size, wasted_space, files`` and ``scan_date, stats,
total_wasted_space, groups``.
"""

from __future__ import annotations

import io
import json
import os
import sys
from dataclasses import asdict, dataclass, field

from doppel_ray.functions.sizes import format_bytes

DEFAULT_REPORT_FILE = "doppel-report.txt"


@dataclass
class Stats:
    # reference model.Stats (model/model.go:51-78)
    total_files: int = 0
    processed_files: int = 0
    skipped_files: int = 0
    skipped_dirs: int = 0
    error_count: int = 0
    duplicate_groups: int = 0
    duplicate_files: int = 0
    duration_s: float = 0.0


@dataclass
class DuplicateReport:
    # reference model.DuplicateReport (model/model.go:36-48)
    scan_date: str = ""
    stats: Stats = field(default_factory=Stats)
    total_wasted_space: int = 0
    groups: list[dict] = field(default_factory=list)  # GROUPS_SCHEMA rows


def report_from_groups(
    groups: list[dict],
    *,
    total_files: int,
    processed_files: int,
    skipped_files: int = 0,
    duration_s: float = 0.0,
    scan_date: str = "",
    total_wasted_space: int | None = None,
    duplicate_groups: int | None = None,
    duplicate_files: int | None = None,
) -> DuplicateReport:
    """Assemble the report from duplicate-group rows (finder.go:114-145).

    The three aggregate overrides let a streaming caller report totals
    over ALL groups while ``groups`` holds only a top-N cap (VERDICT r2
    #6); when omitted they are derived from the list as before."""
    groups = sorted(groups, key=lambda g: g["group_id"])
    total_wasted = (
        sum(int(g["wasted_space"]) for g in groups)
        if total_wasted_space is None
        else total_wasted_space
    )
    stats = Stats(
        total_files=total_files,
        processed_files=processed_files,
        skipped_files=skipped_files,
        duplicate_groups=(
            len(groups) if duplicate_groups is None else duplicate_groups
        ),
        duplicate_files=(
            sum(int(g["count"]) for g in groups)
            if duplicate_files is None
            else duplicate_files
        ),
        duration_s=duration_s,
    )
    return DuplicateReport(
        scan_date=scan_date,
        stats=stats,
        total_wasted_space=total_wasted,
        groups=groups,
    )


def _report_dict(report: DuplicateReport) -> dict:
    d = {
        "scan_date": report.scan_date,
        "stats": asdict(report.stats),
        "total_wasted_space": report.total_wasted_space,
        "groups": [
            {
                "id": i + 1,
                "kind": g.get("kind", "exact"),
                "count": int(g["count"]),
                "size": int(g["size"]),
                "wasted_space": int(g["wasted_space"]),
                "files": list(g["files"]),
            }
            for i, g in enumerate(report.groups)
        ],
    }
    return d


class FormatterRegistry:
    """name -> formatter callable (formatter.go:27-94)."""

    def __init__(self):
        self._formatters: dict[str, callable] = {}

    def register(self, name: str, fn) -> None:
        self._formatters[name] = fn

    def get(self, name: str):
        if name not in self._formatters:
            raise KeyError(f"unknown format: {name}")
        return self._formatters[name]

    def list(self) -> list[str]:
        return sorted(self._formatters)

    def format(self, name: str, report: DuplicateReport, out: io.TextIOBase) -> None:
        self.get(name)(report, out)


def format_json(report: DuplicateReport, out) -> None:
    json.dump(_report_dict(report), out, indent=2)
    out.write("\n")


def format_yaml(report: DuplicateReport, out) -> None:
    import yaml

    yaml.safe_dump(_report_dict(report), out, sort_keys=False)


def format_pretty(report: DuplicateReport, out) -> None:
    """Plain-text analog of the lipgloss report
    (pretty_formatter.go:24-149)."""
    w = out.write
    w("Duplicate File Report\n")
    w("=====================\n\n")
    if not report.groups:
        w("No duplicates found.\n\n")
    for i, g in enumerate(report.groups, 1):
        w(f"Group #{i}: {g['count']} copies, {format_bytes(int(g['size']))} each, "
          f"{format_bytes(int(g['wasted_space']))} wasted\n")
        for f_ in g["files"]:
            w(f"  {f_}\n")
        w("\n")
    s = report.stats
    w("Summary\n-------\n")
    w(f"Duplicate groups:   {s.duplicate_groups}\n")
    w(f"Duplicate files:    {s.duplicate_files}\n")
    w(f"Total wasted space: {format_bytes(report.total_wasted_space)}\n\n")
    w("Statistics\n----------\n")
    w(f"Total files:     {s.total_files}\n")
    w(f"Processed files: {s.processed_files}\n")
    w(f"Skipped files:   {s.skipped_files}\n")
    w(f"Errors:          {s.error_count}\n")
    w(f"Duration:        {s.duration_s:.3f}s\n")
    if s.duration_s > 0:
        # the reference's headline rate (pretty_formatter.go:141-146)
        w(f"Processing rate: {s.processed_files / s.duration_s:.1f} files/sec\n")


def default_registry() -> FormatterRegistry:
    reg = FormatterRegistry()
    reg.register("json", format_json)
    reg.register("yaml", format_yaml)
    reg.register("pretty", format_pretty)
    return reg


def resolve_output(dest: str):
    """stdout/stderr/path routing (cmd/find.go:234-266). Returns (stream,
    should_close)."""
    # stdout/stderr route case-insensitively (strings.ToLower in find.go)
    if dest in ("", "-") or dest.lower() == "stdout":
        return sys.stdout, False
    if dest.lower() == "stderr":
        return sys.stderr, False
    path = os.path.normpath(dest)
    if path == ".":
        path = DEFAULT_REPORT_FILE
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    return open(path, "w"), True


def write_report(
    report: DuplicateReport,
    *,
    fmt: str = "json",
    dest: str = "stdout",
    registry: FormatterRegistry | None = None,
) -> None:
    reg = registry or default_registry()
    out, should_close = resolve_output(dest)
    try:
        reg.format(fmt, report, out)
    finally:
        if should_close:
            out.close()
