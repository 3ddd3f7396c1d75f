"""Exclusion filters: the reference's discovery-side predicates (F1-F6)
re-expressed for a web corpus and applied as ONE vectorized map_batches
stage (or, for the size window, a pushdown-able Arrow expression).

Path -> URL reinterpretation:
* a document's "file name"  = last path segment of the url (basename)
* its "directory path"      = every directory prefix of the url path
* its "size"                = UTF-8 byte length of ``text``

Semantics mirrored from the reference:
* ``should_exclude_dir``  (internal/filter/filter.go:147-169): glob match
  on basename and full path, then regex on both; any hit prunes the
  subtree (scanner.go:61 SkipDir) — here: a url is dropped when ANY of its
  directory prefixes matches, the streaming analog of subtree pruning.
* ``should_exclude_file`` (filter.go:172-207): size window first
  (min>0 && size<min; max>0 && size>max; min==max>0 => exact size only),
  then glob, then regex, each on basename and full path.
* ``build_filter_config`` (filter.go:55-127 BuildConfig): clamps negative
  sizes to 0, errors when min>max (both>0), compiles regex lists eagerly
  (invalid pattern => error), comma-separated lists split+trimmed
  (filter.go:130-144 parseCommaSeparated).
* glob semantics follow Go ``filepath.Match``: ``*``/``?`` do NOT cross
  ``/`` (unlike Python fnmatch).

The compiled predicate is closed over by the batch UDF; regexes compile
once at pipeline-build time on the driver and ship pickled to workers
(cheap, no per-batch compile).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from doppel_ray.functions import hashing


class FilterConfigError(ValueError):
    pass


def parse_comma_separated(s: str) -> list[str]:
    """Split on ',', trim whitespace, drop empties (filter.go:130-144)."""
    if not s:
        return []
    return [p.strip() for p in s.split(",") if p.strip()]


def glob_to_regex(pattern: str) -> str:
    """Translate a Go filepath.Match glob to an anchored Python regex.

    ``*`` matches any run of non-``/`` chars, ``?`` one non-``/`` char,
    ``[...]`` character classes pass through.
    """
    out = []
    i = 0
    n = len(pattern)
    while i < n:
        c = pattern[i]
        if c == "*":
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        elif c == "[":
            j = i + 1
            if j < n and pattern[j] in "!^":
                j += 1
            if j < n and pattern[j] == "]":
                j += 1
            while j < n and pattern[j] != "]":
                j += 1
            if j >= n:
                out.append(re.escape(c))
            else:
                cls = pattern[i + 1 : j]
                if cls.startswith("!"):
                    cls = "^" + cls[1:]
                out.append(f"[{cls}]")
                i = j
        else:
            out.append(re.escape(c))
        i += 1
    return "(?s:" + "".join(out) + r")\Z"


@dataclass
class FilterConfig:
    """Compiled predicate bundle (reference filter.Config, filter.go:28-52)."""

    exclude_dirs: list[str] = field(default_factory=list)
    exclude_files: list[str] = field(default_factory=list)
    exclude_dir_regex: list[re.Pattern] = field(default_factory=list)
    exclude_file_regex: list[re.Pattern] = field(default_factory=list)
    min_size: int = 0
    max_size: int = 0

    # --- scalar truth-table predicates (mirrors of the reference API) ---

    def should_exclude_dir(self, dir_path: str) -> bool:
        base = dir_path.rstrip("/").rsplit("/", 1)[-1]
        for pattern in self.exclude_dirs:
            if re.match(glob_to_regex(pattern), base) or re.match(
                glob_to_regex(pattern), dir_path
            ):
                return True
        for rx in self.exclude_dir_regex:
            if rx.search(base) or rx.search(dir_path):
                return True
        return False

    def should_exclude_file(self, file_path: str, size: int) -> bool:
        base = file_path.rsplit("/", 1)[-1]
        if self.min_size > 0 and size < self.min_size:
            return True
        if self.max_size > 0 and size > self.max_size:
            return True
        if (
            self.min_size > 0
            and self.min_size == self.max_size
            and size != self.min_size
        ):
            return True
        for pattern in self.exclude_files:
            if re.match(glob_to_regex(pattern), base) or re.match(
                glob_to_regex(pattern), file_path
            ):
                return True
        for rx in self.exclude_file_regex:
            if rx.search(base) or rx.search(file_path):
                return True
        return False


def build_filter_config(
    exclude_dirs: str = "",
    exclude_files: str = "",
    exclude_dir_regex: str = "",
    exclude_file_regex: str = "",
    min_size: int = 0,
    max_size: int = 0,
) -> FilterConfig:
    """BuildConfig analog (filter.go:55-127)."""
    if min_size < 0:
        min_size = 0
    if max_size < 0:
        max_size = 0
    if min_size > 0 and max_size > 0 and min_size > max_size:
        raise FilterConfigError(
            f"minimum size ({min_size}) cannot be greater than maximum size ({max_size})"
        )
    fc = FilterConfig(min_size=min_size, max_size=max_size)
    fc.exclude_dirs = parse_comma_separated(exclude_dirs)
    fc.exclude_files = parse_comma_separated(exclude_files)
    for raw, dest in (
        (exclude_dir_regex, fc.exclude_dir_regex),
        (exclude_file_regex, fc.exclude_file_regex),
    ):
        for pattern in parse_comma_separated(raw):
            try:
                dest.append(re.compile(pattern))
            except re.error as e:
                raise FilterConfigError(
                    f"invalid regex pattern '{pattern}': {e}"
                ) from e
    return fc


# Preset predicate bundles (reference internal/filter/presets.go:6-33),
# reinterpreted for web corpora: dir names become url path segments, file
# globs become url basename globs; min sizes carried over verbatim.
PRESETS: dict[str, dict] = {
    "dev": {
        "exclude_dirs": "node_modules,.git,build,dist,target,__pycache__,.vscode,.idea,vendor",
        "exclude_files": "*.tmp,*.log,*.swp,*.swo,*~,.DS_Store,Thumbs.db,*.pyc,*.pyo",
        "min_size": 100,
    },
    "media": {
        "exclude_dirs": ".git,__pycache__,node_modules",
        "min_size": 10240,
    },
    "docs": {
        "exclude_dirs": ".git,__pycache__,node_modules,build,dist",
        "exclude_files": "*.tmp,*.log,*.swp,*~",
        "min_size": 1024,
    },
    "clean": {
        "exclude_dirs": ".git,__pycache__,node_modules,.cache,tmp,temp",
        "exclude_files": "*.tmp,*.log,*.cache,*.swp,*~",
    },
}


def get_preset_config(preset: str) -> FilterConfig:
    """Named preset -> compiled FilterConfig; unknown -> empty config
    (presets.go:31-32)."""
    return build_filter_config(**PRESETS.get(preset, {}))


# ----------------------------------------------------------- batch stage


def _compiled_matchers(fc: FilterConfig):
    """Fold glob+regex lists into single alternation regexes (vectorized
    matching via pandas .str.contains / fullmatch in C)."""
    dir_globs = [glob_to_regex(p) for p in fc.exclude_dirs]
    file_globs = [glob_to_regex(p) for p in fc.exclude_files]
    dir_rx = [r.pattern for r in fc.exclude_dir_regex]
    file_rx = [r.pattern for r in fc.exclude_file_regex]
    return (
        re.compile("|".join(dir_globs)) if dir_globs else None,
        re.compile("|".join(file_globs)) if file_globs else None,
        re.compile("|".join(dir_rx)) if dir_rx else None,
        re.compile("|".join(file_rx)) if file_rx else None,
    )


def exclusion_mask(
    urls: pd.Series, sizes: np.ndarray, fc: FilterConfig
) -> np.ndarray:
    """Vectorized mask: True = row is EXCLUDED."""
    dir_glob, file_glob, dir_rx, file_rx = _compiled_matchers(fc)
    n = len(urls)
    excl = np.zeros(n, dtype=bool)
    if fc.min_size > 0:
        excl |= sizes < fc.min_size
    if fc.max_size > 0:
        excl |= sizes > fc.max_size
    if fc.min_size > 0 and fc.min_size == fc.max_size:
        excl |= sizes != fc.min_size

    # url decomposition: path part, basename, directory prefixes
    paths = urls.str.replace(r"^[a-z][a-z0-9+.-]*://[^/]*", "", regex=True)
    base = paths.str.rsplit("/", n=1).str[-1]
    full = urls

    if file_glob is not None:
        excl |= base.str.match(file_glob).fillna(False).to_numpy(dtype=bool)
        excl |= full.str.match(file_glob).fillna(False).to_numpy(dtype=bool)
    if file_rx is not None:
        excl |= base.str.contains(file_rx, regex=True).fillna(False).to_numpy(dtype=bool)
        excl |= full.str.contains(file_rx, regex=True).fillna(False).to_numpy(dtype=bool)

    if dir_glob is not None or dir_rx is not None:
        # dir predicates apply to every directory prefix (subtree pruning):
        # match any path segment (basename form) or any prefix (path form).
        # Vectorized: explode segments ONCE to a flat Series whose index is
        # the originating row, run one C-level match over the flat array,
        # and scatter hits back by row position — no per-row Python lambda.
        dirpart = paths.str.rsplit("/", n=1).str[0].reset_index(drop=True)
        flat = dirpart.str.split("/").explode()
        flat = flat[flat.notna() & (flat != "")]
        rows = flat.index.to_numpy(dtype=np.int64)
        if dir_glob is not None:
            hits = flat.str.match(dir_glob).to_numpy(dtype=bool)
            seg_excl = np.zeros(n, dtype=bool)
            seg_excl[rows[hits]] = True
            excl |= seg_excl
        if dir_rx is not None:
            hits = flat.str.contains(dir_rx, regex=True).to_numpy(dtype=bool)
            seg_excl = np.zeros(n, dtype=bool)
            seg_excl[rows[hits]] = True
            excl |= seg_excl
            excl |= (
                dirpart.str.contains(dir_rx, regex=True)
                .fillna(False)
                .to_numpy(dtype=bool)
            )
    return excl


def apply_filters(
    ds: Dataset, fc: FilterConfig, *, url_col: str = "url", text_col: str = "text"
) -> Dataset:
    """Drop excluded rows (one vectorized map_batches; no shuffle)."""

    def fn(batch: pa.Table) -> pa.Table:
        urls = batch[url_col].to_pandas()
        sizes = hashing.byte_lengths(batch[text_col])
        mask = exclusion_mask(urls, sizes, fc)
        return batch.filter(pa.array(~mask))

    return ds.map_batches(fn, batch_format="pyarrow")
