"""Parquet corpus sources + input-manifest normalization.

The reference's record source is a recursive directory walk emitting
``FileInfo`` rows (reference internal/scanner/scanner.go:32-107); ours is
``ray.data.read_parquet`` over a corpus of part files, with the walk-side
filters re-expressed as Parquet **projection + predicate pushdown** so only
needed columns/row-groups leave storage (SURVEY.md S1).

Input normalization mirrors ``processDirectories`` (reference
internal/scanner/scanner.go:147-237): absolutize, dedupe, validate, drop
roots nested under other roots (prevents double-scan), sort for determinism.
"""

from __future__ import annotations

import os

import ray.data as rd
from ray.data import Dataset


class InputPathError(ValueError):
    pass


def normalize_inputs(paths: list[str], *, must_exist: bool = True) -> list[str]:
    """Absolutize + dedupe + drop nested roots + sort (scanner.go:147-237).

    A root that is a subdirectory of another root is removed so no file is
    scanned twice (``removeSubdirectories``, scanner.go:192-209).
    """
    if not paths:
        raise InputPathError("no input paths")
    absed: list[str] = []
    seen = set()
    for p in paths:
        a = os.path.abspath(p)
        if must_exist and not os.path.exists(a):
            raise InputPathError(f"input does not exist: {p}")
        if a not in seen:
            seen.add(a)
            absed.append(a)
    absed.sort()  # scanner.go:198 sorts for determinism
    out: list[str] = []
    for p in absed:
        # parents sort before children, so checking against the last kept
        # root detects containment (scanner.go:213-237 isSubdirectory)
        if out and os.path.isdir(out[-1]) and _is_subpath(p, out[-1]):
            continue
        out.append(p)
    return out


def _is_subpath(child: str, parent: str) -> bool:
    rel = os.path.relpath(child, parent)
    return rel != "." and not rel.startswith(os.pardir)


def read_pages(
    paths: str | list[str],
    *,
    columns: list[str] | None = None,
    predicate=None,
    drop_html: bool = True,
    override_num_blocks: int | None = None,
) -> Dataset:
    """Read a pages corpus with column pruning at the source.

    ``html`` (the wide binary column) is excluded by default — the dedup
    pipelines operate on ``text`` and a read that loads all columns for a
    text transform is wrong at 100 TB (SURVEY.md §7.1).
    """
    if isinstance(paths, str):
        paths = [paths]
    paths = normalize_inputs(paths)
    if columns is None:
        columns = ["url", "warc_ts", "text", "lang"]
        if not drop_html:
            columns.append("html")
    kwargs = {}
    if predicate is not None:
        kwargs["filter"] = predicate  # pyarrow dataset expression pushdown
    if override_num_blocks is not None:
        # sort-based shuffles pay O(blocks^2) coordination; sizing blocks
        # to ~2x total CPUs instead of Ray's read_op_min_num_blocks=200
        # default measured 3x faster groupby stages on this workload
        kwargs["override_num_blocks"] = override_num_blocks
    return rd.read_parquet(paths, columns=columns, **kwargs)


def read_documents(sf_dir: str, *, columns: list[str] | None = None) -> Dataset:
    """Driver-provided secondary dedup input (TESTDATA.md ``documents``)."""
    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns
    )


def read_embeddings(sf_dir: str, *, columns: list[str] | None = None) -> Dataset:
    return rd.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=columns
    )


def read_events(sf_dir: str, *, columns: list[str] | None = None) -> Dataset:
    return rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=columns
    )


def read_table(
    sf_dir: str, table: str, *, columns: list[str] | None = None
) -> Dataset:
    """Any driver-provided TESTDATA.md table by name (column-pruned)."""
    return rd.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )
