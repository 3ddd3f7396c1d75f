"""Query registry: every implemented operator/pipeline from SURVEY.md §2
exposed as a named callable ``(sf_dir) -> Dataset | DataFrame | Table``,
with a matching DuckDB oracle SQL where the semantics are SQL-expressible.

Column names in each Ray result match the oracle SQL aliases exactly
(the driver's compare hashes values under sorted column names).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_REGISTRY: dict[str, Callable[[str], Any]] = {}
_ORACLES: dict[str, str] = {}


def finalize(ds, schema) -> Any:
    """Materialize a small query result into a typed pyarrow Table.

    Oracle-paired query results are aggregates (small by construction);
    materializing guarantees the declared schema survives even when the
    result is empty (an empty Dataset otherwise loses its columns)."""
    import pyarrow as pa
    import ray.data

    if isinstance(ds, ray.data.Dataset):
        return pa.Table.from_pylist(ds.take_all(), schema=schema)
    return ds


def query(name: str, sql: str | None = None):
    """Decorator registering a query callable and its optional oracle."""

    def deco(fn):
        _REGISTRY[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


def registry() -> dict[str, Callable[[str], Any]]:
    _load()
    return dict(_REGISTRY)


def oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)


def _load() -> None:
    # importing the modules populates the registry via decorators
    from doppel_ray.pipelines import dedup_queries  # noqa: F401

    try:
        from doppel_ray.pipelines import analysis_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from doppel_ray.pipelines import events_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from doppel_ray.pipelines import similarity_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from doppel_ray.pipelines import relational_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from doppel_ray.pipelines import link_queries  # noqa: F401
    except ImportError:
        pass
    try:
        from doppel_ray.pipelines import curation_queries  # noqa: F401
    except ImportError:
        pass
