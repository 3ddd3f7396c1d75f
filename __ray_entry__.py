"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

No ``ray.init`` / ``ray.shutdown`` here or in the library code — the
driver owns the Ray session.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: the namesake TIERED dedup ledger (exact ->
    normalized -> near -> kept, stages/tiered.py) over the sf0.001
    ``documents`` table — one row per document with its tier."""
    from doppel_ray.pipelines import registry

    return registry()["tiered_dedup"]("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from doppel_ray import pipelines

    return pipelines.registry()


def oracle_sql() -> dict[str, str]:
    from doppel_ray import pipelines

    return pipelines.oracles()
