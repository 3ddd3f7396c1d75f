"""Shared Ray-Data stage utilities (no heavy deps, import-safe from any
stage module — keeps ``exact``/``minhash``/``cluster`` import-acyclic)."""

from __future__ import annotations

import functools

import pyarrow as pa
from ray.data import Dataset


def collect_table(ds: Dataset, schema: pa.Schema | None = None) -> pa.Table:
    """Materialize a Dataset to one Arrow table WITHOUT the per-row dict
    conversion of ``take_all`` (vectorized batch concat). Only for
    results known to be driver-bounded (key sets, verified edges)."""
    # batch_size=None yields whole blocks zero-copy; the default
    # (256-row) batching re-slices every block into thousands of tiny
    # tables (measured: multi-second overhead on multi-million-row
    # collects)
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    batches = [b for b in batches if b.num_rows]
    if not batches:
        return schema.empty_table() if schema is not None else pa.table({})
    if schema is not None:
        batches = [b.select(schema.names).cast(schema) for b in batches]
    return pa.concat_tables(batches)


def from_arrow_blocks(table: pa.Table, n_blocks: int) -> Dataset:
    """Driver table -> Dataset with ~n_blocks blocks (one slice each).

    ``ray.data.from_arrow(table)`` creates ONE block, so a downstream
    ``map_batches`` runs as ONE task — single-threaded no matter how many
    CPUs the cluster has (measured: the minhash driver-regime verify of
    ~190k pairs spent 3.6 s in one task; sliced, it fans across the
    pool). Use for any driver-built table whose downstream map is the
    point of the dataset."""
    import ray.data

    n = table.num_rows
    if n == 0 or n_blocks <= 1:
        return ray.data.from_arrow(table)
    # at least ~1k rows per block: a tiny table sliced 256 ways pays 256
    # task launches for microseconds of work each
    step = max(1024, (n + n_blocks - 1) // n_blocks)
    if step >= n:
        return ray.data.from_arrow(table)
    slices = [table.slice(i, step) for i in range(0, n, step)]
    return ray.data.from_arrow(slices)


def cached_get(ref):
    """Per-worker-process cached ``ray.get`` for broadcast Python objects
    (dicts/sets/lists): plasma re-DESERIALIZES pickled objects on every
    get — only raw numpy/Arrow buffers are zero-copy — so a per-batch
    ``ray.get`` of a large lookup dict pays the unpickle each batch.
    One fetch per worker process instead (the ann.py ``_planes`` idiom).

    maxsize=4: each cache entry pins BOTH the deserialized object and
    its ObjectRef (blocking plasma eviction) for the worker-process
    lifetime, so the bound stays tight — but a streaming pipeline can
    interleave batches from several stages holding DIFFERENT refs in
    one worker (e.g. substring probes + verify texts + a bloom filter),
    and an LRU smaller than the live-ref count thrashes into per-batch
    re-unpickling. Four covers the most refs any current pipeline holds
    live at once.
    """
    return _cached_get(ref)


@functools.lru_cache(maxsize=4)
def _cached_get(ref):
    import ray

    return ray.get(ref)
