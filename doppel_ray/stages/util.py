"""Shared Ray-Data stage utilities (no heavy deps, import-safe from any
stage module — keeps ``exact``/``minhash``/``cluster`` import-acyclic)."""

from __future__ import annotations

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
