"""JSONL / CSV corpus ingestion + JSONL export.

Web-text pipelines rarely start from Parquet: crawl extractors emit
JSON-lines (one document object per line) and tabular side data arrives
as CSV. These sources land either format in the SAME Arrow schema the
Parquet sources produce, so every downstream stage (dedup cascade,
MinHash, quality scores) is format-agnostic — a user switching their
ingest from Parquet to JSONL changes one call.

Scale notes:
* ``ray.data.read_json`` / ``read_csv`` stream file-parallel exactly like
  ``read_parquet``; there is no row-group pruning in text formats, so the
  projection happens in the first ``map_batches`` (we still never carry
  unrequested columns past the read boundary).
* ``write_jsonl`` is the interchange sink (one part file per block,
  resumable at the directory level like write_training_shards).

Reference framing: the Go tool's record source is a filesystem walk
(internal/scanner/scanner.go:32-107) and its sinks are report formatters
(internal/output/json_formatter.go) — corpus-format ingestion/export is
engine surface the reference doesn't need but a corpus engine does.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from doppel_ray.sources.parquet import normalize_inputs

#: canonical documents schema (TESTDATA.md) — ingestion conforms to this
DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)


def _conform(columns: list[str] | None, schema: pa.Schema):
    """Batch fn casting/projecting parsed rows onto the target schema.

    Text formats carry no types: JSON numbers parse as int64/double and
    CSV may infer anything, so every kept column is cast explicitly; a
    missing column raises (a silently-null corpus column hides ingest
    bugs); extra columns are dropped here, at the read boundary.
    """
    names = columns if columns is not None else schema.names

    def fn(batch: pa.Table) -> pa.Table:
        arrays = []
        for name in names:
            f = schema.field(name)
            if name not in batch.column_names:
                raise ValueError(
                    f"ingest: required column {name!r} missing from input"
                )
            arrays.append(batch[name].cast(f.type))
        return pa.table(dict(zip(names, arrays)))

    return fn


def read_documents_jsonl(
    paths: str | list[str],
    *,
    columns: list[str] | None = None,
    schema: pa.Schema = DOCUMENTS_SCHEMA,
) -> Dataset:
    """JSON-lines documents -> Dataset with the Parquet-identical schema."""
    if isinstance(paths, str):
        paths = [paths]
    ds = rd.read_json(normalize_inputs(paths))
    return ds.map_batches(_conform(columns, schema), batch_format="pyarrow")


def read_documents_csv(
    paths: str | list[str],
    *,
    columns: list[str] | None = None,
    schema: pa.Schema = DOCUMENTS_SCHEMA,
) -> Dataset:
    """CSV documents -> Dataset with the Parquet-identical schema."""
    if isinstance(paths, str):
        paths = [paths]
    ds = rd.read_csv(normalize_inputs(paths))
    return ds.map_batches(_conform(columns, schema), batch_format="pyarrow")


def write_jsonl(ds: Dataset, out_dir: str) -> str:
    """Export a Dataset as JSON-lines part files (one per block)."""
    os.makedirs(out_dir, exist_ok=True)
    ds.write_json(out_dir)
    return out_dir
