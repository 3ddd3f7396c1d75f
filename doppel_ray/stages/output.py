"""Resumable sharded training-data output.

Writes a Dataset as ``out_dir/shard=K/*.parquet`` with a DETERMINISTIC
shard assignment — ``hash64(str(key) + salt) % num_shards`` via the same
key-hash kernel as the samplers (stages/sample.py ``_key_hashes``), so a
row lands in the same shard regardless of cluster size, block layout or
retry. This is the output contract a 100 TB run needs:

* **Partitioned, never one giant file** — each shard is a hive-style
  directory Ray's ``write_parquet(partition_cols=...)`` fans out to in
  one streaming pass.
* **Resumable at shard-group granularity** — shards are split into
  ``num_groups`` contiguous ranges; each range is one filtered write
  pass that ends by stamping a ``_COMPLETE_<lo>_<hi>`` marker. A re-run
  skips stamped ranges entirely (their input rows are filtered out
  before any bytes move), so a job that died 70% through redoes only
  the unfinished ranges. ``num_groups=1`` is the single-pass fast path
  (resume redoes everything); more groups buy finer resume at the cost
  of re-streaming the input once per group — the right trade when the
  input read is cheap relative to losing the output (the same
  recompute-over-materialize stance as pipelines/job.py checkpoints).
* **Manifest** — ``manifest.json`` records the config and per-shard row
  counts (a narrow shard-key groupby, no payload) once all ranges are
  complete, making the output self-describing for downstream loaders.

A partially-written range is OVERWRITTEN on resume (its marker is
absent), so the invariant is: marker present <=> every row of that
range's shards is on disk exactly once.

Reference framing: the reference routes one report to one path/stream
(cmd/find.go:234-266 default-filename handling); corpus-scale output
instead shards by key with per-partition completion state.
"""

from __future__ import annotations

import json
import os
from typing import Any

import pyarrow as pa

from ray.data import Dataset

from doppel_ray.stages.sample import _key_hashes

MANIFEST_NAME = "manifest.json"


def _marker(out_dir: str, lo: int, hi: int) -> str:
    return os.path.join(out_dir, f"_COMPLETE_{lo}_{hi}")


def _add_shard(
    ds: Dataset, key_col: str, num_shards: int, salt: str, method: str
) -> Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        h = _key_hashes(
            batch[key_col].combine_chunks(), salt, method, num_shards
        )
        t = batch
        if "shard" in t.column_names:
            t = t.drop_columns(["shard"])
        return t.append_column("shard", pa.array(h.astype("int64")))

    return ds.map_batches(fn, batch_format="pyarrow")


def write_training_shards(
    ds: Dataset,
    out_dir: str,
    *,
    num_shards: int = 64,
    num_groups: int = 1,
    key_col: str = "doc_id",
    salt: str = "",
    method: str = "sip64",
) -> dict[str, Any]:
    """Write ``ds`` to ``out_dir`` as hash-sharded partitioned Parquet
    (see module docstring). Returns the manifest dict. Re-invoking after
    a partial failure skips ranges whose completion marker exists."""
    if num_shards < 1 or not 1 <= num_groups <= num_shards:
        raise ValueError(
            f"need num_shards >= 1 and 1 <= num_groups <= num_shards, "
            f"got {num_shards}/{num_groups}"
        )
    os.makedirs(out_dir, exist_ok=True)
    sharded = _add_shard(ds, key_col, num_shards, salt, method)

    # contiguous shard ranges: [bounds[g], bounds[g+1])
    bounds = [round(g * num_shards / num_groups) for g in range(num_groups + 1)]
    skipped = []
    for g in range(num_groups):
        lo, hi = bounds[g], bounds[g + 1]
        if os.path.exists(_marker(out_dir, lo, hi)):
            skipped.append((lo, hi))
            continue
        # a range without a marker may hold files from a failed attempt;
        # write_parquet APPENDS uniquely-named files, so clear the
        # range's shard dirs first to keep "marker <=> exactly once"
        import shutil

        for k in range(lo, hi):
            d = os.path.join(out_dir, f"shard={k}")
            if os.path.isdir(d):
                shutil.rmtree(d)
        part = sharded
        if num_groups > 1:
            part = part.filter(expr=f"shard >= {lo} and shard < {hi}")
        part.write_parquet(out_dir, partition_cols=["shard"])
        with open(_marker(out_dir, lo, hi), "w") as f:
            f.write("")

    # per-shard row counts: narrow key-only pass, no payload columns
    from ray.data.aggregate import Count

    counts = {
        int(r["shard"]): int(r["n"])
        for r in (
            _add_shard(
                ds.select_columns([key_col]), key_col, num_shards, salt, method
            )
            .groupby("shard")
            .aggregate(Count(alias_name="n"))
            .take_all()
        )
    }
    manifest = {
        "num_shards": num_shards,
        "num_groups": num_groups,
        "key_col": key_col,
        "salt": salt,
        "method": method,
        "rows_per_shard": {str(k): counts.get(k, 0) for k in range(num_shards)},
        "total_rows": sum(counts.values()),
        "resumed_skipping": [list(r) for r in skipped],
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_manifest(out_dir: str) -> dict[str, Any]:
    with open(os.path.join(out_dir, MANIFEST_NAME)) as f:
        return json.load(f)
