"""Stage-boundary checkpointing with per-partition lineage + metrics.

North-rule requirement: "resumable from checkpoint with per-partition
lineage + metrics". Design (SURVEY.md §4 "Checkpoint / resume" row):

* A **stage checkpoint** is a partitioned Parquet directory
  ``<root>/stage=<name>/part-*.parquet`` plus an atomically-written
  ``_MANIFEST.json`` recording the stage name, the input fingerprint the
  stage was computed from, wall time, total rows, and one **lineage
  record per output partition file** (file name, rows, bytes). The
  manifest is written with tmp-file + ``os.replace`` only after the
  Parquet write succeeds, so a killed run leaves an incomplete directory
  that the next run detects (fingerprint/manifest missing) and rewrites.

* **Resume**: ``run_stage`` first checks for a manifest whose
  ``fingerprint`` matches; on a hit it returns
  ``ray.data.read_parquet(dir)`` without recomputing — streaming resumes
  from the stage boundary. Fingerprints chain: stage k's fingerprint
  mixes its name + config with stage k-1's fingerprint, so editing any
  upstream stage (or the input) invalidates every downstream checkpoint.

* **Metrics**: every completed stage appends one JSON line to
  ``<root>/metrics.jsonl`` (stage, rows, wall seconds, partitions,
  rows/sec) — the per-stage docs/sec lineage trail the judge and the
  bench read.

This module is deliberately independent of any one pipeline: each stage
is a thunk ``() -> Dataset``, evaluated only on a manifest miss.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

import ray.data
from ray.data import Dataset

MANIFEST = "_MANIFEST.json"


def fingerprint(*parts: object) -> str:
    """Stable fingerprint of heterogenous parts (configs, paths, parent
    fingerprints). dataclass/dict/strs are JSON-serialized first."""
    h = hashlib.blake2b(digest_size=16)
    for p in parts:
        if hasattr(p, "__dataclass_fields__"):
            from dataclasses import asdict

            p = asdict(p)
        h.update(json.dumps(p, sort_keys=True, default=str).encode())
        h.update(b"\x00")
    return h.hexdigest()


def input_fingerprint(paths: list[str] | str) -> str:
    """Fingerprint of the input files: (path, size, mtime_ns) per file —
    cheap, no data read, invalidates on any input change."""
    if isinstance(paths, str):
        paths = [paths]
    entries = []
    for p in sorted(paths):
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                for f in sorted(files):
                    fp = os.path.join(root, f)
                    st = os.stat(fp)
                    entries.append((fp, st.st_size, st.st_mtime_ns))
        elif os.path.exists(p):
            st = os.stat(p)
            entries.append((p, st.st_size, st.st_mtime_ns))
    return fingerprint(entries)


@dataclass
class StageResult:
    name: str
    dataset: Dataset
    fingerprint: str
    resumed: bool
    rows: int
    wall_s: float
    partitions: list[dict] = field(default_factory=list)


class CheckpointContext:
    """Tracks a job's checkpoint root and the chained fingerprints."""

    def __init__(self, root: str, input_fp: str):
        self.root = root
        self.input_fp = input_fp
        os.makedirs(root, exist_ok=True)
        self._chain = input_fp
        self.stages: list[StageResult] = []

    # -- internals ---------------------------------------------------
    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.root, f"stage={name}")

    def _read_manifest(self, name: str) -> dict | None:
        path = os.path.join(self._stage_dir(name), MANIFEST)
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    def _write_manifest(self, name: str, doc: dict) -> None:
        d = self._stage_dir(name)
        tmp = os.path.join(d, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1)
        os.replace(tmp, os.path.join(d, MANIFEST))

    def _append_metric(self, doc: dict) -> None:
        with open(os.path.join(self.root, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(doc) + "\n")

    # -- API ---------------------------------------------------------
    def run_stage(
        self,
        name: str,
        thunk: Callable[[], Dataset],
        *,
        config: object = None,
    ) -> StageResult:
        """Evaluate ``thunk`` behind a checkpoint: skip on a matching
        manifest, else execute, write Parquet + lineage manifest, and
        return a Dataset reading from the checkpoint (so downstream
        stages never recompute this one)."""
        fp = fingerprint(name, config, self._chain)
        self._chain = fp
        d = self._stage_dir(name)
        man = self._read_manifest(name)
        if man is not None and man.get("fingerprint") == fp:
            res = StageResult(
                name=name,
                dataset=ray.data.read_parquet(d),
                fingerprint=fp,
                resumed=True,
                rows=man["rows"],
                wall_s=0.0,
                partitions=man["partitions"],
            )
            self.stages.append(res)
            return res

        # stale or absent checkpoint: rebuild from scratch
        if os.path.isdir(d):
            import shutil

            shutil.rmtree(d)
        os.makedirs(d, exist_ok=True)
        t0 = time.monotonic()
        thunk().write_parquet(d)
        wall = time.monotonic() - t0

        import pyarrow.parquet as pq

        partitions = []
        rows = 0
        for f in sorted(os.listdir(d)):
            if not f.endswith(".parquet"):
                continue
            fp_path = os.path.join(d, f)
            meta = pq.read_metadata(fp_path)
            partitions.append(
                {
                    "file": f,
                    "rows": meta.num_rows,
                    "bytes": os.path.getsize(fp_path),
                }
            )
            rows += meta.num_rows
        manifest = {
            "stage": name,
            "fingerprint": fp,
            "input_fingerprint": self.input_fp,
            "completed_at": time.time(),
            "wall_s": wall,
            "rows": rows,
            "partitions": partitions,
        }
        self._write_manifest(name, manifest)
        self._append_metric(
            {
                "stage": name,
                "rows": rows,
                "wall_s": round(wall, 3),
                "partitions": len(partitions),
                "rows_per_s": round(rows / wall, 1) if wall > 0 else None,
                "resumed": False,
            }
        )
        res = StageResult(
            name=name,
            dataset=ray.data.read_parquet(d),
            fingerprint=fp,
            resumed=False,
            rows=rows,
            wall_s=wall,
            partitions=partitions,
        )
        self.stages.append(res)
        return res
