"""Count-Min sketch over the corpus token stream (Cormode &
Muthukrishnan 2005) — a mergeable frequency sketch answering point
queries ``est(token) >= true_count`` with bounded overestimate, without
ever shuffling tokens.

Scale shape:

- **Per-block fold** — one ``map_batches`` tokenizes (shared Arrow
  kernel with stages/decontam.py), counts tokens exactly in-batch via
  ``dictionary_encode`` + ``bincount``, and scatters the counts into the
  sketch's ``depth x width`` grid. Only NONZERO slots leave the task, as
  narrow ``(slot_key, cnt)`` int64 partials.
- **ONE narrow groupby** sums partials; the global sketch relation is at
  most ``depth * width`` rows regardless of corpus size (the whole point
  of a sketch: shuffle volume is structure-bounded, not data-bounded).
- Point queries read the driver-materialized grid (``depth * width * 8``
  bytes, e.g. 128 KiB at 4x4096).

Determinism contract: the row-``j`` hash is ``md5(token + '#' + str(j))``
low-64 (functions.text.md5_token_hash64 == DuckDB ``md5_number_upper``),
and every count is exact int64 arithmetic — so the sketch, and every
estimate, is bit-identical at any block layout AND SQL-recomputable
(the `cms_token_estimates` oracle rebuilds the identical grid).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from doppel_ray.functions.text import md5_token_hash64
from doppel_ray.stages.decontam import _flat_tokens


def _slot_hashes(tokens: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(len(tokens), depth) int64 slot matrix: md5(tok#j) % width."""
    out = np.empty((len(tokens), depth), dtype=np.int64)
    for j in range(depth):
        salted = np.array([f"{t}#{j}" for t in tokens], dtype=object)
        out[:, j] = (md5_token_hash64(salted) % np.uint64(width)).astype(
            np.int64
        )
    return out


def build_cms(
    ds: Dataset,
    *,
    width: int = 4096,
    depth: int = 4,
    text_col: str = "text",
) -> Dataset:
    """Sparse sketch relation ``(slot_key, cnt)`` with
    ``slot_key = j * width + slot`` — nonzero cells only."""
    if width < 1 or depth < 1:
        raise ValueError(f"width/depth must be >= 1, got {width}x{depth}")

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch[text_col])
        if len(flat) == 0:
            return pa.table(
                {
                    "slot_key": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                }
            )
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        counts = np.bincount(codes).astype(np.int64)
        uniq = enc.dictionary.to_numpy(zero_copy_only=False)
        slots = _slot_hashes(uniq, depth, width)  # (V, depth)
        keys = (
            slots + (np.arange(depth, dtype=np.int64) * width)[None, :]
        ).ravel()
        vals = np.repeat(counts, depth).reshape(len(uniq), depth).ravel()
        # several tokens can share a slot within the batch: fold locally
        order = np.argsort(keys, kind="stable")
        keys, vals = keys[order], vals[order]
        edge = np.flatnonzero(np.diff(keys)) + 1
        starts = np.concatenate(([0], edge))
        folded = np.add.reduceat(vals, starts)
        return pa.table(
            {
                "slot_key": pa.array(keys[starts], type=pa.int64()),
                "cnt": pa.array(folded, type=pa.int64()),
            }
        )

    return (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("slot_key")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def cms_point_estimates(
    ds: Dataset,
    probes: list[str],
    *,
    width: int = 4096,
    depth: int = 4,
    text_col: str = "text",
) -> pa.Table:
    """``(token, true_cnt, cms_est)`` for each probe token: the CMS
    estimate (min over rows of the probed cells) next to the exact count
    (one extra probe-filtered narrow pass). ``cms_est >= true_cnt``
    always; equality when no other token collides into all ``depth``
    probed cells."""
    if not probes:
        raise ValueError("probes must be non-empty")
    if len(set(probes)) != len(probes):
        raise ValueError("probes must be distinct")

    from doppel_ray.stages.util import collect_table

    sketch = collect_table(
        build_cms(ds, width=width, depth=depth, text_col=text_col),
        schema=pa.schema([("slot_key", pa.int64()), ("cnt", pa.int64())]),
    )
    grid = np.zeros(depth * width, dtype=np.int64)
    grid[sketch["slot_key"].to_numpy(zero_copy_only=False)] = sketch[
        "cnt"
    ].to_numpy(zero_copy_only=False)

    probe_arr = np.array(probes, dtype=object)
    slots = _slot_hashes(probe_arr, depth, width)
    keys = slots + (np.arange(depth, dtype=np.int64) * width)[None, :]
    est = grid[keys].min(axis=1)

    # exact counts for the probe set: probe-filtered in-batch partials
    # -> ONE groupby bounded by len(probes)
    probe_set = set(probes)

    def true_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat, _ = _flat_tokens(batch[text_col])
        hit = flat.filter(
            pc.is_in(flat, value_set=pa.array(sorted(probe_set)))
        )
        enc = hit.dictionary_encode()
        counts = np.bincount(
            enc.indices.to_numpy(zero_copy_only=False),
            minlength=len(enc.dictionary),
        ).astype(np.int64)
        return pa.table(
            {
                "token": enc.dictionary,
                "c": pa.array(counts, type=pa.int64()),
            }
        )

    truth_ds = (
        ds.select_columns([text_col])
        .map_batches(true_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("c", alias_name="c"))
    )
    truth_tbl = collect_table(
        truth_ds, schema=pa.schema([("token", pa.string()), ("c", pa.int64())])
    )
    truth = dict(
        zip(
            truth_tbl["token"].to_pylist(),
            truth_tbl["c"].to_pylist(),
        )
    )
    return pa.table(
        {
            "token": pa.array(probes, type=pa.string()),
            "true_cnt": pa.array(
                [int(truth.get(t, 0)) for t in probes], type=pa.int64()
            ),
            "cms_est": pa.array(est, type=pa.int64()),
        }
    )
