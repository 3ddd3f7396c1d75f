"""Hash-column stages: Dataset -> Dataset transforms adding size / quick /
full content hash columns.

These are the Ray-Data re-expressions of the reference's worker pools
(reference internal/finder/finder.go:149-269 ``quickHash`` / ``fullHash``):
instead of hand-rolled goroutine pools with buffered channels, each stage is
a vectorized ``map_batches`` over zero-copy Arrow batches and the streaming
executor provides the parallelism, pipelining and backpressure. Hashers
here are cheap to construct (no model/regex state), so stateless task pools
are used; stages with real per-actor state (MinHash permutation matrices,
suffix-array builders) live in their own modules as callable classes.

Per-row error policy mirrors the reference (finder.go:168-172): a row that
fails to hash is tagged, counted, and dropped — here a null/empty hash is
filtered downstream rather than aborting the job.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from doppel_ray.functions import hashing


def _append(batch: pa.Table, name: str, arr) -> pa.Table:
    if name in batch.column_names:
        batch = batch.drop_columns([name])
    return batch.append_column(name, arr)


def add_size(ds: Dataset, text_col: str = "text", out_col: str = "size") -> Dataset:
    """Append ``size`` = UTF-8 byte length of ``text_col`` (int64).

    The corpus analog of the reference's file-size grouping key
    (reference internal/scanner/scanner.go:94).
    """

    def fn(batch: pa.Table) -> pa.Table:
        return _append(batch, out_col, pa.array(hashing.byte_lengths(batch[text_col])))

    return ds.map_batches(fn, batch_format="pyarrow")


def add_quick_hash(ds: Dataset, text_col: str = "text", out_col: str = "quick_hash") -> Dataset:
    """Append 64-bit sampled quick hash (first/last 8 KiB windows;
    reference internal/scanner/hasher.go:46-92)."""

    def fn(batch: pa.Table) -> pa.Table:
        h = hashing.quick_hash(batch[text_col])
        # carry as int64 (bit-reinterpreted): uint64 values above 2^63 turn
        # into Python ints outside int64 range in groupby/aggregate paths and
        # get pickled into extension arrays — int64 keeps the fast path.
        return _append(batch, out_col, pa.array(h.view(np.int64), type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


def add_content_hash(ds: Dataset, text_col: str = "text", out_col: str = "content_hash") -> Dataset:
    """Append full-content 128-bit hash hex string (reference
    internal/scanner/hasher.go:22-42, BLAKE3 there / BLAKE2b here)."""

    def fn(batch: pa.Table) -> pa.Table:
        h = hashing.content_hash(batch[text_col])
        return _append(batch, out_col, pa.array(h, type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def approx_distinct(ds, col: str, *, p: int = 14) -> float:
    """Approximate COUNT(DISTINCT col) via a distributed HyperLogLog:
    each block folds its rows into a 2^p-byte register array inside
    ``map_batches`` (one partial row per block), the driver max-merges
    the partials — no all-to-all shuffle, ~0.8% relative error at p=14
    (functions/sketch.py; accuracy pinned in tests/test_sketch.py)."""
    import numpy as np
    import pyarrow as pa

    from doppel_ray.functions import sketch as SK

    def partial(batch: pa.Table) -> pa.Table:
        reg = SK.empty_registers(p)
        SK.add_values(reg, batch[col].to_pandas(), p=p)
        return pa.table({"reg": pa.array([reg.tobytes()], type=pa.large_binary())})

    merged = SK.empty_registers(p)
    for b in (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ):
        for buf in b["reg"].to_pylist():
            merged = SK.merge(merged, np.frombuffer(buf, dtype=np.uint8))
    return SK.estimate(merged)


def approx_quantiles(
    ds, value_col: str, id_col: str, ps: list[float], *, k: int = 4096
) -> list[tuple[float, float]]:
    """Approximate quantiles via the distributed bottom-k row sample
    (functions/sketch.BottomKSample): each block folds its rows into a
    <= k-row partial inside ``map_batches``, the driver merges partials
    by concat + re-prune — no shuffle, rank error ~ sqrt(p(1-p)/k).
    ``id_col`` must uniquely key rows (the sample hashes IDs, not
    values, so duplicated values keep their true multiplicity)."""
    import pandas as pd

    from doppel_ray.functions import sketch as SK
    from doppel_ray.functions.hashing import sip64

    def partial(batch: pa.Table) -> pa.Table:
        s = SK.BottomKSample(k)
        h = sip64(batch[id_col].to_pandas().astype(str))
        v = batch[value_col].to_numpy(zero_copy_only=False)
        s.add(h, v)
        return pa.table(
            {"s": pa.array([s.to_bytes()], type=pa.large_binary())}
        )

    merged = SK.BottomKSample(k)
    for b in (
        ds.select_columns([value_col, id_col])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ):
        for buf in b["s"].to_pylist():
            merged = merged.merge(SK.BottomKSample.from_bytes(buf, k))
    return [(p, merged.quantile(p)) for p in ps]


def grouped_approx_distinct(
    ds,
    group_col: str,
    value_col: str,
    *,
    p: int = 12,
    num_buckets: int = 64,
):
    """Approximate ``COUNT(DISTINCT value) GROUP BY group`` via per-group
    HyperLogLog registers — the scale path when groups x values is too
    large for the exact distinct-pair shuffle (`sources_per_lang`'s
    shape): per batch, each group folds its values into a 2^p register
    array and ships ONE ``(group, registers)`` row; a bucketed group
    shuffle max-merges the register arrays at C speed. Shuffle volume is
    ``groups x blocks x 2^p`` bytes — structure-bounded, independent of
    value cardinality.

    Returns a Dataset of ``(group_col, approx_distinct)`` with int64
    estimates (~1.6% relative error at p=12, the same HLL kernel whose
    accuracy is pinned in tests/test_sketch.py).
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from doppel_ray.functions import sketch as SK
    from doppel_ray.stages.exact import bucketed_group_apply

    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": batch[group_col].to_pandas(),
                "v": batch[value_col].to_pandas(),
            }
        )
        groups, regs = [], []
        for g, sub in df.groupby("g", sort=False):
            reg = SK.empty_registers(p)
            SK.add_values(reg, sub["v"], p=p)
            groups.append(g)
            regs.append(reg.tobytes())
        return pa.table(
            {
                group_col: pa.array(groups, type=batch[group_col].type),
                "reg": pa.array(regs, type=pa.large_binary()),
            }
        )

    def per_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out_g, out_n = [], []
        for g, sub in df.groupby(group_col, sort=False):
            stacked = np.stack(
                [np.frombuffer(b, dtype=np.uint8) for b in sub["reg"]]
            )
            merged = stacked.max(axis=0)
            out_g.append(g)
            out_n.append(int(round(SK.estimate(merged))))
        return pa.table(
            {
                group_col: pa.array(out_g, type=t.schema.field(group_col).type),
                "approx_distinct": pa.array(out_n, type=pa.int64()),
            }
        )

    partials = ds.select_columns([group_col, value_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    return bucketed_group_apply(
        partials, group_col, per_bucket, num_buckets=num_buckets,
        materialize_input=True,
    )
