"""Exact-duplicate detection: the staged size -> quick-hash -> full-hash
cascade with HAVING-count>1 pruning between stages.

Re-expresses the reference's core algorithm (SURVEY.md G1-G4):
  * group by size, keep groups with >=2 members (reference
    internal/scanner/scanner.go:94 + internal/finder/finder.go:47-58)
  * quick-hash survivors, re-prune (finder.go:75-96)
  * full-hash survivors, group into DuplicateGroups (finder.go:106-145)

Ray-Data design — the point of the cascade here is to avoid shuffling
document payloads: pruning is done by aggregating ONLY the key column
(``groupby(key).count()`` over a projected single-column dataset, a tiny
shuffle), broadcasting the set of keys with count>1 via ``ray.put``, and
filtering the main stream inside ``map_batches`` with ``pc.is_in`` — a
broadcast semi-join, no full-row shuffle until the final group-by on
``content_hash`` which carries only (hash, url, size).

Scale note (10^12 docs): the broadcast dup-key set is bounded by the number
of *distinct duplicated keys*, not rows. Past ``BLOOM_KEY_LIMIT`` distinct
dup keys the prune switches to a Bloom filter broadcast (~10 bits/key, an
~6x shrink; implemented, tests pin bloom-pruned groups == exact-pruned
groups) — safe because every downstream consumer re-verifies exactly.
Residual assumption: the Bloom bit array for the dup keys fits one node's
RAM (holds past ~10^10 dup keys at 10 bits each).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from ray.data.aggregate import Count

from doppel_ray.schema import GROUPS_SCHEMA
from doppel_ray.stages import hashes


#: partial-count rows (distinct keys after in-block combining) below
#: which the cross-block merge runs on the driver instead of paying a
#: shuffle. The driver merge is a single-core np.unique sort — measured
#: 1.1 s at 200 k rows but ~10 s at 17.9 M (it was the largest serial
#: fraction of the 800 k-doc near-dedup scaling profile), so the bound
#: sits where the bucketed merge's fixed shuffle-coordination cost
#: (~2-3 s at 32 CPUs) starts winning. Above it, the cross-block merge
#: is a bucketed hash shuffle of the (narrow) partial stream with
#: per-bucket vectorized count-sums — fully distributed, scale-correct.
DRIVER_AGG_LIMIT = 4_000_000


def duplicated_key_values(ds: Dataset, key: str) -> pa.Array:
    """Distinct values of ``key`` appearing on >=2 rows (HAVING count>1).

    Combiner-first (the classic partial-aggregation push-down): each
    block collapses to (key, in-block count) via ``np.unique`` — dups
    concentrated inside blocks never leave them. The cross-block merge
    then auto-selects: below ``DRIVER_AGG_LIMIT`` partial rows the
    driver sums the partials vectorized (one ``np.add.at``); above it a
    groupby-sum shuffle over the (narrow) partial stream does. Either
    way only the projected key column moves, and the result is small
    and collected for broadcast.
    """
    import numpy as np

    from doppel_ray.stages.util import collect_table

    sch = ds.schema()  # ray.data.Schema: parallel .names / .types lists
    int_key = pa.types.is_integer(sch.types[sch.names.index(key)])

    def partial(batch: pa.Table) -> pa.Table:
        if int_key:
            u, c = np.unique(
                batch[key].to_numpy(zero_copy_only=False), return_counts=True
            )
            ukeys = pa.array(u)
        else:
            vc = batch[key].value_counts()
            ukeys, c = vc.field("values"), vc.field("counts")
        return pa.table({key: ukeys, "cnt": pa.array(c)})

    partials = (
        ds.select_columns([key])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    if partials.count() <= DRIVER_AGG_LIMIT:
        t = collect_table(partials)
        if t.num_rows == 0:
            return pa.array([])
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        if int_key:
            u, idx = np.unique(
                t[key].to_numpy(zero_copy_only=False), return_inverse=True
            )
            tot = np.zeros(len(u), dtype=np.int64)
            np.add.at(tot, idx, cnt)
            return pa.array(u[tot > 1])
        keys = t[key].combine_chunks()
        u, idx = np.unique(keys, return_inverse=True)
        tot = np.zeros(len(u), dtype=np.int64)
        np.add.at(tot, idx, cnt)
        return pa.array(u[tot > 1], type=keys.type)
    # distributed cross-block merge: ONE bucketed hash shuffle of the
    # narrow (key, cnt) partials; each bucket sums its counts vectorized
    # and emits only its dup keys — cheaper than Ray's sort-based
    # groupby-Sum (no global sort) and the per-bucket output is bounded
    # by dup keys, so the driver collect below stays small.
    def merge_bucket(g: pa.Table) -> pa.Table:
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        if int_key:
            u, idx = np.unique(
                g[key].to_numpy(zero_copy_only=False), return_inverse=True
            )
            tot = np.zeros(len(u), dtype=np.int64)
            np.add.at(tot, idx, cnt)
            return pa.table({key: pa.array(u[tot > 1])})
        keys_arr = g[key].combine_chunks()
        u, idx = np.unique(keys_arr, return_inverse=True)
        tot = np.zeros(len(u), dtype=np.int64)
        np.add.at(tot, idx, cnt)
        return pa.table({key: pa.array(u[tot > 1], type=keys_arr.type)})

    dup = bucketed_group_apply(partials, key, merge_bucket)
    t = collect_table(dup.select_columns([key]))
    if t.num_rows == 0:
        return pa.array([])
    return t[key].combine_chunks()


#: broadcast value-set size above which integer semi-joins switch from
#: ``pc.is_in`` (which rebuilds its hash table on EVERY batch — O(|set|)
#: per batch) to one driver-side sort + per-batch ``np.searchsorted``
#: (O(batch x log |set|), and the sorted array is a zero-copy plasma
#: read). Measured on the 800k near-dedup profile: the band-key
#: semi-join carried a 2.2M-key set across ~200 blocks.
_SEARCHSORTED_LIMIT = 100_000


def semi_filter(
    ds: Dataset, key: str, values: pa.Array, *, invert: bool = False
) -> Dataset:
    """Keep rows whose ``key`` is in the broadcast value set (broadcast
    semi-join: one ``ray.put``, zero-copy read in every task).
    ``invert=True`` keeps rows NOT in the set (anti-join)."""
    import numpy as np

    if (
        pa.types.is_integer(values.type)
        and len(values) > _SEARCHSORTED_LIMIT
    ):
        sorted_vals = np.sort(values.to_numpy(zero_copy_only=False))
        ref = ray.put(sorted_vals)

        def fn_ss(batch: pa.Table) -> pa.Table:
            from doppel_ray.stages.util import cached_get

            arr: np.ndarray = cached_get(ref)
            v = batch[key].to_numpy(zero_copy_only=False).astype(arr.dtype)
            pos = np.searchsorted(arr, v)
            pos[pos == len(arr)] = 0
            mask = arr[pos] == v
            if invert:
                mask = ~mask
            return batch.filter(pa.array(mask))

        return ds.map_batches(fn_ss, batch_format="pyarrow")

    ref = ray.put(values)

    def fn(batch: pa.Table) -> pa.Table:
        vals = pc.cast(ray.get(ref), batch[key].type)
        mask = pc.is_in(batch[key], value_set=vals)
        if invert:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


#: distinct dup keys above which the broadcast switches from the exact
#: value set (8+ B/key) to a Bloom filter (~10 bits/key, FP ~1%) — the
#: module-docstring scale path, now real. Safe ONLY because every
#: consumer of the pruned stream re-verifies exactly downstream (the
#: full-hash groupby / group emission): a false positive costs one
#: extra row of work, never a wrong answer.
BLOOM_KEY_LIMIT = 50_000_000


def bloom_semi_filter(ds: Dataset, key: str, values: pa.Array) -> Dataset:
    """Broadcast SEMI-join via a Bloom filter of ``values`` (keep rows
    whose key is probably in the set; no false negatives). Never use for
    an anti-join or terminal filter — FP rows must be re-verified by an
    exact downstream stage (see BLOOM_KEY_LIMIT note)."""
    import pandas as pd

    from doppel_ray.functions.sketch import BloomFilter

    bf = BloomFilter(len(values))
    bf.add_values(values.to_pandas())
    ref = ray.put(bf)

    def fn(batch: pa.Table) -> pa.Table:
        from doppel_ray.stages.util import cached_get

        filt: BloomFilter = cached_get(ref)
        mask = filt.contains_values(pd.Series(batch[key].to_pandas()))
        return batch.filter(pa.array(mask))

    return ds.map_batches(fn, batch_format="pyarrow")


def prune_singletons(ds: Dataset, key: str, *, allow_bloom: bool = True) -> Dataset:
    """HAVING-count>1 prune on ``key`` (reference finder.go:47-58, 84-96).

    ``allow_bloom=False`` forces the exact broadcast semi-join past
    ``BLOOM_KEY_LIMIT`` — REQUIRED when the pruned stream is a TERMINAL
    result with no exact downstream re-verify (Bloom FPs would emit
    unique rows as 'duplicates'). The dedup cascade keeps the default:
    its full-hash groupby re-verifies every survivor exactly.
    """
    dup_vals = duplicated_key_values(ds, key)
    if len(dup_vals) == 0:
        # no duplicated keys at all -> empty survivor stream
        return ds.limit(0)
    if allow_bloom and len(dup_vals) > BLOOM_KEY_LIMIT:
        return bloom_semi_filter(ds, key, dup_vals)
    return semi_filter(ds, key, dup_vals)


def bucketed_group_apply(
    ds: Dataset,
    key: str,
    per_bucket_fn,
    *,
    num_buckets: int = 64,
    materialize_input: bool = False,
) -> Dataset:
    """Group-by ``key`` with per-BUCKET (not per-group) Python dispatch.

    ``groupby(key).map_groups(fn)`` invokes Python once per distinct key —
    catastrophic for millions of tiny groups. This helper shuffles on
    ``bucket = hash(key) % num_buckets`` instead (exact co-location of
    equal keys) and hands each bucket's rows to ``per_bucket_fn`` as one
    Arrow table, where a pandas groupby resolves the fine-grained groups
    at C speed. ``num_buckets`` bounds shuffle fan-in; size it ~2-4x the
    cluster's total CPUs.

    ``materialize_input=True`` cuts the lazy upstream chain before the
    sort: a compute-heavy map fused into Ray's sort operator runs at the
    shuffle's task granularity (measured 3-6x slower than the same map
    as a free map stage). Use it when the upstream map is expensive AND
    its output is narrow relative to the corpus.
    """
    if materialize_input:
        ds = ds.materialize()

    def add_bucket(batch: pa.Table) -> pa.Table:
        import numpy as np

        from doppel_ray.functions.hashing import sip64

        col = batch[key]
        if pa.types.is_integer(col.type):
            vals = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                mixed = vals * np.uint64(0x9E3779B97F4A7C15)
            b = (mixed % np.uint64(num_buckets)).astype(np.int64)
        else:
            b = (sip64(col.to_pandas()) % np.uint64(num_buckets)).astype(
                np.int64
            )
        if "bucket" in batch.column_names:
            batch = batch.drop_columns(["bucket"])
        return batch.append_column("bucket", pa.array(b))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")

    def apply(g: pa.Table) -> pa.Table:
        return per_bucket_fn(g.drop_columns(["bucket"]))

    return bucketed.groupby("bucket").map_groups(apply, batch_format="pyarrow")


def _emit_groups_bucket(g: pa.Table) -> pa.Table:
    """Per-bucket DuplicateGroup emission (finder.go:114-145 semantics):
    pandas resolves the per-hash groups at C speed; the Python loop runs
    only over hashes that actually have >=2 members."""
    id_type = g.schema.field("url").type
    schema = pa.schema(
        [
            ("group_id", id_type),
            ("count", pa.int64()),
            ("size", pa.int64()),
            ("wasted_space", pa.int64()),
            ("files", pa.list_(id_type)),
        ]
    )
    if g.num_rows < 2:
        return schema.empty_table()
    df = g.to_pandas()
    dup = df[df.duplicated("content_hash", keep=False)]
    if dup.empty:
        return schema.empty_table()
    gids, counts, sizes, wasted, files = [], [], [], [], []
    for _, grp in dup.groupby("content_hash", sort=False):
        urls = sorted(grp["url"].tolist())
        size = int(grp["size"].iloc[0])
        n = len(urls)
        gids.append(urls[0])
        counts.append(n)
        sizes.append(size)
        wasted.append(size * (n - 1))
        files.append(urls)
    return pa.table(
        {
            "group_id": pa.array(gids, type=id_type),
            "count": pa.array(counts, type=pa.int64()),
            "size": pa.array(sizes, type=pa.int64()),
            "wasted_space": pa.array(wasted, type=pa.int64()),
            "files": pa.array(files, type=pa.list_(id_type)),
        },
        schema=schema,
    )


def exact_duplicate_groups(
    ds: Dataset,
    *,
    id_col: str = "url",
    text_col: str = "text",
    cascade: bool = True,
    num_buckets: int = 64,
) -> Dataset:
    """Full exact-dup pipeline: pages -> DuplicateGroup rows.

    ``cascade=True`` prunes by quick hash (HAVING count>1) before paying
    full-hash + shuffle cost — the Ray-Data reading of the reference's
    staged cascade (finder.go:44-146). Deviation, deliberate: the
    reference prunes by *size* first because size is free while any hash
    requires reading the file; here ``text`` is already resident in the
    Arrow batch, so a separate size-prune pass costs an extra pipeline
    execution + count shuffle and saves only the (cheap, 8 KiB-windowed,
    memory-bandwidth-bound) quick hash. Size+quick-hash are computed in
    ONE map_batches pass and pruning happens once, on the stronger key —
    identical results, one fewer all-to-all round. ``cascade=False``
    full-hashes everything (cross-checks that the cascade changes cost,
    not results).
    """
    ds = ds.select_columns([id_col, text_col])
    if id_col != "url":
        ds = ds.rename_columns({id_col: "url"})

    def add_size_quick(batch: pa.Table) -> pa.Table:
        import numpy as np

        from doppel_ray.functions import hashing as H

        batch = batch.append_column(
            "size", pa.array(H.byte_lengths(batch[text_col]))
        )
        if cascade:
            qh = H.quick_hash(batch[text_col]).view(np.int64)
            batch = batch.append_column("quick_hash", pa.array(qh))
        return batch

    ds = ds.map_batches(add_size_quick, batch_format="pyarrow")
    if cascade:
        ds = prune_singletons(ds, "quick_hash")
    ds = hashes.add_content_hash(ds, text_col=text_col)
    # drop the payload BEFORE the all-to-all shuffle: only (hash, url, size)
    # moves through the object store.
    ds = ds.select_columns(["content_hash", "url", "size"])
    return bucketed_group_apply(
        ds, "content_hash", _emit_groups_bucket, num_buckets=num_buckets
    )


def dedup_keep_first(
    ds: Dataset,
    *,
    id_col: str = "url",
    text_col: str = "text",
) -> Dataset:
    """Exact dedup for training-data pipelines: keep one representative row
    (min id) per distinct text. Returns (url) of survivors.

    Equivalent SQL: SELECT min(id) FROM t GROUP BY text.
    """
    ds = ds.select_columns([id_col, text_col])
    ds = hashes.add_content_hash(ds, text_col=text_col)
    ds = ds.select_columns(["content_hash", id_col])
    from ray.data.aggregate import Min

    return (
        ds.groupby("content_hash")
        .aggregate(Min(id_col, alias_name=id_col))
        .select_columns([id_col])
    )
