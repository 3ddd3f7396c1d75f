"""Corpus snapshot diff: compare two corpus versions by key and content
hash, classifying every key as added / removed / changed / unchanged —
the CDC-style curation regression check run between two corpus drops
(did the recrawl replace pages? did a filter change silently drop a
language?).

Not in the reference (doppel compares files within ONE tree); included
as a first-class training-data op: every periodic-recrawl pipeline
diffs snapshots before retraining.

Ray-Data design
---------------
Payloads never move. Each side reduces to narrow ``(key, content_hash,
side)`` partials in one ``map_batches`` pass (blake2b-128 of the
payload — equal hash == equal bytes at any realistic corpus size, the
same identity the exact-dedup cascade rests on, hashing.py:85); the
tagged union makes ONE bucketed shuffle on the key, and each bucket
resolves statuses vectorized (pandas pivot on side). Shuffle bytes =
corpus keys x ~40 B, independent of document size.

Partitioning assumption: keys are unique WITHIN each side (a corpus
snapshot has one row per url/doc_id); duplicate keys within a side
raise per bucket rather than silently mis-classifying.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from doppel_ray.functions.hashing import content_hash
from doppel_ray.stages.exact import bucketed_group_apply

DIFF_SCHEMA = pa.schema([("key", pa.int64()), ("status", pa.string())])


def _narrow(ds: Dataset, key_col: str, payload_col: str, side: int) -> Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch[key_col].cast(pa.int64()),
                "h": pa.array(content_hash(batch[payload_col]), type=pa.string()),
                "side": pa.array(
                    np.full(batch.num_rows, side, dtype=np.int8), type=pa.int8()
                ),
            }
        )

    return ds.select_columns([key_col, payload_col]).map_batches(
        fn, batch_format="pyarrow"
    )


def snapshot_diff(
    old: Dataset,
    new: Dataset,
    *,
    key_col: str = "doc_id",
    payload_col: str = "text",
    include_unchanged: bool = False,
    num_buckets: int = 64,
) -> Dataset:
    """Relation ``(key, status)`` with status in {added, removed,
    changed[, unchanged]} — ``added`` = key only in ``new``. Output is
    bounded by churn when ``include_unchanged=False`` (the default: at
    recrawl scale the unchanged set IS the corpus)."""
    union = _narrow(old, key_col, payload_col, 0).union(
        _narrow(new, key_col, payload_col, 1)
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return DIFF_SCHEMA.empty_table()
        df = g.to_pandas()
        piv = df.pivot(index="key", columns="side", values="h")
        # pivot raises ValueError on duplicate (key, side) — the
        # within-side uniqueness contract, surfaced not swallowed
        o = piv.get(0)
        n = piv.get(1)
        if o is None:
            status = np.full(len(piv), "added", dtype=object)
        elif n is None:
            status = np.full(len(piv), "removed", dtype=object)
        else:
            status = np.where(
                o.isna(),
                "added",
                np.where(
                    n.isna(), "removed", np.where(o != n, "changed", "unchanged")
                ),
            )
        out = pa.table(
            {
                "key": pa.array(piv.index.to_numpy(), type=pa.int64()),
                "status": pa.array(status, type=pa.string()),
            }
        )
        if include_unchanged:
            return out
        import pyarrow.compute as pc

        return out.filter(pc.not_equal(out["status"], "unchanged"))

    return bucketed_group_apply(union, "key", per_bucket, num_buckets=num_buckets)


def keep_latest(
    ds: Dataset,
    *,
    key_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> Dataset:
    """Recrawl capture versioning: keep, per key, the row with the
    greatest ``(ts_col, id_col)`` — the newest capture of each url,
    with the id as a deterministic tie-break so results are
    layout-invariant even when two captures share a timestamp.

    Scale shape: a per-batch combiner first argmax-reduces each batch
    to one candidate row per key it contains, so the ONE bucketed key
    shuffle carries at most (distinct keys x blocks-touching-them)
    candidate rows — bounded below by the output size and far below
    the capture firehose when recrawls cluster in time (the common
    layout). Per bucket, the same vectorized argmax resolves the
    global winner. Equivalent SQL: ``QUALIFY row_number() OVER
    (PARTITION BY key ORDER BY ts DESC, id DESC) = 1``.
    """

    def argmax_per_key(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values([ts_col, id_col], kind="stable")
        return pa.Table.from_pandas(
            df.groupby(key_col, sort=False, as_index=False).tail(1),
            schema=batch.schema,
            preserve_index=False,
        )

    cand = ds.map_batches(argmax_per_key, batch_format="pyarrow")
    return bucketed_group_apply(cand, key_col, argmax_per_key)
