"""Curation intake funnel: label every document blocked ->
low_quality -> duplicate -> kept, in that gate order (the ledger a
corpus release publishes next to tiered_dedup's duplicate
attribution). Gate order is load-bearing: blocked docs are never
scored, filtered docs never hash, and the dedup gate runs only among
survivors — matching how a real funnel spends compute.

Scale shape: two streaming filters + the hashed-linear classifier
actor pool (weights ray.put once, fetched per actor), then ONE
bucketed content-hash shuffle of narrow (hash, id) pairs resolving
kept/duplicate via in-bucket window-min. Payload text never shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

LEDGER_SCHEMA = pa.schema([("doc_id", pa.int64()), ("status", pa.string())])


def funnel_ledger(
    ds: Dataset,
    weights: np.ndarray,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    blocked_col: str = "blocked",
    bias: int = 0,
    concurrency=None,
) -> Dataset:
    """``ds`` must carry ``id_col``, ``text_col`` and a bool
    ``blocked_col`` (the policy gate, computed upstream — blocklist,
    robots, URL rules). Returns the (id, status) ledger with statuses
    ``blocked`` / ``low_quality`` / ``duplicate`` / ``kept``."""
    from doppel_ray.stages import classifier as C
    from doppel_ray.stages import hashes
    from doppel_ray.stages.exact import bucketed_group_apply

    def blocked_rows(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.fill_null(batch[blocked_col], False))
        return pa.table(
            {
                "doc_id": pc.cast(t[id_col], pa.int64()),
                "status": pa.array(["blocked"] * len(t), type=pa.string()),
            }
        )

    blocked = ds.map_batches(blocked_rows, batch_format="pyarrow")

    def unblocked(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.invert(pc.fill_null(batch[blocked_col], False))
        )
        return pa.table({id_col: t[id_col], text_col: t[text_col]})

    rest = ds.map_batches(unblocked, batch_format="pyarrow")
    scored = C.score_documents(
        rest, weights, text_col=text_col, bias=bias, concurrency=concurrency
    )

    def lowq_rows(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.invert(batch["keep"]))
        return pa.table(
            {
                "doc_id": pc.cast(t[id_col], pa.int64()),
                "status": pa.array(
                    ["low_quality"] * len(t), type=pa.string()
                ),
            }
        )

    lowq = scored.map_batches(lowq_rows, batch_format="pyarrow")

    surv = scored.map_batches(
        lambda b: b.filter(b["keep"]).select([id_col, text_col]),
        batch_format="pyarrow",
    )
    hashed = hashes.add_content_hash(
        surv, text_col=text_col
    ).select_columns(["content_hash", id_col])

    def per_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        mn = df.groupby("content_hash")[id_col].transform("min")
        return pa.table(
            {
                "doc_id": pa.array(df[id_col].to_numpy(), type=pa.int64()),
                "status": pa.array(
                    np.where(
                        df[id_col].to_numpy() == mn.to_numpy(),
                        "kept",
                        "duplicate",
                    ),
                    type=pa.string(),
                ),
            }
        )

    deduped = bucketed_group_apply(hashed, "content_hash", per_bucket)
    return blocked.union(lowq).union(deduped)
