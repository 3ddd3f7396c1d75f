"""Tiered duplicate ATTRIBUTION — the cascade the reference runs for
speed (size -> quick hash -> full hash, internal/finder/finder.go:44-146
prunes between stages), re-expressed as the *semantic* tiering a
training-data pipeline publishes: every document labeled with the FIRST
tier that eliminates it,

    ``exact``       byte-identical text to a lower-id document
    ``normalized``  case/whitespace-insensitive duplicate of an earlier
                    exact-tier survivor (functions/text.normalize_texts)
    ``near``        MinHash/LSH near-duplicate (exact-Jaccard verified,
                    tau = cfg.threshold) of an earlier survivor
    ``kept``        the corpus a training run would actually use

Ray-Data design
---------------
Tiers 1-2 never shuffle payloads: ONE ``map_batches`` emits the narrow
``(id, content_hash, norm_hash)`` key table, then each tier is one
bucketed hash shuffle of that key table (``exact.bucketed_group_apply``
— per-bucket pandas ``transform('min')`` resolves millions of tiny
groups at C speed). Tier 3 reuses the full near-dedup machinery
(``minhash.near_dup_edges`` -> ``cluster.cluster_edges``) over ALL
documents — safe because exact and normalized duplicates have identical
normalized shingle sets, so (a) they land in the same component as
their survivor and (b) every component's min id is itself a kept
document; restricting the near tier to tier-2 survivors therefore
needs no semi-join, just the broadcast drop-set membership test that
``near_dedup_keep_first`` already uses (cluster.cluster_edges_distributed
is the documented fallback past the driver edge limit).

Scale notes (100 TB): the key table is ~50 bytes/doc regardless of
document size; both tier shuffles move only that. The near tier's cost
profile is exactly near_dup_edges' (banded LSH, salted hot bands,
auto scale-mode) — this stage adds zero new wide operations.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from doppel_ray.functions import hashing
from doppel_ray.functions.text import normalize_texts
from doppel_ray.stages import cluster, minhash
from doppel_ray.stages.exact import bucketed_group_apply

TIERS = ("exact", "normalized", "near", "kept")


def _mark_group_dups(key: str, id_col: str):
    """Per-bucket: flag rows whose id exceeds their key-group's min."""

    def per_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        gmin = df.groupby(key)[id_col].transform("min")
        df["is_dup"] = (df[id_col] > gmin).to_numpy()
        return pa.Table.from_pandas(df, preserve_index=False)

    return per_bucket


def tiered_dedup(
    ds: Dataset,
    cfg: minhash.MinHashConfig | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
) -> Dataset:
    """(id, text) -> (id, tier) for EVERY input row; tier in TIERS."""
    cfg = cfg or minhash.MinHashConfig()

    def keys_fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        norm = pa.array(normalize_texts(texts), type=pa.large_string())
        return pa.table(
            {
                id_col: batch[id_col],
                "ch": pa.array(hashing.content_hash(texts), type=pa.string()),
                "nh": pa.array(hashing.content_hash(norm), type=pa.string()),
            }
        )

    keys = ds.select_columns([id_col, text_col]).map_batches(
        keys_fn, batch_format="pyarrow"
    )

    # tier 1: exact (one narrow bucketed shuffle on content hash)
    t1 = bucketed_group_apply(
        keys, "ch", _mark_group_dups("ch", id_col), num_buckets=num_buckets
    )

    def split(want_dup: bool):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(
                batch["is_dup"] if want_dup else pc.invert(batch["is_dup"])
            ).drop_columns(["is_dup"])

        return fn

    t1 = t1.materialize()  # consumed by both branches below
    exact_dups = t1.map_batches(split(True), batch_format="pyarrow")
    s1 = t1.map_batches(split(False), batch_format="pyarrow")

    # tier 2: normalized (second narrow shuffle, survivors only)
    t2 = bucketed_group_apply(
        s1.select_columns([id_col, "nh"]),
        "nh",
        _mark_group_dups("nh", id_col),
        num_buckets=num_buckets,
    ).materialize()
    norm_dups = t2.map_batches(split(True), batch_format="pyarrow")
    s2 = t2.map_batches(split(False), batch_format="pyarrow")

    # tier 3: near — components over ALL docs (see module docstring for
    # why that equals components over survivors); broadcast drop set.
    def as_pages(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # zero-padded decimal ids as the near tier's url key — Arrow
        # cast + lpad (this map re-executes on every pass near_dup_edges
        # makes over its input, so a per-row Python f-string loop here
        # was multiplied by the KMV/prune/sign/verify scans)
        ids = pc.utf8_lpad(
            pc.cast(batch[id_col], pa.string()), width=12, padding="0"
        )
        return pa.table({"url": ids, "text": batch[text_col]})

    pages = ds.select_columns([id_col, text_col]).map_batches(
        as_pages, batch_format="pyarrow"
    )
    edges = minhash.near_dup_edges(pages, cfg)
    labels = cluster.cluster_edges(edges)
    drop = np.array(
        sorted(int(u) for u, c in labels.items() if u != c), dtype=np.int64
    )
    drop_ref = ray.put(drop)

    def tag(tier: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    id_col: batch[id_col],
                    "tier": pa.array([tier] * len(batch), type=pa.string()),
                }
            )

        return fn

    def near_or_kept(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(d) == 0:
            hit = np.zeros(len(ids), dtype=bool)
        else:
            idx = np.searchsorted(d, ids)
            hit = (idx < len(d)) & (d[np.clip(idx, 0, len(d) - 1)] == ids)
        tiers = np.where(hit, "near", "kept")
        return pa.table(
            {
                id_col: batch[id_col],
                "tier": pa.array(tiers.tolist(), type=pa.string()),
            }
        )

    out_exact = exact_dups.map_batches(tag("exact"), batch_format="pyarrow")
    out_norm = norm_dups.map_batches(tag("normalized"), batch_format="pyarrow")
    out_rest = s2.map_batches(near_or_kept, batch_format="pyarrow")
    return out_exact.union(out_norm, out_rest)
