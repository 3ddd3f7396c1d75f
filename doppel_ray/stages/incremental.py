"""Incremental dedup: dedupe a NEW batch of documents against an existing
corpus index — the standing operation of a continuously-crawled training
pipeline (every fresh crawl is deduped against everything already kept).

Generalizes the reference's single-corpus grouping (finder.go:106-145) to
two inputs. Semantics = SQL anti-join on content:

    SELECT min(id) FROM new
    WHERE text NOT IN (SELECT text FROM index)
    GROUP BY text                         -- optional within-batch keep-first

Ray-Data design
---------------
Neither side's payload ever shuffles. Both sides project to a narrow
content-hash stream; the only exchanged data is per-block-DISTINCT
(hash, side-bit) partials — the combiner-first shape of
``exact.duplicated_key_values``. Keys present on BOTH sides (the
contaminated set) are bounded by the actual new∩index overlap — i.e. by
duplicate volume, not corpus size — so they broadcast, and the new batch
is anti-filtered in one ``map_batches`` pass. The index side contributes
one narrow column scan regardless of its size.

Scale bound: the broadcast overlap-key set follows the same bound as the
exact cascade's dup-key broadcast (exact.py module docstring): holds to
~10^9 overlapping keys; past that the drop-in is a Bloom filter of index
keys or a bucketed semi-join — stage boundary unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from doppel_ray.stages import hashes
from doppel_ray.stages.exact import DRIVER_AGG_LIMIT, semi_filter


def overlap_key_values(a: Dataset, b: Dataset, key: str) -> pa.Array:
    """Distinct ``key`` values present in BOTH datasets.

    Combiner-first: each block of each side emits its block-distinct
    keys tagged with a side bit (a=1, b=2); the merge then keeps keys
    whose bits span both sides. Below ``DRIVER_AGG_LIMIT`` partial rows
    the merge is one vectorized driver pass; above it, a narrow
    groupby(min,max) shuffle of the partials (bits are {1,2}, so a key
    is on both sides iff min(bit)=1 and max(bit)=2 — duplicate partials
    from multiple blocks of one side cannot distort min/max, unlike a
    sum).
    """
    from doppel_ray.stages.util import collect_table

    def tag(bit: int):
        def partial(batch: pa.Table) -> pa.Table:
            u = batch[key].unique()
            return pa.table(
                {key: u, "bit": pa.array(np.full(len(u), bit, dtype=np.int64))}
            )

        return partial

    parts_a = a.select_columns([key]).map_batches(tag(1), batch_format="pyarrow")
    parts_b = b.select_columns([key]).map_batches(tag(2), batch_format="pyarrow")
    partials = parts_a.union(parts_b).materialize()

    if partials.count() <= DRIVER_AGG_LIMIT:
        t = collect_table(partials)
        if t.num_rows == 0:
            return pa.array([])
        df = t.to_pandas().drop_duplicates()
        bits = df.groupby(key, sort=False)["bit"].sum()
        both = bits.index[bits.to_numpy() == 3]
        return pa.Array.from_pandas(both.to_series().reset_index(drop=True))

    from ray.data.aggregate import Max, Min

    spans = partials.groupby(key).aggregate(
        Min("bit", alias_name="lo"), Max("bit", alias_name="hi")
    )
    t = collect_table(
        spans.filter(expr="lo == 1 and hi == 2").select_columns([key])
    )
    if t.num_rows == 0:
        return pa.array([])
    return t[key].combine_chunks()


def dedup_against_index(
    new_ds: Dataset,
    index_ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    within_batch: bool = True,
) -> Dataset:
    """IDs of new-batch docs that survive dedup against the index.

    ``within_batch=True`` additionally keeps one representative (min id)
    per distinct surviving text — the full incremental-ingest semantics.
    """
    new_h = hashes.add_content_hash(
        new_ds.select_columns([id_col, text_col]), text_col=text_col
    ).select_columns([id_col, "content_hash"])
    idx_h = hashes.add_content_hash(
        index_ds.select_columns([text_col]), text_col=text_col
    ).select_columns(["content_hash"])

    hits = overlap_key_values(
        new_h.select_columns(["content_hash"]), idx_h, "content_hash"
    )
    survivors = (
        semi_filter(new_h, "content_hash", hits, invert=True)
        if len(hits)
        else new_h
    )
    if not within_batch:
        return survivors.select_columns([id_col])
    from ray.data.aggregate import Min

    return (
        survivors.groupby("content_hash")
        .aggregate(Min(id_col, alias_name=id_col))
        .select_columns([id_col])
    )


def _side_pages(
    ds: Dataset, prefix: str, id_col: str, text_col: str
) -> Dataset:
    """(id, text) -> side-tagged page stream: url = prefix + zero-padded
    id (index prefix "0" < new prefix "1" keeps the pair-orientation
    invariant)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        return pa.table(
            {
                "url": pa.array([f"{prefix}{i:012d}" for i in ids]),
                "text": batch[text_col],
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow"
    )


def build_signature_index(
    index_ds: Dataset,
    cfg=None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    path: str | None = None,
) -> Dataset:
    """Sign the standing index ONCE for reuse across ingest runs.

    Signing is the compute-dominant near-dedup stage and signatures are
    a pure function of (text, cfg), so a continuously-ingesting pipeline
    persists the index's narrow (url, band_key) rows and re-signs only
    each new batch — the documented production path of
    ``near_dedup_against_index``. ``path`` additionally writes the rows
    as Parquet (resumable artifact); pass the returned/read Dataset as
    ``index_signatures``. MUST be built with the same cfg (shingle,
    bands, kernel, seed) the ingest runs use.
    """
    from doppel_ray.stages import minhash

    cfg = cfg or minhash.MinHashConfig()
    sig = minhash.signatures(
        _side_pages(index_ds, "0", id_col, text_col),
        cfg,
        with_eq=cfg.is_pair_complete,
    )
    if path is not None:
        sig.write_parquet(path)
        import ray.data as rd

        return rd.read_parquet(path)
    return sig.materialize()


def near_dedup_against_index(
    new_ds: Dataset,
    index_ds: Dataset,
    cfg=None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    index_signatures: Dataset | None = None,
) -> Dataset:
    """IDs of new-batch docs with NO near-duplicate (shingle Jaccard >=
    cfg.threshold) anywhere in the existing index — incremental ingest
    with the same MinHash/LSH + exact-verify semantics as
    ``minhash.near_dup_edges`` (recall harness in tests/test_minhash.py
    applies unchanged; verification is exact Jaccard, so a surviving doc
    is exactly one with no verified cross-corpus pair).

    Composition: both sides are tagged into one page stream via a 1-char
    url prefix (index "0" < new "1", preserving the orientation
    invariant), banded together, and only CROSS-side verified edges flag
    a new doc. Requires integer ``id_col``.

    Scale notes: (a) edges are bounded by actual near-dup volume, so the
    flagged-id set broadcasts (same bound as the exact path's overlap
    keys); (b) pass ``index_signatures`` (from ``build_signature_index``
    with the SAME cfg) to skip re-signing the standing index — only the
    new batch is signed, the signature streams union at the band level
    (prune_exact is disabled on this path: precomputed signatures cover
    the unpruned doc set; results are identical, equivalence pinned in
    tests); (c) index-index candidate pairs are skipped at verify cost
    only after banding — a side-aware pair emission (drop same-side
    pairs in the band bucket) is the documented optimization; results
    are identical either way.
    """
    import dataclasses

    import pyarrow.compute as pc

    from doppel_ray.stages import minhash
    from doppel_ray.stages.util import collect_table

    cfg = cfg or minhash.MinHashConfig()

    new_pages = _side_pages(new_ds, "1", id_col, text_col)
    index_pages = _side_pages(index_ds, "0", id_col, text_col)
    union = new_pages.union(index_pages)
    if index_signatures is not None:
        cfg = dataclasses.replace(cfg, prune_exact=False)
        sig = minhash.signatures(
            new_pages, cfg, with_eq=cfg.is_pair_complete
        ).union(index_signatures)
        edges = minhash.near_dup_edges(union, cfg, sig=sig)
    else:
        edges = minhash.near_dup_edges(union, cfg)

    def cross_side_new_ids(batch: pa.Table) -> pa.Table:
        out = []
        for x, y in zip(batch["url_a"].to_pylist(), batch["url_b"].to_pylist()):
            xn, yn = x[0] == "1", y[0] == "1"
            if xn != yn:
                out.append(int((x if xn else y)[1:]))
        return pa.table({id_col: pa.array(out, pa.int64())})

    hits_t = collect_table(
        edges.map_batches(cross_side_new_ids, batch_format="pyarrow")
    )
    ids_only = new_ds.select_columns([id_col])
    if hits_t.num_rows == 0:
        return ids_only
    return semi_filter(
        ids_only, id_col, pc.unique(hits_t[id_col]), invert=True
    )
