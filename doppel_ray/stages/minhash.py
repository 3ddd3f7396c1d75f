"""MinHash/LSH near-duplicate detection as a Ray Data pipeline.

Pipeline (SURVEY.md §7.3 step 5):

    pages --map_batches(MinHashSigner actor pool)--> (url, band_key x B)
          --flat explode--> (url, band_key) rows
          --groupby(band_key)--> candidate pairs (capped for hot bands)
          --groupby(pair)------> deduped pairs
          --map_batches(PairVerifier)--> edges with exact Jaccard >= tau

The signer is a callable CLASS (actor pool): the k-permutation parameter
matrix is built once per actor in ``__init__`` and reused per batch — the
Ray-Data analog of the reference's per-worker reused hasher state
(reference internal/finder/finder.go:163-166, 224-227).

Skew handling (north rule; no counterpart in the reference): boilerplate
corpora create mega-bands. A band group larger than ``band_cap`` does NOT
emit all O(m^2) pairs; it emits a sorted ring (m pairs) which preserves
component connectivity for clustering, and reports the dropped pair count
in the ``dropped`` column — no silent truncation. Huge bands are in
practice exact-dup boilerplate already captured by the exact cascade.

Verification: candidate docs (urls appearing in >=1 pair) are a small
subset of the corpus; their exact shingle sets are computed distributed,
then broadcast via ``ray.put`` for pair verification in ``map_batches``.
Scale path (documented assumption): when candidate shingle sets outgrow a
node, replace the broadcast with a bucketed two-pass hash join on
``hash(url) % B`` — the surrounding stages are unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data import Dataset
from ray.data.aggregate import Sum

from doppel_ray.functions import text as T
from doppel_ray.stages.exact import semi_filter


def _doc_bytes(col: pa.Array | pa.ChunkedArray, cfg: "MinHashConfig") -> list[bytes]:
    if cfg.normalize:
        return [s.encode() for s in T.normalize_texts(col)]
    return [s.encode() for s in col.to_pylist()]


@dataclass(frozen=True)
class MinHashConfig:
    num_perm: int = 128
    bands: int = 32          # rows = num_perm // bands = 4
    shingle_n: int = 5       # char n-gram width (bytes of normalized text)
    threshold: float = 0.8   # exact-Jaccard dup threshold tau
    band_cap: int = 64       # max band-group size emitting all pairs
    seed: int = 42
    normalize: bool = True   # lowercase+collapse-ws before shingling
    # "jaccard": exact set-Jaccard >= threshold (near-dup semantics).
    # "exact": byte-identical text (content-hash equality) — note that
    # set-Jaccard 1.0 does NOT imply identical text (repeated shingles
    # vanish in the set), so exact dedup must compare content hashes.
    verify_mode: str = "jaccard"
    # autoscaling actor pool (min,max): min=1 so the pool can never reserve
    # every CPU and starve downstream stages on small clusters
    signer_concurrency: int | tuple[int, int] = (1, 8)
    batch_size: int = 1024

    @property
    def rows_per_band(self) -> int:
        return self.num_perm // self.bands


class MinHashSigner:
    """Actor-pool stage: text -> flattened (url, band_key) candidate rows."""

    def __init__(self, cfg: MinHashConfig):
        self.cfg = cfg
        self.a, self.b = T.make_permutations(cfg.num_perm, cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        byte_docs = _doc_bytes(batch["text"], cfg)
        sigs = T.minhash_signatures(byte_docs, cfg.shingle_n, self.a, self.b)
        keys = T.band_keys(sigs, cfg.bands, seed=cfg.seed)  # (n, bands) int64
        urls = batch["url"].to_pylist()
        n = len(urls)
        return pa.table(
            {
                "url": pa.array(np.repeat(urls, cfg.bands)),
                "band_key": pa.array(keys.ravel(), type=pa.int64()),
            }
        )


def candidate_pairs(ds: Dataset, cfg: MinHashConfig) -> Dataset:
    """pages -> deduped candidate pair rows (url_a < url_b, dropped count)."""
    sig = ds.map_batches(
        MinHashSigner,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.signer_concurrency,
    )
    cap = cfg.band_cap

    def emit_pairs(g: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("url_a", pa.string()), ("url_b", pa.string()), ("dropped", pa.int64())]
        )
        m = g.num_rows
        if m < 2:
            return schema.empty_table()
        urls = sorted(set(g["url"].to_pylist()))
        m = len(urls)
        if m < 2:
            return schema.empty_table()
        if m <= cap:
            pairs = list(combinations(urls, 2))
            dropped = [0] * len(pairs)
        else:
            # hot band: ring of consecutive pairs keeps the component
            # connected; report the pruned pair count (no silent truncation)
            pairs = [(urls[i], urls[i + 1]) for i in range(m - 1)]
            total = m * (m - 1) // 2
            dropped = [total - len(pairs)] + [0] * (len(pairs) - 1)
        return pa.table(
            {
                "url_a": pa.array([p[0] for p in pairs]),
                "url_b": pa.array([p[1] for p in pairs]),
                "dropped": pa.array(dropped, type=pa.int64()),
            }
        )

    pairs = sig.groupby("band_key").map_groups(emit_pairs, batch_format="pyarrow")
    # dedupe pairs found in multiple bands; keep the dropped-pair tally
    return pairs.groupby(["url_a", "url_b"]).aggregate(Sum("dropped", alias_name="dropped"))


class PairVerifier:
    """Actor-pool stage: candidate pairs -> verified edges.

    jaccard mode: holds the broadcast {url: sorted-unique shingle hashes}
    map; exact set-Jaccard via ``np.intersect1d`` per pair.
    exact mode: holds {url: content_hash}; edge iff byte-identical text.
    """

    def __init__(self, lookup_ref, threshold: float, mode: str = "jaccard"):
        self.lookup: dict = ray.get(lookup_ref)
        self.threshold = threshold
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ua = batch["url_a"].to_pylist()
        ub = batch["url_b"].to_pylist()
        sims = np.empty(len(ua), dtype=np.float64)
        for i, (x, y) in enumerate(zip(ua, ub)):
            sa = self.lookup.get(x)
            sb = self.lookup.get(y)
            if sa is None or sb is None:
                sims[i] = 0.0
            elif self.mode == "exact":
                sims[i] = 1.0 if sa == sb else 0.0
            else:
                sims[i] = T.exact_jaccard(sa, sb)
        tbl = pa.table(
            {
                "url_a": batch["url_a"],
                "url_b": batch["url_b"],
                "similarity": pa.array(sims),
            }
        )
        mask = pa.array(sims >= self.threshold)
        return tbl.filter(mask)


def shingle_sets_for(
    ds: Dataset, urls: pa.Array, cfg: MinHashConfig
) -> dict[str, np.ndarray]:
    """Distributed exact shingle-set computation for the candidate urls;
    collected to the driver for broadcast (bounded by candidate count)."""

    def to_sets(batch: pa.Table) -> pa.Table:
        byte_docs = _doc_bytes(batch["text"], cfg)
        sets = T.unique_shingles(byte_docs, cfg.shingle_n)
        return pa.table(
            {
                "url": batch["url"],
                "shingles": pa.array(
                    [s.view(np.int64) for s in sets], type=pa.list_(pa.int64())
                ),
            }
        )

    cand = semi_filter(ds.select_columns(["url", "text"]), "url", urls)
    out = {}
    for b in cand.map_batches(to_sets, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for u, s in zip(b["url"].to_pylist(), b["shingles"].to_pylist()):
            out[u] = np.asarray(s, dtype=np.int64).view(np.uint64)
    return out


def content_hashes_for(ds: Dataset, urls: pa.Array) -> dict[str, str]:
    """{url: full-content hash} for the candidate urls (exact verify mode)."""
    from doppel_ray.functions import hashing

    def to_hashes(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch["url"],
                "h": pa.array(hashing.content_hash(batch["text"])),
            }
        )

    cand = semi_filter(ds.select_columns(["url", "text"]), "url", urls)
    out = {}
    for b in cand.map_batches(to_hashes, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for u, h in zip(b["url"].to_pylist(), b["h"].to_pylist()):
            out[u] = h
    return out


def near_dup_edges(ds: Dataset, cfg: MinHashConfig | None = None) -> Dataset:
    """pages -> verified near-dup edges (url_a, url_b, similarity, kind).

    ``similarity`` is the exact Jaccard over unique char-n-gram shingle
    hashes of the normalized text; only pairs >= cfg.threshold survive.
    """
    cfg = cfg or MinHashConfig()
    pairs = candidate_pairs(ds, cfg)
    pairs_t = pa.Table.from_pylist(
        pairs.take_all(),
        schema=pa.schema(
            [("url_a", pa.string()), ("url_b", pa.string()), ("dropped", pa.int64())]
        ),
    )
    if pairs_t.num_rows == 0:
        return ray.data.from_arrow(
            pa.schema(
                [
                    ("url_a", pa.string()),
                    ("url_b", pa.string()),
                    ("similarity", pa.float64()),
                    ("kind", pa.string()),
                ]
            ).empty_table()
        )
    cand_urls = pa.array(
        sorted(
            set(pairs_t["url_a"].to_pylist()) | set(pairs_t["url_b"].to_pylist())
        )
    )
    if cfg.verify_mode == "exact":
        lookup = content_hashes_for(ds, cand_urls)
    else:
        lookup = shingle_sets_for(ds, cand_urls, cfg)
    ref = ray.put(lookup)
    pairs_ds = ray.data.from_arrow(pairs_t.drop_columns(["dropped"]))
    edges = pairs_ds.map_batches(
        PairVerifier,
        fn_constructor_args=(ref, cfg.threshold, cfg.verify_mode),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "kind", pa.array(["minhash"] * batch.num_rows, type=pa.string())
        )

    return edges.map_batches(tag, batch_format="pyarrow")
