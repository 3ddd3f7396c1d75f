"""SimHash near-duplicate candidates (Charikar 2002) as a Ray Data stage.

64-bit token-weighted SimHash per doc; Hamming-distance candidates via the
pigeonhole band trick (Manku/Jain/Sarma, WWW'07 "Detecting near-duplicates
for web crawling"): split the 64-bit fingerprint into ``bands`` equal
blocks — any pair within Hamming distance d < bands shares at least one
exact block, so a groupby per block finds all candidates.

Scale design (round 2 — replaces the r1 driver-collect verify):

* **Exact-dup pre-pruning** (``prune_exact``, default on): identical
  normalized texts have identical fingerprints, so a mega-group of m
  exact copies used to form an m-clique in EVERY band block (the
  dominant cost at bench scale). Now one representative (min url) per
  equality class goes through banding; the full pair relation is
  restored afterward by fully-distributed expansion — intra-class
  cliques at Hamming 0 plus rep-edge cross products — via bucketed
  hash joins, no driver data paths.
* **Verification inside the band bucket**: the fingerprints travel with
  the rows, so the exact popcount filter runs where the pairs are born;
  only surviving (url_a, url_b, hamming) rows ever shuffle again.
* **Distributed pair dedupe**: a pair surfacing from several blocks is
  deduped by a bucketed groupby on url_a — the r1 ``collect_table``
  driver pass is gone; no stage materializes on the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset

from doppel_ray.functions import text as T
from doppel_ray.stages.exact import bucketed_group_apply

SIMHASH_EDGES_SCHEMA = pa.schema(
    [
        ("url_a", pa.string()),
        ("url_b", pa.string()),
        ("hamming", pa.int64()),
        ("kind", pa.string()),
    ]
)

_PAIRS_SCHEMA = pa.schema(
    [
        ("url_a", pa.string()),
        ("url_b", pa.string()),
        ("hamming", pa.int64()),
        ("dropped", pa.int64()),
    ]
)


@dataclass(frozen=True)
class SimHashConfig:
    max_hamming: int = 3     # candidate pairs must be within this distance
    bands: int = 4           # 64/4 = 16-bit blocks; requires bands > max_hamming
    band_cap: int = 64       # hot-block cap (ring emission + dropped tally)
    num_buckets: int = 64
    normalize: bool = True
    batch_size: int = 4096
    # collapse identical (normalized) texts to one representative before
    # banding; the full pair relation is restored by distributed
    # expansion afterward. Kills the exact-dup mega-clique cost.
    prune_exact: bool = True
    # "pandas" (fast default) or "md5" (DuckDB-reproducible fingerprints
    # — the SQL-oracle mode; see functions.text.md5_token_hash64)
    token_hash: str = "pandas"

    def __post_init__(self):
        assert 64 % self.bands == 0, "bands must divide 64"
        assert self.bands > self.max_hamming, (
            "pigeonhole requires bands > max_hamming"
        )


def add_simhash(ds: Dataset, cfg: SimHashConfig | None = None,
                text_col: str = "text", out_col: str = "simhash",
                eq_col: str | None = None) -> Dataset:
    """Append the 64-bit SimHash fingerprint column (int64 bit-view);
    ``eq_col`` additionally appends a 64-bit hash of the (normalized)
    text — the equality key the exact-dup pre-prune groups on."""
    cfg = cfg or SimHashConfig()

    def fn(batch: pa.Table) -> pa.Table:
        texts = (
            T.normalize_texts(batch[text_col])
            if cfg.normalize
            else batch[text_col].to_pandas()
        )
        sh = T.simhash_signatures(texts, token_hash=cfg.token_hash)
        if out_col in batch.column_names:
            batch = batch.drop_columns([out_col])
        batch = batch.append_column(out_col, pa.array(sh, type=pa.int64()))
        if eq_col is not None:
            from doppel_ray.functions.hashing import sip64

            eq = sip64(texts).view(np.int64)
            batch = batch.append_column(eq_col, pa.array(eq, type=pa.int64()))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=cfg.batch_size)


def _explode_blocks(batch: pa.Table, bands: int) -> pa.Table:
    """(url, simhash) -> one row per (block_key, url, simhash)."""
    sh = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    urls = batch["url"].to_pylist()
    n = len(urls)
    keys = np.empty((n, bands), dtype=np.uint64)
    for i in range(bands):
        block = (sh >> np.uint64(i * width)) & mask
        # fold block id into the key so one groupby covers all blocks
        keys[:, i] = block * np.uint64(bands * 2 + 1) + np.uint64(i)
    return pa.table(
        {
            "block_key": pa.array(keys.ravel().view(np.int64), type=pa.int64()),
            "url": pa.array(np.repeat(urls, bands)),
            "simhash": pa.array(np.repeat(sh.view(np.int64), bands), type=pa.int64()),
        }
    )


def _emit_pairs_bucket(g: pa.Table, cap: int, max_hamming: int) -> pa.Table:
    """Within-block pairs (ring-capped for hot blocks) with the exact
    Hamming popcount applied HERE — fingerprints travel with the rows,
    so verification needs no join and failing pairs never shuffle.

    Ring-pruned pair tallies survive the Hamming filter independently of
    which pairs pass it (ADVICE r2): each hot block's tally lands on the
    block's first SURVIVING pair, else any surviving pair of the group,
    else a self-pair marker row (url_a == url_b, hamming 0) that
    ``_dedupe_pairs`` sums like any pair and ``simhash_edges`` strips
    from the edge output — the tally is accounting, not an edge."""
    if g.num_rows < 2:
        return _PAIRS_SCHEMA.empty_table()
    df = g.to_pandas().drop_duplicates(subset=["block_key", "url"])
    dup = df[df.duplicated("block_key", keep=False)]
    if dup.empty:
        return _PAIRS_SCHEMA.empty_table()
    ua, ub, sa, sb = [], [], [], []
    tallies: list[tuple[int, int, int]] = []  # (start, end, pruned) per hot block
    for _, grp in dup.groupby("block_key", sort=False):
        rows = sorted(zip(grp["url"], grp["simhash"]))
        m = len(rows)
        if m < 2:
            continue
        start = len(ua)
        if m <= cap:
            for i in range(m):
                for j in range(i + 1, m):
                    ua.append(rows[i][0]); ub.append(rows[j][0])
                    sa.append(rows[i][1]); sb.append(rows[j][1])
        else:
            total = m * (m - 1) // 2
            for i in range(m - 1):
                ua.append(rows[i][0]); ub.append(rows[i + 1][0])
                sa.append(rows[i][1]); sb.append(rows[i + 1][1])
            tallies.append((start, len(ua), total - (m - 1)))
    if not ua:
        return _PAIRS_SCHEMA.empty_table()
    d = T.hamming_distance64(
        np.asarray(sa, dtype=np.int64).view(np.uint64),
        np.asarray(sb, dtype=np.int64).view(np.uint64),
    )
    keep = d <= max_hamming
    dropped = np.zeros(len(ua), dtype=np.int64)
    kept_idx = np.nonzero(keep)[0]
    homeless = 0
    for start, end, pruned in tallies:
        in_block = kept_idx[(kept_idx >= start) & (kept_idx < end)]
        if in_block.size:
            dropped[in_block[0]] += pruned
        elif kept_idx.size:
            dropped[kept_idx[0]] += pruned
        else:
            homeless += pruned
    out_ua = np.asarray(ua)[keep]
    out_ub = np.asarray(ub)[keep]
    out_h = d[keep].astype(np.int64)
    out_dropped = dropped[keep]
    if homeless:
        out_ua = np.append(out_ua, ua[0])
        out_ub = np.append(out_ub, ua[0])  # self-pair marker row
        out_h = np.append(out_h, 0)
        out_dropped = np.append(out_dropped, homeless)
    return pa.table(
        {
            "url_a": pa.array(out_ua, type=pa.string()),
            "url_b": pa.array(out_ub, type=pa.string()),
            "hamming": pa.array(out_h),
            "dropped": pa.array(out_dropped),
        },
        schema=_PAIRS_SCHEMA,
    )


def _dedupe_pairs(pairs: Dataset, num_buckets: int) -> Dataset:
    """Bucketed distributed dedupe: all copies of a pair share url_a, so
    one hash-bucket shuffle co-locates them; hamming is identical for
    every copy, dropped tallies sum."""

    def per_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        agg = df.groupby(["url_a", "url_b"], sort=False, as_index=False).agg(
            hamming=("hamming", "first"), dropped=("dropped", "sum")
        )
        return pa.Table.from_pandas(agg, preserve_index=False).cast(_PAIRS_SCHEMA)

    return bucketed_group_apply(pairs, "url_a", per_bucket, num_buckets=num_buckets)


def simhash_edges(ds: Dataset, cfg: SimHashConfig | None = None) -> Dataset:
    """pages -> verified SimHash edges (url_a, url_b, hamming, kind).

    Fully distributed: exact-dup classes collapse to representatives
    before banding (prune_exact), popcount verification happens inside
    the band bucket, pair dedupe is a bucketed groupby, and pruned
    classes are reattached by bucketed hash joins — no stage collects
    data to the driver (the r1 ``collect_table`` pass is gone).
    """
    cfg = cfg or SimHashConfig()
    # The signed table is materialized BEFORE the first shuffle: a map
    # fused into Ray's sort operator runs at the shuffle's task
    # granularity and measured 3-6x slower than the same map as a free
    # map stage (80s fused vs 26s pre-materialized at 200k docs). The
    # table is narrow — (url, 2 x int64), one row per doc — so the
    # object-store cost is trivial next to the corpus.
    if cfg.prune_exact:
        signed = (
            add_simhash(ds.select_columns(["url", "text"]), cfg, eq_col="eq_key")
            .select_columns(["url", "simhash", "eq_key"])
            .materialize()
        )
        from doppel_ray.stages.prune import split_rep_groups

        reps, members = split_rep_groups(
            signed, cfg.num_buckets, carry_col="simhash"
        )
    else:
        reps = (
            add_simhash(ds.select_columns(["url", "text"]), cfg)
            .select_columns(["url", "simhash"])
            .materialize()
        )
        members = None
    blocks = reps.map_batches(
        lambda t: _explode_blocks(t, cfg.bands), batch_format="pyarrow"
    )
    pairs = bucketed_group_apply(
        blocks,
        "block_key",
        lambda g: _emit_pairs_bucket(g, cfg.band_cap, cfg.max_hamming),
        num_buckets=cfg.num_buckets,
        materialize_input=True,  # keep the explode map out of the sort
    )
    # segment the plan at stage boundaries: the pair stream is tiny
    # relative to the corpus, and leaving the whole DAG fused makes Ray
    # interleave four sorts + unions with high run-to-run variance
    # (57-177s at 200k docs; segmented: stable ~40s)
    edges = _dedupe_pairs(pairs, cfg.num_buckets).materialize()

    def _strip_tally_rows(batch: pa.Table) -> pa.Table:
        # self-pair marker rows carry homeless ring-prune tallies through
        # the deduped pair stream; they are accounting, not edges
        import pyarrow.compute as pc

        return batch.filter(pc.invert(pc.equal(batch["url_a"], batch["url_b"])))

    edges = edges.map_batches(_strip_tally_rows, batch_format="pyarrow")
    if members is not None:
        from doppel_ray.stages.prune import expand_edges

        edges = expand_edges(
            edges, members, cfg.num_buckets,
            value_col="hamming", value_type=pa.int64(), identity_value=0,
        )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url_a": batch["url_a"],
                "url_b": batch["url_b"],
                "hamming": batch["hamming"],
                "kind": pa.array(["simhash"] * batch.num_rows, type=pa.string()),
            },
            schema=SIMHASH_EDGES_SCHEMA,
        )

    return edges.map_batches(finalize, batch_format="pyarrow")
