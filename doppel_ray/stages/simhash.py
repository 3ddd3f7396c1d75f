"""SimHash near-duplicate candidates (Charikar 2002) as a Ray Data stage.

64-bit token-weighted SimHash per doc; Hamming-distance candidates via the
pigeonhole band trick (Manku/Jain/Sarma, WWW'07 "Detecting near-duplicates
for web crawling"): split the 64-bit fingerprint into ``bands`` equal
blocks — any pair within Hamming distance d < bands shares at least one
exact block, so a groupby per block finds all candidates. Same bucketed
shuffle + capped hot groups as the MinHash path; verification computes the
exact Hamming distance from the two fingerprints (carried with the pair —
no second join needed, unlike Jaccard verification).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

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
        ("sim_a", pa.int64()),
        ("sim_b", pa.int64()),
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

    def __post_init__(self):
        assert 64 % self.bands == 0, "bands must divide 64"
        assert self.bands > self.max_hamming, (
            "pigeonhole requires bands > max_hamming"
        )


def add_simhash(ds: Dataset, cfg: SimHashConfig | None = None,
                text_col: str = "text", out_col: str = "simhash") -> Dataset:
    """Append the 64-bit SimHash fingerprint column (int64 bit-view)."""
    cfg = cfg or SimHashConfig()

    def fn(batch: pa.Table) -> pa.Table:
        texts = (
            T.normalize_texts(batch[text_col])
            if cfg.normalize
            else batch[text_col].to_pandas()
        )
        sh = T.simhash_signatures(texts)
        if out_col in batch.column_names:
            batch = batch.drop_columns([out_col])
        return batch.append_column(out_col, pa.array(sh, type=pa.int64()))

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


def _emit_pairs_bucket(g: pa.Table, cap: int) -> pa.Table:
    if g.num_rows < 2:
        return _PAIRS_SCHEMA.empty_table()
    df = g.to_pandas().drop_duplicates(subset=["block_key", "url"])
    dup = df[df.duplicated("block_key", keep=False)]
    if dup.empty:
        return _PAIRS_SCHEMA.empty_table()
    ua, ub, sa, sb, dropped = [], [], [], [], []
    for _, grp in dup.groupby("block_key", sort=False):
        rows = sorted(zip(grp["url"], grp["simhash"]))
        m = len(rows)
        if m < 2:
            continue
        if m <= cap:
            for i in range(m):
                for j in range(i + 1, m):
                    ua.append(rows[i][0]); ub.append(rows[j][0])
                    sa.append(rows[i][1]); sb.append(rows[j][1])
                    dropped.append(0)
        else:
            total = m * (m - 1) // 2
            for i in range(m - 1):
                ua.append(rows[i][0]); ub.append(rows[i + 1][0])
                sa.append(rows[i][1]); sb.append(rows[i + 1][1])
                dropped.append(0)
            dropped[-(m - 1)] = total - (m - 1)
    return pa.table(
        {
            "url_a": pa.array(ua, type=pa.string()),
            "url_b": pa.array(ub, type=pa.string()),
            "sim_a": pa.array(sa, type=pa.int64()),
            "sim_b": pa.array(sb, type=pa.int64()),
            "dropped": pa.array(dropped, type=pa.int64()),
        },
        schema=_PAIRS_SCHEMA,
    )


def simhash_edges(ds: Dataset, cfg: SimHashConfig | None = None) -> Dataset:
    """pages -> verified SimHash edges (url_a, url_b, hamming, kind).

    Unlike MinHash verification, the fingerprints travel WITH the pairs,
    so verification is a vectorized popcount — no join stage at all.
    """
    cfg = cfg or SimHashConfig()
    signed = add_simhash(ds.select_columns(["url", "text"]), cfg)
    blocks = signed.map_batches(
        lambda t: _explode_blocks(t.select(["url", "simhash"]), cfg.bands),
        batch_format="pyarrow",
    )
    pairs = bucketed_group_apply(
        blocks,
        "block_key",
        lambda g: _emit_pairs_bucket(g, cfg.band_cap),
        num_buckets=cfg.num_buckets,
    )

    # fingerprints travel WITH the pairs, so dedupe + verification need no
    # join and no second shuffle: one vectorized driver pass (pandas
    # drop_duplicates + popcount) replaces the bucketed dedupe + verify
    # map that cost a full extra sort (same lesson as minhash's
    # driver-verify regime; documented scale bound: the pair list fits
    # the driver — beyond that restore a bucketed dedupe on url_a).
    from doppel_ray.stages.minhash import collect_table

    t = collect_table(
        pairs.map_batches(
            lambda b: b.select(_PAIRS_SCHEMA.names), batch_format="pyarrow"
        ),
        _PAIRS_SCHEMA,
    )
    if t.num_rows == 0:
        return ray.data.from_arrow(SIMHASH_EDGES_SCHEMA.empty_table())
    df = t.to_pandas().drop_duplicates(subset=["url_a", "url_b"])
    d = T.hamming_distance64(
        df["sim_a"].to_numpy().view(np.uint64),
        df["sim_b"].to_numpy().view(np.uint64),
    )
    keep = d <= cfg.max_hamming
    out = pa.table(
        {
            "url_a": pa.array(df["url_a"].to_numpy()[keep], type=pa.string()),
            "url_b": pa.array(df["url_b"].to_numpy()[keep], type=pa.string()),
            "hamming": pa.array(d[keep].astype(np.int64)),
            "kind": pa.array(["simhash"] * int(keep.sum()), type=pa.string()),
        },
        schema=SIMHASH_EDGES_SCHEMA,
    )
    return ray.data.from_arrow(out)
