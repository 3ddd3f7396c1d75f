"""Corpus-duplicated TOKEN windows — exact detection of every n-token
run that occurs more than once anywhere in the corpus (the detection
core of substring-level training-data dedup, cf. Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better": a repeated
substring of >= n tokens implies every length-n window inside it is
repeated at stride 1, so the duplicate-window relation localises the
repeats without a suffix array).

Scale shape (the decontamination two-pass, self-applied):

1. **Hash prefilter** — one ``map_batches`` rolls a 64-bit polynomial
   over every within-doc n-token window (shared kernel with
   stages/decontam.py: Arrow-native tokenization, vocabulary-coded
   sip64, boundary masking), emits per-batch DISTINCT-hash count
   partials, and a narrow ``groupby(hash)`` keeps hashes seen >= 2
   times. Shuffle volume: distinct window hashes x 16 B, never window
   strings.
2. **String verify** — a second pass re-rolls the windows, keeps only
   hash-hits (broadcast sorted-int64 semi-join; past ``bloom_limit``
   keys a Bloom filter stands in — SAFE here, unlike terminal prunes,
   because stage 3 re-verifies on the exact window string), and emits
   the window STRING plus a zero-padded ``doc:pos`` key only for
   survivors — bounded by duplicated-window volume, not the corpus.
3. ``groupby(window)`` count + lexicographic-min first-occurrence key:
   the string-level count>1 filter kills both 64-bit hash collisions
   and hash-count false positives, so the output relation is exact.

Output: one row per duplicated window — ``(win_text, cnt, first_doc,
first_pos)``, pos in token units (0-based), first = min over the
zero-padded (doc, pos) key (stable-id stance of SURVEY.md G4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Min, Sum

from doppel_ray.stages.decontam import _flat_tokens, _ngram_hashes

#: duplicated-hash keys above which the exact broadcast semi-join gives
#: way to the Bloom prefilter (~10 bits/key vs 8 B/key)
BLOOM_PREFILTER_LIMIT = 50_000_000


def dup_token_windows(
    ds: Dataset,
    *,
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bloom_limit: int = BLOOM_PREFILTER_LIMIT,
) -> Dataset:
    """Exact duplicated n-token-window relation (module docstring)."""
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")

    narrow = ds.select_columns([id_col, text_col])

    def hash_partial(batch: pa.Table) -> pa.Table:
        flat, counts = _flat_tokens(batch[text_col])
        _, h, _ = _ngram_hashes(flat, counts, window)
        uniq, cnt = np.unique(h.view(np.int64), return_counts=True)
        return pa.table(
            {
                "h": pa.array(uniq, type=pa.int64()),
                "c": pa.array(cnt, type=pa.int64()),
            }
        )

    dup_hashes = (
        narrow.map_batches(hash_partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("c", alias_name="c"))
        .filter(expr="c > 1")
    )
    from doppel_ray.stages.util import collect_table

    t = collect_table(dup_hashes.select_columns(["h"]))
    keys = (
        t["h"].to_numpy(zero_copy_only=False)
        if t.num_rows
        else np.empty(0, dtype=np.int64)
    )

    # broadcast the dup-hash set once (ray.put; workers fetch once via
    # cached_get): exact sorted-int64 semi-join below bloom_limit keys,
    # Bloom prefilter above it — FPs die at the string-verify groupby
    import ray

    exact = len(keys) <= bloom_limit
    if exact:
        ref = ray.put(np.sort(keys))
    else:
        from doppel_ray.functions.sketch import BloomFilter

        bf = BloomFilter(len(keys))
        bf.add_hashes(keys.view(np.uint64))
        ref = ray.put(bf)

    survivors_fn = _make_survivor_fn(text_col, id_col, window, ref, exact)
    survivors = narrow.map_batches(survivors_fn, batch_format="pyarrow")

    g = (
        survivors.groupby("win_text")
        .aggregate(Count(alias_name="cnt"), Min("key", alias_name="fk"))
        .filter(expr="cnt > 1")
    )

    def split_key(batch: pa.Table) -> pa.Table:
        fk = batch["fk"].to_pandas()
        return pa.table(
            {
                "win_text": batch["win_text"],
                "cnt": batch["cnt"],
                "first_doc": pa.array(
                    fk.str.slice(0, 12).astype(np.int64), type=pa.int64()
                ),
                "first_pos": pa.array(
                    fk.str.slice(13).astype(np.int64), type=pa.int64()
                ),
            }
        )

    return g.map_batches(split_key, batch_format="pyarrow")


def _make_survivor_fn(text_col, id_col, window, ref, exact: bool):
    def fn(batch: pa.Table) -> pa.Table:
        from doppel_ray.stages.util import cached_get

        out_schema = pa.schema(
            [("win_text", pa.string()), ("key", pa.string())]
        )
        flat, counts = _flat_tokens(batch[text_col])
        starts, h, doc_idx = _ngram_hashes(flat, counts, window)
        if len(starts) == 0:
            return out_schema.empty_table()
        obj = cached_get(ref)
        v = h.view(np.int64)
        if exact:
            if len(obj) == 0:
                return out_schema.empty_table()
            pos_ = np.searchsorted(obj, v)
            pos_[pos_ == len(obj)] = 0
            hit = obj[pos_] == v
        else:
            hit = obj.contains_hashes(h)
        starts, doc_idx = starts[hit], doc_idx[hit]
        if len(starts) == 0:
            return out_schema.empty_table()
        doc_start = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=doc_start[1:])
        pos = starts - doc_start[doc_idx]
        ids = batch[id_col].to_numpy(zero_copy_only=False)[doc_idx]
        # only survivor windows (bounded by dup volume) ever materialize
        # Python token strings — same stance as decontam._NgramMatcher
        wins = [
            " ".join(flat.slice(int(s), window).to_pylist()) for s in starts
        ]
        key = [f"{int(d):012d}:{int(p):07d}" for d, p in zip(ids, pos)]
        return pa.table(
            {
                "win_text": pa.array(wins, type=pa.string()),
                "key": pa.array(key, type=pa.string()),
            }
        )

    return fn
