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
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Min, Sum

from doppel_ray.stages.decontam import _flat_tokens, _ngram_hashes

#: duplicated-hash keys above which the exact broadcast semi-join gives
#: way to the Bloom prefilter (~10 bits/key vs 8 B/key)
BLOOM_PREFILTER_LIMIT = 50_000_000


#: removal pairs above which the broadcast rebuild gives way to the
#: bucketed doc-id join (pairs are two int64s = 16 B each)
REBUILD_BROADCAST_LIMIT = 2_000_000


def dup_token_windows(
    ds: Dataset,
    *,
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bloom_limit: int = BLOOM_PREFILTER_LIMIT,
) -> Dataset:
    """Exact duplicated n-token-window relation (module docstring)."""
    survivors = _dup_window_occurrences(
        ds, window=window, text_col=text_col, id_col=id_col,
        bloom_limit=bloom_limit,
    )

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


def _dup_window_occurrences(
    ds: Dataset,
    *,
    window: int,
    text_col: str,
    id_col: str,
    bloom_limit: int,
) -> Dataset:
    """Hash-prefiltered occurrence stream of CANDIDATE duplicated
    windows: one row ``(win_text, key)`` per window whose 64-bit hash is
    seen >= 2 times corpus-wide (key = zero-padded ``doc:pos``). Shared
    by detection (`dup_token_windows`) and removal (`remove_dup_spans`);
    consumers must re-verify on the window STRING (count > 1) to kill
    hash collisions."""
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
    return narrow.map_batches(survivors_fn, batch_format="pyarrow")


def remove_dup_spans(
    ds: Dataset,
    *,
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bloom_limit: int = BLOOM_PREFILTER_LIMIT,
    broadcast_limit: int = REBUILD_BROADCAST_LIMIT,
    num_buckets: int = 64,
) -> Dataset:
    """Substring-level dedup REMOVAL (Lee et al. 2022 semantics): every
    duplicated n-token window keeps its first occurrence corpus-wide
    (min zero-padded ``(doc, pos)`` key, the stable-id stance of
    SURVEY.md G4) and every OTHER occurrence marks its ``window`` tokens
    for removal; docs are rewritten as the space-join of surviving
    tokens. Output text is whitespace-NORMALIZED for every doc (the
    tokenizer collapses runs), with ``n_tokens`` (original) and
    ``n_removed`` audit columns.

    Scale shape:

    1. Candidate occurrences from the shared hash-prefilter pass
       (`_dup_window_occurrences` — shuffle volume bounded by duplicated
       windows, never the corpus).
    2. ONE bucketed ``win_text`` shuffle resolves per-window min keys at
       C speed (string grouping kills 64-bit hash collisions exactly as
       in `dup_token_windows`); non-first occurrences emit narrow
       ``(doc_id, pos)`` int64 pairs — 16 B each, bounded by duplicated
       token volume (~3% of tokens on web corpora per Lee et al.).
    3. Rebuild: below ``broadcast_limit`` pairs, the sorted pair arrays
       broadcast once (``ray.put`` + per-worker `cached_get`) and one
       ``map_batches`` rewrites docs in place — unaffected docs take the
       vectorized normalized string, only affected docs materialize
       Python tokens. Above it, a tagged-union bucketed join on
       ``id_col`` co-locates each doc with its pairs (payload shuffles
       once; the pair side is narrow).
    """
    survivors = _dup_window_occurrences(
        ds, window=window, text_col=text_col, id_col=id_col,
        bloom_limit=bloom_limit,
    )

    def per_bucket_pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("win_text")["key"]
        dup = (g.transform("size") > 1).to_numpy()
        nonfirst = (df["key"] != g.transform("min")).to_numpy()
        rem = df.loc[dup & nonfirst, "key"]
        return pa.table(
            {
                "doc_id": pa.array(
                    rem.str.slice(0, 12).astype(np.int64), type=pa.int64()
                ),
                "pos": pa.array(
                    rem.str.slice(13).astype(np.int64), type=pa.int64()
                ),
            }
        )

    from doppel_ray.stages.exact import bucketed_group_apply

    pairs = bucketed_group_apply(
        survivors, "win_text", per_bucket_pairs,
        num_buckets=num_buckets, materialize_input=True,
    ).materialize()
    n_pairs = pairs.count()

    docs = ds.select_columns([id_col, text_col])

    if n_pairs <= broadcast_limit:
        import ray

        from doppel_ray.stages.util import collect_table

        t = collect_table(
            pairs,
            schema=pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())]),
        )
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        p = t["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((p, d))
        ref = ray.put((d[order], p[order]))

        def rebuild(batch: pa.Table) -> pa.Table:
            from doppel_ray.stages.util import cached_get

            pd_, pp_ = cached_get(ref)
            return _rebuild_docs(batch, pd_, pp_, window, text_col, id_col)

        return docs.map_batches(rebuild, batch_format="pyarrow")

    # bucketed regime: co-locate each doc with its removal pairs via ONE
    # tagged-union shuffle on the doc id (pos = -1 tags the doc row)
    def tag_docs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                text_col: batch[text_col].cast(pa.string()),
                "pos": pa.array(
                    np.full(batch.num_rows, -1, dtype=np.int64)
                ),
            }
        )

    def tag_pairs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch["doc_id"],
                text_col: pa.array([""] * batch.num_rows, type=pa.string()),
                "pos": batch["pos"],
            }
        )

    union = docs.map_batches(tag_docs, batch_format="pyarrow").union(
        pairs.map_batches(tag_pairs, batch_format="pyarrow")
    )

    def per_bucket_rebuild(t: pa.Table) -> pa.Table:
        is_doc = pc.less(t["pos"], 0)
        doc_tbl = t.filter(is_doc).select([id_col, text_col])
        pr = t.filter(pc.invert(is_doc))
        d = pr[id_col].to_numpy(zero_copy_only=False)
        p = pr["pos"].to_numpy(zero_copy_only=False)
        o = np.lexsort((p, d))
        return _rebuild_docs(doc_tbl, d[o], p[o], window, text_col, id_col)

    return bucketed_group_apply(
        union, id_col, per_bucket_rebuild, num_buckets=num_buckets
    )


def _rebuild_docs(
    doc_tbl: pa.Table,
    pair_doc: np.ndarray,
    pair_pos: np.ndarray,
    window: int,
    text_col: str,
    id_col: str,
) -> pa.Table:
    """Rewrite each doc with its removal windows excised. ``pair_doc``
    MUST be sorted (pairs for docs outside this table are ignored, so
    the broadcast regime can ship one global array). Unaffected docs
    take the vectorized whitespace-normalized string; only affected docs
    materialize Python token lists."""
    from doppel_ray.stages.decontam import _WS_CHARS

    ids = doc_tbl[id_col].to_numpy(zero_copy_only=False)
    flat, counts = _flat_tokens(doc_tbl[text_col])
    doc_start = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=doc_start[1:])

    arr = doc_tbl[text_col]
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_null(arr.type):
        arr = arr.cast(pa.string())
    norm = pc.utf8_trim(
        pc.replace_substring_regex(
            pc.fill_null(arr, ""), pattern=f"[{_WS_CHARS}]+", replacement=" "
        ),
        characters=_WS_CHARS,
    )
    texts = norm.to_pylist()
    n_removed = np.zeros(len(ids), dtype=np.int64)

    lo = np.searchsorted(pair_doc, ids, side="left")
    hi = np.searchsorted(pair_doc, ids, side="right")
    for r in np.flatnonzero(hi > lo):
        rel = pair_pos[lo[r] : hi[r]]
        n_tok = int(counts[r])
        if len(rel) and (rel.min() < 0 or int(rel.max()) + window > n_tok):
            raise ValueError(
                f"removal window out of range for doc {ids[r]}: "
                f"pos {int(rel.max())} + {window} > {n_tok} tokens "
                "(tokenization mismatch between passes)"
            )
        keep = np.ones(n_tok, dtype=bool)
        cover = (rel[:, None] + np.arange(window, dtype=np.int64)).ravel()
        keep[cover] = False
        n_removed[r] = n_tok - int(keep.sum())
        toks = flat.slice(int(doc_start[r]), n_tok)
        texts[r] = " ".join(toks.filter(pa.array(keep)).to_pylist())

    return pa.table(
        {
            id_col: pa.array(ids, type=pa.int64()),
            text_col: pa.array(texts, type=pa.string()),
            "n_tokens": pa.array(counts, type=pa.int64()),
            "n_removed": pa.array(n_removed, type=pa.int64()),
        }
    )


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
