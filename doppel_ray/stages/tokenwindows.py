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

from doppel_ray.stages.decontam import _POLY_B, _flat_tokens, _ngram_hashes

#: duplicated-hash keys above which the exact broadcast semi-join gives
#: way to the Bloom prefilter (~10 bits/key vs 8 B/key)
BLOOM_PREFILTER_LIMIT = 50_000_000

#: second, independent polynomial base for the 128-bit removal-pair
#: grouping (xxhash64's prime2 — odd, high-entropy, != _POLY_B)
_POLY_B2 = np.uint64(0xC2B2AE3D27D4EB4F)

#: splitmix64 mixing multiplier: bijectively scrambles the per-token
#: hashes so the second roll sees DIFFERENT values, not just a
#: different base
_MIX_MUL = np.uint64(0xBF58476D1CE4E5B9)


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
                    fk.str.slice(0, 19).astype(np.int64), type=pa.int64()
                ),
                "first_pos": pa.array(
                    fk.str.slice(20).astype(np.int64), type=pa.int64()
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
    ref, is_exact = _dup_hash_broadcast(
        narrow, window=window, text_col=text_col, bloom_limit=bloom_limit
    )
    survivors_fn = _make_survivor_fn(text_col, id_col, window, ref, is_exact)
    return narrow.map_batches(survivors_fn, batch_format="pyarrow")


def _dup_hash_broadcast(
    narrow: Dataset, *, window: int, text_col: str, bloom_limit: int
):
    """Corpus-wide duplicated-window-HASH set, broadcast once: returns
    ``(object ref, exact_flag)`` — a sorted int64 array below
    ``bloom_limit`` keys (exact semi-join), a Bloom filter above it
    (FPs die at the downstream group verify). The hash-prefilter half
    of the module's two-pass shape, shared by both survivor emitters."""

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

    # bucketed count instead of groupby("h").aggregate: Ray's sort-based
    # aggregate over the ~22.5M-row partial relation measured 62 s on
    # the 200k dup-heavy bench corpus; shuffling on a 64-value bucket
    # key and resolving the per-hash sums with one in-bucket
    # argsort+reduceat runs the same reduction at C speed (the
    # bucketed_group_apply idiom). materialize_input keeps the
    # compute-heavy tokenize+ngram map out of the shuffle operator.
    from doppel_ray.stages.exact import bucketed_group_apply
    from doppel_ray.stages.util import collect_table

    def per_bucket_dups(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h, c = h[order], c[order]
        edge = np.flatnonzero(np.diff(h)) + 1
        starts_ = np.concatenate(([0], edge))
        tot = np.add.reduceat(c, starts_) if len(c) else c
        keys_ = h[starts_][tot > 1] if len(c) else h
        return pa.table({"h": pa.array(keys_, type=pa.int64())})

    partials = narrow.map_batches(hash_partial, batch_format="pyarrow")
    dup_hashes = bucketed_group_apply(
        partials, "h", per_bucket_dups, materialize_input=True
    )

    t = collect_table(dup_hashes.select_columns(["h"]))
    keys = (
        t["h"].to_numpy(zero_copy_only=False)
        if t.num_rows
        else np.empty(0, dtype=np.int64)
    )

    # broadcast the dup-hash set once (ray.put; workers fetch once via
    # cached_get): exact sorted-int64 semi-join below bloom_limit keys,
    # Bloom prefilter above it — FPs die at the downstream group verify
    import ray

    exact = len(keys) <= bloom_limit
    if exact:
        ref = ray.put(np.sort(keys))
    else:
        from doppel_ray.functions.sketch import BloomFilter

        bf = BloomFilter(len(keys))
        bf.add_hashes(keys.view(np.uint64))
        ref = ray.put(bf)
    return ref, exact


def remove_dup_spans(
    ds: Dataset,
    *,
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bloom_limit: int = BLOOM_PREFILTER_LIMIT,
    broadcast_limit: int = REBUILD_BROADCAST_LIMIT,
    num_buckets: int = 64,
    verify: str = "hash128",
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
       (shuffle volume bounded by duplicated windows, never the corpus).
    2. ONE bucketed shuffle resolves per-window min keys at C speed —
       on the 128-bit (h1, h2) hash pair by default, on the window
       STRING with ``verify="string"`` (see `removal_pairs` for the
       tradeoff: ~3x shuffle bytes + pandas string groupby vs a
       quantified ~2^-128-per-pair false-merge bound); non-first
       occurrences emit narrow ``(doc_id, pos)`` int64 pairs — 16 B
       each, bounded by duplicated token volume (~3% of tokens on web
       corpora per Lee et al.).
    3. Rebuild: below ``broadcast_limit`` pairs, the sorted pair arrays
       broadcast once (``ray.put`` + per-worker `cached_get`) and one
       ``map_batches`` rewrites docs in place — unaffected docs take the
       vectorized normalized string, only affected docs materialize
       Python tokens. Above it, a tagged-union bucketed join on
       ``id_col`` co-locates each doc with its pairs (payload shuffles
       once; the pair side is narrow).
    """
    pairs = removal_pairs(
        ds, window=window, text_col=text_col, id_col=id_col,
        bloom_limit=bloom_limit, num_buckets=num_buckets, verify=verify,
    ).materialize()
    return rebuild_from_pairs(
        ds, pairs, window=window, text_col=text_col, id_col=id_col,
        broadcast_limit=broadcast_limit, num_buckets=num_buckets,
        n_pairs=pairs.count(),
    )


def removal_pairs(
    ds: Dataset,
    *,
    window: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bloom_limit: int = BLOOM_PREFILTER_LIMIT,
    num_buckets: int = 64,
    verify: str = "hash128",
) -> Dataset:
    """Narrow ``(doc_id, pos)`` removal-pair relation: every non-first
    occurrence of a duplicated n-token window. Bounded by
    duplicated-token volume, never the corpus — the checkpointable
    artifact of span removal (pipelines/job.run_span_removal_job
    stage 1).

    ``verify`` picks the group key for the one wide shuffle:

    - ``"hash128"`` (default): occurrences ship as FOUR int64s —
      (h1, h2, doc, pos), two INDEPENDENT 64-bit rolling hashes
      (different per-token values via a splitmix64 bijection AND a
      different polynomial base) — and group on the 128-bit pair.
      ~3x fewer shuffle bytes than window strings and a pure-numpy
      in-bucket kernel (measured 12.3 s -> ~2 s on the 200k dup-heavy
      bench corpus). A false merge needs a joint (h1, h2) collision:
      P <= D^2/2^129 — at D = 10^15 candidate occurrences (a 10^12-doc
      corpus) that is ~1.5e-9 for the WHOLE corpus, and the damage is
      bounded: one spurious ``window``-token excision, no cascade.
    - ``"string"``: group on the window STRING — exact (collisions
      cannot mark a span), at the cost of shuffling the duplicated
      window text; the semantics `dup_token_windows` always uses.
    """
    from doppel_ray.stages.exact import bucketed_group_apply

    if verify == "string":
        survivors = _dup_window_occurrences(
            ds, window=window, text_col=text_col, id_col=id_col,
            bloom_limit=bloom_limit,
        )
        return bucketed_group_apply(
            survivors, "win_text", _per_bucket_removal_pairs,
            num_buckets=num_buckets, materialize_input=True,
        )
    if verify != "hash128":
        raise ValueError(f"verify must be 'hash128' or 'string', got {verify!r}")
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")

    narrow = ds.select_columns([id_col, text_col])
    ref, is_exact = _dup_hash_broadcast(
        narrow, window=window, text_col=text_col, bloom_limit=bloom_limit
    )
    surv = narrow.map_batches(
        _make_pair_survivor_fn(text_col, id_col, window, ref, is_exact),
        batch_format="pyarrow",
    )
    return bucketed_group_apply(
        surv, "h1", _per_bucket_pairs_hash128,
        num_buckets=num_buckets, materialize_input=True,
    )


def _make_pair_survivor_fn(text_col, id_col, window, ref, exact: bool):
    """Hash-mode survivor emitter: (h1, h2, doc_id, pos) int64 rows for
    every window whose h1 is in the broadcast dup-hash set — fixed-width
    and string-free (the `verify="hash128"` fast path)."""

    def fn(batch: pa.Table) -> pa.Table:
        from doppel_ray.stages.util import cached_get

        out_schema = pa.schema(
            [
                ("h1", pa.int64()),
                ("h2", pa.int64()),
                ("doc_id", pa.int64()),
                ("pos", pa.int64()),
            ]
        )
        flat, counts = _flat_tokens(batch[text_col])
        starts, h1, h2, doc_idx = _ngram_hash_pairs(flat, counts, window)
        if len(starts) == 0:
            return out_schema.empty_table()
        obj = cached_get(ref)
        v = h1.view(np.int64)
        if exact:
            if len(obj) == 0:
                return out_schema.empty_table()
            pos_ = np.searchsorted(obj, v)
            pos_[pos_ == len(obj)] = 0
            hit = obj[pos_] == v
        else:
            hit = obj.contains_hashes(h1)
        starts, doc_idx = starts[hit], doc_idx[hit]
        if len(starts) == 0:
            return out_schema.empty_table()
        h1, h2 = h1[hit], h2[hit]
        doc_start = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=doc_start[1:])
        pos = starts - doc_start[doc_idx]
        ids = batch[id_col].to_numpy(zero_copy_only=False)[doc_idx]
        return pa.table(
            {
                "h1": pa.array(h1.view(np.int64), type=pa.int64()),
                "h2": pa.array(h2.view(np.int64), type=pa.int64()),
                "doc_id": pa.array(ids, type=pa.int64()),
                "pos": pa.array(pos, type=pa.int64()),
            }
        )

    return fn


def _per_bucket_pairs_hash128(t: pa.Table) -> pa.Table:
    """Within one h1 bucket: one 4-key lexsort puts each (h1, h2) group
    contiguous with its min-(doc, pos) occurrence first; every non-first
    row is a removal pair (singleton groups — h1-count false positives
    or distinct-h2 splits — keep their only row). Pure numpy, no
    strings, no pandas."""
    n = t.num_rows
    if n == 0:
        return pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "pos": pa.array([], type=pa.int64()),
            }
        )
    h1 = t["h1"].to_numpy(zero_copy_only=False)
    h2 = t["h2"].to_numpy(zero_copy_only=False)
    d = t["doc_id"].to_numpy(zero_copy_only=False)
    p = t["pos"].to_numpy(zero_copy_only=False)
    o = np.lexsort((p, d, h2, h1))
    h1s, h2s = h1[o], h2[o]
    first = np.empty(n, dtype=bool)
    first[0] = True
    np.logical_or(
        h1s[1:] != h1s[:-1], h2s[1:] != h2s[:-1], out=first[1:]
    )
    rem = o[~first]
    return pa.table(
        {
            "doc_id": pa.array(d[rem], type=pa.int64()),
            "pos": pa.array(p[rem], type=pa.int64()),
        }
    )


def _ngram_hash_pairs(
    flat, counts: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """The decontam rolling kernel (stages/decontam._ngram_hashes: one
    vocabulary sip64 + scatter-by-code + Horner roll) extended with a
    SECOND independent 64-bit roll: h2 rolls splitmix64-mixed per-token
    values with a different base, so a joint (h1, h2) collision for
    distinct windows needs either a vocabulary-level sip64 collision or
    a simultaneous 2^-128 double-roll collision. h1 is bit-identical to
    `_ngram_hashes` (the broadcast dup-hash set is built from it).

    Returns (window starts into ``flat``, h1, h2, doc index per window).
    """
    from doppel_ray.functions.hashing import sip64

    total = len(flat)
    if total < n:
        e = np.empty(0, dtype=np.int64)
        u = e.view(np.uint64)
        return e, u, u, e
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = enc.dictionary.to_pandas().astype(object)
    tv = sip64(uniq).astype(np.uint64)
    with np.errstate(over="ignore"):
        tv2 = tv * _MIX_MUL
    tv2 ^= tv2 >> np.uint64(31)
    th, th2 = tv[codes], tv2[codes]
    m = total - n + 1
    h1 = th[:m].copy()
    h2 = th2[:m].copy()
    with np.errstate(over="ignore"):
        for j in range(1, n):
            h1 = h1 * _POLY_B + th[j : m + j]
            h2 = h2 * _POLY_B2 + th2[j : m + j]
    valid = doc_idx[:m] == doc_idx[n - 1 : n - 1 + m]
    starts = np.nonzero(valid)[0]
    return starts, h1[valid], h2[valid], doc_idx[starts]


def _per_bucket_removal_pairs(t: pa.Table) -> pa.Table:
    """Within one win_text bucket: string-verify (count > 1) and emit the
    non-first occurrences as decoded ``(doc_id, pos)`` int64 pairs."""
    df = t.to_pandas()
    g = df.groupby("win_text")["key"]
    dup = (g.transform("size") > 1).to_numpy()
    nonfirst = (df["key"] != g.transform("min")).to_numpy()
    rem = df.loc[dup & nonfirst, "key"]
    return pa.table(
        {
            "doc_id": pa.array(
                rem.str.slice(0, 19).astype(np.int64), type=pa.int64()
            ),
            "pos": pa.array(
                rem.str.slice(20).astype(np.int64), type=pa.int64()
            ),
        }
    )


def rebuild_from_pairs(
    ds: Dataset,
    pairs: Dataset,
    *,
    window: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_limit: int = REBUILD_BROADCAST_LIMIT,
    num_buckets: int = 64,
    n_pairs: int | None = None,
) -> Dataset:
    """Rewrite docs against a ``(doc_id, pos)`` removal-pair relation —
    the regime-switched rebuild shared by `remove_dup_spans` and the
    checkpointed job (which resumes ``pairs`` from Parquet): below
    ``broadcast_limit`` pairs the sorted arrays broadcast once, above it
    a tagged-union bucketed join on ``id_col`` co-locates each doc with
    its pairs (payload shuffles once; the pair side is narrow). Pass
    ``n_pairs`` when already known (e.g. a checkpoint manifest row
    count) to skip the count."""
    from doppel_ray.stages.exact import bucketed_group_apply

    if n_pairs is None:
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
    """Rewrite each doc with its removal windows excised — fully
    vectorized (a per-affected-doc Python join loop measured 92 s on the
    200k dup-heavy bench corpus where most docs are affected): one
    global keep mask over the flat token array, one filtered ListArray,
    one Arrow ``binary_join``. ``pair_doc`` MUST be sorted (pairs for
    docs outside this table are ignored, so the broadcast regime can
    ship one global array)."""
    ids = doc_tbl[id_col].to_numpy(zero_copy_only=False)
    flat, counts = _flat_tokens(doc_tbl[text_col])
    doc_start = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=doc_start[1:])
    total = int(counts.sum())

    lo = np.searchsorted(pair_doc, ids, side="left")
    hi = np.searchsorted(pair_doc, ids, side="right")
    n_pairs_per_row = hi - lo
    keep = np.ones(total, dtype=bool)
    n_removed = np.zeros(len(ids), dtype=np.int64)
    affected = np.flatnonzero(n_pairs_per_row > 0)
    if len(affected):
        # gather this table's pairs: row index + global window start
        rows = np.repeat(affected, n_pairs_per_row[affected])
        take = np.concatenate(
            [np.arange(lo[r], hi[r]) for r in affected]
        )
        rel = pair_pos[take]
        out_of_range = (rel < 0) | (rel + window > counts[rows])
        if np.any(out_of_range):
            bad = rows[np.argmax(out_of_range)]
            raise ValueError(
                f"removal window out of range for doc {ids[bad]} "
                "(tokenization mismatch between passes)"
            )
        gstart = doc_start[rows] + rel
        cover = (gstart[:, None] + np.arange(window, dtype=np.int64)).ravel()
        keep[cover] = False
        removed_idx = np.flatnonzero(~keep)
        row_of = np.searchsorted(doc_start, removed_idx, side="right") - 1
        n_removed = np.bincount(row_of, minlength=len(ids)).astype(np.int64)

    kept_counts = counts - n_removed
    offsets = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(kept_counts, out=offsets[1:])
    kept = flat.filter(pa.array(keep))
    texts = _list_join(kept, offsets)

    return pa.table(
        {
            id_col: pa.array(ids, type=pa.int64()),
            text_col: texts.cast(pa.string()),
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
        if len(ids) and (int(ids.min()) < 0 or int(pos.max()) >= 10**7):
            raise ValueError(
                "doc ids must be non-negative and token positions < 1e7 "
                "for the zero-padded (doc, pos) first-occurrence key"
            )
        # survivor window strings fully vectorized: gather the window
        # tokens into a ListArray and let Arrow's C binary_join build
        # them (a per-window Python " ".join was the measured hot spot
        # on dup-heavy corpora: 92 s -> see module history)
        wins = _join_windows(flat, starts, window)
        key = _doc_pos_keys(ids, pos)
        return pa.table(
            {
                "win_text": wins,
                "key": pa.array(key, type=pa.string()),
            }
        )

    return fn


def _join_windows(flat: pa.Array, starts: np.ndarray, window: int) -> pa.Array:
    """Space-joined window strings, vectorized: one fancy-index gather +
    one Arrow ``binary_join`` over a synthetic ListArray."""
    idx = (starts[:, None] + np.arange(window, dtype=np.int64)).ravel()
    toks = flat.take(pa.array(idx, type=pa.int64()))
    offsets = np.arange(
        0, (len(starts) + 1) * window, window, dtype=np.int64
    )
    return _list_join(toks, offsets)


def _list_join(values: pa.Array, offsets: np.ndarray) -> pa.Array:
    """binary_join with the kernel-matching list family: Arrow only
    ships (list<string>, string) and (large_list<large_string>,
    large_string) kernels."""
    if pa.types.is_large_string(values.type):
        lists = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), values
        )
        return pc.binary_join(lists, pa.scalar(" ", type=pa.large_string()))
    lists = pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32), type=pa.int32()), values
    )
    return pc.binary_join(lists, " ")


def _doc_pos_keys(ids: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Zero-padded ``doc:pos`` sort keys at C speed (np.char kernels)."""
    return np.char.add(
        np.char.add(
            np.char.zfill(ids.astype(np.int64).astype("U"), 19),
            np.array(":", dtype="U1"),
        ),
        np.char.zfill(pos.astype(np.int64).astype("U"), 7),
    ).astype(object)
