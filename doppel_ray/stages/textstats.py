"""Text-analysis Ray Data stages: quality columns, language ID, and
document fingerprints as zero-copy Arrow ``map_batches`` transforms."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from doppel_ray.functions import analysis as A


def add_quality_columns(
    ds: Dataset, text_col: str = "text", batch_size: int = 4096
) -> Dataset:
    """Append n_chars/n_bytes/n_tokens/n_punct/punct_ratio/mean_token_len/
    stopword_ratio/quality columns (all vectorized RE2/numpy)."""

    def fn(batch: pa.Table) -> pa.Table:
        feats = A.quality_features(batch[text_col])
        feats["quality"] = A.quality_score(feats)
        for name, arr in feats.items():
            if name in batch.column_names:
                batch = batch.drop_columns([name])
            batch = batch.append_column(name, pa.array(arr))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def add_lang_id(
    ds: Dataset,
    text_col: str = "text",
    out_col: str = "lang_pred",
    batch_size: int = 4096,
) -> Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        pred = A.lang_id(batch[text_col])
        if out_col in batch.column_names:
            batch = batch.drop_columns([out_col])
        return batch.append_column(out_col, pa.array(pred, type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def add_fingerprints(
    ds: Dataset,
    text_col: str = "text",
    out_col: str = "fingerprint",
    w: int = 16,
    batch_size: int = 4096,
) -> Dataset:
    """Winnowing-style min-window-hash fingerprint column (int64 view)."""

    def fn(batch: pa.Table) -> pa.Table:
        fp = A.doc_fingerprints(batch[text_col], w=w).view(np.int64)
        if out_col in batch.column_names:
            batch = batch.drop_columns([out_col])
        return batch.append_column(out_col, pa.array(fp, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def repetition_features(
    texts: pa.Array | pa.ChunkedArray, n: int = 2
) -> dict[str, np.ndarray]:
    """Gopher-style repetition quality signals per document (Rae et al.
    2021 §A1.1 repetition rules, token-count variant):

    * ``dup_{n}gram_frac`` — fraction of the doc's n-gram occurrences
      whose n-gram appears more than once in the doc;
    * ``top_{n}gram_frac`` — occurrence share of the most frequent
      n-gram.

    Fully vectorized and EXACT: token ids come from one ``pd.factorize``
    pass (no hashing, so no collision caveat — per-doc n-gram identity
    is the integer code tuple), occurrence counting is one sort-based
    ``np.unique`` over (doc, gram-key) pairs, and per-doc aggregation is
    bincount / segment-reduce. Docs with fewer than ``n`` tokens have no
    n-grams: mask=False, fractions 0 (the SQL oracle emits no row for
    them — callers filter on ``has_ngrams``).
    """
    from doppel_ray.stages.decontam import _flat_tokens

    flat, counts = _flat_tokens(texts)
    ndocs = len(counts)
    out = {
        f"dup_{n}gram_frac": np.zeros(ndocs),
        f"top_{n}gram_frac": np.zeros(ndocs),
        "has_ngrams": np.zeros(ndocs, dtype=bool),
    }
    total = len(flat)
    if total < n:
        return out
    # Arrow-native factorize (decontam._flat_tokens now returns an Arrow
    # array — no Python token objects anywhere in this path)
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    V = np.int64(len(enc.dictionary))
    doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
    m = total - n + 1
    # exact n-gram key: base-V positional code (int64; V^n * ndocs can
    # overflow for huge vocab x n — guard with the pair-struct fallback)
    valid = doc_idx[:m] == doc_idx[n - 1 : n - 1 + m]
    win_doc = doc_idx[:m][valid]
    if not len(win_doc):
        return out
    fits = V > 0 and float(V) ** n < 2**62
    if fits:
        key = codes[:m].copy()
        for j in range(1, n):
            key = key * V + codes[j : m + j]
        key = key[valid]
        pairs = np.empty(len(key), dtype=[("d", "i8"), ("g", "i8")])
        pairs["d"], pairs["g"] = win_doc, key
    else:  # exact fallback: struct of raw code columns
        fields = [("d", "i8")] + [(f"c{j}", "i8") for j in range(n)]
        pairs = np.empty(len(win_doc), dtype=fields)
        pairs["d"] = win_doc
        for j in range(n):
            pairs[f"c{j}"] = codes[j : m + j][valid]
    uq, cnt = np.unique(pairs, return_counts=True)
    d = uq["d"]
    tot = np.bincount(win_doc, minlength=ndocs).astype(np.float64)
    dup = np.bincount(d, weights=cnt * (cnt > 1), minlength=ndocs)
    # segment max of cnt per doc (uq is sorted with d as primary key)
    seg_starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
    mx_per_seg = np.maximum.reduceat(cnt, seg_starts)
    mx = np.zeros(ndocs)
    mx[d[seg_starts]] = mx_per_seg
    has = tot > 0
    safe_tot = np.where(has, tot, 1.0)
    out[f"dup_{n}gram_frac"] = dup / safe_tot
    out[f"top_{n}gram_frac"] = mx / safe_tot
    out["has_ngrams"] = has
    return out


def add_repetition_columns(
    ds: Dataset, text_col: str = "text", n: int = 2, batch_size: int = 4096
) -> Dataset:
    """Append the Gopher repetition-signal columns (one map_batches)."""

    def fn(batch: pa.Table) -> pa.Table:
        feats = repetition_features(batch[text_col], n=n)
        for name, arr in feats.items():
            if name in batch.column_names:
                batch = batch.drop_columns([name])
            batch = batch.append_column(name, pa.array(arr))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def chunk_documents(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    stride: int | None = None,
    drop_final_partial: bool = False,
) -> Dataset:
    """Split documents into fixed-token-count training chunks (context-
    window packing): one output row per window of ``chunk_tokens``
    whitespace tokens, advancing by ``stride`` (default = chunk_tokens,
    i.e. non-overlapping). The final short window is kept unless
    ``drop_final_partial``; empty docs yield no rows.

    Chunk text is the tokens re-joined with single spaces — original
    whitespace runs are NOT preserved inside chunks (chunking is a
    training-side transform; the corpus ``text`` column itself always
    passes through byte-identical per the north-rule invariant). The
    rule is shared verbatim with the SQL oracle
    (``array_to_string(tk[i:j], ' ')``).

    One ``map_batches`` pass, row expansion only — no shuffle at any
    corpus width. Token extraction is the shared C-regex pass
    (decontam._flat_tokens).
    """
    stride = stride or chunk_tokens
    if chunk_tokens < 1 or stride < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")

    from doppel_ray.stages.decontam import _flat_tokens

    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np

        flat, counts = _flat_tokens(batch[text_col])
        # chunk text must materialize anyway; one bulk conversion
        flat = flat.to_pylist()
        ids = batch[id_col]
        rows_id, rows_ci, rows_nt, rows_tx = [], [], [], []
        base = 0
        for r in range(batch.num_rows):
            n = int(counts[r])
            start = 0
            ci = 0
            while start < n:
                end = min(start + chunk_tokens, n)
                if end - start < chunk_tokens and drop_final_partial and ci > 0:
                    break
                rows_id.append(r)
                rows_ci.append(ci)
                rows_nt.append(end - start)
                rows_tx.append(" ".join(flat[base + start : base + end]))
                if end == n:
                    break
                start += stride
                ci += 1
            base += n
        return pa.table(
            {
                id_col: ids.take(pa.array(rows_id, type=pa.int64())),
                "chunk_idx": pa.array(rows_ci, type=pa.int64()),
                "n_tokens": pa.array(rows_nt, type=pa.int64()),
                "chunk_text": pa.array(rows_tx, type=pa.string()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow"
    )


def add_compression_signal(
    ds: Dataset, *, text_col: str = "text", level: int = 6
) -> Dataset:
    """Per-doc zlib compression signal: ``raw_len`` / ``comp_len`` UTF-8
    byte lengths — the classic cheap gibberish/boilerplate detector
    (natural text compresses to ~30-50%; repeated spam compresses far
    more, random junk barely at all). Appended as integer columns so
    downstream filters threshold on the exact ratio ``comp_len * 100 //
    raw_len`` with no float drift.

    Pure map stage, zero shuffles; zlib runs once per row at C speed on
    the encoded buffer (the per-row Python is the loop driving a C
    call, not per-character work)."""
    import zlib

    def fn(batch: pa.Table) -> pa.Table:
        raw = [t.encode() if t is not None else b"" for t in batch[text_col].to_pylist()]
        comp = [len(zlib.compress(b, level)) for b in raw]
        return batch.append_column(
            "raw_len", pa.array([len(b) for b in raw], type=pa.int64())
        ).append_column("comp_len", pa.array(comp, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")


#: Gopher document-quality rule constants (Rae et al. 2021, A1.1) —
#: shared with the SQL oracle; comparisons are kept ALL-INTEGER
#: (3*n <= chars <= 10*n instead of a float mean) so flags hash-match
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MWL10 = 3   # mean word length >= 3  <=> chars >= 3*n
GOPHER_MAX_MWL10 = 10  # mean word length <= 10 <=> chars <= 10*n
GOPHER_ALPHA_NUM = 8   # >= 80% words contain an alphabetic char
GOPHER_ALPHA_DEN = 10
GOPHER_MIN_STOPWORDS = 2


def gopher_quality_flags(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Gopher document-level quality rules (Rae et al. 2021, A1.1 —
    the canonical pre-training filter set; the repetition signals from
    the same appendix live in `repetition_features`): word-count window,
    mean-word-length window, alphabetic-word fraction, and a stopword
    floor, each emitted as its own audit column plus the combined
    ``keep``. One vectorized ``map_batches`` over the shared tokenizer —
    zero shuffles, corpus-width independent; every comparison is integer
    arithmetic so the flags are layout-invariant and SQL-recomputable.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from doppel_ray.stages.decontam import _flat_tokens

    stop_set = pa.array(sorted(GOPHER_STOPWORDS), type=pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        flat, counts = _flat_tokens(batch[text_col])
        n = len(counts)
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        seg = np.concatenate((starts, [int(counts.sum())]))

        def seg_sum(vals: np.ndarray) -> np.ndarray:
            out = np.zeros(n, dtype=np.int64)
            if len(vals):
                cs = np.concatenate(([0], np.cumsum(vals, dtype=np.int64)))
                out = cs[seg[1:]] - cs[seg[:-1]]
            return out

        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(
            zero_copy_only=False
        )
        stop = pc.is_in(flat, value_set=stop_set).to_numpy(
            zero_copy_only=False
        )
        n_words = counts.astype(np.int64)
        n_chars = seg_sum(lens.astype(np.int64))
        n_alpha = seg_sum(alpha.astype(np.int64))
        n_stop = seg_sum(stop.astype(np.int64))

        ok_words = (n_words >= GOPHER_MIN_WORDS) & (
            n_words <= GOPHER_MAX_WORDS
        )
        ok_mwl = (n_chars >= GOPHER_MIN_MWL10 * n_words) & (
            n_chars <= GOPHER_MAX_MWL10 * n_words
        )
        ok_alpha = GOPHER_ALPHA_DEN * n_alpha >= GOPHER_ALPHA_NUM * n_words
        ok_stop = n_stop >= GOPHER_MIN_STOPWORDS
        keep = ok_words & ok_mwl & ok_alpha & ok_stop
        return pa.table(
            {
                id_col: batch[id_col],
                "n_words": pa.array(n_words, type=pa.int64()),
                "n_word_chars": pa.array(n_chars, type=pa.int64()),
                "n_alpha_words": pa.array(n_alpha, type=pa.int64()),
                "n_stopwords": pa.array(n_stop, type=pa.int64()),
                "keep": pa.array(keep),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow"
    )
