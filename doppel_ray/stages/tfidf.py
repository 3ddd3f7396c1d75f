"""Per-document TF-IDF salient terms — the classic corpus-analysis
signal (most-distinctive terms per document), as a broadcast-scored
Ray Data stage.

Scale shape (the vocab/decontam broadcast regime — ONE narrow shuffle,
then zero-shuffle scoring):

1. **df build** — ``vocab.document_frequency``: distinct-doc frequency
   per token; the collected (token, df) table is bounded by VOCABULARY
   size (Heaps' law), guarded by ``vocab_limit``. idf values are
   computed ONCE on the driver with ``math.log`` (libm) — bit-identical
   to DuckDB's ``ln`` (verified empirically; numpy's SIMD ``np.log``
   differs in the last ulp on ~25% of inputs and would break the
   value-hash oracle).
2. **score** — one ``map_batches`` over the corpus: tokenize
   (stages/decontam.py ``_flat_tokens``), dictionary-encode, count
   (row, code) pairs with one ``np.unique`` (a doc is one row, so tf is
   exact in-batch), look idf up by vocab index, and take each doc's
   top-k by (tfidf DESC, token ASC) with one lexsort. No per-row Python,
   no shuffle — per-doc top-k never leaves the batch.

Determinism: tfidf = tf * ln(N/df) is two correctly-rounded IEEE ops on
the same integers evaluated in the same order as the SQL oracle, and
the token tie-break is binary collation on both sides (UTF-8 memcmp ==
codepoint order), so results hash-match exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from doppel_ray.stages.decontam import _flat_tokens
from doppel_ray.stages.util import cached_get, collect_table
from doppel_ray.stages.vocab import DEFAULT_VOCAB_LIMIT, document_frequency

_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("token", pa.string()),
        ("tf", pa.int64()),
        ("df", pa.int64()),
        ("tfidf", pa.float64()),
    ]
)


def tfidf_top_terms(
    ds: Dataset,
    *,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_docs: int | None = None,
    vocab_limit: int = DEFAULT_VOCAB_LIMIT,
) -> Dataset:
    """Each document's ``k`` highest-tfidf tokens.

    Returns (doc_id, token, tf, df, tfidf) rows, at most ``k`` per doc
    (ties broken by token ascending; docs with no tokens emit nothing).
    ``n_docs`` overrides the corpus size N in idf = ln(N/df) — by
    default it is ``ds.count()`` (ALL documents, token-less included,
    matching ``count(*)`` in SQL). Tokens absent from the df table
    (impossible when scoring the corpus the table was built from) are
    skipped.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    N = int(n_docs) if n_docs is not None else ds.count()
    dft = collect_table(
        document_frequency(ds, text_col=text_col),
        pa.schema([("token", pa.string()), ("df", pa.int64())]),
    )
    if dft.num_rows > vocab_limit:
        raise RuntimeError(
            f"{dft.num_rows} vocab tokens exceed vocab_limit={vocab_limit}; "
            f"the broadcast regime does not fit this corpus"
        )
    df_vals = dft["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    # driver-side idf via libm log: bit-identical to SQL ln (see module
    # docstring); one entry per vocab token, computed once
    idf = np.array([math.log(N / d) for d in df_vals], dtype=np.float64)
    ref = ray.put((dft["token"].combine_chunks(), df_vals, idf))

    kk = int(k)

    def score(batch: pa.Table) -> pa.Table:
        voc_tokens, voc_df, voc_idf = cached_get(ref)
        flat, counts = _flat_tokens(batch[text_col])
        if len(flat) == 0:
            return _OUT_SCHEMA.empty_table()
        enc = pc.dictionary_encode(flat)
        codes = np.asarray(enc.indices, dtype=np.int64)
        dic = enc.dictionary
        ndict = len(dic)
        vi = pc.fill_null(
            pc.index_in(dic, value_set=voc_tokens), -1
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        rows = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        key = rows * np.int64(ndict) + codes
        ukey, tf = np.unique(key, return_counts=True)
        urow, ucode = ukey // ndict, ukey % ndict
        keep = vi[ucode] >= 0
        urow, ucode, tf = urow[keep], ucode[keep], tf[keep].astype(np.int64)
        sc = tf * voc_idf[vi[ucode]]
        # per-doc top-k: one lexsort on (row ASC, score DESC, token ASC)
        tok_rank = np.empty(ndict, dtype=np.int64)
        tok_rank[np.argsort(np.asarray(dic, dtype=object))] = np.arange(ndict)
        order = np.lexsort((tok_rank[ucode], -sc, urow))
        urow, ucode, tf, sc = urow[order], ucode[order], tf[order], sc[order]
        seg_starts = np.flatnonzero(np.r_[True, urow[1:] != urow[:-1]])
        seg_len = np.diff(np.r_[seg_starts, len(urow)])
        within = np.arange(len(urow)) - np.repeat(seg_starts, seg_len)
        top = within < kk
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[urow[top]]),
                "token": dic.take(pa.array(ucode[top])),
                "tf": pa.array(tf[top]),
                "df": pa.array(voc_df[vi[ucode[top]]]),
                "tfidf": pa.array(sc[top], type=pa.float64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow"
    )
