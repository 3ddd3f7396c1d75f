"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023):
score every raw document by how much more likely its hashed-n-gram
features are under a TARGET distribution (a small high-quality corpus)
than under the RAW distribution, then keep the top-weighted docs. The
standard cheap data-selection step before pretraining.

Model: unigrams + bigrams hashed into ``m`` buckets (sip64, vectorized);
each corpus induces a bag-of-buckets multinomial with Laplace
smoothing. A document's importance log-weight is

    logw(d) = sum_{g in ngrams(d)} [ log p_target(b(g)) - log p_raw(b(g)) ]

Scale shape — two narrow count passes and one zero-shuffle scoring pass:

1. **bucket counts** (target, then raw): one ``map_batches`` bincounts
   each batch's n-gram buckets and emits the NONZERO (bucket, cnt)
   partials — at most ``m`` rows per block; ``groupby(bucket).sum``
   then collects exactly <= ``m`` rows to the driver. Shuffle volume is
   bounded by ``m x blocks``, independent of corpus token count.
2. **log-ratio vector** — computed once on the driver (m float64s),
   broadcast via ``ray.put``.
3. **scoring** — one ``map_batches`` over the raw corpus: hash the
   doc's n-grams, gather the log-ratios, and segment-sum per doc with
   ``np.add.reduceat`` IN DOCUMENT TOKEN ORDER — the summation order is
   a function of the document alone, so scores are bit-identical at any
   cluster size or block layout (tests pin this). No shuffle.

The weight column is a float sum of many terms, so there is no
hash-exact SQL twin (SQL SUM order is unspecified); the driver query is
rows-only and correctness is pinned by a brute-force oracle + the
integer feature counts in tests/test_dsir.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from doppel_ray.functions.hashing import sip64
from doppel_ray.stages.util import cached_get, collect_table

_COUNT_SCHEMA = pa.schema([("bucket", pa.int64()), ("cnt", pa.int64())])

OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_ngrams", pa.int64()),
        ("logweight", pa.float64()),
    ]
)


def _doc_ngram_buckets(
    texts: pa.ChunkedArray | pa.Array, m: int
) -> tuple[np.ndarray, np.ndarray]:
    """(flat bucket ids in per-doc token order, per-doc n-gram counts).

    Features are unigrams plus space-joined bigrams (bigrams never
    cross documents), hashed with sip64 % m. Per-doc layout is
    [u_1..u_k, b_1..b_{k-1}] — a pure function of the document text,
    which is what makes downstream float sums layout-invariant."""
    from doppel_ray.stages.decontam import _flat_tokens

    flat, counts = _flat_tokens(texts)
    counts = np.asarray(counts, dtype=np.int64)
    if len(flat) == 0:
        return np.empty(0, dtype=np.int64), np.zeros(len(counts), dtype=np.int64)
    toks = pd.Series(np.asarray(flat, dtype=object))
    uni = sip64(toks) % np.uint64(m)
    # bigrams: join adjacent tokens within a doc
    ends = np.cumsum(counts)
    starts = ends - counts
    # positions whose successor is in the same doc
    pos = np.arange(len(toks) - 1) if len(toks) > 1 else np.empty(0, np.int64)
    last_of_doc = ends[counts > 0] - 1  # last token index of nonempty docs
    is_last = np.zeros(len(toks), dtype=bool)
    is_last[last_of_doc] = True
    pos = pos[~is_last[:-1]] if len(toks) > 1 else pos
    if len(pos):
        bi = sip64(
            toks.iloc[pos].reset_index(drop=True)
            + " "
            + toks.iloc[pos + 1].reset_index(drop=True)
        ) % np.uint64(m)
    else:
        bi = np.empty(0, dtype=np.uint64)
    n_uni = counts
    n_bi = np.maximum(counts - 1, 0)
    n_feats = n_uni + n_bi
    # interleave per doc: doc i owns uni[starts_i:ends_i] then its bigrams
    out = np.empty(int(n_feats.sum()), dtype=np.int64)
    fe = np.cumsum(n_feats)
    fs = fe - n_feats
    bi_ends = np.cumsum(n_bi)
    bi_starts = bi_ends - n_bi
    # vectorized scatter: indices for unigram segment of each doc
    doc_idx = np.repeat(np.arange(len(counts)), n_uni)
    off_in_doc = np.arange(len(uni)) - np.repeat(starts, n_uni)
    out[fs[doc_idx] + off_in_doc] = uni.astype(np.int64)
    if len(bi):
        doc_idx_b = np.repeat(np.arange(len(counts)), n_bi)
        off_b = np.arange(len(bi)) - np.repeat(bi_starts, n_bi)
        out[fs[doc_idx_b] + n_uni[doc_idx_b] + off_b] = bi.astype(np.int64)
    return out, n_feats


def bucket_counts(
    ds: Dataset, *, m: int = 10_000, text_col: str = "text"
) -> np.ndarray:
    """Corpus-wide n-gram bucket counts as a dense length-m int64 vector."""

    def partial(batch: pa.Table) -> pa.Table:
        buckets, _ = _doc_ngram_buckets(batch[text_col], m)
        if len(buckets) == 0:
            return _COUNT_SCHEMA.empty_table()
        cnt = np.bincount(buckets, minlength=m).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"bucket": pa.array(nz), "cnt": pa.array(cnt[nz])}
        ).cast(_COUNT_SCHEMA)

    t = collect_table(
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("cnt", alias_name="cnt")),
        _COUNT_SCHEMA,
    )
    dense = np.zeros(m, dtype=np.int64)
    if t.num_rows:
        dense[t["bucket"].to_numpy(zero_copy_only=False)] = t[
            "cnt"
        ].to_numpy(zero_copy_only=False)
    return dense


def log_ratio_vector(
    target_counts: np.ndarray, raw_counts: np.ndarray, *, alpha: float = 1.0
) -> np.ndarray:
    """lambda_b = log p_target(b) - log p_raw(b), Laplace-smoothed."""
    m = len(target_counts)
    if len(raw_counts) != m:
        raise ValueError("count vectors must share m")
    pt = (target_counts + alpha) / (target_counts.sum() + alpha * m)
    pr = (raw_counts + alpha) / (raw_counts.sum() + alpha * m)
    return np.log(pt) - np.log(pr)


def dsir_scores(
    raw: Dataset,
    target: Dataset,
    *,
    m: int = 10_000,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Per-raw-doc DSIR importance log-weights: (doc_id, n_ngrams,
    logweight). Docs with zero n-grams score 0.0. Select downstream by
    ``logweight`` threshold or top-k (deterministic tie-break on id)."""
    if m < 2:
        raise ValueError(f"m must be >= 2, got {m}")
    lam = log_ratio_vector(
        bucket_counts(target, m=m, text_col=text_col),
        bucket_counts(raw, m=m, text_col=text_col),
        alpha=alpha,
    )
    ref = ray.put(lam)

    def score(batch: pa.Table) -> pa.Table:
        lam_ = cached_get(ref)
        buckets, n_feats = _doc_ngram_buckets(batch[text_col], m)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.zeros(len(ids), dtype=np.float64)
        nz = n_feats > 0
        if nz.any():
            fe = np.cumsum(n_feats)
            fs = (fe - n_feats)[nz]
            # reduceat sums each doc's gathered lambdas in doc order
            w[nz] = np.add.reduceat(lam_[buckets], fs)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_ngrams": pa.array(n_feats),
                "logweight": pa.array(w),
            },
            schema=OUT_SCHEMA,
        )

    return raw.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow"
    )
