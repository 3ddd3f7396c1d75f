"""Feature-hashed linear text classifier scoring (the fastText-style
quality-filter shape: CCNet/FineWeb score every page with a hashed
bag-of-words linear model and keep by threshold). The model is an
int64 fixed-point weight vector indexed by ``hash(token) % dim`` —
all-integer scores, so results are bit-identical at any block layout
and SQL-recomputable (the DECIMAL/float-sum pitfalls never arise).

Scale shape
-----------
The weight vector is broadcast ONCE via ``ray.put`` (a real fastText
dim of 2M buckets is ~16 MB — per-actor fetch, never per-batch) and
scoring is an actor-pool ``map_batches``: tokenize with the shared
all-Arrow ``_flat_tokens`` kernel, md5-low64 token hash (cached on
unique tokens — corpus text is highly repetitive), one ``bincount``
-free segmented gather-sum per doc. Zero shuffles; corpus-width
independent.

Cross-engine contract: the token hash is DuckDB's
``md5_number_upper`` (functions.text.md5_token_hash64), so an oracle
recomputes scores exactly with ``unnest(regexp_extract_all(...))`` +
the same modular weight formula.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from doppel_ray.functions.text import md5_token_hash64
from doppel_ray.stages.decontam import _flat_tokens


def derived_weights(dim: int, *, mul: int = 2654435761, span: int = 2001) -> np.ndarray:
    """Deterministic demo weight vector: w[b] = (b*mul) % span - span//2.
    Stands in for trained weights in fixtures; int64, zero-mean-ish."""
    b = np.arange(dim, dtype=np.uint64)
    return ((b * np.uint64(mul)) % np.uint64(span)).astype(np.int64) - span // 2


class HashedLinearScorer:
    """Actor-pool callable: fetch the broadcast weight vector once per
    actor, score batches vectorized. ``weights_ref`` may be a plain
    ndarray (tests) or a ``ray.ObjectRef`` (pipelines)."""

    def __init__(
        self,
        weights_ref,
        *,
        text_col: str = "text",
        bias: int = 0,
        out_col: str = "score",
        label_col: str = "keep",
    ) -> None:
        w = (
            ray.get(weights_ref)
            if isinstance(weights_ref, ray.ObjectRef)
            else weights_ref
        )
        self.w = np.ascontiguousarray(w, dtype=np.int64)
        self.dim = np.uint64(len(self.w))
        self.text_col = text_col
        self.bias = int(bias)
        self.out_col = out_col
        self.label_col = label_col
        # cross-BATCH token->weight memo (the bpe.py Zipf-memo idiom):
        # corpus tokens repeat heavily across batches, so after the
        # first batches the per-token md5 loop only runs on the vocab
        # tail. Epoch-cleared at _MEMO_CAP to bound actor memory.
        self._memo: dict[str, int] = {}

    _MEMO_CAP = 1_000_000

    def _token_weights(self, uniq: np.ndarray) -> np.ndarray:
        memo = self._memo
        missing = [t for t in uniq if t not in memo]
        if missing:
            if len(memo) + len(missing) > self._MEMO_CAP:
                memo.clear()
            h = md5_token_hash64(np.asarray(missing, dtype=object))
            ws = self.w[(h % self.dim).astype(np.int64)]
            memo.update(zip(missing, ws.tolist()))
        return np.fromiter(
            (memo[t] for t in uniq), dtype=np.int64, count=len(uniq)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat, counts = _flat_tokens(batch[self.text_col])
        tw = np.zeros(0, dtype=np.int64)
        if len(flat):
            # vocab extraction via Arrow's C++ hash (dictionary_encode),
            # NOT np.unique — unique SORTS the object-string array and
            # was the measured hot spot (1.3 s vs 0.007 s md5 per 6k
            # docs); codes gather the per-vocab weights back out
            enc = pc.dictionary_encode(flat)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            vocab = np.asarray(
                enc.dictionary.to_numpy(zero_copy_only=False)
            )
            tw = self._token_weights(vocab)[codes]
        ends = np.cumsum(counts)
        starts = ends - counts
        csum = np.concatenate([[0], np.cumsum(tw)])
        scores = csum[ends] - csum[starts]
        cols = {n: batch[n] for n in batch.column_names}
        cols[self.out_col] = pa.array(scores, type=pa.int64())
        cols[self.label_col] = pa.array(scores >= self.bias)
        return pa.table(cols)


def score_documents(
    ds: Dataset,
    weights: np.ndarray,
    *,
    text_col: str = "text",
    bias: int = 0,
    concurrency: int | tuple[int, int] | None = None,
) -> Dataset:
    """Score every row with the hashed linear model; adds int64
    ``score`` and bool ``keep`` columns. Autoscaling actor pool by
    default (same rationale as lm.score_perplexity)."""
    ref = ray.put(np.ascontiguousarray(weights, dtype=np.int64))
    return ds.map_batches(
        HashedLinearScorer,
        fn_constructor_kwargs={
            "weights_ref": ref,
            "text_col": text_col,
            "bias": bias,
        },
        batch_format="pyarrow",
        concurrency=concurrency or (1, 4),
    )


def weight_sql(bucket_expr: str, *, mul: int = 2654435761, span: int = 2001) -> str:
    """DuckDB expression for ``derived_weights`` at a bucket expr."""
    return f"((({bucket_expr}) * {mul}) % {span} - {span // 2})"
