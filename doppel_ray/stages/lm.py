"""N-gram language-model perplexity scoring — the CCNet-style quality
signal (Wenzek et al. 2020): train a small interpolated bigram LM on
the corpus (or a curated slice of it), then score every document by
perplexity; low-perplexity ≈ fluent prose, high ≈ gibberish/boilerplate
soup. The reference (doppel) has no text ops; this is part of the
LLM-training-data operator surface.

Ray-Data design
---------------
Training produces a BOUNDED model no matter the corpus width:

1. Unigram pass: shared RE2-parity tokenizer (decontam._flat_tokens)
   with per-batch pre-aggregation, one narrow ``(word, freq)``
   groupby-sum — identical shape to bpe.word_freqs. The vocabulary is
   then the top ``vocab_size`` words (ties broken (freq DESC, word
   ASC), so layout-invariant); everything else maps to ``<unk>``.
2. Bigram pass: the vocab id-map is broadcast ONCE via ``ray.put``;
   each batch maps tokens to ids vectorized (np.searchsorted on the
   sorted vocab), packs adjacent pairs into one int64 key
   (``id1 * (V+1) + id2``), pre-aggregates, and one narrow
   ``(pair_key, cnt)`` groupby-sum follows. The pair table is capped
   at ``max_bigrams`` by (cnt DESC, key ASC) — the model stays
   broadcastable at any corpus size.

Scoring is a stateful actor pool: the model ObjectRef is fetched once
per actor in ``__init__`` (zero-copy numpy views out of the object
store); each batch scores fully vectorized — id-mapping via
searchsorted, unigram log-probs by array indexing, bigram counts by
searchsorted on the sorted pair-key array, per-doc reduction with
``np.add.reduceat``. No per-token Python in the hot path.

Probability model (deterministic, pinned in tests vs a brute-force
reference): unigram is add-k smoothed over the V+1 (vocab + <unk>)
alphabet; token probability is the interpolation
``lam * p_bigram_MLE(w | prev) + (1 - lam) * p_unigram(w)`` (first
token of a doc has no context: unigram only). Perplexity is
``exp(-mean(log p))`` over the doc's tokens; empty docs score null.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

UNK = "<unk>"


def _unigram_counts(ds: Dataset, *, text_col: str, lowercase: bool) -> Dataset:
    """(word, freq) over the corpus — one narrow shuffle (bpe.word_freqs
    shape, re-declared here so the two stages stay independently
    tunable)."""
    import pyarrow.compute as pc

    from doppel_ray.stages.decontam import _flat_tokens

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if lowercase:
            texts = pc.utf8_lower(texts)
        flat, _ = _flat_tokens(texts)
        if len(flat) == 0:
            return pa.schema(
                [("word", pa.string()), ("freq", pa.int64())]
            ).empty_table()
        s = pd.Series(flat.to_pandas()).value_counts()
        return pa.table(
            {
                "word": pa.array(s.index.to_numpy(dtype=object), type=pa.string()),
                "freq": pa.array(s.to_numpy(dtype=np.int64), type=pa.int64()),
            }
        )

    return (
        ds.select_columns([text_col])
        .map_batches(fn, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("freq", alias_name="freq"))
    )


def _ids_for(tokens: pa.Array, vocab_sorted: np.ndarray, unk_id: int) -> np.ndarray:
    """Vectorized token -> id against the SORTED vocab array; misses map
    to ``unk_id``."""
    toks = tokens.to_numpy(zero_copy_only=False).astype(object)
    idx = np.searchsorted(vocab_sorted, toks)
    idx_c = np.clip(idx, 0, len(vocab_sorted) - 1)
    hit = vocab_sorted[idx_c] == toks
    return np.where(hit, idx_c, unk_id).astype(np.int64)


def train_bigram_lm(
    ds: Dataset,
    *,
    text_col: str = "text",
    vocab_size: int = 50_000,
    max_bigrams: int = 2_000_000,
    lowercase: bool = True,
) -> dict:
    """Train the bounded interpolated-bigram model; returns a plain dict
    (numpy arrays) suitable for ``ray.put`` broadcast:

    ``vocab_sorted``  sorted word array (ids = positions; <unk> = V)
    ``uni_counts``    int64[V+1] unigram counts (unk bucket = all OOV mass)
    ``total_tokens``  int
    ``pair_keys``     sorted int64 keys ``id1*(V+1)+id2``
    ``pair_counts``   int64 aligned with pair_keys
    """
    if vocab_size < 1 or max_bigrams < 1:
        raise ValueError("vocab_size and max_bigrams must be >= 1")
    uni = _unigram_counts(ds, text_col=text_col, lowercase=lowercase)
    # top-V by (freq DESC, word ASC): deterministic at any layout.
    top = uni.sort(["freq", "word"], descending=[True, False]).limit(vocab_size)
    tdf = top.to_pandas()
    words = tdf["word"].to_numpy(dtype=object)
    freqs = tdf["freq"].to_numpy(dtype=np.int64)
    order = np.argsort(words, kind="stable")
    vocab_sorted = words[order]
    in_vocab_counts = freqs[order]
    V = len(vocab_sorted)
    unk_id = V

    # total corpus tokens + OOV mass: one tiny aggregate over the same
    # word-freq relation (never re-reads the corpus).
    total = uni.aggregate(Sum("freq", alias_name="t"))["t"] or 0
    uni_counts = np.zeros(V + 1, dtype=np.int64)
    uni_counts[:V] = in_vocab_counts
    uni_counts[unk_id] = int(total) - int(in_vocab_counts.sum())

    vocab_ref = ray.put(vocab_sorted)
    stride = V + 1

    import pyarrow.compute as pc

    from doppel_ray.stages.decontam import _flat_tokens

    def pair_partials(batch: pa.Table) -> pa.Table:
        vs = ray.get(vocab_ref)
        texts = batch[text_col]
        if lowercase:
            texts = pc.utf8_lower(texts)
        flat, counts = _flat_tokens(texts)
        empty = pa.schema(
            [("pair_key", pa.int64()), ("cnt", pa.int64())]
        ).empty_table()
        if len(flat) == 0:
            return empty
        ids = _ids_for(flat, vs, unk_id)
        bounds = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        keys = ids[:-1] * stride + ids[1:]
        # mask out pairs that straddle a document boundary (vectorized)
        mask = np.ones(len(ids) - 1, dtype=bool) if len(ids) > 1 else np.zeros(0, bool)
        inner = bounds[1:-1]
        inner = inner[(inner > 0) & (inner < len(ids))]
        mask[inner - 1] = False
        keys = keys[mask]
        if len(keys) == 0:
            return empty
        uk, uc = np.unique(keys, return_counts=True)
        return pa.table(
            {
                "pair_key": pa.array(uk, type=pa.int64()),
                "cnt": pa.array(uc.astype(np.int64), type=pa.int64()),
            }
        )

    pairs = (
        ds.select_columns([text_col])
        .map_batches(pair_partials, batch_format="pyarrow")
        .groupby("pair_key")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .sort(["cnt", "pair_key"], descending=[True, False])
        .limit(max_bigrams)
    )
    pdf = pairs.to_pandas()
    pk = pdf["pair_key"].to_numpy(dtype=np.int64)
    pc_ = pdf["cnt"].to_numpy(dtype=np.int64)
    o = np.argsort(pk, kind="stable")
    return {
        "vocab_sorted": vocab_sorted,
        "uni_counts": uni_counts,
        "total_tokens": int(total),
        "pair_keys": pk[o],
        "pair_counts": pc_[o],
    }


class PerplexityScorer:
    """Actor-pool scorer: model fetched once per actor; per-batch work
    is pure numpy."""

    def __init__(
        self,
        model_ref,
        *,
        text_col: str = "text",
        id_col: str = "doc_id",
        lam: float = 0.7,
        add_k: float = 0.5,
        lowercase: bool = True,
    ):
        m = ray.get(model_ref) if isinstance(model_ref, ray.ObjectRef) else model_ref
        self.vocab_sorted = m["vocab_sorted"]
        self.stride = len(self.vocab_sorted) + 1
        self.unk_id = len(self.vocab_sorted)
        uni = m["uni_counts"].astype(np.float64)
        denom = m["total_tokens"] + add_k * self.stride
        self.log_uni = np.log((uni + add_k) / denom)
        self.p_uni = (uni + add_k) / denom
        self.uni_counts = m["uni_counts"].astype(np.float64)
        self.pair_keys = m["pair_keys"]
        self.pair_counts = m["pair_counts"].astype(np.float64)
        self.lam = lam
        self.text_col = text_col
        self.id_col = id_col
        self.lowercase = lowercase

    def _pair_count(self, keys: np.ndarray) -> np.ndarray:
        if len(self.pair_keys) == 0 or len(keys) == 0:
            return np.zeros(len(keys), dtype=np.float64)
        idx = np.searchsorted(self.pair_keys, keys)
        idx_c = np.clip(idx, 0, len(self.pair_keys) - 1)
        hit = self.pair_keys[idx_c] == keys
        return np.where(hit, self.pair_counts[idx_c], 0.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from doppel_ray.stages.decontam import _flat_tokens

        texts = batch[self.text_col]
        if self.lowercase:
            texts = pc.utf8_lower(texts)
        flat, counts = _flat_tokens(texts)
        n_docs = len(batch)
        n_tok = counts.astype(np.int64)
        if len(flat) == 0:
            ppl = pa.array([None] * n_docs, type=pa.float64())
            return pa.table(
                {
                    self.id_col: batch[self.id_col],
                    "n_tokens": pa.array(n_tok, type=pa.int64()),
                    "ppl": ppl,
                }
            )
        ids = _ids_for(flat, self.vocab_sorted, self.unk_id)
        logp = self.log_uni[ids].copy()  # first-token / fallback term
        if len(ids) > 1:
            keys = ids[:-1] * self.stride + ids[1:]
            bic = self._pair_count(keys)
            prev_uni = self.uni_counts[ids[:-1]]
            with np.errstate(divide="ignore", invalid="ignore"):
                p_bi = np.where(prev_uni > 0, bic / np.maximum(prev_uni, 1), 0.0)
            mix = self.lam * p_bi + (1.0 - self.lam) * self.p_uni[ids[1:]]
            # doc-boundary positions keep their unigram-only score
            bounds = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
            is_cont = np.ones(len(ids), dtype=bool)
            is_cont[bounds[:-1][bounds[:-1] < len(ids)]] = False
            cont_log = np.log(np.maximum(mix, 1e-300))
            logp[1:] = np.where(is_cont[1:], cont_log, logp[1:])
        bounds = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        sums = np.add.reduceat(np.concatenate([logp, [0.0]]), bounds[:-1]) * (
            n_tok > 0
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            ppl_np = np.exp(-sums / np.maximum(n_tok, 1))
        ppl = pa.array(
            [float(p) if t > 0 else None for p, t in zip(ppl_np, n_tok)],
            type=pa.float64(),
        )
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_tokens": pa.array(n_tok, type=pa.int64()),
                "ppl": ppl,
            }
        )


def perplexity_scores(
    ds: Dataset,
    model: dict,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
    add_k: float = 0.5,
    lowercase: bool = True,
    concurrency: int | tuple[int, int] | None = None,
) -> Dataset:
    """Score every doc with the trained model: (id, n_tokens, ppl).
    Model broadcast once; zero shuffles.

    Default concurrency is the AUTOSCALING pool ``(1, 4)``: a fixed
    pool pre-reserves every actor's CPU at pipeline start, which
    deadlocks against upstream blocking operators (a non-shuffle
    ``repartition`` issues split tasks via a blocking ``ray.get`` in
    the scheduling loop — with all CPUs actor-held they never run)."""
    model_ref = ray.put(model)
    return ds.select_columns([id_col, text_col]).map_batches(
        PerplexityScorer,
        fn_constructor_kwargs={
            "model_ref": model_ref,
            "text_col": text_col,
            "id_col": id_col,
            "lam": lam,
            "add_k": add_k,
            "lowercase": lowercase,
        },
        batch_format="pyarrow",
        concurrency=concurrency or (1, 4),
    )
