"""Vocabulary-coverage (OOV-rate) scoring — the CCNet-style quality
signal: score each document by the fraction of its tokens that fall
outside a reference vocabulary (tokens appearing in >= ``min_df``
distinct reference documents). High OOV rate flags gibberish, encoding
damage, and out-of-domain text.

Scale shape (the decontam/linededup broadcast regime):

1. **vocab build** — one ``map_batches`` over the REFERENCE corpus
   explodes docs into tokens (the Arrow-native tokenizer shared with
   decontamination — stages/decontam.py ``_flat_tokens``, boundaries
   pinned byte-identical to RE2 ``\\S+``), dedupes (token, doc) pairs
   in-batch (a doc is one row, so in-batch dedupe is globally exact),
   and ships only tokens into a ``groupby(token)`` distinct-doc count.
   The shuffle carries distinct (token, doc) pairs; the collected vocab
   is bounded by VOCABULARY size (Heaps' law — sublinear in corpus
   size), the same bound decontam's benchmark gram set relies on, with
   ``vocab_limit`` guarding the degenerate corpus.
2. **score** — one ``map_batches`` over the target corpus: tokenize,
   one vectorized ``is_in`` against the broadcast vocab, segment-sum
   OOV flags per doc. ``oov_rate`` is a single IEEE division of the two
   integer counts (bit-identical to the SQL oracle's expression).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from ray.data.aggregate import Count

from doppel_ray.stages.decontam import _flat_tokens
from doppel_ray.stages.util import collect_table

#: broadcast guard: a reference "vocabulary" larger than this means the
#: tokens aren't natural-language-ish and the broadcast regime is wrong
DEFAULT_VOCAB_LIMIT = 100_000_000


def document_frequency(ds: Dataset, *, text_col: str = "text") -> Dataset:
    """(token, df) — each token's DISTINCT-document frequency.

    One ``map_batches`` explodes docs into tokens and dedupes
    (token, doc) pairs in-batch (a doc is one row, so in-batch dedupe is
    globally exact); the ``groupby(token)`` shuffle then carries only
    distinct pairs. Output size is bounded by vocabulary, not corpus.
    """

    def explode(batch: pa.Table) -> pa.Table:
        flat, counts = _flat_tokens(batch[text_col])
        row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        t = pa.table({"token": flat, "row": pa.array(row_idx)})
        # in-batch (token, doc) dedupe -> shipped pairs globally distinct
        df = t.to_pandas().drop_duplicates()
        return pa.table({"token": pa.array(df["token"], type=pa.string())})

    return (
        ds.select_columns([text_col])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Count(alias_name="df"))
    )


def reference_vocab(
    ds: Dataset,
    *,
    text_col: str = "text",
    min_df: int = 2,
    vocab_limit: int = DEFAULT_VOCAB_LIMIT,
) -> pa.Array:
    """Distinct tokens appearing in >= ``min_df`` distinct documents."""
    if min_df < 1:
        raise ValueError(f"min_df must be >= 1, got {min_df}")

    counts = document_frequency(ds, text_col=text_col)
    freq = counts.filter(expr=f"df >= {int(min_df)}").select_columns(["token"])
    t = collect_table(freq)
    if t.num_rows > vocab_limit:
        raise RuntimeError(
            f"{t.num_rows} vocab tokens exceed vocab_limit={vocab_limit}; "
            f"the broadcast regime does not fit this corpus — raise min_df "
            f"or the limit"
        )
    return (
        t["token"].combine_chunks()
        if t.num_rows
        else pa.array([], type=pa.string())
    )


def add_oov_columns(
    ds: Dataset,
    vocab: pa.Array,
    *,
    text_col: str = "text",
) -> Dataset:
    """Append ``n_tokens``, ``n_oov`` and ``oov_rate`` (0.0 for empty
    docs) scored against the broadcast ``vocab``."""
    ref = ray.put(vocab)

    def score(batch: pa.Table) -> pa.Table:
        from doppel_ray.stages.util import cached_get

        voc: pa.Array = cached_get(ref)
        flat, counts = _flat_tokens(batch[text_col])
        oov = pc.invert(pc.is_in(flat, value_set=voc)).to_numpy(
            zero_copy_only=False
        )
        n_oov = np.zeros(len(counts), dtype=np.int64)
        np.add.at(
            n_oov,
            np.repeat(np.arange(len(counts), dtype=np.int64), counts),
            oov.astype(np.int64),
        )
        rate = np.where(
            counts > 0, n_oov / np.maximum(counts, 1), 0.0
        )
        out = batch
        for name, arr in (
            ("n_tokens", pa.array(counts)),
            ("n_oov", pa.array(n_oov)),
            ("oov_rate", pa.array(rate, type=pa.float64())),
        ):
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, arr)
        return out

    return ds.map_batches(score, batch_format="pyarrow")


def posting_lists(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    max_df: int = 10_000,
    num_buckets: int = 64,
) -> Dataset:
    """Inverted-index construction: ``(token, df, postings)`` where
    ``postings`` is the comma-joined ASCENDING doc-id list — the
    retrieval-infrastructure build artifact (a BM25/boolean engine's
    index segment), emitted as a relation so it writes straight to
    Parquet shards.

    ``max_df`` is a REQUIRED ceiling, not an optimization: at web scale
    a stopword's posting list is corpus-sized (every real indexer
    stop-lists or block-splits those), and a CSV cell must stay
    worker-heap-bounded. Rows outside ``[min_df, max_df]`` are dropped.

    Scale shape: one ``map_batches`` explodes docs to globally-distinct
    ``(token, doc_id)`` pairs (in-batch dedupe is exact because a doc
    is one row — the ``document_frequency`` argument above); ONE
    bucketed shuffle on token co-locates each token's pairs; the bucket
    sorts and joins vectorized per group. Output is bounded by
    vocabulary x max_df, not corpus size.
    """
    if min_df < 1 or max_df < min_df:
        raise ValueError("need 1 <= min_df <= max_df")

    from doppel_ray.stages.exact import bucketed_group_apply

    def explode(batch: pa.Table) -> pa.Table:
        flat, counts = _flat_tokens(batch[text_col])
        row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                "token": flat,
                "doc_id": pa.array(ids[row_idx], type=pa.int64()),
            }
        )
        dd = t.to_pandas().drop_duplicates()
        return pa.table(
            {
                "token": pa.array(dd["token"], type=pa.string()),
                "doc_id": pa.array(
                    dd["doc_id"].to_numpy(), type=pa.int64()
                ),
            }
        )

    pairs = ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow"
    )
    out_schema = pa.schema(
        [("token", pa.string()), ("df", pa.int64()), ("postings", pa.string())]
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        df = g.to_pandas()
        sizes = df.groupby("token", sort=False)["doc_id"].size()
        keep = sizes[(sizes >= min_df) & (sizes <= max_df)]
        if keep.empty:
            return out_schema.empty_table()
        sub = df[df["token"].isin(keep.index)].sort_values(["token", "doc_id"])
        # the per-group join runs once per DISTINCT token in the bucket
        # (vocabulary-bounded, the same Heaps'-law bound the vocab
        # broadcast relies on), never per document
        agg = sub.groupby("token", sort=True)["doc_id"].agg(
            lambda s: ",".join(map(str, s.to_numpy()))
        )
        toks = agg.index.to_numpy()
        return pa.table(
            {
                "token": pa.array(toks, type=pa.string()),
                "df": pa.array(
                    keep.loc[toks].to_numpy().astype(np.int64), type=pa.int64()
                ),
                "postings": pa.array(agg.to_numpy(), type=pa.string()),
            }
        )

    return bucketed_group_apply(pairs, "token", per_bucket, num_buckets=num_buckets)
