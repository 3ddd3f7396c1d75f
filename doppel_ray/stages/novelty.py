"""Per-document n-gram NOVELTY vs an index corpus — the dedup-audit
metric: what fraction of a new document's distinct token n-grams has the
existing corpus never seen? (Low novelty ≈ near-duplicate / boilerplate
/ syndicated content; the score ranks a crawl batch before ingestion.)
The reference (doppel) has no text ops; this extends its "cheap
invariant before expensive verify" philosophy to statistical overlap.

Ray-Data design — contrast with the two sibling overlap stages:
``decontam`` BROADCASTS the (small) benchmark gram set; ``incremental``
anti-joins whole-document keys. Novelty needs gram-level overlap against
a corpus-sized index, so neither broadcast nor per-doc keys work — the
shape is ONE narrow all-to-all on the gram hash:

1. Each batch emits block-distinct ``(gh, doc_id, side)`` rows —
   ``gh`` the vectorized rolling-polynomial n-gram hash shared with
   decontam (``_ngram_hashes``: dictionary-encode token vocab, hash the
   vocab once, scatter+roll; no Python per window), per-(doc, gram)
   dedupe via one lexicographic ``np.unique``. Index rows carry
   ``doc_id = -1``.
2. ``bucketed_group_apply`` on ``gh``: equal hashes co-locate, the
   bucket dedupes cross-block ``(gh, doc)`` repeats, counts per new-side
   doc its grams and its hits against the bucket's index-gram set, and
   emits ``(doc_id, n_grams, n_hit)`` partials — exact, because each
   gram hash lives in exactly one bucket.
3. One narrow ``groupby(doc_id).sum`` folds partials;
   ``novelty = (n_grams - n_hit) / n_grams`` is a single IEEE division
   of exact integers (SQL-oracle bit parity).

Collision bound: two DISTINCT grams colliding on the 64-bit hash
overcount ``n_hit`` by at most the collision count — ~1e-10 expected at
test scale (oracle compares exactly), a few hundred expected at 10^12
grams, i.e. a <1e-9 relative shift of a statistical score. The
exact-string verify decontam pays (it answers a boolean per doc) is not
warranted for a fraction; documented here instead of hidden.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from doppel_ray.stages.decontam import _flat_tokens, _ngram_hashes
from doppel_ray.stages.exact import bucketed_group_apply

_INDEX_DOC = -1


def _gram_rows(
    batch: pa.Table, *, id_col: str | None, text_col: str, n: int, side: int
) -> pa.Table:
    """Block-distinct (gh, doc_id, side) rows; index side uses doc_id=-1
    and dedupes on gh alone (who held the gram is irrelevant)."""
    flat, counts = _flat_tokens(batch[text_col])
    starts, h, doc_of = _ngram_hashes(flat, counts, n)
    empty = pa.table(
        {
            "gh": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "side": pa.array([], pa.int8()),
        }
    )
    if len(starts) == 0:
        return empty
    gh = h.view(np.int64)
    if side == 0:
        gh = np.unique(gh)
        doc = np.full(len(gh), _INDEX_DOC, dtype=np.int64)
    else:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = ids[doc_of]
        pairs = np.unique(np.stack([doc, gh], axis=1), axis=0)
        doc, gh = pairs[:, 0], pairs[:, 1]
    return pa.table(
        {
            "gh": pa.array(gh, type=pa.int64()),
            "doc_id": pa.array(doc, type=pa.int64()),
            "side": pa.array(np.full(len(gh), side, dtype=np.int8), type=pa.int8()),
        }
    )


def _bucket_counts(g: pa.Table) -> pa.Table:
    """Per-bucket: (doc_id, n_grams, n_hit) partials for new-side docs."""
    schema = pa.schema(
        [("doc_id", pa.int64()), ("n_grams", pa.int64()), ("n_hit", pa.int64())]
    )
    df = g.to_pandas()
    new = df[df["side"] == 1].drop_duplicates(["gh", "doc_id"])
    if new.empty:
        return schema.empty_table()
    idx_gh = np.unique(df.loc[df["side"] == 0, "gh"].to_numpy())
    ngh = new["gh"].to_numpy()
    if len(idx_gh):
        pos = np.clip(np.searchsorted(idx_gh, ngh), 0, len(idx_gh) - 1)
        hit = idx_gh[pos] == ngh
    else:
        hit = np.zeros(len(ngh), dtype=bool)
    out = (
        pd.DataFrame(
            {
                "doc_id": new["doc_id"].to_numpy(),
                "n_grams": 1,
                "n_hit": hit.astype(np.int64),
            }
        )
        .groupby("doc_id", as_index=False)
        .sum()
    )
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"].to_numpy(), type=pa.int64()),
            "n_grams": pa.array(out["n_grams"].to_numpy(), type=pa.int64()),
            "n_hit": pa.array(out["n_hit"].to_numpy(), type=pa.int64()),
        }
    )


def novelty_scores(
    new_ds: Dataset,
    index_ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    num_buckets: int = 64,
) -> Dataset:
    """(doc_id, n_grams, n_hit, novelty) per new-side doc with >= 1
    n-gram; novelty = (n_grams - n_hit) / n_grams."""
    if n < 1:
        raise ValueError("n must be >= 1")

    def new_fn(batch: pa.Table) -> pa.Table:
        return _gram_rows(batch, id_col=id_col, text_col=text_col, n=n, side=1)

    def idx_fn(batch: pa.Table) -> pa.Table:
        return _gram_rows(batch, id_col=None, text_col=text_col, n=n, side=0)

    rows = new_ds.select_columns([id_col, text_col]).map_batches(
        new_fn, batch_format="pyarrow"
    ).union(
        index_ds.select_columns([text_col]).map_batches(
            idx_fn, batch_format="pyarrow"
        )
    )
    partials = bucketed_group_apply(
        rows, "gh", _bucket_counts, num_buckets=num_buckets
    )
    folded = partials.groupby("doc_id").aggregate(
        Sum("n_grams", alias_name="n_grams"), Sum("n_hit", alias_name="n_hit")
    )

    def add_novelty(batch: pa.Table) -> pa.Table:
        ng = batch["n_grams"].to_numpy(zero_copy_only=False).astype(np.int64)
        nh = batch["n_hit"].to_numpy(zero_copy_only=False).astype(np.int64)
        nov = (ng - nh) / ng
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_grams": batch["n_grams"],
                "n_hit": batch["n_hit"],
                "novelty": pa.array(nov, type=pa.float64()),
            }
        )

    return folded.map_batches(add_novelty, batch_format="pyarrow")


def ngram_diversity(
    ds: Dataset,
    *,
    n: int = 3,
    source_col: str = "source",
    text_col: str = "text",
) -> Dataset:
    """Per-source n-gram diversity — ``distinct n-grams / total
    n-grams`` (the type-token-ratio-style audit that catches template
    farms and generator loops: a boilerplate-heavy source scores low).

    Scale shape (the `sources_per_lang` distinct-pair idiom on gram
    HASHES): one ``map_batches`` rolls the shared 64-bit polynomial over
    every within-doc window and folds in-batch to distinct
    ``(source, gram-hash)`` pairs with their counts; ONE narrow two-key
    groupby sums the pair counts; a tiny per-source rollup counts pairs
    (= exact distinct, up to the documented 64-bit collision bound —
    the `novelty.py` stance) and sums totals. ``diversity_bp`` is an
    all-integer floor division, so the result is layout-invariant and
    SQL-recomputable.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    from ray.data.aggregate import Count

    def partial(batch: pa.Table) -> pa.Table:
        flat, counts = _flat_tokens(batch[text_col])
        starts, h, doc_idx = _ngram_hashes(flat, counts, n)
        if len(starts) == 0:
            return pa.table(
                {
                    "source": pa.array([], type=pa.string()),
                    "gh": pa.array([], type=pa.int64()),
                    "cnt": pa.array([], type=pa.int64()),
                }
            )
        src = np.asarray(
            batch[source_col].to_pylist(), dtype=object
        )[doc_idx]
        df = pd.DataFrame({"source": src, "gh": h.view(np.int64)})
        g = df.groupby(["source", "gh"], sort=False).size().reset_index(
            name="cnt"
        )
        return pa.table(
            {
                "source": pa.array(g["source"].to_numpy(), type=pa.string()),
                "gh": pa.array(g["gh"].to_numpy(), type=pa.int64()),
                "cnt": pa.array(
                    g["cnt"].to_numpy().astype(np.int64), type=pa.int64()
                ),
            }
        )

    pairs = (
        ds.select_columns([source_col, text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "gh"])
        .aggregate(Sum("cnt", alias_name="c"))
    )
    agg = pairs.groupby("source").aggregate(
        Count(alias_name="n_distinct"), Sum("c", alias_name="n_total")
    )

    def add_ratio(batch: pa.Table) -> pa.Table:
        nd = batch["n_distinct"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        nt = batch["n_total"].to_numpy(zero_copy_only=False).astype(np.int64)
        bp = (10_000 * nd) // nt
        return pa.table(
            {
                "source": batch["source"],
                "n_distinct": pa.array(nd, type=pa.int64()),
                "n_total": pa.array(nt, type=pa.int64()),
                "diversity_bp": pa.array(bp, type=pa.int64()),
            }
        )

    return agg.map_batches(add_ratio, batch_format="pyarrow")
