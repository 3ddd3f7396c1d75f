"""BM25 keyword retrieval over the ``documents`` table — the classic
sparse-retrieval scorer (Robertson & Zaragoza 2009, Okapi BM25 with the
Lucene ``ln(1 + (N - df + .5)/(df + .5))`` IDF). The reference (doppel)
has no text ops; this is part of the LLM-data operator surface: corpus
search, eval-set mining, and keyword-conditioned curation all reduce to
"score every document against a small fixed query, return top-k".

Ray-Data design
---------------
The query is SMALL (a handful of terms) and the corpus is wide, so the
shape is two narrow passes and zero wide shuffles:

1. Stats pass: one ``map_batches`` emits per-doc ``(dl, tf_0..tf_{m-1})``
   using the shared RE2 tokenizer, then ONE tiny aggregate folds
   ``N`` (docs), ``sum_dl`` (total tokens) and per-term document
   frequencies — a single combine of ``m + 2`` int64s per block.
2. Score pass: the driver turns those integers into ``m`` IDF doubles
   and ``avgdl`` (each a fixed sequence of correctly-rounded IEEE ops,
   reproduced verbatim by the DuckDB oracle), and a second
   ``map_batches`` computes the fixed-term-order score sum per doc.
   Top-k uses ``rank.global_topk`` — per-block prune, k×blocks rows
   shuffled, never a full sort.

At 100 TB: both passes stream; the only materialized object is the
(m+2)-integer stats row. Term count m is the query's, not the corpus's.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

#: BM25 free parameters — the standard Robertson defaults.
K1 = 1.2
B = 0.75


def per_doc_term_stats(
    ds: Dataset,
    terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_re: str | None = None,
    lowercase: bool = True,
) -> Dataset:
    """Per-doc ``(id, dl, tf_i..., has_i...)``: doc length in tokens and
    term frequency / presence per query term — one vectorized
    ``map_batches`` with the shared RE2 tokenizer, no shuffle."""
    if token_re is not None:
        raise NotImplementedError(
            "custom token_re is not supported; the shared all-Arrow "
            "tokenizer (decontam._flat_tokens) is fixed to the RE2 "
            r"whitespace class [^\t\n\f\r ]+"
        )
    if not terms:
        raise ValueError("terms must be non-empty")

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from doppel_ray.stages.decontam import _flat_tokens

        texts = batch[text_col]
        if lowercase:
            texts = pc.utf8_lower(texts)
        flat, counts = _flat_tokens(texts)
        words = flat.to_numpy(zero_copy_only=False).astype(object)
        bounds = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        cols = {id_col: batch[id_col], "dl": pa.array(counts, type=pa.int64())}
        pad = np.zeros(1, dtype=np.int64)
        for i, t in enumerate(terms):
            hit = (words == t).astype(np.int64)
            tf = np.add.reduceat(np.concatenate([hit, pad]), bounds[:-1]) * (
                counts > 0
            )
            cols[f"tf_{i}"] = pa.array(tf.astype(np.int64), type=pa.int64())
            cols[f"has_{i}"] = pa.array(
                (tf > 0).astype(np.int64), type=pa.int64()
            )
        return pa.table(cols)

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow"
    )


def bm25_scores(
    ds: Dataset,
    terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_re: str | None = None,
    lowercase: bool = True,
    k1: float = K1,
    b: float = B,
) -> Dataset:
    """Every document's BM25 score against ``terms`` as ``(id, score)``.

    The score is evaluated in FIXED term order as
    ``((s_0 + s_1) + ...)`` with
    ``s_i = idf_i * (tf_i * (k1+1)) / (tf_i + k1 * (1 - b + b * (dl/avgdl)))``
    and ``idf_i = ln(1 + (N - df_i + 0.5) / (df_i + 0.5))`` — every step a
    correctly-rounded IEEE op on exact integers, so a SQL oracle
    evaluating the same expression tree agrees to 1-ulp (``ln`` is the
    only non-exact step; quantize before comparing/ranking)."""
    stats = per_doc_term_stats(
        ds, terms, text_col=text_col, id_col=id_col, token_re=token_re,
        lowercase=lowercase,
    ).materialize()  # reused twice: stats fold + score pass
    from ray.data.aggregate import Sum

    aggs = [Sum("dl", alias_name="sum_dl")] + [
        Sum(f"has_{i}", alias_name=f"df_{i}") for i in range(len(terms))
    ]
    row = stats.aggregate(*aggs)
    n = stats.count()
    if n == 0:
        raise ValueError("bm25 scoring over an empty dataset")
    sum_dl = int(row["sum_dl"] or 0)
    df = [int(row[f"df_{i}"] or 0) for i in range(len(terms))]
    avgdl = sum_dl / n
    idf = [float(np.log(1.0 + (n - d + 0.5) / (d + 0.5))) for d in df]
    m = len(terms)

    def score(batch: pa.Table) -> pa.Table:
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        norm = k1 * (1.0 - b + b * (dl / avgdl))
        s = np.zeros(len(dl), dtype=np.float64)
        for i in range(m):
            tf = batch[f"tf_{i}"].to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            s = s + idf[i] * (tf * (k1 + 1.0)) / (tf + norm)
        return pa.table(
            {
                id_col: batch[id_col],
                "score": pa.array(s, type=pa.float64()),
            }
        )

    return stats.map_batches(score, batch_format="pyarrow")


def bm25_topk(
    ds: Dataset,
    terms: list[str],
    *,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_re: str | None = None,
    lowercase: bool = True,
    k1: float = K1,
    b: float = B,
) -> Dataset:
    """Top-k documents by BM25 against ``terms``; returns
    ``(id, score)`` ordered by (score DESC, id ASC)."""
    from doppel_ray.stages.rank import global_topk

    scored = bm25_scores(
        ds, terms, text_col=text_col, id_col=id_col, token_re=token_re,
        lowercase=lowercase, k1=k1, b=b,
    )
    top = global_topk(scored, ["score", id_col], ascending=[False, True], k=k)
    return top.sort(["score", id_col], descending=[True, False])


def hybrid_rrf_topk(
    docs: Dataset,
    embeds: Dataset,
    terms: list[str],
    query_vec: np.ndarray,
    *,
    k: int = 20,
    leg_n: int = 50,
    rrf_k: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    emb_col: str = "embedding",
    lowercase: bool = True,
) -> "pa.Table":
    """Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009) of
    a sparse BM25 leg and a dense cosine leg —
    ``rrf(d) = 1/(rrf_k + rank_bm25(d)) + 1/(rrf_k + rank_cos(d))``
    over each leg's top ``leg_n``, missing-leg terms contribute 0.
    Returns the fused top-``k`` as ``(doc_id, rrf_u)`` with
    ``rrf_u = floor(rrf * 1e9)``.

    Determinism contract (what makes this SQL-oracle-pairable): each
    leg ranks by its score FLOORED to micro-units (``floor(s * 1e6)``),
    ties by id ASC — the 1-ulp ``ln``/accumulation noise between numpy
    and any reference implementation is absorbed by the quantization,
    and from integer ranks onward every RRF step (two exact divisions,
    one add) is a correctly-rounded IEEE op, so fused scores are
    bit-identical.

    Scale shape: both legs are streaming passes ending in block-pruned
    ``global_topk`` (k x blocks rows shuffle); only the two <= leg_n-row
    leg tables reach the driver for fusion."""
    import pyarrow.compute as pc

    from doppel_ray.stages.rank import global_topk

    if k < 1 or leg_n < 1 or rrf_k < 0:
        raise ValueError("k and leg_n must be >= 1, rrf_k >= 0")

    def quantize(ds_scored: Dataset, col: str) -> Dataset:
        def fn(batch: pa.Table) -> pa.Table:
            u = np.floor(
                batch[col].to_numpy(zero_copy_only=False) * 1_000_000.0
            )
            return pa.table(
                {
                    id_col: batch[id_col],
                    "score_u": pa.array(u.astype(np.int64), type=pa.int64()),
                }
            )

        return ds_scored.map_batches(fn, batch_format="pyarrow")

    sparse = bm25_scores(
        docs, terms, text_col=text_col, id_col=id_col, lowercase=lowercase
    )
    sparse_top = global_topk(
        quantize(sparse, "score"),
        ["score_u", id_col],
        ascending=[False, True],
        k=leg_n,
    ).take_all()

    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)

    def cos_fn(batch: pa.Table) -> pa.Table:
        from doppel_ray.stages.ann import batch_matrix

        m = batch_matrix(batch[emb_col])  # zero-copy Arrow values reshape
        if len(batch):
            norms = np.linalg.norm(m, axis=1)
            cos = (m @ qn) / np.maximum(norms, 1e-300)
        else:
            cos = np.zeros(0)
        return pa.table(
            {
                id_col: pc.cast(batch[vec_id_col], pa.int64()),
                "score": pa.array(cos, type=pa.float64()),
            }
        )

    dense = embeds.select_columns([vec_id_col, emb_col]).map_batches(
        cos_fn, batch_format="pyarrow"
    )
    dense_top = global_topk(
        quantize(dense, "score"),
        ["score_u", id_col],
        ascending=[False, True],
        k=leg_n,
    ).take_all()

    def ranks(rows: list[dict]) -> dict[int, int]:
        ordered = sorted(rows, key=lambda r: (-r["score_u"], r[id_col]))
        return {int(r[id_col]): i + 1 for i, r in enumerate(ordered)}

    r_sp, r_de = ranks(sparse_top), ranks(dense_top)
    fused = []
    for d in sorted(set(r_sp) | set(r_de)):
        rrf = (1.0 / (rrf_k + r_sp[d]) if d in r_sp else 0.0) + (
            1.0 / (rrf_k + r_de[d]) if d in r_de else 0.0
        )
        fused.append((d, rrf))
    fused.sort(key=lambda t: (-t[1], t[0]))
    top = fused[:k]
    return pa.table(
        {
            id_col: pa.array([d for d, _ in top], type=pa.int64()),
            "rrf_u": pa.array(
                [int(np.floor(r * 1_000_000_000.0)) for _, r in top],
                type=pa.int64(),
            ),
        }
    )
