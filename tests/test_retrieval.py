"""Tests for BM25 retrieval: exact equivalence to a brute-force
reference scorer, top-k boundary semantics, null/empty handling, and
block-layout invariance."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from doppel_ray.stages import retrieval

TEXTS = [
    "the cat sat on the mat",
    "dup dup dup hash",
    "hash join hash join vector",
    "a completely unrelated sentence",
    "vector vector vector vector vector vector vector vector",
    "",
    "dup",
    "the hash of a dup vector is a hash",
]
TERMS = ["dup", "hash", "vector"]


def _ds(texts=TEXTS, parts=None):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )
    return ds.repartition(parts) if parts else ds


def _reference_bm25(texts, terms, k1=1.2, b=0.75):
    """Brute-force BM25 mirroring the documented math (Lucene idf)."""
    docs = [(t or "").lower().split() for t in texts]
    n = len(docs)
    dls = [len(d) for d in docs]
    avgdl = sum(dls) / n
    scores = []
    for d, dl in zip(docs, dls):
        s = 0.0
        for t in terms:
            df = sum(1 for dd in docs if t in dd)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            tf = d.count(t)
            s = s + idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))
        scores.append(s)
    return scores


class TestBM25:
    def test_matches_reference(self, ray_session):
        want = _reference_bm25(TEXTS, TERMS)
        got = {
            r["doc_id"]: r["score"]
            for r in retrieval.bm25_topk(_ds(), TERMS, k=len(TEXTS)).take_all()
        }
        assert len(got) == len(TEXTS)
        for i, w in enumerate(want):
            assert got[i] == pytest.approx(w, rel=1e-12), (i, TEXTS[i])

    def test_topk_order_and_boundary(self, ray_session):
        want = _reference_bm25(TEXTS, TERMS)
        order = sorted(range(len(TEXTS)), key=lambda i: (-want[i], i))
        rows = retrieval.bm25_topk(_ds(), TERMS, k=3).take_all()
        assert [r["doc_id"] for r in rows] == order[:3]
        # scores come back sorted DESC
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)

    def test_layout_invariant(self, ray_session):
        a = retrieval.bm25_topk(_ds(), TERMS, k=4).take_all()
        b = retrieval.bm25_topk(_ds(parts=5), TERMS, k=4).take_all()
        assert [(r["doc_id"], r["score"]) for r in a] == [
            (r["doc_id"], r["score"]) for r in b
        ]

    def test_absent_term_scores_zero(self, ray_session):
        rows = retrieval.bm25_topk(_ds(), ["zzzzz"], k=len(TEXTS)).take_all()
        assert all(r["score"] == 0.0 for r in rows)

    def test_null_text_is_empty_doc(self, ray_session):
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], type=pa.int64()),
                    "text": pa.array(["dup dup", None], type=pa.string()),
                }
            )
        )
        rows = retrieval.bm25_topk(ds, ["dup"], k=2).take_all()
        got = {r["doc_id"]: r["score"] for r in rows}
        assert got[0] > 0.0 and got[1] == 0.0

    def test_validates_params(self, ray_session):
        with pytest.raises(ValueError):
            retrieval.bm25_topk(_ds(), [], k=3)
        with pytest.raises(NotImplementedError):
            retrieval.bm25_topk(_ds(), ["x"], k=3, token_re=r"\w+")

    def test_stats_pass_counts(self, ray_session):
        stats = {
            r["doc_id"]: r
            for r in retrieval.per_doc_term_stats(_ds(), TERMS).take_all()
        }
        assert stats[1]["dl"] == 4 and stats[1]["tf_0"] == 3  # dup x3
        assert stats[1]["has_0"] == 1 and stats[1]["tf_2"] == 0
        assert stats[5]["dl"] == 0 and stats[5]["tf_0"] == 0


def _emb_ds(n, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dim))
    return (
        rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(n), type=pa.int64()),
                    "embedding": pa.array(
                        [row.tolist() for row in m], type=pa.list_(pa.float64())
                    ),
                }
            )
        ),
        m,
    )


def _reference_hybrid(texts, terms, m, *, k=4, leg_n=5, rrf_k=60):
    bm = _reference_bm25(texts, terms)
    sp = sorted(range(len(texts)), key=lambda i: (-math.floor(bm[i] * 1e6), i))
    r_sp = {d: i + 1 for i, d in enumerate(sp[:leg_n])}
    q = m[0] / np.linalg.norm(m[0])
    cos = [float(v @ q / np.linalg.norm(v)) for v in m]
    de = sorted(range(len(m)), key=lambda i: (-math.floor(cos[i] * 1e6), i))
    r_de = {d: i + 1 for i, d in enumerate(de[:leg_n])}
    fused = []
    for d in sorted(set(r_sp) | set(r_de)):
        rrf = (1.0 / (rrf_k + r_sp[d]) if d in r_sp else 0.0) + (
            1.0 / (rrf_k + r_de[d]) if d in r_de else 0.0
        )
        fused.append((d, rrf))
    fused.sort(key=lambda t: (-t[1], t[0]))
    return [(d, int(math.floor(r * 1e9))) for d, r in fused[:k]]


class TestHybridRRF:
    def test_matches_reference(self, ray_session):
        embeds, m = _emb_ds(len(TEXTS))
        got = retrieval.hybrid_rrf_topk(
            _ds(), embeds, TERMS, m[0], k=4, leg_n=5, rrf_k=60
        )
        want = _reference_hybrid(TEXTS, TERMS, m, k=4, leg_n=5)
        assert list(zip(got["doc_id"].to_pylist(), got["rrf_u"].to_pylist())) == want

    def test_doc_in_single_leg_still_fused(self, ray_session):
        # with leg_n=2 the legs pick different docs; fusion must keep
        # single-leg docs with the missing term contributing zero
        embeds, m = _emb_ds(len(TEXTS))
        got = retrieval.hybrid_rrf_topk(
            _ds(), embeds, TERMS, m[0], k=len(TEXTS), leg_n=2, rrf_k=60
        )
        want = _reference_hybrid(TEXTS, TERMS, m, k=len(TEXTS), leg_n=2)
        assert list(zip(got["doc_id"].to_pylist(), got["rrf_u"].to_pylist())) == want

    def test_validates_params(self, ray_session):
        embeds, m = _emb_ds(len(TEXTS))
        import pytest as _pt

        with _pt.raises(ValueError):
            retrieval.hybrid_rrf_topk(_ds(), embeds, TERMS, m[0], k=0)
