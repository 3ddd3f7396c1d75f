"""TF-IDF top terms (stages/tfidf.py): hand-checked scores, tie-breaks,
top-k truncation, empty docs, and bit-exact DuckDB parity (incl. the
float tfidf column) on a random corpus."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from doppel_ray.stages import tfidf


def _docs(texts: list[str | None]) -> rd.Dataset:
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    return rd.from_arrow(t).repartition(3)


class TestTfidfTopTerms:
    def test_hand_checked_scores(self, ray_session):
        # N=3; "rare" df=1 (doc 2 only), "common" df=3
        texts = ["other common", "common", "common rare rare"]
        out = {
            (r["doc_id"], r["token"]): r
            for r in tfidf.tfidf_top_terms(_docs(texts), k=10).take_all()
        }
        r = out[(2, "rare")]
        assert (r["tf"], r["df"]) == (2, 1)
        assert r["tfidf"] == 2 * math.log(3 / 1)
        c = out[(1, "common")]
        assert (c["tf"], c["df"]) == (1, 3)
        assert c["tfidf"] == 1 * math.log(3 / 3) == 0.0

    def test_top_k_and_token_tiebreak(self, ray_session):
        # doc 0: zz and aa both df=1 tf=1 -> equal scores; k=1 keeps aa
        texts = ["zz aa", "filler filler"]
        rows = tfidf.tfidf_top_terms(_docs(texts), k=1).take_all()
        doc0 = [r for r in rows if r["doc_id"] == 0]
        assert len(doc0) == 1 and doc0[0]["token"] == "aa"

    def test_empty_null_docs_and_guard(self, ray_session):
        rows = tfidf.tfidf_top_terms(_docs(["a b", "", None]), k=3).take_all()
        assert {r["doc_id"] for r in rows} == {0}
        with pytest.raises(ValueError, match="k must"):
            tfidf.tfidf_top_terms(_docs(["x"]), k=0)
        with pytest.raises(RuntimeError, match="vocab_limit"):
            tfidf.tfidf_top_terms(_docs(["a b c"]), vocab_limit=2)

    def test_duckdb_parity_random_corpus(self, ray_session):
        import duckdb

        rng = np.random.default_rng(17)
        pool = [f"w{i}" for i in range(40)]
        texts = [
            " ".join(rng.choice(pool, size=rng.integers(1, 25)))
            for _ in range(60)
        ] + ["", None]
        got = sorted(
            (r["doc_id"], r["token"], r["tf"], r["df"], r["tfidf"])
            for r in tfidf.tfidf_top_terms(_docs(texts), k=4).take_all()
        )
        con = duckdb.connect()
        con.register(
            "documents",
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, type=pa.string()),
                }
            ),
        )
        want = con.execute(
            r"""
            WITH tok AS (
              SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS s
              FROM documents
            ),
            tf AS (
              SELECT doc_id, s, count(*)::BIGINT AS tf
              FROM tok GROUP BY doc_id, s
            ),
            dfq AS (
              SELECT s, count(DISTINCT doc_id)::BIGINT AS df
              FROM tok GROUP BY s
            ),
            nq AS (SELECT count(*)::DOUBLE AS n FROM documents),
            sc AS (
              SELECT tf.doc_id, tf.s AS token, tf.tf, dfq.df,
                     tf.tf * ln(n / dfq.df::DOUBLE) AS tfidf,
                     row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf * ln(n / dfq.df::DOUBLE) DESC, tf.s ASC
                     ) AS rk
              FROM tf JOIN dfq USING (s), nq
            )
            SELECT doc_id, token, tf, df, tfidf FROM sc WHERE rk <= 4
            ORDER BY doc_id, token
            """
        ).fetchall()
        # exact equality including the float column (bit-identical ops)
        assert got == [tuple(r) for r in want]
