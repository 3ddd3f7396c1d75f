"""Vocabulary-coverage scoring (stages/vocab.py): df-threshold
boundaries, null/empty docs, guards, and DuckDB parity on a random
corpus."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from doppel_ray.stages import vocab as V


def _docs(texts: list[str | None]) -> rd.Dataset:
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    return rd.from_arrow(t).repartition(3)


class TestReferenceVocab:
    def test_df_threshold_counts_distinct_docs(self, ray_session):
        texts = [
            "alpha beta",
            "alpha gamma",
            "alpha alpha delta delta",  # repeats within ONE doc: df 1
        ]
        voc = set(V.reference_vocab(_docs(texts), min_df=2).to_pylist())
        assert voc == {"alpha"}  # beta/gamma/delta/delta have df 1

    def test_min_df_one_is_all_tokens(self, ray_session):
        voc = set(V.reference_vocab(_docs(["a b", "c"]), min_df=1).to_pylist())
        assert voc == {"a", "b", "c"}

    def test_guards(self, ray_session):
        with pytest.raises(ValueError, match="min_df"):
            V.reference_vocab(_docs(["x"]), min_df=0)
        with pytest.raises(RuntimeError, match="vocab_limit"):
            V.reference_vocab(_docs(["a b", "a b"]), min_df=2, vocab_limit=1)


class TestOOVScoring:
    def test_counts_and_rate(self, ray_session):
        ref = _docs(["known words here", "known words there"])
        voc = V.reference_vocab(ref, min_df=2)  # {known, words}
        out = {
            r["doc_id"]: r
            for r in V.add_oov_columns(
                _docs(["known novel words xyz", "known words", "", None]),
                voc,
            ).take_all()
        }
        assert (out[0]["n_tokens"], out[0]["n_oov"]) == (4, 2)
        assert out[0]["oov_rate"] == 2 / 4
        assert (out[1]["n_tokens"], out[1]["n_oov"]) == (2, 0)
        # empty and null docs: zero tokens, rate 0.0 (not NaN)
        for i in (2, 3):
            assert (out[i]["n_tokens"], out[i]["n_oov"]) == (0, 0)
            assert out[i]["oov_rate"] == 0.0

    def test_duckdb_parity_random_corpus(self, ray_session):
        import duckdb

        rng = np.random.default_rng(11)
        pool = [f"w{i}" for i in range(30)]
        texts = [
            " ".join(rng.choice(pool, size=rng.integers(1, 12)))
            for _ in range(50)
        ]
        ds = _docs(texts)
        voc = V.reference_vocab(ds, min_df=3)
        got = sorted(
            (r["doc_id"], r["n_tokens"], r["n_oov"], r["oov_rate"])
            for r in V.add_oov_columns(ds, voc).take_all()
        )
        con = duckdb.connect()
        con.register(
            "documents",
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts),
                }
            ),
        )
        want = con.execute(
            r"""
            WITH tok AS (
              SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS s
              FROM documents
            ),
            vocab AS (
              SELECT s FROM tok
              GROUP BY s HAVING count(DISTINCT doc_id) >= 3
            ),
            per AS (
              SELECT t.doc_id, count(*) AS n_tokens,
                     sum(CASE WHEN v.s IS NULL THEN 1 ELSE 0 END) AS n_oov
              FROM tok t LEFT JOIN vocab v ON t.s = v.s
              GROUP BY t.doc_id
            )
            SELECT d.doc_id, coalesce(p.n_tokens, 0)::BIGINT,
                   coalesce(p.n_oov, 0)::BIGINT,
                   CASE WHEN coalesce(p.n_tokens, 0) = 0 THEN 0.0
                        ELSE coalesce(p.n_oov, 0)::DOUBLE / p.n_tokens::DOUBLE
                   END
            FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
            ORDER BY d.doc_id
            """
        ).fetchall()
        assert got == [tuple(r) for r in want]


class TestPostingLists:
    TEXTS = [
        "apple banana apple",        # 0: apple df-counts once per doc
        "banana cherry",             # 1
        "apple cherry date",         # 2
        None,                        # 3: null doc -> no pairs
        "banana banana banana",      # 4
    ]

    def _brute(self, min_df, max_df):
        out = {}
        for i, t in enumerate(self.TEXTS):
            for tok in set((t or "").split()):
                out.setdefault(tok, []).append(i)
        return {
            tok: (len(ids), ",".join(map(str, sorted(ids))))
            for tok, ids in out.items()
            if min_df <= len(ids) <= max_df
        }

    def test_matches_brute_force(self, ray_session):
        got = {
            r["token"]: (r["df"], r["postings"])
            for r in V.posting_lists(
                _docs(self.TEXTS), min_df=1, max_df=10
            ).take_all()
        }
        assert got == self._brute(1, 10)

    def test_df_window(self, ray_session):
        # banana df=3, apple df=2, cherry df=2, date df=1
        got = {
            r["token"]: r["postings"]
            for r in V.posting_lists(
                _docs(self.TEXTS), min_df=2, max_df=2
            ).take_all()
        }
        assert got == {"apple": "0,2", "cherry": "1,2"}

    def test_layout_invariant(self, ray_session):
        a = sorted(
            map(
                str,
                V.posting_lists(_docs(self.TEXTS), min_df=1, max_df=10)
                .take_all(),
            )
        )
        b = sorted(
            map(
                str,
                V.posting_lists(
                    _docs(self.TEXTS).repartition(5), min_df=1, max_df=10
                ).take_all(),
            )
        )
        assert a == b

    def test_validation(self, ray_session):
        with pytest.raises(ValueError):
            V.posting_lists(_docs(self.TEXTS), min_df=0)
        with pytest.raises(ValueError):
            V.posting_lists(_docs(self.TEXTS), min_df=5, max_df=4)
