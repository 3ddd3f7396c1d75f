"""Benchmark decontamination (stages/decontam.py): exactness vs a
brute-force Python n-gram-overlap oracle, boundary behavior, and the
full-row filter."""

from __future__ import annotations

import re

import pyarrow as pa
import pytest

import ray.data as rd

from doppel_ray.stages import decontam as D


def _brute_contaminated(train, bench, n):
    def grams(text):
        tk = re.findall(r"\S+", text)
        return {" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)}

    bg = set()
    for t in bench:
        bg |= grams(t)
    return {i for i, t in train if grams(t) & bg}


def _mk(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _doc(seed, k=40):
    import random

    rng = random.Random(seed)
    return " ".join(rng.choice(WORDS) for _ in range(k))


@pytest.fixture(scope="module")
def corpus():
    bench_texts = [_doc(1000 + i) for i in range(5)]
    train = [(i, _doc(i)) for i in range(60)]
    # inject real contamination: doc 7 embeds an 8-gram from bench 0,
    # doc 13 IS bench 1 verbatim, doc 21 shares exactly n-1 tokens (miss)
    frag8 = " ".join(bench_texts[0].split()[10:18])
    frag7 = " ".join(bench_texts[2].split()[0:7])
    train[7] = (7, f"prefix words {frag8} suffix words")
    train[13] = (13, bench_texts[1])
    train[21] = (21, f"{frag7} unrelatedtail")
    return train, bench_texts


def test_contaminated_ids_matches_bruteforce(corpus):
    train, bench_texts = corpus
    n = 8
    expect = _brute_contaminated(train, bench_texts, n)
    assert 7 in expect and 13 in expect  # injection is live (non-vacuous)
    got = D.contaminated_ids(
        _mk(train),
        rd.from_arrow(pa.table({"text": pa.array(bench_texts)})),
        n=n,
    )
    ids = {r["doc_id"] for r in got.take_all()}
    assert ids == expect
    assert 21 not in ids  # n-1 overlap must not flag


def test_decontaminate_drops_exactly_flagged_rows(corpus):
    train, bench_texts = corpus
    n = 8
    expect = _brute_contaminated(train, bench_texts, n)
    bench = rd.from_arrow(pa.table({"text": pa.array(bench_texts)}))
    out = D.decontaminate(_mk(train), bench, n=n).take_all()
    assert {r["doc_id"] for r in out} == {i for i, _ in train} - expect
    # full rows preserved
    texts = dict(train)
    assert all(r["text"] == texts[r["doc_id"]] for r in out)


def test_boundary_cases():
    # windows never cross documents; short docs never flag
    bench = rd.from_arrow(pa.table({"text": pa.array(["a b c d"])}))
    train = _mk([(1, "x y a b"), (2, "c d z w"), (3, "a b"), (4, "")])
    # n=4: doc1 ends with "a b", doc2 starts "c d" — concatenation would
    # fabricate "a b c d"; per-doc windows must not
    ids = {r["doc_id"] for r in D.contaminated_ids(train, bench, n=4).take_all()}
    assert ids == set()
    # n=2 flags docs 1,2 and 3 ("a b" / "c d") but not the empty doc
    ids2 = {r["doc_id"] for r in D.contaminated_ids(train, bench, n=2).take_all()}
    assert ids2 == {1, 2, 3}


def test_empty_benchmark_flags_nothing():
    bench = rd.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    train = _mk([(1, "a b c"), (2, "d e f")])
    assert D.contaminated_ids(train, bench, n=2).take_all() == []


def test_oracle_parity_duckdb(corpus):
    """Same n-gram semantics as the SQL the driver runs (n=3 variant)."""
    import duckdb

    train, bench_texts = corpus
    rows = train + [(10_000 + i, t) for i, t in enumerate(bench_texts)]
    con = duckdb.connect()
    con.register(
        "docs",
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
    )
    sql = r"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '\S+') AS tk FROM docs
    ),
    bg AS (
      SELECT DISTINCT array_to_string(tk[i:i+7], ' ') AS g
      FROM toks, UNNEST(generate_series(1, greatest(len(tk)-7, 0))) AS u(i)
      WHERE doc_id >= 10000
    )
    SELECT DISTINCT t.doc_id
    FROM toks t, UNNEST(generate_series(1, greatest(len(t.tk)-7, 0))) AS u(i)
    WHERE t.doc_id < 10000
      AND array_to_string(t.tk[u.i:u.i+7], ' ') IN (SELECT g FROM bg)
    """
    expect = {r[0] for r in con.execute(sql).fetchall()}
    got = D.contaminated_ids(
        _mk(train),
        rd.from_arrow(pa.table({"text": pa.array(bench_texts)})),
        n=8,
    )
    assert {r["doc_id"] for r in got.take_all()} == expect


def test_null_texts_treated_as_empty():
    """A null text row must behave as an empty doc, never crash the
    tokenizer (regression: len(NaN) TypeError)."""
    from doppel_ray.stages.decontam import _flat_tokens

    flat, counts = _flat_tokens(
        pa.chunked_array([pa.array(["a b c", None, "d e"])])
    )
    assert counts.tolist() == [3, 0, 2]
    assert flat.to_pylist() == ["a", "b", "c", "d", "e"]
    bench = rd.from_arrow(pa.table({"text": pa.array(["a b", None])}))
    train = _mk([(1, "x a b y"), (2, None), (3, "z w")])
    ids = {r["doc_id"] for r in D.contaminated_ids(train, bench, n=2).take_all()}
    assert ids == {1}


def test_colliding_gram_strings_all_reach_driver():
    """Distinct grams colliding on the rolling hash must BOTH survive
    the per-block dedupe (regression: unique-on-hash dropped one,
    producing a contamination false negative)."""
    import numpy as np

    from doppel_ray.stages.decontam import _gram_pairs

    flat = np.array(["p", "q", "r", "s"], dtype=object)
    starts = np.array([0, 2])          # grams "p q" and "r s"
    h = np.zeros(2, dtype=np.uint64)   # forced full collision
    t = _gram_pairs(flat, starts, h, 2)
    assert set(t["g"].to_pylist()) == {"p q", "r s"}
    # and true duplicates still collapse
    h2 = np.zeros(2, dtype=np.uint64)
    flat2 = np.array(["p", "q", "p", "q"], dtype=object)
    t2 = _gram_pairs(flat2, np.array([0, 2]), h2, 2)
    assert t2.num_rows == 1


def test_nbsp_tokenization_matches_re2_oracle():
    """Non-ASCII whitespace (NBSP) is a TOKEN character under RE2 \\S —
    the Python tokenizer must agree (regression: Python Unicode \\s
    split on NBSP and diverged from every n-gram oracle)."""
    import duckdb

    from doppel_ray.stages.decontam import _flat_tokens

    text = "x\xa0y z"
    flat, counts = _flat_tokens(pa.chunked_array([pa.array([text])]))
    want = duckdb.connect().execute(
        r"SELECT regexp_extract_all(?, '\S+')", [text]
    ).fetchone()[0]
    assert flat.to_pylist() == want == ["x\xa0y", "z"]


class TestEmbeddingDecontam:
    def test_counts_and_filtering(self, ray_session):
        import numpy as np
        import ray.data as rd

        from doppel_ray.stages.decontam import embedding_decontam_counts

        # eval basis: e0, e1; corpus: one aligned to e0, one to both
        # (45 deg between e0 and e1 plane combos), one orthogonal
        ev = np.array([[1.0, 0, 0], [0, 1.0, 0]])
        corpus = pa.table(
            {
                "vec_id": pa.array([10, 11, 12], type=pa.int64()),
                "embedding": pa.array(
                    [
                        [0.9, 0.0, 0.1],        # ~e0 only
                        [0.7, 0.7, 0.0],        # cos ~0.707 to both
                        [0.0, 0.0, 1.0],        # orthogonal: not flagged
                    ],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        out = embedding_decontam_counts(
            rd.from_arrow(corpus), ev, threshold=0.5
        ).take_all()
        got = {r["vec_id"]: r["n_matches"] for r in out}
        assert got == {10: 1, 11: 2}

    def test_threshold_one_requires_alignment(self, ray_session):
        import numpy as np
        import ray.data as rd

        from doppel_ray.stages.decontam import embedding_decontam_counts

        ev = np.array([[0.0, 2.0]])  # normalization inside the stage
        corpus = pa.table(
            {
                "vec_id": pa.array([1, 2], type=pa.int64()),
                "embedding": pa.array(
                    [[0.0, 5.0], [1.0, 1.0]], type=pa.list_(pa.float32())
                ),
            }
        )
        out = embedding_decontam_counts(
            rd.from_arrow(corpus), ev, threshold=0.9999
        ).take_all()
        assert [r["vec_id"] for r in out] == [1]
