"""Incremental dedup (stages/incremental.py): anti-join exactness vs a
DuckDB oracle on a dup-injected two-corpus fixture, both merge regimes of
``overlap_key_values``, and within-batch keep-first semantics."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pytest

import ray.data as rd

from doppel_ray.stages import incremental as I


@pytest.fixture(scope="module")
def two_corpora():
    # index: ids 0..99; new batch: ids 1000..1099
    # 30 new docs duplicate an index doc; 10 new docs duplicate each other
    idx = [(i, f"index document {i} body") for i in range(100)]
    new = [(1000 + i, f"new document {i} body") for i in range(100)]
    for i in range(30):
        new[i] = (1000 + i, idx[i * 3][1])  # cross-corpus dup
    for i in range(40, 50):
        new[i] = (1000 + i, "repeated new text")  # within-batch dup
    return idx, new


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _oracle(idx, new, within_batch=True):
    con = duckdb.connect()
    con.register("idx", pa.table({"text": pa.array([r[1] for r in idx])}))
    con.register(
        "new",
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in new], pa.int64()),
                "text": pa.array([r[1] for r in new]),
            }
        ),
    )
    if within_batch:
        sql = """SELECT min(doc_id) FROM new
                 WHERE text NOT IN (SELECT text FROM idx) GROUP BY text"""
    else:
        sql = """SELECT doc_id FROM new
                 WHERE text NOT IN (SELECT text FROM idx)"""
    return {r[0] for r in con.execute(sql).fetchall()}


def test_dedup_against_index_keep_first(two_corpora):
    idx, new = two_corpora
    expect = _oracle(idx, new)
    got = I.dedup_against_index(_ds(new), _ds(idx)).take_all()
    ids = {r["doc_id"] for r in got}
    assert ids == expect
    assert 1000 not in ids  # cross-corpus dup removed
    assert 1040 in ids and 1041 not in ids  # keep-first within batch


def test_dedup_against_index_no_within_batch(two_corpora):
    idx, new = two_corpora
    expect = _oracle(idx, new, within_batch=False)
    got = I.dedup_against_index(_ds(new), _ds(idx), within_batch=False)
    assert {r["doc_id"] for r in got.take_all()} == expect


def test_no_overlap_passthrough():
    idx = [(i, f"a{i}") for i in range(5)]
    new = [(100 + i, f"b{i}") for i in range(5)]
    got = I.dedup_against_index(_ds(new), _ds(idx))
    assert {r["doc_id"] for r in got.take_all()} == {100, 101, 102, 103, 104}


def test_overlap_key_values_both_regimes(monkeypatch):
    a = rd.from_arrow(pa.table({"k": pa.array(["x", "y", "z", "x"])}))
    b = rd.from_arrow(pa.table({"k": pa.array(["y", "w", "y"])}))
    got = I.overlap_key_values(a, b, "k")
    assert set(got.to_pylist()) == {"y"}
    # scale regime: force the narrow groupby merge path
    monkeypatch.setattr(I, "DRIVER_AGG_LIMIT", 0)
    got2 = I.overlap_key_values(a, b, "k")
    assert set(got2.to_pylist()) == {"y"}
    # a key duplicated across blocks of ONE side must not count as "both"
    a2 = rd.from_arrow(pa.table({"k": pa.array(["q"])})).union(
        rd.from_arrow(pa.table({"k": pa.array(["q"])}))
    )
    b2 = rd.from_arrow(pa.table({"k": pa.array(["r"])}))
    assert len(I.overlap_key_values(a2, b2, "k")) == 0


class TestNearDedupAgainstIndex:
    @pytest.fixture(scope="class")
    def near_corpora(self):
        import random

        rng = random.Random(7)
        words = "alpha beta gamma delta epsilon zeta eta theta".split()

        def doc(k=80):
            return " ".join(rng.choice(words) for _ in range(k))

        idx = [(2 * i, doc()) for i in range(40)]
        new = [(2 * i + 1, doc()) for i in range(40)]
        # near-dup injections: verbatim copy and a light edit of index docs
        new[3] = (7, idx[5][1])
        new[8] = (17, idx[9][1] + " tail")
        return idx, new

    def _oracle_survivors(self, idx, new):
        con = duckdb.connect()
        con.register(
            "docs",
            pa.table(
                {
                    "doc_id": pa.array(
                        [r[0] for r in idx + new], pa.int64()
                    ),
                    "text": pa.array([r[1] for r in idx + new]),
                }
            ),
        )
        sql = r"""
        WITH norm AS (
          SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
          FROM docs
        ),
        sh AS (
          SELECT DISTINCT doc_id, substr(t, i, 5) AS s
          FROM norm, LATERAL (SELECT unnest(generate_series(1, strlen(t) - 4)) AS i)
          WHERE strlen(t) >= 5
        ),
        sizes AS (SELECT doc_id, count(*) AS c FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_n, b.doc_id AS id_i, count(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s
          WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
          GROUP BY 1, 2
        ),
        hits AS (
          SELECT DISTINCT id_n
          FROM inter
          JOIN sizes sa ON sa.doc_id = inter.id_n
          JOIN sizes sb ON sb.doc_id = inter.id_i
          WHERE 5 * i >= 4 * (sa.c + sb.c - i)
        )
        SELECT doc_id FROM docs
        WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT id_n FROM hits)
        """
        return {r[0] for r in con.execute(sql).fetchall()}

    def test_matches_exact_jaccard_oracle(self, near_corpora):
        idx, new = near_corpora
        expect = self._oracle_survivors(idx, new)
        assert 7 not in expect and 17 not in expect  # injections are live
        got = I.near_dedup_against_index(_ds(new), _ds(idx))
        assert {r["doc_id"] for r in got.take_all()} == expect

    def test_index_only_dups_do_not_flag(self):
        # two identical INDEX docs must not remove any new doc
        idx = [(0, "the quick brown fox jumps over the dog"), (2, "the quick brown fox jumps over the dog")]
        new = [(1, "completely different text body here indeed")]
        got = I.near_dedup_against_index(_ds(new), _ds(idx))
        assert {r["doc_id"] for r in got.take_all()} == {1}


class TestSignatureIndex:
    def test_persisted_index_signatures_give_identical_survivors(
        self, near_corpora_shared, tmp_path
    ):
        idx, new = near_corpora_shared
        base = {
            r["doc_id"]
            for r in I.near_dedup_against_index(_ds(new), _ds(idx)).take_all()
        }
        # in-memory index signatures
        sig = I.build_signature_index(_ds(idx))
        with_sig = {
            r["doc_id"]
            for r in I.near_dedup_against_index(
                _ds(new), _ds(idx), index_signatures=sig
            ).take_all()
        }
        assert with_sig == base
        # parquet round-trip (the resumable artifact)
        sig2 = I.build_signature_index(_ds(idx), path=str(tmp_path / "sigidx"))
        with_sig2 = {
            r["doc_id"]
            for r in I.near_dedup_against_index(
                _ds(new), _ds(idx), index_signatures=sig2
            ).take_all()
        }
        assert with_sig2 == base

    def test_prune_exact_rejected_with_precomputed_sig(self):
        import pytest as _pytest

        from doppel_ray.stages import minhash

        ds = _ds([(1, "a b c d e")])
        sig = minhash.signatures(
            I._side_pages(ds, "0", "doc_id", "text"), minhash.MinHashConfig()
        )
        with _pytest.raises(ValueError):
            minhash.near_dup_edges(
                I._side_pages(ds, "0", "doc_id", "text"),
                minhash.MinHashConfig(prune_exact=True),
                sig=sig,
            ).materialize()


import pytest as _pt


@_pt.fixture(scope="module")
def near_corpora_shared():
    import random

    rng = random.Random(7)
    words = "alpha beta gamma delta epsilon zeta eta theta".split()

    def doc(k=80):
        return " ".join(rng.choice(words) for _ in range(k))

    idx = [(2 * i, doc()) for i in range(40)]
    new = [(2 * i + 1, doc()) for i in range(40)]
    new[3] = (7, idx[5][1])
    new[8] = (17, idx[9][1] + " tail")
    return idx, new


def test_signature_index_pair_complete_mode():
    """threshold=1.0 (pair-complete) with a precomputed signature index
    must work end-to-end (regression: signatures lacked eq_key and
    candidate_pairs raised)."""
    from doppel_ray.stages import minhash

    idx = [(0, "a b c d e f"), (2, "q r s t u v")]
    new = [(1, "a b c d e f"), (3, "totally different text here")]
    cfg = minhash.MinHashConfig(threshold=1.0, verify_mode="exact")
    sig = I.build_signature_index(_ds(idx), cfg)
    got = {
        r["doc_id"]
        for r in I.near_dedup_against_index(
            _ds(new), _ds(idx), cfg, index_signatures=sig
        ).take_all()
    }
    assert got == {3}
