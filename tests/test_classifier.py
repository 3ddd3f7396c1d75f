"""Hashed linear classifier (stages/classifier.py): brute-force score
parity, null/empty docs, threshold labels, broadcast-ref path, layout
invariance."""

import hashlib

import numpy as np
import pyarrow as pa
import ray

from doppel_ray.stages import classifier as C


def _brute_score(text: str | None, w: np.ndarray) -> int:
    if not text:
        return 0
    tot = 0
    for tok in text.split():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
        tot += int(w[h % len(w)])
    return tot


def _ds(texts):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )


TEXTS = [
    "the quick brown fox",
    "spam spam spam buy now",
    "",
    None,
    "  padded   whitespace\ttokens\n",
    "a",
]


class TestScoring:
    def test_brute_force_parity(self, ray_session):
        w = C.derived_weights(256)
        rows = sorted(
            C.score_documents(_ds(TEXTS), w).take_all(),
            key=lambda r: r["doc_id"],
        )
        for r, t in zip(rows, TEXTS):
            assert r["score"] == _brute_score(t, w), t
            assert r["keep"] == (r["score"] >= 0)

    def test_bias_threshold(self, ray_session):
        w = np.ones(16, dtype=np.int64)  # score == token count
        rows = sorted(
            C.score_documents(_ds(TEXTS), w, bias=3).take_all(),
            key=lambda r: r["doc_id"],
        )
        assert [r["keep"] for r in rows] == [
            True, True, False, False, True, False,
        ]

    def test_repeated_token_counts_each_occurrence(self, ray_session):
        w = C.derived_weights(64)
        one = C.score_documents(_ds(["word"]), w).take_all()[0]["score"]
        three = C.score_documents(
            _ds(["word word word"]), w
        ).take_all()[0]["score"]
        assert three == 3 * one != 0 or (one == 0 and three == 0)

    def test_layout_invariant(self, ray_session):
        w = C.derived_weights(128)
        texts = [f"tok{i} tok{i % 7} filler" for i in range(60)]
        a = sorted(map(str, C.score_documents(_ds(texts), w).take_all()))
        b = sorted(
            map(
                str,
                C.score_documents(
                    _ds(texts).repartition(9), w
                ).take_all(),
            )
        )
        assert a == b


class TestWeights:
    def test_derived_weights_range_and_sql(self):
        import duckdb

        w = C.derived_weights(512)
        assert w.dtype == np.int64
        assert w.min() >= -1000 and w.max() <= 1000
        got = [
            r[0]
            for r in duckdb.execute(
                f"SELECT {C.weight_sql('x')} FROM "
                "(SELECT unnest(range(512)) AS x)"
            ).fetchall()
        ]
        assert got == w.tolist()
