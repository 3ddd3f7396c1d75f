"""DSIR importance scoring (stages/dsir.py): brute-force parity
(bit-exact), self-target zero weights, target-affinity ordering, layout
invariance, empty/null docs, guards."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from doppel_ray.functions.hashing import sip64
from doppel_ray.stages import dsir


def _docs(texts: list[str | None], start_id: int = 0) -> rd.Dataset:
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    range(start_id, start_id + len(texts)), pa.int64()
                ),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )


def _ngrams(text: str) -> list[str]:
    toks = text.split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _brute(raw: list[str], target: list[str], m: int, alpha: float = 1.0):
    def counts(texts):
        c = np.zeros(m, dtype=np.int64)
        for t in texts:
            if t:
                g = _ngrams(t)
                if g:
                    b = sip64(pd.Series(g)) % np.uint64(m)
                    c += np.bincount(b.astype(np.int64), minlength=m)
        return c

    ct, cr = counts(target), counts(raw)
    pt = (ct + alpha) / (ct.sum() + alpha * m)
    pr = (cr + alpha) / (cr.sum() + alpha * m)
    lam = np.log(pt) - np.log(pr)
    out = {}
    for i, t in enumerate(raw):
        g = _ngrams(t) if t else []
        if not g:
            out[i] = (0, 0.0)
            continue
        b = (sip64(pd.Series(g)) % np.uint64(m)).astype(np.int64)
        # same order as the stage: unigrams then bigrams, left to right
        out[i] = (len(g), float(np.add.reduce(lam[b])))
    return out


RAW = [
    "the cat sat on the mat",
    "stock market update and analysis",
    "the dog sat on the log",
    "",
    None,
    "cat cat cat",
]
TARGET = ["the cat sat quietly", "a cat sat on a mat"]


class TestDsirScores:
    def test_brute_force_parity_bit_exact(self, ray_session):
        rows = dsir.dsir_scores(
            _docs(RAW).repartition(3), _docs(TARGET, 100).repartition(2), m=512
        ).take_all()
        want = _brute([t or "" for t in RAW], TARGET, 512)
        assert len(rows) == len(RAW)
        for r in rows:
            n, w = want[r["doc_id"]]
            assert r["n_ngrams"] == n
            assert r["logweight"] == w  # bit-exact: same order, same ops

    def test_self_target_scores_zero(self, ray_session):
        rows = dsir.dsir_scores(
            _docs(RAW).repartition(2), _docs(RAW, 50).repartition(3), m=256
        ).take_all()
        assert all(r["logweight"] == 0.0 for r in rows)

    def test_target_affinity_ordering(self, ray_session):
        rows = {
            r["doc_id"]: r["logweight"]
            for r in dsir.dsir_scores(
                _docs(RAW), _docs(TARGET, 100), m=1024
            ).take_all()
        }
        # cat-ish docs outrank the stock-market doc
        assert rows[0] > rows[1]
        assert rows[5] > rows[1]
        assert rows[3] == 0.0 and rows[4] == 0.0

    def test_layout_invariance_bit_exact(self, ray_session):
        outs = []
        for parts in (1, 5):
            rows = dsir.dsir_scores(
                _docs(RAW).repartition(parts),
                _docs(TARGET, 100).repartition(parts),
                m=512,
            ).take_all()
            outs.append(
                sorted((r["doc_id"], r["n_ngrams"], r["logweight"]) for r in rows)
            )
        assert outs[0] == outs[1]

    def test_guards(self, ray_session):
        with pytest.raises(ValueError, match="m must"):
            dsir.dsir_scores(_docs(RAW), _docs(TARGET), m=1)
        with pytest.raises(ValueError, match="share m"):
            dsir.log_ratio_vector(np.zeros(4), np.zeros(5))
