"""Tests for n-gram novelty scoring: brute-force reference parity at
n=8 and n=2, disjoint/identical corpora edges, short-doc exclusion, and
layout invariance."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from doppel_ray.stages import novelty

INDEX = [
    "the quick brown fox jumps over the lazy dog near the old mill",
    "four score and seven years ago our fathers brought forth a nation",
    "pack my box with five dozen liquor jugs before the auction starts",
]
NEW = [
    INDEX[0],                                              # 0: fully seen
    "the quick brown fox jumps over the lazy dog near a new pond today",  # 1: partial
    "completely novel sentence with words the index corpus never strings together",  # 2
    "tiny",                                               # 3: < n tokens -> excluded
    "",                                                    # 4: empty -> excluded
]


def _ds(texts, with_ids=True, parts=None):
    cols = {"text": pa.array(texts, type=pa.string())}
    if with_ids:
        cols = {"doc_id": pa.array(range(len(texts)), type=pa.int64()), **cols}
    ds = rd.from_arrow(pa.table(cols))
    return ds.repartition(parts) if parts else ds


def _reference(new_texts, index_texts, n):
    idx = set()
    for t in index_texts:
        tk = t.split()
        idx.update(" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1))
    out = {}
    for d, t in enumerate(new_texts):
        tk = t.split()
        grams = {" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)}
        if not grams:
            continue
        hit = sum(1 for g in grams if g in idx)
        out[d] = (len(grams), hit, (len(grams) - hit) / len(grams))
    return out


def _run(new_texts, index_texts, n, parts=None):
    got = novelty.novelty_scores(
        _ds(new_texts, parts=parts), _ds(index_texts, with_ids=False), n=n
    ).take_all()
    return {
        r["doc_id"]: (r["n_grams"], r["n_hit"], r["novelty"]) for r in got
    }


class TestNovelty:
    @pytest.mark.parametrize("n", [2, 8])
    def test_matches_reference(self, ray_session, n):
        assert _run(NEW, INDEX, n) == _reference(NEW, INDEX, n)

    def test_fully_seen_doc_has_zero_novelty(self, ray_session):
        got = _run(NEW, INDEX, 4)
        assert got[0][2] == 0.0

    def test_disjoint_corpora_full_novelty(self, ray_session):
        got = _run(["alpha beta gamma delta epsilon"], ["one two three four"], 2)
        assert got[0] == (4, 0, 1.0)

    def test_short_and_empty_docs_excluded(self, ray_session):
        got = _run(NEW, INDEX, 8)
        assert 3 not in got and 4 not in got

    def test_layout_invariant(self, ray_session):
        assert _run(NEW, INDEX, 3, parts=4) == _run(NEW, INDEX, 3)

    def test_validates_n(self, ray_session):
        with pytest.raises(ValueError):
            novelty.novelty_scores(_ds(NEW), _ds(INDEX, with_ids=False), n=0)
