"""Tests for n-gram novelty scoring: brute-force reference parity at
n=8 and n=2, disjoint/identical corpora edges, short-doc exclusion, and
layout invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data
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


class TestNgramDiversity:
    @staticmethod
    def _brute(df, n):
        import re

        rows = {}
        for _, r in df.iterrows():
            toks = re.findall(r"[^\t\n\f\r ]+", r.text or "")
            grams = [
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            ]
            d = rows.setdefault(r.source, {"s": set(), "t": 0})
            d["s"].update(grams)
            d["t"] += len(grams)
        out = pd.DataFrame(
            [
                {
                    "source": s,
                    "n_distinct": len(d["s"]),
                    "n_total": d["t"],
                    "diversity_bp": (10_000 * len(d["s"])) // d["t"],
                }
                for s, d in rows.items()
                if d["t"]
            ]
        ).astype(
            {"n_distinct": np.int64, "n_total": np.int64, "diversity_bp": np.int64}
        )
        return out.sort_values("source", ignore_index=True)

    def test_matches_brute_force_and_layout(self, ray_session):
        from doppel_ray.stages.novelty import ngram_diversity

        rng = np.random.default_rng(13)
        vocab = [f"w{i}" for i in range(25)]
        rows = []
        for i in range(80):
            toks = list(rng.choice(vocab, rng.integers(4, 20)))
            if i % 2 == 0:
                toks += ["rep", "rep", "rep", "rep"]  # boilerplate tail
            rows.append(
                {
                    "doc_id": i,
                    "source": f"s{i % 3}",
                    "text": " ".join(toks),
                }
            )
        df = pd.DataFrame(rows)
        want = self._brute(df, 2)
        for p in (1, 7):
            got = (
                ngram_diversity(
                    ray.data.from_pandas(df).repartition(p), n=2
                )
                .to_pandas()
                .sort_values("source", ignore_index=True)
            )
            pd.testing.assert_frame_equal(got, want)

    def test_unigram_mode_and_validation(self, ray_session):
        from doppel_ray.stages.novelty import ngram_diversity

        df = pd.DataFrame(
            {
                "doc_id": [0, 1],
                "source": ["a", "a"],
                "text": ["x x y", "y z"],
            }
        )
        got = ngram_diversity(ray.data.from_pandas(df), n=1).to_pandas()
        assert got.n_distinct.tolist() == [3] and got.n_total.tolist() == [5]
        import pytest as _pytest

        with _pytest.raises(ValueError):
            ngram_diversity(ray.data.from_pandas(df), n=0)
