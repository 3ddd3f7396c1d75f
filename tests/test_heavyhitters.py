"""Misra-Gries heavy hitters (stages/heavyhitters.py): exact regime ==
plain counts, lossy-regime bounds (undercount <= total decrement, no
false negatives above it), merge behavior across layouts, guards."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from doppel_ray.stages.heavyhitters import _mg_compress, frequent_tokens


def _docs(texts: list[str]) -> rd.Dataset:
    return rd.from_arrow(
        pa.table({"text": pa.array(texts, type=pa.string())})
    )


def _zipf_corpus(n_docs: int = 60, seed: int = 11) -> list[str]:
    rng = np.random.default_rng(seed)
    # zipf-ish: token w{i} drawn with weight 1/(i+1)
    w = 1.0 / np.arange(1, 201)
    w /= w.sum()
    return [
        " ".join(f"w{i}" for i in rng.choice(200, size=50, p=w))
        for _ in range(n_docs)
    ]


def _true_counts(texts: list[str]) -> Counter:
    c: Counter = Counter()
    for t in texts:
        c.update(t.split())
    return c


class TestMGCompress:
    def test_no_compress_when_fits(self):
        toks = np.array(["a", "b"], dtype=object)
        cnts = np.array([5, 3], dtype=np.int64)
        t, c, dec = _mg_compress(toks, cnts, capacity=2)
        assert dec == 0 and list(t) == ["a", "b"] and list(c) == [5, 3]

    def test_compress_decrements_and_drops(self):
        toks = np.array(list("abcde"), dtype=object)
        cnts = np.array([10, 7, 3, 2, 1], dtype=np.int64)
        t, c, dec = _mg_compress(toks, cnts, capacity=2)
        # 3rd largest = 3: a->7, b->4, c/d/e vanish
        assert dec == 3
        assert dict(zip(t, c)) == {"a": 7, "b": 4}


class TestFrequentTokens:
    def test_exact_regime_equals_counts(self, ray_session):
        texts = _zipf_corpus()
        table, dec = frequent_tokens(
            _docs(texts).repartition(5), capacity=10_000, min_count=5
        )
        assert dec == 0
        want = {t: n for t, n in _true_counts(texts).items() if n >= 5}
        got = dict(zip(table["token"].to_pylist(), table["est"].to_pylist()))
        assert got == want
        # sorted by est DESC, token ASC
        ests = table["est"].to_pylist()
        assert ests == sorted(ests, reverse=True)

    def test_lossy_regime_bounds(self, ray_session):
        texts = _zipf_corpus(seed=23)
        true = _true_counts(texts)
        table, dec = frequent_tokens(
            _docs(texts).repartition(6), capacity=20, min_count=1
        )
        assert dec > 0  # 200 distinct >> 20 capacity forces decrements
        got = dict(zip(table["token"].to_pylist(), table["est"].to_pylist()))
        for t, est in got.items():
            assert est <= true[t] <= est + dec, (t, est, true[t], dec)
        # no false negatives above the bound
        for t, n in true.items():
            if n > dec:
                assert t in got, (t, n, dec)

    def test_layout_invariant_in_exact_regime(self, ray_session):
        texts = _zipf_corpus(seed=7)
        results = []
        for parts in (1, 8):
            table, dec = frequent_tokens(
                _docs(texts).repartition(parts), capacity=10_000, min_count=3
            )
            assert dec == 0
            results.append(
                list(zip(table["token"].to_pylist(), table["est"].to_pylist()))
            )
        assert results[0] == results[1]

    def test_guards(self, ray_session):
        with pytest.raises(ValueError, match="capacity"):
            frequent_tokens(_docs(["x"]), capacity=0)
        with pytest.raises(ValueError, match="min_count"):
            frequent_tokens(_docs(["x"]), min_count=0)
