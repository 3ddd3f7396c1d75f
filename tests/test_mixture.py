"""Token-budget mixture fill (stages/mixture.py): prefix semantics vs a
brute-force oracle, coarse-bits invariance, layout invariance, edge
budgets, and the marginal-limit guard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from doppel_ray.functions.text import md5_token_hash64
from doppel_ray.stages.mixture import token_budget_fill


def _corpus(n_docs: int = 120, n_strata: int = 3, seed: int = 7):
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(f"w{rng.integers(50)}" for _ in range(rng.integers(0, 30)))
        for _ in range(n_docs)
    ]
    strata = [f"s{i % n_strata}" for i in range(n_docs)]
    return pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "source": pa.array(strata),
            "text": pa.array(texts),
        }
    )


def _brute(t: pa.Table, budgets: dict, default: int) -> set[int]:
    """Reference: per stratum, sort by (md5(key), key), cumsum <= budget."""
    ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
    strata = np.asarray(t["source"].to_pylist(), dtype=object)
    n = np.asarray(
        [len(s.split()) if s else 0 for s in t["text"].to_pylist()],
        dtype=np.int64,
    )
    h = md5_token_hash64(np.asarray([str(i) for i in ids], dtype=object))
    kept: set[int] = set()
    for s in set(strata):
        m = strata == s
        order = np.lexsort((ids[m], h[m]))
        cum = np.cumsum(n[m][order])
        b = budgets.get(s, default)
        kept.update(ids[m][order][cum <= b].tolist())
    return kept


BUDGETS = {"s0": 150, "s1": 0}


class TestTokenBudgetFill:
    def test_matches_brute_force_prefix(self, ray_session):
        t = _corpus()
        got = token_budget_fill(
            rd.from_arrow(t).repartition(5),
            "source",
            BUDGETS,
            default_budget=90,
            coarse_bits=3,
        ).take_all()
        assert {r["doc_id"] for r in got} == _brute(t, BUDGETS, 90)
        # emitted n_tokens are the whitespace token counts
        by_id = {r["doc_id"]: r for r in got}
        for i, txt in enumerate(t["text"].to_pylist()):
            if i in by_id:
                assert by_id[i]["n_tokens"] == len(txt.split())

    @pytest.mark.parametrize("bits", [1, 8, 20])
    def test_coarse_bits_invariance(self, ray_session, bits):
        t = _corpus(80)
        want = _brute(t, BUDGETS, 90)
        got = token_budget_fill(
            rd.from_arrow(t).repartition(4),
            "source",
            BUDGETS,
            default_budget=90,
            coarse_bits=bits,
        ).take_all()
        assert {r["doc_id"] for r in got} == want

    def test_layout_invariance(self, ray_session):
        t = _corpus(60)
        sets = []
        for parts in (1, 7):
            got = token_budget_fill(
                rd.from_arrow(t).repartition(parts),
                "source",
                {"s2": 10**9},
                default_budget=40,
                coarse_bits=5,
            ).take_all()
            sets.append(frozenset(r["doc_id"] for r in got))
        assert sets[0] == sets[1]
        # the 10^9 budget keeps every s2 doc
        s2 = {i for i, s in enumerate(t["source"].to_pylist()) if s == "s2"}
        assert s2 <= sets[0]

    def test_zero_budget_and_guards(self, ray_session):
        t = _corpus(30)
        got = token_budget_fill(
            rd.from_arrow(t), "source", {}, default_budget=0, coarse_bits=4
        ).take_all()
        # zero budget keeps only zero-token docs that precede any tokens
        assert all(r["n_tokens"] == 0 for r in got)
        with pytest.raises(ValueError, match="budget"):
            token_budget_fill(rd.from_arrow(t), "source", {"s0": -1})
        with pytest.raises(ValueError, match="coarse_bits"):
            token_budget_fill(rd.from_arrow(t), "source", {}, coarse_bits=0)
        with pytest.raises(RuntimeError, match="marginal_limit"):
            token_budget_fill(
                rd.from_arrow(t),
                "source",
                {"s0": 1, "s1": 1, "s2": 1},
                coarse_bits=1,
                marginal_limit=1,
            ).take_all()
