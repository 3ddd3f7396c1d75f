"""Collocation lift top-k (stages/collocations.py): brute-force
parity incl. bit-exact lift doubles, boundary masking, layout
invariance, guards."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from doppel_ray.stages.collocations import bigram_lift_topk


def _corpus(seed: int = 5, n: int = 60) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = [f"v{i}" for i in range(12)]
    texts = []
    for i in range(n):
        toks = list(rng.choice(vocab, rng.integers(4, 20)))
        if i % 3 == 0:
            toks[0:0] = ["strong", "pair"]  # planted collocation
        texts.append(" ".join(toks))
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


def _brute(df: pd.DataFrame, k: int, min_count: int) -> pd.DataFrame:
    uni: dict[str, int] = {}
    big: dict[str, int] = {}
    for t in df.text:
        toks = re.findall(r"\S+", (t or "").lower())
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(toks, toks[1:]):
            big[f"{a} {b}"] = big.get(f"{a} {b}", 0) + 1
    n_uni = np.float64(sum(uni.values()))
    n_big = np.float64(sum(big.values()))
    rows = []
    for bg, c in big.items():
        if c < min_count:
            continue
        w1, w2 = bg.split(" ", 1)
        cx, cy = np.float64(uni[w1]), np.float64(uni[w2])
        lift = ((np.float64(c) * n_uni) * n_uni) / ((n_big * cx) * cy)
        rows.append({"bigram": bg, "n": c, "lift": lift})
    out = pd.DataFrame(rows).sort_values(
        ["lift", "bigram"], ascending=[False, True]
    )
    return out.head(k).sort_values("bigram", ignore_index=True).astype(
        {"n": np.int64}
    )


def test_matches_brute_force_bit_exact(ray_session):
    df = _corpus()
    got = (
        bigram_lift_topk(
            rd.from_pandas(df).repartition(5), k=8, min_count=3
        )
        .to_pandas()
        .sort_values("bigram", ignore_index=True)
    )
    want = _brute(df, 8, 3)
    pd.testing.assert_frame_equal(
        got[["bigram", "n", "lift"]], want, check_exact=True
    )
    assert (got.bigram == "strong pair").any()


def test_no_cross_doc_bigrams(ray_session):
    # "x y" only ever appears across a doc boundary -> never counted
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["a b x", "y a b", "a b x", "y a b"],
        }
    )
    got = bigram_lift_topk(
        rd.from_pandas(df).repartition(2), k=10, min_count=1
    ).to_pandas()
    assert not (got.bigram == "x y").any()
    assert (got.bigram == "a b").any()


def test_layout_invariance(ray_session):
    df = _corpus(seed=11, n=40)
    outs = [
        bigram_lift_topk(rd.from_pandas(df).repartition(p), k=6, min_count=2)
        .to_pandas()
        .sort_values("bigram", ignore_index=True)
        for p in (1, 7)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1], check_exact=True)


def test_guards(ray_session):
    ds = rd.from_pandas(_corpus(n=5))
    with pytest.raises(ValueError):
        bigram_lift_topk(ds, k=0)
    with pytest.raises(ValueError):
        bigram_lift_topk(ds, min_count=0)
    with pytest.raises(ValueError, match="vocab_limit"):
        bigram_lift_topk(ds, vocab_limit=1)
