"""Duplicated token-window detection (stages/tokenwindows.py) vs a
brute-force reference: exact relation, Bloom-prefilter equivalence,
layout invariance, validation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from doppel_ray.stages.tokenwindows import dup_token_windows

_TOK = r"[^\t\n\f\r ]+"


def _brute(df: pd.DataFrame, w: int) -> pd.DataFrame:
    import re

    rows = []
    for _, r in df.iterrows():
        toks = re.findall(_TOK, r.text or "")
        for i in range(len(toks) - w + 1):
            rows.append(
                {
                    "win_text": " ".join(toks[i : i + w]),
                    "key": f"{int(r.doc_id):012d}:{i:07d}",
                }
            )
    win = pd.DataFrame(rows)
    g = win.groupby("win_text").agg(cnt=("key", "size"), fk=("key", "min"))
    g = g[g.cnt > 1].reset_index()
    g["first_doc"] = g.fk.str.slice(0, 12).astype(np.int64)
    g["first_pos"] = g.fk.str.slice(13).astype(np.int64)
    return g.drop(columns="fk").sort_values("win_text", ignore_index=True)


def _corpus(seed: int = 41, n: int = 120) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(n):
        toks = list(rng.choice(vocab, rng.integers(5, 30)))
        if i % 4 == 0:
            # planted 6-token run shared by every 4th doc
            toks[1:1] = ["P1", "P2", "P3", "P4", "P5", "P6"]
        texts.append(" ".join(toks))
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


@pytest.mark.parametrize("w", [3, 6])
def test_matches_brute_force(ray_session, w):
    df = _corpus()
    got = (
        dup_token_windows(
            ray.data.from_pandas(df).repartition(7), window=w
        )
        .to_pandas()
        .sort_values("win_text", ignore_index=True)
    )
    want = _brute(df, w)
    pd.testing.assert_frame_equal(
        got[["win_text", "cnt", "first_doc", "first_pos"]],
        want[["win_text", "cnt", "first_doc", "first_pos"]],
    )


def test_bloom_prefilter_path_identical(ray_session):
    df = _corpus(seed=5, n=60)
    exact = (
        dup_token_windows(ray.data.from_pandas(df).repartition(3), window=4)
        .to_pandas()
        .sort_values("win_text", ignore_index=True)
    )
    bloom = (
        dup_token_windows(
            ray.data.from_pandas(df).repartition(3), window=4, bloom_limit=0
        )
        .to_pandas()
        .sort_values("win_text", ignore_index=True)
    )
    pd.testing.assert_frame_equal(exact, bloom)


def test_layout_invariance_and_edges(ray_session):
    df = _corpus(seed=9, n=40)
    outs = [
        dup_token_windows(ray.data.from_pandas(df).repartition(p), window=5)
        .to_pandas()
        .sort_values("win_text", ignore_index=True)
        for p in (1, 11)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # null/short/empty docs never crash and produce no windows
    tiny = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": [None, "a b", ""]}
    ).astype({"doc_id": np.int64})
    got = dup_token_windows(
        ray.data.from_pandas(tiny), window=3
    ).to_pandas()
    assert len(got) == 0
    with pytest.raises(ValueError):
        dup_token_windows(ray.data.from_pandas(tiny), window=1)
