"""Windowed funnel (stages/funnel.py), per-group exact quantiles
(stages/quantiles.grouped_quantiles), and global top-k without a sort
(stages/rank.global_topk) — each checked against a brute-force pandas
reference on randomized corpora, plus layout invariance and validation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from doppel_ray.stages.funnel import windowed_funnel
from doppel_ray.stages.quantiles import grouped_quantiles
from doppel_ray.stages.rank import global_topk

# --------------------------------------------------------------- funnel


def _events_df(n_users: int = 60, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    types = ["view", "click", "purchase", "error"]
    for u in range(n_users):
        for _ in range(rng.integers(1, 25)):
            rows.append(
                {
                    "user_id": u,
                    "event_type": types[rng.integers(0, len(types))],
                    "ts_us": int(rng.integers(0, 3 * 86_400_000_000)),
                }
            )
    return pd.DataFrame(rows)


def _brute_funnel(df: pd.DataFrame, seq: list[str], window_us: int) -> dict:
    out = {}
    for u, g in df.groupby("user_id"):
        first = g[g.event_type == seq[0]]
        if first.empty:
            continue
        t0 = int(first.ts_us.min())
        reached, prev, dl = 1, t0, t0 + window_us
        for st in seq[1:]:
            cand = g[(g.event_type == st) & (g.ts_us > prev) & (g.ts_us <= dl)]
            if cand.empty:
                break
            prev = int(cand.ts_us.min())
            reached += 1
        out[u] = reached
    return out


@pytest.mark.parametrize("window_us", [3_600_000_000, 86_400_000_000])
def test_funnel_matches_brute_force(ray_session, window_us):
    df = _events_df()
    seq = ["view", "click", "purchase"]
    ds = ray.data.from_pandas(df.rename(columns={"ts_us": "ts"})).repartition(7)
    got = windowed_funnel(
        ds,
        user_col="user_id",
        type_col="event_type",
        ts_col="ts",
        sequence=seq,
        window_us=window_us,
        num_buckets=8,
    ).to_pandas()
    want = _brute_funnel(df, seq, window_us)
    assert dict(zip(got.user_id, got.stages_completed)) == want


def test_funnel_strictly_after_and_window_edge(ray_session):
    # click AT the view instant must not count (strict >); purchase AT
    # exactly t0+window must count (inclusive <=)
    W = 1000
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 2],
            "event_type": ["view", "click", "purchase"] * 2,
            "ts": [100, 100, 200, 100, 150, 100 + W],
        }
    )
    got = windowed_funnel(
        ray.data.from_pandas(df),
        user_col="user_id",
        type_col="event_type",
        ts_col="ts",
        sequence=["view", "click", "purchase"],
        window_us=W,
        num_buckets=4,
    ).to_pandas()
    r = dict(zip(got.user_id, got.stages_completed))
    assert r == {1: 1, 2: 3}


def test_funnel_validation(ray_session):
    ds = ray.data.from_items([{"user_id": 1, "event_type": "view", "ts": 1}])
    with pytest.raises(ValueError):
        windowed_funnel(
            ds, user_col="user_id", type_col="event_type", ts_col="ts",
            sequence=["view"], window_us=10,
        )
    with pytest.raises(ValueError):
        windowed_funnel(
            ds, user_col="user_id", type_col="event_type", ts_col="ts",
            sequence=["view", "click"], window_us=0,
        )


# ----------------------------------------------------- grouped quantiles


def test_grouped_quantiles_vs_pandas(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c", "d"], 5000),
            "v": rng.integers(0, 300, 5000).astype(np.int64),
        }
    )
    ps = [0.0, 0.25, 0.5, 0.9, 1.0]
    names = [f"q{i}" for i in range(len(ps))]
    got = (
        grouped_quantiles(
            ray.data.from_pandas(df).repartition(9), "g", "v", ps, names,
            num_buckets=4,
        )
        .to_pandas()
        .sort_values("g", ignore_index=True)
    )
    import math

    for _, row in got.iterrows():
        vals = np.sort(df[df.g == row.g].v.to_numpy())
        for p, nm in zip(ps, names):
            idx = max(math.ceil(p * len(vals)) - 1, 0)
            assert row[nm] == vals[idx], (row.g, p)


def test_grouped_quantiles_layout_invariance(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {"g": rng.choice(["x", "y"], 800), "v": rng.integers(0, 40, 800)}
    )
    outs = []
    for parts in (1, 13):
        outs.append(
            grouped_quantiles(
                ray.data.from_pandas(df).repartition(parts), "g", "v",
                [0.5], ["p50"], num_buckets=3,
            )
            .to_pandas()
            .sort_values("g", ignore_index=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_grouped_quantiles_validation(ray_session):
    ds = ray.data.from_items([{"g": "a", "v": 1}])
    with pytest.raises(ValueError):
        grouped_quantiles(ds, "g", "v", [0.5], ["a", "b"])
    with pytest.raises(ValueError):
        grouped_quantiles(ds, "g", "v", [], [])


# ------------------------------------------------------------ global topk


def test_global_topk_matches_sort(ray_session):
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "id": np.arange(4000, dtype=np.int64),
            "score": rng.integers(0, 500, 4000).astype(np.int64),
        }
    )
    got = (
        global_topk(
            ray.data.from_pandas(df).repartition(11),
            ["score", "id"],
            ascending=[False, True],
            k=25,
        )
        .to_pandas()
        .sort_values(["score", "id"], ascending=[False, True], ignore_index=True)
    )
    want = (
        df.sort_values(["score", "id"], ascending=[False, True])
        .head(25)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["id", "score"]], want[["id", "score"]])


def test_global_topk_string_desc_and_small_input(ray_session):
    df = pd.DataFrame({"s": list("dacb"), "id": [0, 1, 2, 3]})
    got = (
        global_topk(
            ray.data.from_pandas(df).repartition(2), ["s"], ascending=[False], k=2
        )
        .to_pandas()
        .sort_values("s", ascending=False, ignore_index=True)
    )
    assert list(got.s) == ["d", "c"]
    # k larger than the corpus: everything survives
    all_rows = global_topk(
        ray.data.from_pandas(df), ["s"], ascending=[True], k=100
    ).to_pandas()
    assert len(all_rows) == 4
    with pytest.raises(ValueError):
        global_topk(ray.data.from_pandas(df), ["s"], k=0)
    with pytest.raises(ValueError):
        global_topk(ray.data.from_pandas(df), ["s"], ascending=[True, False], k=1)
