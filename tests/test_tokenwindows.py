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
                    "key": f"{int(r.doc_id):019d}:{i:07d}",
                }
            )
    win = pd.DataFrame(rows)
    g = win.groupby("win_text").agg(cnt=("key", "size"), fk=("key", "min"))
    g = g[g.cnt > 1].reset_index()
    g["first_doc"] = g.fk.str.slice(0, 19).astype(np.int64)
    g["first_pos"] = g.fk.str.slice(20).astype(np.int64)
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


def _brute_removed(df: pd.DataFrame, w: int) -> pd.DataFrame:
    """Reference removal: non-first occurrences of duplicated windows
    mark their tokens; docs rebuilt as the space-join of survivors."""
    import re

    toks = {
        int(r.doc_id): re.findall(_TOK, r.text or "") for _, r in df.iterrows()
    }
    occ: dict[str, list[tuple[int, int]]] = {}
    for d, tk in toks.items():
        for i in range(len(tk) - w + 1):
            occ.setdefault(" ".join(tk[i : i + w]), []).append((d, i))
    cover: dict[int, set[int]] = {d: set() for d in toks}
    for positions in occ.values():
        if len(positions) > 1:
            first = min(positions)
            for d, i in positions:
                if (d, i) != first:
                    cover[d].update(range(i, i + w))
    rows = []
    for d, tk in toks.items():
        kept = [t for i, t in enumerate(tk) if i not in cover[d]]
        rows.append(
            {
                "doc_id": d,
                "text": " ".join(kept),
                "n_tokens": len(tk),
                "n_removed": len(cover[d]),
            }
        )
    return (
        pd.DataFrame(rows)
        .astype({"doc_id": np.int64, "n_tokens": np.int64, "n_removed": np.int64})
        .sort_values("doc_id", ignore_index=True)
    )


class TestRemoveDupSpans:
    def _run(self, df, w, **kw):
        from doppel_ray.stages.tokenwindows import remove_dup_spans

        return (
            remove_dup_spans(
                ray.data.from_pandas(df).repartition(5), window=w, **kw
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
            .astype(
                {"doc_id": np.int64, "n_tokens": np.int64, "n_removed": np.int64}
            )
        )

    @pytest.mark.parametrize("w", [3, 6])
    def test_matches_brute_force(self, ray_session, w):
        df = _corpus(seed=17, n=90)
        pd.testing.assert_frame_equal(self._run(df, w), _brute_removed(df, w))

    def test_bucketed_regime_identical(self, ray_session):
        # broadcast_limit=0 forces the tagged-union doc-id join regime
        df = _corpus(seed=23, n=70)
        pd.testing.assert_frame_equal(
            self._run(df, 4, broadcast_limit=0, num_buckets=7),
            self._run(df, 4),
        )

    def test_first_occurrence_survives(self, ray_session):
        run = "p1 p2 p3 p4 p5 p6"
        df = pd.DataFrame(
            {
                "doc_id": np.array([3, 8, 9], dtype=np.int64),
                "text": [
                    f"{run} alpha",          # min (doc,pos): keeps the run
                    f"lead {run} beta",      # later doc: run removed
                    f"{run} x {run}",        # both copies non-first (doc 3 owns
                ],                           # the min key): both removed
            }
        )
        got = self._run(df, 6).set_index("doc_id")
        assert got.loc[3, "text"] == f"{run} alpha"
        assert got.loc[8, "text"] == "lead beta"
        assert got.loc[9, "text"] == "x"
        assert int(got.loc[9, "n_removed"]) == 12

    def test_unaffected_docs_ws_normalized_passthrough(self, ray_session):
        df = pd.DataFrame(
            {
                "doc_id": np.array([1, 2], dtype=np.int64),
                "text": ["  a\t\tb   c  ", None],
            }
        )
        got = self._run(df, 3).set_index("doc_id")
        assert got.loc[1, "text"] == "a b c"
        assert got.loc[2, "text"] == ""
        assert got["n_removed"].sum() == 0

    def test_string_verify_identical(self, ray_session):
        # the exact string-verify path and the default 128-bit hash-pair
        # path agree end-to-end (and the brute-force tests above pin the
        # default path independently); the pair RELATIONS agree as sets
        from doppel_ray.stages.tokenwindows import removal_pairs

        df = _corpus(seed=29, n=80)
        pd.testing.assert_frame_equal(
            self._run(df, 5), self._run(df, 5, verify="string")
        )
        ds = ray.data.from_pandas(df).repartition(5)
        got = {
            v: set(
                map(
                    tuple,
                    removal_pairs(ds, window=5, verify=v)
                    .to_pandas()
                    .values.tolist(),
                )
            )
            for v in ("hash128", "string")
        }
        assert got["hash128"] == got["string"] and len(got["string"]) > 0

    def test_bad_verify_rejected(self, ray_session):
        from doppel_ray.stages.tokenwindows import removal_pairs

        with pytest.raises(ValueError, match="verify"):
            removal_pairs(
                ray.data.from_pandas(_corpus(n=5)), window=3, verify="md5"
            )

    def test_layout_invariance(self, ray_session):
        from doppel_ray.stages.tokenwindows import remove_dup_spans

        df = _corpus(seed=31, n=50)
        outs = [
            remove_dup_spans(
                ray.data.from_pandas(df).repartition(p), window=5
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
            for p in (1, 13)
        ]
        pd.testing.assert_frame_equal(outs[0], outs[1])
