"""Count-Min sketch (stages/cms.py): brute-force grid parity, the
est >= true guarantee, exactness at collision-free width, layout
invariance, DuckDB grid parity on a random corpus, validation."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from doppel_ray.stages.cms import build_cms, cms_point_estimates

_TOK = r"[^\t\n\f\r ]+"


def _corpus(seed: int = 7, n: int = 80) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = [f"t{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(3, 25))) for _ in range(n)
    ]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


def _h(tok: str, j: int, width: int) -> int:
    return (
        int.from_bytes(hashlib.md5(f"{tok}#{j}".encode()).digest()[:8], "little")
        % width
    )


def _brute_grid(df: pd.DataFrame, depth: int, width: int) -> np.ndarray:
    import re

    grid = np.zeros((depth, width), dtype=np.int64)
    for t in df.text:
        for tok in re.findall(_TOK, t or ""):
            for j in range(depth):
                grid[j, _h(tok, j, width)] += 1
    return grid


class TestBuildCMS:
    def test_matches_brute_force_grid(self, ray_session):
        df = _corpus()
        depth, width = 3, 32
        got = (
            build_cms(
                ray.data.from_pandas(df).repartition(6),
                width=width,
                depth=depth,
            )
            .to_pandas()
            .sort_values("slot_key", ignore_index=True)
        )
        grid = _brute_grid(df, depth, width).ravel()
        nz = np.flatnonzero(grid)
        pd.testing.assert_frame_equal(
            got,
            pd.DataFrame({"slot_key": nz, "cnt": grid[nz]}),
        )

    def test_layout_invariance(self, ray_session):
        df = _corpus(seed=11)
        outs = [
            build_cms(ray.data.from_pandas(df).repartition(p), width=16, depth=4)
            .to_pandas()
            .sort_values("slot_key", ignore_index=True)
            for p in (1, 9)
        ]
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_validation(self, ray_session):
        with pytest.raises(ValueError):
            build_cms(ray.data.from_pandas(_corpus(n=3)), width=0)


class TestPointEstimates:
    def test_overestimate_bound_and_exactness(self, ray_session):
        df = _corpus(seed=3, n=60)
        import re

        true = pd.Series(
            [t for s in df.text for t in re.findall(_TOK, s)]
        ).value_counts()
        probes = ["t0", "t7", "t39", "absent_tok"]
        # tight width: collisions guaranteed (40-token vocab into 8 slots)
        tight = cms_point_estimates(
            ray.data.from_pandas(df).repartition(4), probes, width=8, depth=3
        ).to_pandas()
        for _, r in tight.iterrows():
            assert r.cms_est >= r.true_cnt
            assert r.true_cnt == int(true.get(r.token, 0))
        assert (tight.cms_est > tight.true_cnt).any()
        # collision-free width: estimates are exact for every probe
        wide = cms_point_estimates(
            ray.data.from_pandas(df).repartition(4),
            probes,
            width=1 << 20,
            depth=3,
        ).to_pandas()
        assert (wide.cms_est == wide.true_cnt).all()

    def test_validation(self, ray_session):
        ds = ray.data.from_pandas(_corpus(n=3))
        with pytest.raises(ValueError):
            cms_point_estimates(ds, [])
        with pytest.raises(ValueError):
            cms_point_estimates(ds, ["a", "a"])

    def test_duckdb_grid_parity(self, ray_session):
        import duckdb

        df = _corpus(seed=19, n=50)
        got = (
            build_cms(ray.data.from_pandas(df).repartition(5), width=16, depth=2)
            .to_pandas()
            .sort_values("slot_key", ignore_index=True)
        )
        con = duckdb.connect()
        con.register("docs", df)
        want = con.execute(
            r"""
            WITH toks AS (SELECT unnest(regexp_extract_all(text,
                                 '[^\t\n\f\r ]+')) AS tok FROM docs),
            cells AS (
              SELECT j * 16 + CAST(md5_number_upper(tok || '#' ||
                     CAST(j AS VARCHAR)) % 16 AS BIGINT) AS slot_key,
                     count(*)::BIGINT AS cnt
              FROM toks, UNNEST(generate_series(0, 1)) AS g(j)
              GROUP BY 1)
            SELECT slot_key, cnt FROM cells ORDER BY slot_key
            """
        ).df()
        pd.testing.assert_frame_equal(got, want)
