"""SemDeDup (stages/semdedup.py): planted semantic duplicates resolve
to one representative, brute-force parity at n_clusters=1, layout
invariance, and the quadratic-cluster guard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from doppel_ray.stages import semdedup
from doppel_ray.stages.semdedup import SemDeDupConfig, semantic_dedup


def _emb_table(mat: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "vec_id": pa.array(range(len(mat)), pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in mat], type=pa.list_(pa.float32())
            ),
        }
    )


def _planted(seed: int = 3, n_base: int = 40, dim: int = 16):
    """Random unit-ish vectors + near-copies of the first 5 (3 copies
    each): cross sims are far from 1, copies are ~1."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_base, dim))
    dups = [base[i] + rng.normal(scale=1e-3, size=dim) for i in range(5) for _ in range(3)]
    return np.vstack([base, np.array(dups)])


CFG = SemDeDupConfig(
    n_clusters=4, train_num=1000, train_den=1000, threshold=0.95, num_buckets=8
)


class TestSemanticDedup:
    def test_planted_duplicates_one_representative(self, ray_session):
        mat = _planted()
        out = semantic_dedup(rd.from_arrow(_emb_table(mat)).repartition(4), CFG)
        rows = out.take_all()
        assert len(rows) == len(mat)  # every row has a verdict
        kept = {r["vec_id"] for r in rows if r["kept"]}
        # each planted group {i, 40+3i..40+3i+2} keeps exactly one member
        for i in range(5):
            group = {i, 40 + 3 * i, 40 + 3 * i + 1, 40 + 3 * i + 2}
            assert len(group & kept) == 1, f"group {i}: {group & kept}"
        # unduplicated base vectors all survive
        assert set(range(5, 40)) <= kept

    def test_brute_force_parity_single_cluster(self, ray_session):
        mat = _planted(seed=9)
        cfg = SemDeDupConfig(
            n_clusters=1, train_num=1000, train_den=1000, threshold=0.9,
            num_buckets=4,
        )
        ds = rd.from_arrow(_emb_table(mat)).repartition(3)
        rows = semantic_dedup(ds, cfg).take_all()
        # brute force: same centroid fn, same order, full O(m^2) sims
        cent = semdedup.train_centroids(ds, cfg)
        x = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cs = (x @ cent.T).ravel()
        ids = np.arange(len(mat))
        order = np.lexsort((ids, cs))
        xo, ido = x[order], ids[order]
        sims = xo @ xo.T
        want_kept = set()
        for i in range(len(xo)):
            prior = sims[i, :i].max() if i else -1.0
            if prior < cfg.threshold:
                want_kept.add(int(ido[i]))
        assert {r["vec_id"] for r in rows if r["kept"]} == want_kept
        # emitted max_prior_sim matches the brute triangle
        by_id = {r["vec_id"]: r["max_prior_sim"] for r in rows}
        for i in range(1, len(xo)):
            assert by_id[int(ido[i])] == pytest.approx(float(sims[i, :i].max()))

    def test_layout_invariance(self, ray_session):
        mat = _planted(seed=5)
        kept_sets = []
        for parts in (1, 6):
            rows = semantic_dedup(
                rd.from_arrow(_emb_table(mat)).repartition(parts), CFG
            ).take_all()
            kept_sets.append(frozenset(r["vec_id"] for r in rows if r["kept"]))
        assert kept_sets[0] == kept_sets[1]

    def test_guards(self, ray_session):
        mat = _planted()
        ds = rd.from_arrow(_emb_table(mat))
        with pytest.raises(ValueError, match="threshold"):
            semantic_dedup(ds, SemDeDupConfig(threshold=0.0))
        cfg = SemDeDupConfig(
            n_clusters=1, train_num=1000, train_den=1000, cluster_cap=10
        )
        with pytest.raises(Exception, match="cluster_cap"):
            semantic_dedup(ds, cfg).take_all()
