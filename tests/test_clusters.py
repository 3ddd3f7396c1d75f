"""k-means clustering contract tests: planted well-separated blobs are
recovered, assignment is deterministic and layout-invariant, and the
embedding_clusters query keeps its shape on the real fixture."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from doppel_ray.stages.ann import _normalize, batch_matrix
from doppel_ray.stages.semdedup import SemDeDupConfig, train_centroids


def _blob_ds(tmp_path, n_per: int = 120, k: int = 6, dim: int = 32, sep: float = 6.0):
    """k well-separated Gaussian blobs on the unit sphere (after
    normalization) — recoverable by any sane k-means."""
    rng = np.random.default_rng(123)
    centers = rng.normal(size=(k, dim)) * sep
    rows = []
    vid = 0
    for j in range(k):
        pts = centers[j] + rng.normal(size=(n_per, dim))
        for p in pts:
            rows.append({"vec_id": vid, "embedding": p.astype(np.float32).tolist(), "label": j})
            vid += 1
    t = pa.Table.from_pylist(rows)
    path = str(tmp_path / "emb.parquet")
    pq.write_table(t, path)
    return t, path


def _assign_all(t: pa.Table, cent: np.ndarray) -> np.ndarray:
    x = _normalize(batch_matrix(t["embedding"]))
    return np.argmax(x @ cent.T, axis=1)


def test_kmeans_recovers_planted_blobs(ray_session, tmp_path):
    t, _ = _blob_ds(tmp_path)
    ds = ray.data.from_arrow(t).repartition(5)
    cfg = SemDeDupConfig(n_clusters=6, train_num=1000, train_den=1000, kmeans_iters=15)
    cent = train_centroids(ds, cfg)
    a = _assign_all(t, cent)
    lab = t["label"].to_numpy(zero_copy_only=False)
    df = pd.DataFrame({"c": a, "l": lab})
    purity = df.groupby("c")["l"].agg(lambda s: s.value_counts().max()).sum() / len(df)
    assert purity >= 0.95, purity
    # every planted blob maps to its own cluster (bijection)
    assert df.groupby("l")["c"].nunique().max() == 1
    assert df["c"].nunique() == 6


def test_kmeans_training_is_layout_invariant(ray_session, tmp_path):
    t, _ = _blob_ds(tmp_path, n_per=60, k=4)
    cfg = SemDeDupConfig(n_clusters=4, train_num=1000, train_den=1000)
    c1 = train_centroids(ray.data.from_arrow(t).repartition(2), cfg)
    c2 = train_centroids(ray.data.from_arrow(t).repartition(9), cfg)
    np.testing.assert_array_equal(c1, c2)


def test_embedding_clusters_query_shape(ray_session):
    from doppel_ray.pipelines import registry

    out = registry()["embedding_clusters"]("/root/testdata/sf0.001").to_pandas()
    assert list(out.columns) == ["cluster", "n", "majority_label", "n_majority"]
    assert len(out) == 10                      # one row per cluster
    assert out["n"].sum() == 500               # every vector assigned once
    assert (out["n_majority"] <= out["n"]).all()
    assert (out["n_majority"] >= 1).all()
    # deterministic across runs
    out2 = registry()["embedding_clusters"]("/root/testdata/sf0.001").to_pandas()
    pd.testing.assert_frame_equal(out, out2)
