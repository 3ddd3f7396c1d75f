"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"): k-means-cluster the embeddings, then
inside each cluster drop every example whose cosine similarity to an
EARLIER cluster member (in a fixed processing order) exceeds a
threshold. Catches paraphrases/translations/re-renders that lexical
MinHash/SimHash miss.

Scale shape:

1. **train** — centroids fit on a deterministic hash sample
   (stages/sample.py rule, layout-invariant, unlike
   ``Dataset.random_sample``) pulled to the driver; sample size — not
   corpus size — bounds driver memory (the FAISS-style regime shared
   with ann.train_ivf_centroids). Lloyd iterations use cosine
   assignment on normalized vectors.
2. **assign** — one ``map_batches`` matmul against the broadcast
   centroid matrix: (vec_id, cluster, cent_sim). Zero shuffle.
3. **in-cluster dedup** — ONE bucketed shuffle of (id, cluster,
   vector) co-locates each cluster (``bucketed_group_apply``; many
   clusters per bucket). Within a cluster, members are ordered by
   (cent_sim ASC, vec_id ASC) — the paper's default keeps the
   LOW-centroid-similarity representative — and each member's max
   cosine to any EARLIER member is computed with blocked matmuls
   (O(m^2) flops, O(m x block) memory); ``max_prior_sim >= threshold``
   marks it a semantic duplicate. Per-cluster cost is the reason
   ``n_clusters`` must scale with the corpus (target members-per-
   cluster in the low tens of thousands; ``cluster_cap`` guards the
   quadratic blowup of a degenerate clustering).

The emitted relation keeps EVERY row with its verdict — (vec_id,
cluster, cent_sim, max_prior_sim, kept) — so downstream can filter
``kept`` or audit near-threshold calls without a second pass.

The reference has no semantic dedup (byte-exact only); this extends the
same keep-one-representative contract (SURVEY.md G4) to embedding
space, as mandated by the build brief's training-data surface.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from doppel_ray.stages.ann import _normalize, batch_matrix
from doppel_ray.stages.exact import bucketed_group_apply
from doppel_ray.stages.sample import hash_sample
from doppel_ray.stages.util import cached_get, collect_table

OUT_SCHEMA = pa.schema(
    [
        ("vec_id", pa.int64()),
        ("cluster", pa.int64()),
        ("cent_sim", pa.float64()),
        ("max_prior_sim", pa.float64()),
        ("kept", pa.bool_()),
    ]
)


@dataclass(frozen=True)
class SemDeDupConfig:
    n_clusters: int = 32
    kmeans_iters: int = 10
    #: hash-sample rate num/den for the driver training sample; size
    #: n_clusters so the expected sample is >= ~50x n_clusters
    train_num: int = 200
    train_den: int = 1000
    train_limit: int = 1_000_000   # hard cap on collected training rows
    threshold: float = 0.95        # cosine; >= drops the later member
    seed: int = 42
    num_buckets: int = 64
    #: per-CLUSTER member cap: the in-cluster pass is O(m^2) flops, so a
    #: degenerate clustering (one mega-cluster) must fail loudly —
    #: raise n_clusters instead
    cluster_cap: int = 100_000
    sim_block: int = 4096          # column block for the blocked matmul


def train_centroids(
    ds: Dataset, cfg: SemDeDupConfig, *, vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic, layout-invariant k-means: the training set is a
    hash sample keyed on ``id_col`` (same rows at any block layout),
    sorted by id before seeding so init is a pure function of the data.
    Seeding is k-means++ (D^2-weighted, seeded rng) — plain uniform
    init routinely lands the split-one-blob/merge-two local minimum
    even on well-separated clusters (pinned in tests/test_clusters.py:
    planted 6-blob purity 0.83 uniform vs 1.0 with ++)."""
    sample = hash_sample(
        ds.select_columns([id_col, vec_col]),
        id_col,
        num=cfg.train_num,
        den=cfg.train_den,
        method="sip64",
    )
    t = collect_table(sample)
    if t.num_rows > cfg.train_limit:
        raise RuntimeError(
            f"{t.num_rows} training rows exceed train_limit="
            f"{cfg.train_limit}; lower train_num/train_den"
        )
    if t.num_rows == 0:  # degenerate corpora: fall back to the full set
        t = collect_table(ds.select_columns([id_col, vec_col]))
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    x = _normalize(batch_matrix(t[vec_col]))[np.argsort(ids)]
    rng = np.random.default_rng(cfg.seed)
    k = min(cfg.n_clusters, len(x))
    cent = np.empty((k, x.shape[1]), dtype=x.dtype)
    cent[0] = x[rng.integers(len(x))]
    d = np.maximum(0.0, 1.0 - x @ cent[0])  # cosine distance to nearest seed
    for j in range(1, k):
        w = d * d
        s = w.sum()
        idx = rng.choice(len(x), p=w / s) if s > 0 else rng.integers(len(x))
        cent[j] = x[idx]
        d = np.minimum(d, np.maximum(0.0, 1.0 - x @ cent[j]))
    for _ in range(cfg.kmeans_iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for j in range(k):
            m = x[assign == j]
            if len(m):
                c = m.mean(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    cent[j] = c / n
    return cent


def _max_prior_sim(x: np.ndarray, block: int) -> np.ndarray:
    """For row i of (ordered, normalized) x: max cosine to rows < i.
    Blocked upper-triangle matmuls — O(m x block) peak memory."""
    m = len(x)
    out = np.full(m, -1.0)
    for a in range(1, m, block):
        b = min(a + block, m)
        sims = x[:b] @ x[a:b].T  # (b, b-a): rows are potential priors
        cols = np.arange(a, b)
        mask = np.arange(b)[:, None] >= cols[None, :]  # row i not prior of col i
        sims[mask] = -1.0
        out[a:b] = sims.max(axis=0)
    return out


def semantic_dedup(
    ds: Dataset,
    cfg: SemDeDupConfig | None = None,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> Dataset:
    """Every row with its SemDeDup verdict; filter ``kept`` downstream."""
    cfg = cfg or SemDeDupConfig()
    if not 0.0 < cfg.threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {cfg.threshold}")
    cent = train_centroids(ds, cfg, vec_col=vec_col, id_col=id_col)
    ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = cached_get(ref)
        x = _normalize(batch_matrix(batch[vec_col]))
        if x.shape[0] == 0:
            return pa.table(
                {
                    "vec_id": batch[id_col],
                    "cluster": pa.array([], type=pa.int64()),
                    "cent_sim": pa.array([], type=pa.float64()),
                    vec_col: batch[vec_col],
                }
            )
        sims = x @ c.T
        cl = np.argmax(sims, axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch[id_col].cast(pa.int64()),
                "cluster": pa.array(cl),
                "cent_sim": pa.array(sims[np.arange(len(cl)), cl]),
                vec_col: batch[vec_col],
            }
        )

    assigned = ds.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pyarrow"
    )

    tau, cap, blk = cfg.threshold, cfg.cluster_cap, cfg.sim_block

    def dedup_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return OUT_SCHEMA.empty_table()
        ids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cl = g["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        cs = g["cent_sim"].to_numpy(zero_copy_only=False)
        x = _normalize(batch_matrix(g[vec_col]))
        # paper-default order: farthest-from-centroid first (kept), ties
        # by id — deterministic at any layout
        order = np.lexsort((ids, cs))
        ids, cl, cs, x = ids[order], cl[order], cs[order], x[order]
        # stable sort by cluster preserves the in-cluster order
        corder = np.argsort(cl, kind="stable")
        ids, cl, cs, x = ids[corder], cl[corder], cs[corder], x[corder]
        starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
        ends = np.r_[starts[1:], len(cl)]
        mps = np.empty(len(cl))
        for s, e in zip(starts, ends):
            if e - s > cap:
                raise RuntimeError(
                    f"cluster {cl[s]} has {e - s} members > cluster_cap="
                    f"{cap}; raise n_clusters for this corpus"
                )
            mps[s:e] = _max_prior_sim(x[s:e], blk)
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "cluster": pa.array(cl),
                "cent_sim": pa.array(cs, type=pa.float64()),
                "max_prior_sim": pa.array(mps, type=pa.float64()),
                "kept": pa.array(mps < tau),
            },
            schema=OUT_SCHEMA,
        )

    return bucketed_group_apply(
        assigned, "cluster", dedup_bucket, num_buckets=cfg.num_buckets
    )
