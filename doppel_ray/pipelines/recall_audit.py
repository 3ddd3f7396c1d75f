"""Bench-scale dup-pair recall audit against planted ground truth.

The north rule's acceptance criterion is dup-pair recall >= 0.99 at the
pipeline's own shingle/signature config. `tests/test_minhash.py` pins it
at fixture scale against an all-pairs brute-force oracle; this module
evidences it at BENCH scale (200k+ docs), where all-pairs brute force is
infeasible but the synthetic corpus's generator knows the truth: every
row is either a base doc or derived from exactly one base (exact copy or
one-word substitution), so the qualifying near-dup relation is exactly
the within-family pairs whose exact shingle Jaccard clears the
threshold (`synth.generate_bench_corpus(return_families=True)`).

Metric: CLUSTER-ASSIGNMENT recall — a truth pair counts as recalled
when both docs land in the same connected component of the verified
edge relation (the north rule's own phrasing: "matching ... cluster
assignments (dup-pair recall >= 0.99)"). Edge-level pair recall is the
wrong denominator at this dup density: ring-capped hot bands and
star-form clique emission deliberately emit a SPANNING structure per
duplicate family rather than all O(k^2) pairs — keep-first dedup and
cluster assignment need connectivity, not the transitive closure.
Precision is 1.0 by construction (every emitted edge is exact-Jaccard
verified >= tau before clustering).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from doppel_ray.functions import text as T
from doppel_ray.stages import cluster, minhash


def truth_pairs_from_families(
    table: pa.Table, families: np.ndarray, threshold: float, shingle_n: int
) -> list[tuple[str, str]]:
    """Within-family pairs with exact shingle Jaccard >= threshold —
    the complete qualifying relation for a generator-derived corpus
    (cross-family pairs can't qualify: random draws from the 4000-word
    hash vocabulary share almost no char shingles). Only multi-member
    families' texts are shingled."""
    urls = np.asarray(table["url"].to_pylist(), dtype=object)
    order = np.argsort(families, kind="stable")
    fam_s = families[order]
    edge = np.flatnonzero(np.diff(fam_s)) + 1
    starts = np.concatenate(([0], edge)) if len(fam_s) else np.empty(0, int)
    ends = np.concatenate((edge, [len(fam_s)])) if len(fam_s) else starts
    multi = [(s, e) for s, e in zip(starts, ends) if e - s >= 2]
    rows = np.concatenate([order[s:e] for s, e in multi]) if multi else []
    if len(rows) == 0:
        return []
    texts = table["text"].take(pa.array(rows, type=pa.int64()))
    norm = T.normalize_texts(texts)
    sh = T.unique_shingles([s.encode() for s in norm], shingle_n)
    pos_of = {int(r): k for k, r in enumerate(rows)}
    truth = []
    for s, e in multi:
        members = order[s:e]
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = int(members[i]), int(members[j])
                sa, sb = sh[pos_of[a]], sh[pos_of[b]]
                sim = 1.0 if (len(sa) == 0 and len(sb) == 0) else T.exact_jaccard(sa, sb)
                if sim >= threshold:
                    ua, ub = urls[a], urls[b]
                    truth.append((min(ua, ub), max(ua, ub)))
    return truth


def cluster_recall(
    table: pa.Table,
    families: np.ndarray,
    cfg: minhash.MinHashConfig | None = None,
) -> dict:
    """Run the production near-dedup (edges -> components) over the
    corpus and score cluster-assignment recall against the planted
    truth. Returns a plain-dict artifact for bench/BASELINE."""
    import ray.data

    cfg = cfg or minhash.MinHashConfig()
    truth = truth_pairs_from_families(
        table, families, cfg.threshold, cfg.shingle_n
    )
    pages = ray.data.from_arrow(table.select(["url", "text"]))
    edges = minhash.near_dup_edges(pages, cfg)
    labels = cluster.cluster_edges(edges)
    recalled = sum(
        1
        for a, b in truth
        if a in labels and b in labels and labels[a] == labels[b]
    )
    n_truth = len(truth)
    return {
        "docs": table.num_rows,
        "truth_pairs": n_truth,
        "recalled": recalled,
        "recall": round(recalled / n_truth, 6) if n_truth else None,
        "threshold": cfg.threshold,
        "shingle_n": cfg.shingle_n,
        "num_perm": cfg.num_perm,
        "bands": cfg.bands,
    }
