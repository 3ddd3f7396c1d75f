"""Bench-scale recall audit (pipelines/recall_audit.py): the north-rule
dup-pair recall >= 0.99 criterion scored against the bench generator's
planted family ground truth, at a CI-sized corpus. (bench.py --recall
runs the same audit at 200k docs; 2026-08-20: recall 1.0 over 106,605
truth pairs.)"""

from __future__ import annotations

import numpy as np
import pytest

from doppel_ray import synth
from doppel_ray.functions import text as T
from doppel_ray.pipelines.recall_audit import (
    cluster_recall,
    truth_pairs_from_families,
)


def test_families_align_with_corpus():
    # same args, with and without truth: bit-identical corpus
    t0 = synth.generate_bench_corpus(3000, seed=11)
    t1, fam = synth.generate_bench_corpus(3000, seed=11, return_families=True)
    assert t0.equals(t1)
    assert len(fam) == t1.num_rows
    # exact-copy rows really share their family's base text
    texts = t1["text"].to_pylist()
    by_fam: dict[int, list[int]] = {}
    for i, f in enumerate(fam):
        by_fam.setdefault(int(f), []).append(i)
    multi = [m for m in by_fam.values() if len(m) >= 2]
    assert multi  # dup_frac/near_frac planted something
    # within every multi-member family all pairwise Jaccards are high
    # (exact copy = 1.0, one-word substitution ~0.97)
    for m in multi[:50]:
        sh = T.unique_shingles([texts[i].encode() for i in m], 5)
        for a in range(len(m)):
            for b in range(a + 1, len(m)):
                assert T.exact_jaccard(sh[a], sh[b]) >= 0.9


def test_truth_builder_matches_brute_force_small():
    table, fam = synth.generate_bench_corpus(400, seed=5, return_families=True)
    truth = set(truth_pairs_from_families(table, fam, 0.8, 5))
    # brute force over ALL pairs at this tiny scale
    urls = table["url"].to_pylist()
    norm = T.normalize_texts(table["text"])
    sh = T.unique_shingles([s.encode() for s in norm], 5)
    brute = set()
    for i in range(len(urls)):
        for j in range(i + 1, len(urls)):
            if T.exact_jaccard(sh[i], sh[j]) >= 0.8:
                brute.add((min(urls[i], urls[j]), max(urls[i], urls[j])))
    # family-derived truth must equal the full brute-force relation:
    # cross-family pairs never qualify with the hash vocabulary
    assert truth == brute and len(truth) > 0


def test_cluster_recall_ge_099_at_ci_scale(ray_session):
    table, fam = synth.generate_bench_corpus(12000, seed=7, return_families=True)
    out = cluster_recall(table, fam)
    assert out["truth_pairs"] > 3000
    assert out["recall"] is not None and out["recall"] >= 0.99
