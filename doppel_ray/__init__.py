"""doppel_ray — a Ray-Data-native near-duplicate detection + clustering engine.

A from-scratch reimplementation of the *capabilities* of dr8co/doppel
(reference at /root/reference, a concurrent Go duplicate-file finder) as
``ray.data.Dataset`` pipelines over zero-copy Arrow batches, generalized from
duplicate *files* to duplicate *documents* in Parquet web-page corpora
(``url, warc_ts, html, text, lang``), plus near-dedup stages the reference
lacks (MinHash/LSH, SimHash, suffix-array containment) mandated by the
project north rule.

Layout:
    functions/  pure vectorized kernels (hashing, text, sizes) — no Ray
    sources/    dataset readers + input-manifest normalization
    stages/     Dataset -> Dataset transforms (map_batches / groupby stages)
    pipelines/  end-to-end compositions + report assembly
    state/      checkpoint manifests, metrics, union-find cluster state
"""

__version__ = "0.1.0"
