"""Checkpointed end-to-end dedup job: every wide stage lands its compact
artifact (groups / edges / cluster assignments) behind a Parquet
checkpoint with per-partition lineage, so a killed run resumes from the
last completed stage boundary (north rule: resumable with lineage +
metrics records).

Stage boundaries checkpoint DERIVED, compact artifacts only — duplicate
groups, candidate edges, cluster labels — never a copy of the corpus:
the source Parquet is itself the stage-0 checkpoint, and every stage
re-streams it with column pruning. At 100 TB the checkpoints stay
megabytes while the corpus never lands twice.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyarrow as pa

import ray.data
from ray.data import Dataset

from doppel_ray import config as C
from doppel_ray.pipelines.dedup import compile_filters, minhash_config
from doppel_ray.sources.parquet import read_pages
from doppel_ray.stages import cluster as cluster_mod
from doppel_ray.stages import exact, filters, minhash, simhash, substring
from doppel_ray.state.checkpoint import CheckpointContext, input_fingerprint


@dataclass
class JobResult:
    groups: Dataset
    edges: Dataset | None
    clusters: Dataset | None
    ctx: CheckpointContext
    resumed_stages: list[str] = field(default_factory=list)
    computed_stages: list[str] = field(default_factory=list)


def run_dedup_job(
    source: str | list[str],
    ckpt_root: str,
    cfg: C.JobConfig | None = None,
    *,
    near: bool = True,
    with_simhash: bool = False,
    with_containment: bool = False,
    checkpoint_signatures: bool = False,
) -> JobResult:
    """Full cascade with stage checkpoints:

        exact_groups -> [minhash_edges (+simhash/containment)] -> clusters

    Rerunning with the same inputs + config skips every completed stage
    (manifest fingerprint hit); changing config or inputs invalidates
    exactly the affected suffix of the chain.

    ``checkpoint_signatures=True`` inserts a ``signatures`` stage before
    ``minhash_edges``: the narrow (url, band_key) rows checkpoint to
    Parquet and a run that dies mid-near-dedup resumes past the
    compute-dominant signing pass. Tradeoff, documented: precomputed
    signatures disable the exact-dup pre-prune (results identical —
    prune==unpruned equivalence pinned; the prune is itself a compute
    saving, so prefer the default on heavily-duplicated corpora and
    signature checkpointing on mostly-unique ones).
    """
    cfg = cfg or C.default_config()
    ctx = CheckpointContext(ckpt_root, input_fingerprint(source))
    fc = compile_filters(cfg)

    def pages() -> Dataset:
        return filters.apply_filters(read_pages(source), fc)

    groups_res = ctx.run_stage(
        "exact_groups",
        lambda: exact.exact_duplicate_groups(pages()),
        config=cfg.find,
    )

    edges_res = None
    clusters_res = None
    if near:
        mh_cfg = minhash_config(cfg)
        if checkpoint_signatures:
            import dataclasses

            mh_cfg = dataclasses.replace(mh_cfg, prune_exact=False)
            sig_res = ctx.run_stage(
                "signatures",
                lambda: minhash.signatures(
                    pages(), mh_cfg, with_eq=mh_cfg.is_pair_complete
                ),
                config=mh_cfg,
            )
            edges_res = ctx.run_stage(
                "minhash_edges",
                lambda: minhash.near_dup_edges(
                    pages(), mh_cfg, sig=sig_res.dataset
                ),
                config=mh_cfg,
            )
        else:
            edges_res = ctx.run_stage(
                "minhash_edges",
                lambda: minhash.near_dup_edges(pages(), mh_cfg),
                config=mh_cfg,
            )
        edge_sets = [edges_res]
        if with_simhash:
            sh_cfg = simhash.SimHashConfig()
            edge_sets.append(
                ctx.run_stage(
                    "simhash_edges",
                    lambda: simhash.simhash_edges(pages(), sh_cfg),
                    config=sh_cfg,
                )
            )
        if with_containment:
            ct_cfg = substring.ContainmentConfig()
            edge_sets.append(
                ctx.run_stage(
                    "containment_edges",
                    lambda: substring.containment_edges(pages(), ct_cfg),
                    config=ct_cfg,
                )
            )

        def build_clusters() -> Dataset:
            es = [r.dataset.select_columns(["url_a", "url_b"]) for r in edge_sets]
            all_edges = es[0]
            for e in es[1:]:
                all_edges = all_edges.union(e)
            labels = cluster_mod.cluster_edges(all_edges)
            if not labels:
                return ray.data.from_arrow(
                    pa.table(
                        {
                            "url": pa.array([], type=pa.string()),
                            "cluster_id": pa.array([], type=pa.string()),
                        }
                    )
                )
            return cluster_mod.assign_clusters(pages(), labels).select_columns(
                ["url", "cluster_id"]
            )

        clusters_res = ctx.run_stage(
            "clusters", build_clusters, config={"members": len(edge_sets)}
        )

    resumed = [s.name for s in ctx.stages if s.resumed]
    computed = [s.name for s in ctx.stages if not s.resumed]
    return JobResult(
        groups=groups_res.dataset,
        edges=edges_res.dataset if edges_res else None,
        clusters=clusters_res.dataset if clusters_res else None,
        ctx=ctx,
        resumed_stages=resumed,
        computed_stages=computed,
    )


@dataclass
class CurationJobResult:
    ledger: Dataset
    status_counts: Dataset
    ctx: CheckpointContext
    resumed_stages: list[str] = field(default_factory=list)
    computed_stages: list[str] = field(default_factory=list)


def run_curation_job(
    source: str | list[str],
    ckpt_root: str,
    *,
    blocked_url_prefixes: tuple[str, ...] = (),
    dim: int = 4096,
    bias: int = 0,
) -> CurationJobResult:
    """Checkpointed intake funnel (stages/curation.py) over a page
    corpus:

        funnel_ledger -> status_counts

    The ledger stage labels every page blocked (URL-prefix policy) ->
    low_quality (hashed-linear classifier) -> duplicate -> kept and
    checkpoints the compact (doc_id, status) relation; the rollup stage
    is the release report. Same resume semantics as run_dedup_job: a
    rerun with identical inputs + policy skips both stages, a policy
    change (prefixes, dim, bias) invalidates exactly the funnel suffix.
    doc_id = sip64(url) — deterministic, so the keep-first tiebreak and
    the resume fingerprint agree across runs.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Count

    from doppel_ray.functions.hashing import sip64
    from doppel_ray.stages import classifier as clf
    from doppel_ray.stages.curation import funnel_ledger

    ctx = CheckpointContext(ckpt_root, input_fingerprint(source))
    prefixes = tuple(sorted(blocked_url_prefixes))

    def prepared() -> Dataset:
        ds = read_pages(source)

        def add(batch: pa.Table) -> pa.Table:
            ids = sip64(batch["url"].to_pandas()).astype(np.int64)
            urls = pc.cast(batch["url"], pa.string())
            blocked = np.zeros(len(batch), dtype=bool)
            for p in prefixes:
                blocked |= np.asarray(
                    pc.fill_null(pc.starts_with(urls, p), False).to_numpy(
                        zero_copy_only=False
                    ),
                    dtype=bool,
                )
            return pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "text": batch["text"],
                    "blocked": pa.array(blocked),
                }
            )

        return ds.map_batches(add, batch_format="pyarrow")

    policy = {"prefixes": prefixes, "dim": dim, "bias": bias}
    ledger_res = ctx.run_stage(
        "funnel_ledger",
        lambda: funnel_ledger(
            prepared(), clf.derived_weights(dim), bias=bias
        ),
        config=policy,
    )
    counts_res = ctx.run_stage(
        "status_counts",
        lambda: ledger_res.dataset.groupby("status").aggregate(
            Count(alias_name="n")
        ),
        config=policy,
    )
    resumed = [s.name for s in ctx.stages if s.resumed]
    computed = [s.name for s in ctx.stages if not s.resumed]
    return CurationJobResult(
        ledger=ledger_res.dataset,
        status_counts=counts_res.dataset,
        ctx=ctx,
        resumed_stages=resumed,
        computed_stages=computed,
    )


@dataclass
class SpanRemovalJobResult:
    pairs: Dataset
    docs: Dataset
    ctx: CheckpointContext
    resumed_stages: list[str] = field(default_factory=list)
    computed_stages: list[str] = field(default_factory=list)


def run_span_removal_job(
    source: str | list[str],
    ckpt_root: str,
    *,
    window: int = 8,
) -> SpanRemovalJobResult:
    """Checkpointed substring-level dedup REMOVAL (Lee et al. 2022;
    stages/tokenwindows.remove_dup_spans) over a page corpus.

    ONE stage checkpoints: the narrow ``(doc_id, pos)`` removal-pair
    relation (bounded by duplicated-token volume — megabytes at any
    corpus size where the job is worth running). The rewrite is NOT a
    checkpoint stage — landing the full rewritten corpus would violate
    this module's compact-artifacts-only contract ("the corpus never
    lands twice") — it re-derives from the checkpointed pairs with one
    streaming pass over the source, regime-switched exactly like
    `remove_dup_spans` (broadcast below ``REBUILD_BROADCAST_LIMIT``
    pairs, tagged-union bucketed doc-id join above). A rerun with
    identical input + window resumes the pair stage and recomputes only
    that cheap pass; changing ``window`` invalidates the pairs. doc_id =
    sip64(url) >> 1 (non-negative, deterministic), so the
    first-occurrence tiebreak and the resume fingerprint agree across
    runs.
    """
    import numpy as np

    from doppel_ray.functions.hashing import sip64
    from doppel_ray.stages import tokenwindows as tw

    ctx = CheckpointContext(ckpt_root, input_fingerprint(source))
    policy = {"window": window}

    def prepared() -> Dataset:
        ds = read_pages(source)

        def add(batch: pa.Table) -> pa.Table:
            ids = (sip64(batch["url"].to_pandas()) >> np.uint64(1)).astype(
                np.int64
            )
            return pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "text": batch["text"],
                }
            )

        return ds.map_batches(add, batch_format="pyarrow")

    pairs_res = ctx.run_stage(
        "removal_pairs",
        lambda: tw.removal_pairs(prepared(), window=window),
        config=policy,
    )

    docs = tw.rebuild_from_pairs(
        prepared(),
        pairs_res.dataset,
        window=window,
        n_pairs=pairs_res.rows,
    )
    resumed = [s.name for s in ctx.stages if s.resumed]
    computed = [s.name for s in ctx.stages if not s.resumed]
    return SpanRemovalJobResult(
        pairs=pairs_res.dataset,
        docs=docs,
        ctx=ctx,
        resumed_stages=resumed,
        computed_stages=computed,
    )
