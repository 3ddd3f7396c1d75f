"""End-to-end duplicate-finding pipelines: the Ray-Data lifecycle of
``doppel find`` (SURVEY.md §3.1, §3.4).

    config -> read_parquet (pruned columns) -> exclusion filters
           -> size -> quick-hash -> full-hash cascade (pruned groupbys)
           -> duplicate groups  [exact]
           -> MinHash/LSH -> verify -> union-find   [near, optional]
           -> groups/clusters parquet + driver-side report

The reference's phase structure (scan -> hash cascade -> output,
cmd/find.go:206-288) maps to: source read + filter stage; the exact
cascade of stages/exact.py; report assembly of pipelines/report.py.
"""

from __future__ import annotations

import time

import pyarrow as pa

from ray.data import Dataset

from doppel_ray import config as C
from doppel_ray.pipelines import report as R
from doppel_ray.sources.parquet import read_pages
from doppel_ray.stages import cluster as cluster_mod
from doppel_ray.stages import exact, filters, minhash
from doppel_ray.functions.sizes import parse_size


def compile_filters(cfg: C.JobConfig) -> filters.FilterConfig:
    """FindConfig -> compiled FilterConfig (cmd/find.go:154-183 analog:
    preset bypasses parse/build, carrying pre-compiled sizes —
    cmd/preset.go:98-131)."""
    if cfg.find.preset:
        return filters.get_preset_config(cfg.find.preset)
    return filters.build_filter_config(
        exclude_dirs=cfg.find.exclude_dirs,
        exclude_files=cfg.find.exclude_files,
        exclude_dir_regex=cfg.find.exclude_dir_regex,
        exclude_file_regex=cfg.find.exclude_file_regex,
        min_size=parse_size(cfg.find.min_size),
        max_size=parse_size(cfg.find.max_size),
    )


def minhash_config(cfg: C.JobConfig) -> minhash.MinHashConfig:
    d = cfg.dedup
    return minhash.MinHashConfig(
        num_perm=d.num_perm,
        bands=d.bands,
        shingle_n=d.shingle_n,
        threshold=d.threshold,
        band_cap=d.band_cap,
        seed=d.seed,
    )


def _near_groups(filtered: Dataset, labels: dict[str, str]) -> list[dict]:
    """Near-dup clusters -> kind-tagged group rows for the report.

    One semi-filtered corpus pass fetches the clustered docs' sizes
    (clustered docs are a small subset by construction); per cluster the
    report row keeps the LARGEST member as the representative ``size``
    and counts everything beyond it as ``wasted_space`` — for near-dups
    sizes differ, so "all but one copy" generalizes to "all bytes beyond
    the biggest member".
    """
    import pyarrow.compute as pc

    from doppel_ray.functions.hashing import byte_lengths
    from doppel_ray.stages.exact import semi_filter

    urls = pa.array(list(labels.keys()), type=pa.string())
    sizes: dict[str, int] = {}
    sel = semi_filter(filtered.select_columns(["url", "text"]), "url", urls)

    def add_size(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch["url"],
                "size": pa.array(byte_lengths(batch["text"])),
            }
        )

    for b in sel.map_batches(add_size, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for u, s in zip(b["url"].to_pylist(), b["size"].to_pylist()):
            sizes[u] = int(s)

    clusters: dict[str, list[str]] = {}
    for u, c in labels.items():
        clusters.setdefault(c, []).append(u)
    out = []
    for label, members in sorted(clusters.items()):
        if len(members) < 2:
            continue
        members.sort()
        msizes = [sizes.get(u, 0) for u in members]
        biggest = max(msizes)
        out.append(
            {
                "group_id": label,
                "count": len(members),
                "size": biggest,
                "wasted_space": sum(msizes) - biggest,
                "files": members,
                "kind": "near",
            }
        )
    return out


def find_duplicates(
    source: Dataset | str | list[str],
    cfg: C.JobConfig | None = None,
    *,
    near: bool = False,
    out_dir: str | None = None,
    with_stats: bool = True,
    report_cap: int = 10_000,
) -> tuple[R.DuplicateReport, Dataset]:
    """Run the full find pipeline; returns (report, groups dataset).

    ``near=True`` additionally runs MinHash/LSH and merges near-dup
    clusters into the report's group list, kind-tagged: exact groups
    carry ``kind="exact"``; each near-dup cluster becomes a
    ``kind="near"`` group whose ``size`` is the largest member and whose
    ``wasted_space`` is the total bytes beyond that largest member.
    ``out_dir`` writes groups (and cluster assignments when near=True) as
    partitioned parquet. ``with_stats=False`` skips the total/processed
    row counts (each an extra pipeline execution) for benchmarking.

    The in-memory report streams the groups dataset batch-by-batch and
    keeps at most ``report_cap`` groups (largest ``wasted_space`` first);
    aggregate stats (group/file counts, total wasted bytes) cover ALL
    groups regardless. The FULL group list lives only in the ``out_dir``
    parquet artifact — reference semantics, without a corpus-scale
    ``take_all`` on the driver (VERDICT r2 #6).
    """
    import heapq

    cfg = cfg or C.default_config()
    t0 = time.monotonic()

    ds = source if isinstance(source, Dataset) else read_pages(source)
    total_files = ds.count() if with_stats else 0

    fc = compile_filters(cfg)
    filtered = filters.apply_filters(ds, fc)
    processed_files = filtered.count() if with_stats else 0

    groups_ds = exact.exact_duplicate_groups(filtered)

    # top-report_cap by wasted_space via a min-heap; totals over all rows
    heap: list = []
    seq = 0
    n_groups = 0
    n_dup_files = 0
    total_wasted = 0
    for b in groups_ds.iter_batches(batch_format="pyarrow"):
        for g in b.to_pylist():
            g["kind"] = "exact"
            n_groups += 1
            n_dup_files += int(g["count"])
            total_wasted += int(g["wasted_space"])
            heapq.heappush(heap, (int(g["wasted_space"]), seq, g))
            seq += 1
            if len(heap) > report_cap:
                heapq.heappop(heap)

    if near:
        edges = minhash.near_dup_edges(filtered, minhash_config(cfg))
        labels = cluster_mod.cluster_edges(edges)
        if labels:
            if out_dir is not None:
                assigned = cluster_mod.assign_clusters(filtered, labels)
                assigned.select_columns(["url", "cluster_id"]).write_parquet(
                    f"{out_dir}/clusters"
                )
            for g in _near_groups(filtered, labels):
                n_groups += 1
                n_dup_files += int(g["count"])
                total_wasted += int(g["wasted_space"])
                heapq.heappush(heap, (int(g["wasted_space"]), seq, g))
                seq += 1
                if len(heap) > report_cap:
                    heapq.heappop(heap)

    groups = [g for _, _, g in heap]

    duration = time.monotonic() - t0
    rep = R.report_from_groups(
        groups,
        total_files=total_files,
        processed_files=processed_files,
        skipped_files=total_files - processed_files,
        duration_s=duration,
        total_wasted_space=total_wasted,
        duplicate_groups=n_groups,
        duplicate_files=n_dup_files,
    )
    if out_dir is not None:
        groups_ds.write_parquet(f"{out_dir}/groups")
    return rep, groups_ds
