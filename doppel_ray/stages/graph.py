"""Iterative graph computation: PageRank over a link graph — the
canonical power-iteration-as-dataflow workload (Page et al. 1999; the
Pregel/GraphX execution shape re-expressed as Ray Data joins/groupbys).
A web-curation pipeline ranks hosts/pages by link authority to pick
crawl frontiers and quality priors; the reference (doppel) has no graph
ops, so this extends the engine's operator families with an ITERATIVE
one (everything else on the surface is a bounded-depth dataflow).

All-integer contract
--------------------
Float PageRank is not cross-engine reproducible (summation order).
Ranks here are int64 micro-units: ``r_0 = scale`` for every node, and

    contrib_unit(v) = r(v) // outdeg(v)                (floor div)
    r'(u) = base + (damp_num * S(u)) // damp_den,
    S(u)  = sum of contrib_unit(v) over edges v->u,
    base  = ((damp_den - damp_num) * scale) // damp_den

— every step exact integer arithmetic, so results are bit-identical at
any parallelism/layout and a SQL oracle unrolling the same iterations
agrees hash-exactly. The classic float formulation is recovered by
``rank / scale`` to ~1e-6. Dangling nodes (no out-edges) RAISE: the
deterministic-redistribution policies all need a convention, and a
silent one corrupts ranks — callers add self-loops if they want the
absorbing treatment.

Ray-Data design
---------------
Per iteration the dataflow is the textbook distributed PageRank:
edges join ranks on src -> (dst, contrib) -> groupby(dst).sum -> left
join back onto the node set. Two regimes, gated like the rest of the
repo:

* ``node count <= broadcast_limit``: the rank vector is a numpy array
  broadcast ONCE per iteration via ``ray.put``; one ``map_batches``
  over the (materialized-once) edges emits per-batch pre-aggregated
  ``(dst, contrib)`` partials, one narrow groupby folds them, and the
  driver scatters the <= node-count result rows into the next vector.
  Edges stream every iteration; only the O(nodes) vector is held.
* above it: ranks stay a Dataset and each iteration is ONE
  ``hash_join(edges, ranks, on=src)`` + narrow ``groupby(dst)`` +
  left hash_join onto the node relation — no driver data paths. The
  per-iteration shuffle volume is edges x 16 B, the inherent cost of
  power iteration (partitioning assumption: co-locating by src would
  let the join be local, noted for a real cluster's edge layout).

Node ids must be non-negative int64. Multi-edges are counted with
multiplicity (outdeg too), matching the SQL twin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Count, Sum

#: above this many nodes the rank vector stops being broadcastable and
#: the per-iteration dataflow switches to distributed joins
BROADCAST_NODE_LIMIT = 2_000_000


def _int64(arr) -> np.ndarray:
    return np.asarray(arr, dtype=np.int64)


def pagerank(
    edges: Dataset,
    *,
    num_iters: int = 5,
    scale: int = 1_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_limit: int = BROADCAST_NODE_LIMIT,
    num_buckets: int = 32,
    seeds=None,
) -> Dataset:
    """Integer PageRank over ``edges``; returns ``(node, rank)`` int64
    for every node appearing as src or dst.

    ``seeds`` switches the computation to TRUSTRANK (Gyongyi et al.
    2004): the teleport mass lands only on the seed whitelist (initial
    ranks = ``scale`` on seeds, 0 elsewhere; per-iteration base term
    only on seeds), so trust flows outward along links from vetted
    nodes and spam farms unreachable from seeds converge to 0. Seeds
    are by definition a small curated list, so they broadcast in both
    regimes; same all-integer contract (bit-identical at any layout,
    SQL-unrollable)."""
    if num_iters < 1:
        raise ValueError("num_iters must be >= 1")
    if not (0 < damp_num < damp_den):
        raise ValueError("need 0 < damp_num < damp_den")
    if scale < damp_den:
        raise ValueError("scale must be >= damp_den")
    seed_arr = None
    if seeds is not None:
        seed_arr = np.unique(np.asarray(seeds, dtype=np.int64))
        if len(seed_arr) == 0:
            raise ValueError("seeds must be non-empty when given")

    edges = edges.select_columns([src_col, dst_col]).materialize()

    # node set + out-degrees: two narrow key-only aggregations
    srcs = edges.groupby(src_col).aggregate(Count(alias_name="od"))
    od_rows = None
    n_nodes_known: int | None = None

    # distinct nodes = union of both endpoints
    def endpoints(batch: pa.Table) -> pa.Table:
        vals = np.union1d(
            _int64(batch[src_col].to_numpy(zero_copy_only=False)),
            _int64(batch[dst_col].to_numpy(zero_copy_only=False)),
        )
        return pa.table({"node": pa.array(vals, type=pa.int64())})

    nodes = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
        .select_columns(["node"])
        .materialize()
    )
    n_nodes_known = nodes.count()

    if n_nodes_known <= broadcast_limit:
        if n_nodes_known == 0:
            return ray.data.from_arrow(
                pa.table(
                    {
                        "node": pa.array([], type=pa.int64()),
                        "rank": pa.array([], type=pa.int64()),
                    }
                )
            )
        od_tbl = pa.concat_tables(
            list(srcs.iter_batches(batch_format="pyarrow"))
        )
        node_ids = np.sort(
            np.concatenate(
                [
                    _int64(b["node"].to_numpy(zero_copy_only=False))
                    for b in nodes.iter_batches(batch_format="pyarrow")
                ]
            )
        )
        if len(node_ids) and node_ids[0] < 0:
            raise ValueError("node ids must be non-negative")
        od = np.zeros(len(node_ids), dtype=np.int64)
        od_keys = _int64(od_tbl[src_col].to_numpy(zero_copy_only=False))
        od[np.searchsorted(node_ids, od_keys)] = _int64(
            od_tbl["od"].to_numpy(zero_copy_only=False)
        )
        if np.any(od == 0):
            raise ValueError(
                "dangling nodes (no out-edges) are not supported; add "
                "self-loops for the absorbing treatment"
            )
        return _pagerank_broadcast(
            edges,
            node_ids,
            od,
            num_iters=num_iters,
            scale=scale,
            damp_num=damp_num,
            damp_den=damp_den,
            src_col=src_col,
            dst_col=dst_col,
            seed_arr=seed_arr,
        )
    return _pagerank_distributed(
        edges,
        nodes,
        srcs,
        num_iters=num_iters,
        scale=scale,
        damp_num=damp_num,
        damp_den=damp_den,
        src_col=src_col,
        dst_col=dst_col,
        num_buckets=num_buckets,
        n_nodes=n_nodes_known,
        seed_arr=seed_arr,
    )


def _pagerank_broadcast(
    edges: Dataset,
    node_ids: np.ndarray,
    od: np.ndarray,
    *,
    num_iters: int,
    scale: int,
    damp_num: int,
    damp_den: int,
    src_col: str,
    dst_col: str,
    seed_arr: np.ndarray | None = None,
) -> Dataset:
    base = ((damp_den - damp_num) * scale) // damp_den
    if seed_arr is None:
        base_vec = np.full(len(node_ids), base, dtype=np.int64)
        ranks = np.full(len(node_ids), scale, dtype=np.int64)
    else:
        mask = np.isin(node_ids, seed_arr)
        base_vec = np.where(mask, base, 0).astype(np.int64)
        ranks = np.where(mask, scale, 0).astype(np.int64)
    ids_ref = ray.put(node_ids)
    od_ref = ray.put(od)

    for _ in range(num_iters):
        r_ref = ray.put(ranks)

        def contribs(batch: pa.Table) -> pa.Table:
            from doppel_ray.stages.util import cached_get

            ids = cached_get(ids_ref)
            outd = cached_get(od_ref)
            r = cached_get(r_ref)
            s = np.searchsorted(ids, _int64(batch[src_col].to_numpy(zero_copy_only=False)))
            d = _int64(batch[dst_col].to_numpy(zero_copy_only=False))
            cu = r[s] // outd[s]
            # pre-aggregate within the batch: one (dst, partial) row per
            # distinct dst, not per edge
            uniq, inv = np.unique(d, return_inverse=True)
            part = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(part, inv, cu)
            return pa.table(
                {
                    "node": pa.array(uniq, type=pa.int64()),
                    "c": pa.array(part, type=pa.int64()),
                }
            )

        folded = (
            edges.map_batches(contribs, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("c", alias_name="c"))
        )
        s = np.zeros(len(node_ids), dtype=np.int64)
        # <= node count rows reach the driver, gated by broadcast_limit
        for b in folded.iter_batches(batch_format="pyarrow"):
            pos = np.searchsorted(
                node_ids, _int64(b["node"].to_numpy(zero_copy_only=False))
            )
            s[pos] = _int64(b["c"].to_numpy(zero_copy_only=False))
        ranks = base_vec + (damp_num * s) // damp_den

    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(node_ids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.int64()),
            }
        )
    )


def _pagerank_distributed(
    edges: Dataset,
    nodes: Dataset,
    outdeg: Dataset,
    *,
    num_iters: int,
    scale: int,
    damp_num: int,
    damp_den: int,
    src_col: str,
    dst_col: str,
    num_buckets: int,
    n_nodes: int,
    seed_arr: np.ndarray | None = None,
) -> Dataset:
    import ray as _ray

    from doppel_ray.stages.joins import hash_join

    base = ((damp_den - damp_num) * scale) // damp_den
    seed_ref = _ray.put(seed_arr) if seed_arr is not None else None

    def _seed_mask(node_col: pa.Array) -> np.ndarray:
        from doppel_ray.stages.util import cached_get

        sa = cached_get(seed_ref)
        return np.isin(
            _int64(node_col.to_numpy(zero_copy_only=False)), sa
        )

    # (node, od) relation; a missing node here = dangling -> raise
    od_rel = outdeg.map_batches(
        lambda b: pa.table(
            {
                "node": b[src_col],
                "od": b["od"],
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # reused every iteration (count gate + the cu join)
    if od_rel.count() != n_nodes:
        raise ValueError(
            "dangling nodes (no out-edges) are not supported; add "
            "self-loops for the absorbing treatment"
        )

    def init_ranks(b: pa.Table) -> pa.Table:
        if seed_ref is None:
            r = np.full(b.num_rows, scale, dtype=np.int64)
        else:
            r = np.where(_seed_mask(b["node"]), scale, 0).astype(np.int64)
        return pa.table(
            {"node": b["node"], "r": pa.array(r, type=pa.int64())}
        )

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow").materialize()

    for _ in range(num_iters):
        # contrib_unit per node: r // od
        cu = hash_join(
            ranks,
            od_rel,
            on="node",
            left_cols=["r"],
            right_cols=["od"],
            num_buckets=num_buckets,
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "cu": pa.array(
                        _int64(b["r"].to_numpy(zero_copy_only=False))
                        // _int64(b["od"].to_numpy(zero_copy_only=False)),
                        type=pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        # scatter along edges, fold per dst
        sums = (
            hash_join(
                edges.map_batches(
                    lambda b: pa.table({"node": b[src_col], "dst": b[dst_col]}),
                    batch_format="pyarrow",
                ),
                cu,
                on="node",
                left_cols=["dst"],
                right_cols=["cu"],
                num_buckets=num_buckets,
            )
            .map_batches(
                lambda b: pa.table({"node": b["dst"], "c": b["cu"]}),
                batch_format="pyarrow",
            )
            .groupby("node")
            .aggregate(Sum("c", alias_name="c"))
        )
        # nodes with no in-edges keep base: LEFT join the node set
        def fold(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # fill_null keeps int64 exact (a NaN float round-trip would
            # corrupt sums past 2^53 — the joins.py:128-132 lesson)
            c = _int64(
                pc.fill_null(
                    pc.cast(b["c"], pa.int64()), 0
                ).to_numpy(zero_copy_only=False)
            )
            if seed_ref is None:
                bv = base
            else:
                bv = np.where(_seed_mask(b["node"]), base, 0).astype(
                    np.int64
                )
            return pa.table(
                {
                    "node": b["node"],
                    "r": pa.array(
                        bv + (damp_num * c) // damp_den, type=pa.int64()
                    ),
                }
            )

        ranks = hash_join(
            nodes,
            sums,
            on="node",
            left_cols=[],
            right_cols=["c"],
            how="left",
            num_buckets=num_buckets,
        ).map_batches(fold, batch_format="pyarrow").materialize()

    return ranks.map_batches(
        lambda b: pa.table({"node": b["node"], "rank": b["r"]}),
        batch_format="pyarrow",
    )
