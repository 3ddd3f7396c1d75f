"""Connected-component clustering over verified duplicate edges.

Two implementations with identical semantics (cluster id = min member):

* ``cluster_edges`` — driver-side union-find; edges after verification are
  tiny relative to the corpus, so this is the default (SURVEY.md §7.3
  step 6).
* ``cluster_edges_distributed`` — iterative min-label propagation expressed
  as Ray Data groupbys, for edge sets too large for one node: each round
  every node adopts the min label among its neighbors+itself; converges in
  O(component diameter) rounds. Used when ``len(edges) > driver_limit``.

``assign_clusters`` joins cluster ids back onto the corpus by broadcasting
the (small) url->cluster map — ``ray.put`` once, dict lookup per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data import Dataset
from ray.data.aggregate import Min

from doppel_ray.state.unionfind import UnionFind


def cluster_edges(edges: Dataset | pa.Table) -> dict[str, str]:
    """Verified edges -> {url: cluster_id(min url of component)}."""
    if isinstance(edges, Dataset):
        rows = edges.select_columns(["url_a", "url_b"]).take_all()
        pairs = [(r["url_a"], r["url_b"]) for r in rows]
    else:
        pairs = list(
            zip(edges["url_a"].to_pylist(), edges["url_b"].to_pylist())
        )
    uf = UnionFind()
    uf.add_edges(pairs)
    return uf.labels()


def cluster_edges_distributed(
    edges: Dataset, max_rounds: int = 50
) -> Dataset:
    """Min-label propagation: returns Dataset (url, cluster_id).

    Each round: label(u) = min(label(u), min over neighbors' labels),
    expressed as explode-to-(node, neighbor_label) + groupby(node).min().
    Stops when the label sum stops changing (fixed point).
    """

    def explode(batch: pa.Table) -> pa.Table:
        a = batch["url_a"].to_pylist()
        b = batch["url_b"].to_pylist()
        la = batch["label_a"].to_pylist()
        lb = batch["label_b"].to_pylist()
        return pa.table(
            {
                "url": pa.array(a + b),
                "cand": pa.array(lb + la),
            }
        )

    # initial labels: node itself
    e = edges.select_columns(["url_a", "url_b"]).map_batches(
        lambda t: t.append_column("label_a", t["url_a"]).append_column(
            "label_b", t["url_b"]
        ),
        batch_format="pyarrow",
    )
    labels = None
    prev_sig = None
    for _ in range(max_rounds):
        cand = e.map_batches(explode, batch_format="pyarrow")
        # also keep own label so labels only decrease
        if labels is not None:
            own = labels.rename_columns({"cluster_id": "cand"})
            cand = cand.union(own)
        labels = (
            cand.groupby("url")
            .aggregate(Min("cand", alias_name="cluster_id"))
        ).materialize()
        sig = labels.map_batches(
            lambda t: pa.table(
                {
                    "s": pa.array(
                        [
                            int(
                                pd.util.hash_pandas_object(
                                    pd.Series(t["cluster_id"].to_pylist())
                                ).sum()
                                % (1 << 63)
                            )
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        ).sum("s")
        if sig == prev_sig:
            break
        prev_sig = sig
        # re-join labels onto edges for the next round (broadcast map —
        # labels == nodes touched by edges, small by construction)
        lbl_map = {
            r["url"]: r["cluster_id"] for r in labels.take_all()
        }
        ref = ray.put(lbl_map)

        def relabel(batch: pa.Table) -> pa.Table:
            m = ray.get(ref)
            la = [m[u] for u in batch["url_a"].to_pylist()]
            lb = [m[u] for u in batch["url_b"].to_pylist()]
            return pa.table(
                {
                    "url_a": batch["url_a"],
                    "url_b": batch["url_b"],
                    "label_a": pa.array(la),
                    "label_b": pa.array(lb),
                }
            )

        e = edges.select_columns(["url_a", "url_b"]).map_batches(
            relabel, batch_format="pyarrow"
        )
    return labels


def assign_clusters(
    ds: Dataset, labels: dict[str, str], *, id_col: str = "url"
) -> Dataset:
    """Append ``cluster_id`` to the corpus (own id when unclustered).

    Broadcast join: the label map covers only docs in some duplicate
    cluster — small relative to the corpus — shipped once via ``ray.put``.
    """
    ref = ray.put(labels)

    def fn(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        ids = batch[id_col].to_pylist()
        out = [m.get(u, u) for u in ids]
        col = pa.array(out, type=batch[id_col].type)
        if "cluster_id" in batch.column_names:
            batch = batch.drop_columns(["cluster_id"])
        return batch.append_column("cluster_id", col)

    return ds.map_batches(fn, batch_format="pyarrow")
