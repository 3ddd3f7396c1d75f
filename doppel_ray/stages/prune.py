"""Exact-duplicate pre-pruning shared by the near-dup stages.

Identical (normalized) texts are interchangeable for every similarity
measure in this engine — identical shingle sets, MinHash signatures,
SimHash fingerprints — so collapsing each equality class to one
representative BEFORE the expensive candidate/verify machinery removes
the mega-clique cost exact duplicates would otherwise inject into every
LSH band (30-50% of real web corpora are exact dups). The full pair
relation is restored afterward by distributed expansion:

* intra-class cliques at the measure's identity value (Hamming 0 /
  similarity 1.0);
* each rep-level edge (ra, rb, v) expands to all (u in class(ra),
  v in class(rb)) pairs at the SAME value — exact, because
  sim(member, x) == sim(rep, x) for identical texts.

Expansion is auto-gated on the measured member count: small member sets
(<= ``broadcast_limit``, bounded by duplicated docs — the same
documented bound as the corpus prune's own NON-rep url broadcast and the
exact cascade's dup-key broadcast, stages/exact.py:20-23) broadcast the
rep->members map once and expand with shuffle-free ``map_batches``;
larger sets expand via bucketed hash joins with zero driver data paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from doppel_ray.stages.exact import bucketed_group_apply

MEMBERS_SCHEMA = pa.schema([("rep", pa.string()), ("url", pa.string())])


def split_rep_groups(
    keyed: Dataset,
    num_buckets: int,
    *,
    carry_col: str | None = None,
) -> tuple[Dataset, Dataset]:
    """(url, eq_key[, carry]) -> (reps, members).

    One bucketed shuffle on eq_key resolves equality classes; per class
    the representative is min(url). ``reps`` = one row per class (url
    [+ carry]); ``members`` = (rep, url) rows for EVERY member of
    classes with >= 2 members (rep included) — the expansion side-input.
    """
    cols = [("row_kind", pa.int8()), ("url", pa.string()), ("rep", pa.string())]
    if carry_col:
        cols.insert(2, (carry_col, pa.int64()))
    union_schema = pa.schema(cols)

    def per_bucket(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        gb = df.groupby("eq_key", sort=False)
        agg = {"url": ("url", "min")}
        if carry_col:
            agg[carry_col] = (carry_col, "first")
        rep = gb.agg(**agg).reset_index()
        counts = gb.size()
        dup_keys = set(counts[counts > 1].index)
        data = {
            "row_kind": pa.array(np.zeros(len(rep), dtype=np.int8)),
            "url": pa.array(rep["url"], type=pa.string()),
            "rep": pa.nulls(len(rep), type=pa.string()),
        }
        if carry_col:
            data[carry_col] = pa.array(rep[carry_col], type=pa.int64())
        out = [pa.table(data, schema=union_schema)]
        if dup_keys:
            mem = df[df["eq_key"].isin(dup_keys)].merge(
                rep[["eq_key", "url"]].rename(columns={"url": "rep"}),
                on="eq_key",
            )
            data = {
                "row_kind": pa.array(np.ones(len(mem), dtype=np.int8)),
                "url": pa.array(mem["url"], type=pa.string()),
                "rep": pa.array(mem["rep"], type=pa.string()),
            }
            if carry_col:
                data[carry_col] = pa.array(mem[carry_col], type=pa.int64())
            out.append(pa.table(data, schema=union_schema))
        return pa.concat_tables(out)

    split = bucketed_group_apply(
        keyed, "eq_key", per_bucket, num_buckets=num_buckets
    ).materialize()
    rep_cols = ["url"] + ([carry_col] if carry_col else [])
    reps = split.filter(expr="row_kind == 0").select_columns(rep_cols)
    members = split.filter(expr="row_kind == 1").select_columns(["rep", "url"])
    return reps, members


def _expand_broadcast(
    edges: Dataset,
    members: Dataset,
    num_buckets: int,
    *,
    value_col: str,
    value_type: pa.DataType,
    identity_value,
    out_schema: pa.Schema,
) -> Dataset:
    """Broadcast expansion: the (rep -> members) map ships once via
    ``ray.put`` and BOTH outputs — intra-class cliques and rep-edge
    cross products — are emitted by shuffle-free ``map_batches`` stages
    (clique emission fans over a rep-key dataset so the quadratic output
    is born distributed). Replaces three serial bucketed shuffles whose
    fixed coordination cost dominated at bench scale (31.7 s -> ~2 s on
    the 200k-doc simhash expand with ~60k member rows)."""
    import ray

    from doppel_ray.stages.util import collect_table, from_arrow_blocks

    mem_t = collect_table(members, MEMBERS_SCHEMA)
    groups: dict[str, list[str]] = {}
    for r, u in zip(mem_t["rep"].to_pylist(), mem_t["url"].to_pylist()):
        groups.setdefault(r, []).append(u)
    for v in groups.values():
        v.sort()
    ref = ray.put(groups)

    reps_ds = from_arrow_blocks(
        pa.table({"rep": pa.array(sorted(groups), type=pa.string())}),
        4 * num_buckets,
    )

    def cliques(batch: pa.Table) -> pa.Table:
        g = ray.get(ref)
        ua, ub = [], []
        for r in batch["rep"].to_pylist():
            urls = g[r]
            m = len(urls)
            for i in range(m):
                for j in range(i + 1, m):
                    ua.append(urls[i]); ub.append(urls[j])
        return pa.table(
            {
                "url_a": pa.array(ua, type=pa.string()),
                "url_b": pa.array(ub, type=pa.string()),
                value_col: pa.array([identity_value] * len(ua), type=value_type),
            },
            schema=out_schema,
        )

    intra = reps_ds.map_batches(cliques, batch_format="pyarrow")

    def cross(batch: pa.Table) -> pa.Table:
        g = ray.get(ref)
        ua, ub, vv = [], [], []
        for a, b, v in zip(
            batch["url_a"].to_pylist(),
            batch["url_b"].to_pylist(),
            batch[value_col].to_pylist(),
        ):
            for x in g.get(a, (a,)):
                for y in g.get(b, (b,)):
                    if x <= y:
                        ua.append(x); ub.append(y)
                    else:
                        ua.append(y); ub.append(x)
                    vv.append(v)
        return pa.table(
            {
                "url_a": pa.array(ua, type=pa.string()),
                "url_b": pa.array(ub, type=pa.string()),
                value_col: pa.array(vv, type=value_type),
            },
            schema=out_schema,
        )

    cross_ds = edges.select_columns(["url_a", "url_b", value_col]).map_batches(
        cross, batch_format="pyarrow"
    )
    return intra.union(cross_ds)


def expand_edges(
    edges: Dataset,
    members: Dataset,
    num_buckets: int,
    *,
    value_col: str,
    value_type: pa.DataType,
    identity_value,
    broadcast_limit: int = 2_000_000,
) -> Dataset:
    """Reattachment of pruned classes (module docstring): intra-class
    cliques at ``identity_value`` plus rep-edge cross products.
    ``edges`` columns: (url_a, url_b, value_col).

    Auto-gated on the MEASURED member count: at or below
    ``broadcast_limit`` rows the (rep -> members) map broadcasts once and
    both outputs are emitted shuffle-free (``_expand_broadcast``) — the
    same duplicated-docs bound the prune's corpus filter already accepts
    (module docstring). Above it, two bucketed hash joins expand with
    zero driver data paths."""
    out_schema = pa.schema(
        [("url_a", pa.string()), ("url_b", pa.string()), (value_col, value_type)]
    )
    members = members.materialize()
    if members.count() <= broadcast_limit:
        return _expand_broadcast(
            edges,
            members,
            num_buckets,
            value_col=value_col,
            value_type=value_type,
            identity_value=identity_value,
            out_schema=out_schema,
        )

    def cliques(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        ua, ub = [], []
        for _, grp in df.groupby("rep", sort=False):
            urls = sorted(grp["url"].tolist())
            m = len(urls)
            for i in range(m):
                for j in range(i + 1, m):
                    ua.append(urls[i]); ub.append(urls[j])
        return pa.table(
            {
                "url_a": pa.array(ua, type=pa.string()),
                "url_b": pa.array(ub, type=pa.string()),
                value_col: pa.array([identity_value] * len(ua), type=value_type),
            },
            schema=out_schema,
        )

    intra = bucketed_group_apply(
        members, "rep", cliques, num_buckets=num_buckets
    )

    join_schema = pa.schema(
        [
            ("join_key", pa.string()),
            ("url_a", pa.string()),
            ("url_b", pa.string()),
            (value_col, value_type),
            ("member", pa.string()),
        ]
    )

    def tag_edges(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "join_key": batch[side],
                    "url_a": batch["url_a"],
                    "url_b": batch["url_b"],
                    value_col: batch[value_col],
                    "member": pa.nulls(n, type=pa.string()),
                },
                schema=join_schema,
            )

        return fn

    def tag_members(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "join_key": batch["rep"],
                "url_a": pa.nulls(n, type=pa.string()),
                "url_b": pa.nulls(n, type=pa.string()),
                value_col: pa.nulls(n, type=value_type),
                "member": batch["url"],
            },
            schema=join_schema,
        )

    def expand_side(side: str):
        def fn(g: pa.Table) -> pa.Table:
            is_mem = pc.is_valid(g["member"])
            mem = g.filter(is_mem)
            ed = g.filter(pc.invert(is_mem))
            if ed.num_rows == 0:
                return out_schema.empty_table()
            groups: dict[str, list[str]] = {}
            for r, u in zip(mem["join_key"].to_pylist(), mem["member"].to_pylist()):
                groups.setdefault(r, []).append(u)
            ua, ub, vv = [], [], []
            for a, b, v, k in zip(
                ed["url_a"].to_pylist(),
                ed["url_b"].to_pylist(),
                ed[value_col].to_pylist(),
                ed["join_key"].to_pylist(),
            ):
                for u in groups.get(k, [k]):
                    if side == "url_a":
                        ua.append(u); ub.append(b)
                    else:
                        ua.append(a); ub.append(u)
                    vv.append(v)
            return pa.table(
                {
                    "url_a": pa.array(ua, type=pa.string()),
                    "url_b": pa.array(ub, type=pa.string()),
                    value_col: pa.array(vv, type=value_type),
                },
                schema=out_schema,
            )

        return fn

    e = edges.select_columns(["url_a", "url_b", value_col])
    u1 = e.map_batches(tag_edges("url_a"), batch_format="pyarrow").union(
        members.map_batches(tag_members, batch_format="pyarrow")
    )
    pass_a = bucketed_group_apply(
        u1, "join_key", expand_side("url_a"), num_buckets=num_buckets
    )
    u2 = pass_a.map_batches(tag_edges("url_b"), batch_format="pyarrow").union(
        members.map_batches(tag_members, batch_format="pyarrow")
    )
    cross = bucketed_group_apply(
        u2, "join_key", expand_side("url_b"), num_buckets=num_buckets
    )

    def orient(batch: pa.Table) -> pa.Table:
        a = batch["url_a"].to_numpy(zero_copy_only=False)
        b = batch["url_b"].to_numpy(zero_copy_only=False)
        swap = a > b
        return pa.table(
            {
                "url_a": pa.array(np.where(swap, b, a), type=pa.string()),
                "url_b": pa.array(np.where(swap, a, b), type=pa.string()),
                value_col: batch[value_col],
            },
            schema=out_schema,
        )

    return intra.union(cross.map_batches(orient, batch_format="pyarrow"))
