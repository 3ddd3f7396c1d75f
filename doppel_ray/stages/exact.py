"""Exact-duplicate detection: the staged size -> quick-hash -> full-hash
cascade with HAVING-count>1 pruning between stages.

Re-expresses the reference's core algorithm (SURVEY.md G1-G4):
  * group by size, keep groups with >=2 members (reference
    internal/scanner/scanner.go:94 + internal/finder/finder.go:47-58)
  * quick-hash survivors, re-prune (finder.go:75-96)
  * full-hash survivors, group into DuplicateGroups (finder.go:106-145)

Ray-Data design — the point of the cascade here is to avoid shuffling
document payloads: pruning is done by aggregating ONLY the key column
(``groupby(key).count()`` over a projected single-column dataset, a tiny
shuffle), broadcasting the set of keys with count>1 via ``ray.put``, and
filtering the main stream inside ``map_batches`` with ``pc.is_in`` — a
broadcast semi-join, no full-row shuffle until the final group-by on
``content_hash`` which carries only (hash, url, size).

Scale note (10^12 docs): the broadcast dup-key set is bounded by the number
of *distinct duplicated keys*, not rows. If that outgrows driver memory the
drop-in replacement is a Bloom filter of dup keys (same filter stage,
~10 bits/key) or a shuffle semi-join on a bucketed key — the stage boundary
is unchanged. Documented assumption: distinct dup sizes/quick-hashes fit in
one node's RAM (holds to ~10^9 dup keys at 8 B each).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from ray.data.aggregate import Count

from doppel_ray.schema import GROUPS_SCHEMA
from doppel_ray.stages import hashes


def duplicated_key_values(ds: Dataset, key: str) -> pa.Array:
    """Distinct values of ``key`` appearing on >=2 rows (HAVING count>1).

    Shuffles only the projected key column; the result is small and is
    collected to the driver for broadcast.
    """
    counts = (
        ds.select_columns([key])
        .groupby(key)
        .aggregate(Count(alias_name="cnt"))
    )
    dup = counts.filter(expr="cnt > 1")
    # take_all() returns list[dict]; the key set is small (distinct dup keys)
    rows = dup.select_columns([key]).take_all()
    return pa.array([r[key] for r in rows])


def semi_filter(ds: Dataset, key: str, values: pa.Array) -> Dataset:
    """Keep rows whose ``key`` is in the broadcast value set (broadcast
    semi-join: one ``ray.put``, zero-copy read in every task)."""
    ref = ray.put(values)

    def fn(batch: pa.Table) -> pa.Table:
        vals = pc.cast(ray.get(ref), batch[key].type)
        return batch.filter(pc.is_in(batch[key], value_set=vals))

    return ds.map_batches(fn, batch_format="pyarrow")


def prune_singletons(ds: Dataset, key: str) -> Dataset:
    """HAVING-count>1 prune on ``key`` (reference finder.go:47-58, 84-96)."""
    dup_vals = duplicated_key_values(ds, key)
    if len(dup_vals) == 0:
        # no duplicated keys at all -> empty survivor stream
        return ds.limit(0)
    return semi_filter(ds, key, dup_vals)


def _emit_group(g: pa.Table) -> pa.Table:
    """One DuplicateGroup row per content-hash group with >=2 members
    (reference finder.go:114-145). group_id = min(url) and members sorted,
    fixing the reference's nondeterministic ids (SURVEY.md G4). Works for
    string urls or integer doc ids alike."""
    id_type = g.schema.field("url").type
    schema = pa.schema(
        [
            ("group_id", id_type),
            ("count", pa.int64()),
            ("size", pa.int64()),
            ("wasted_space", pa.int64()),
            ("files", pa.list_(id_type)),
        ]
    )
    if g.num_rows < 2:
        return schema.empty_table()
    urls = sorted(g["url"].to_pylist())
    size = int(g["size"][0].as_py())
    n = g.num_rows
    return pa.table(
        {
            "group_id": pa.array([urls[0]], type=id_type),
            "count": pa.array([n], type=pa.int64()),
            "size": pa.array([size], type=pa.int64()),
            "wasted_space": pa.array([size * (n - 1)], type=pa.int64()),
            "files": pa.array([urls], type=pa.list_(id_type)),
        },
        schema=schema,
    )


def exact_duplicate_groups(
    ds: Dataset,
    *,
    id_col: str = "url",
    text_col: str = "text",
    cascade: bool = True,
) -> Dataset:
    """Full exact-dup pipeline: pages -> DuplicateGroup rows.

    ``cascade=True`` runs the reference's staged pruning (size then quick
    hash) before paying full-hash cost; ``cascade=False`` hashes everything
    (used to cross-check that the cascade changes cost, not results).
    """
    ds = ds.select_columns([id_col, text_col])
    if id_col != "url":
        ds = ds.rename_columns({id_col: "url"})
    ds = hashes.add_size(ds, text_col=text_col)
    if cascade:
        ds = prune_singletons(ds, "size")
        ds = hashes.add_quick_hash(ds, text_col=text_col)
        ds = prune_singletons(ds, "quick_hash")
    ds = hashes.add_content_hash(ds, text_col=text_col)
    # drop the payload BEFORE the all-to-all shuffle: only (hash, url, size)
    # moves through the object store.
    ds = ds.select_columns(["content_hash", "url", "size"])
    groups = ds.groupby("content_hash").map_groups(
        _emit_group, batch_format="pyarrow"
    )
    return groups


def dedup_keep_first(
    ds: Dataset,
    *,
    id_col: str = "url",
    text_col: str = "text",
) -> Dataset:
    """Exact dedup for training-data pipelines: keep one representative row
    (min id) per distinct text. Returns (url) of survivors.

    Equivalent SQL: SELECT min(id) FROM t GROUP BY text.
    """
    ds = ds.select_columns([id_col, text_col])
    ds = hashes.add_content_hash(ds, text_col=text_col)
    ds = ds.select_columns(["content_hash", id_col])
    from ray.data.aggregate import Min

    return (
        ds.groupby("content_hash")
        .aggregate(Min(id_col, alias_name=id_col))
        .select_columns([id_col])
    )
