"""Dedup pipelines over the driver-provided ``documents`` table, each with a
DuckDB oracle (see FIXTURES.md §4). ``size`` is always the UTF-8 **byte**
length (DuckDB ``strlen``), matching the reference's file-size semantics."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Min

from doppel_ray.pipelines import finalize, query
from doppel_ray.sources.parquet import read_documents
from doppel_ray.stages import exact, hashes


@query(
    "exact_dup_groups",
    """
    SELECT min(doc_id) AS group_id,
           count(*) AS cnt,
           min(strlen(text)) AS size,
           min(strlen(text)) * (count(*) - 1) AS wasted_space
    FROM documents
    GROUP BY text
    HAVING count(*) > 1
    """,
)
def exact_dup_groups(sf_dir: str):
    """Reference G4: group-by full content hash -> DuplicateGroup rows
    (finder.go:114-145), via the size->quick->full cascade."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    groups = exact.exact_duplicate_groups(ds, id_col="doc_id")
    out = groups.drop_columns(["files"]).rename_columns({"count": "cnt"})
    return finalize(
        out,
        pa.schema(
            [
                ("group_id", pa.int64()),
                ("cnt", pa.int64()),
                ("size", pa.int64()),
                ("wasted_space", pa.int64()),
            ]
        ),
    )


@query(
    "size_groups",
    """
    SELECT strlen(text) AS size, count(*) AS cnt
    FROM documents
    GROUP BY 1
    HAVING count(*) > 1
    """,
)
def size_groups(sf_dir: str):
    """Reference G1+G2: group-by size, keep groups with >=2 members
    (scanner.go:94, finder.go:47-58)."""
    ds = read_documents(sf_dir, columns=["text"])
    ds = hashes.add_size(ds).select_columns(["size"])
    counts = ds.groupby("size").aggregate(Count(alias_name="cnt"))
    return finalize(
        counts.filter(expr="cnt > 1"),
        pa.schema([("size", pa.int64()), ("cnt", pa.int64())]),
    )


@query(
    "dedup_keep_first",
    "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
)
def dedup_keep_first(sf_dir: str):
    """Training-data exact dedup: one representative (min doc_id) per
    distinct text."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    return exact.dedup_keep_first(ds, id_col="doc_id")


@query(
    "quick_hash_groups",
    """
    SELECT min(doc_id) AS group_id, count(*) AS cnt
    FROM documents
    GROUP BY text
    HAVING count(*) > 1
    """,
)
def quick_hash_groups(sf_dir: str):
    """Reference G3: group-by sampled quick hash, HAVING count>1
    (finder.go:84-96). Oracle note: every sf document is far below the
    8 KiB sampling window, so the quick hash covers the whole text and
    quick-hash groups coincide exactly with group-by-text — which makes
    the semantics SQL-checkable (collision probability ~n^2/2^64 aside).
    """
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    ds = hashes.add_quick_hash(ds).select_columns(["doc_id", "quick_hash"])
    grouped = ds.groupby("quick_hash").aggregate(
        Min("doc_id", alias_name="group_id"), Count(alias_name="cnt")
    )
    out = grouped.filter(expr="cnt > 1").select_columns(["group_id", "cnt"])
    return finalize(
        out, pa.schema([("group_id", pa.int64()), ("cnt", pa.int64())])
    )


@query(
    "dedup_stats",
    """
    SELECT count(*) AS total_files,
           count(DISTINCT text) AS distinct_texts,
           count(*) - count(DISTINCT text) AS duplicate_files
    FROM documents
    """,
)
def dedup_stats(sf_dir: str):
    """Reference G5 global stats counters (model/model.go:51-78), reduced
    to the corpus analogs."""
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    total = ds.count()
    distinct = exact.dedup_keep_first(ds, id_col="doc_id").count()
    return pd.DataFrame(
        {
            "total_files": [total],
            "distinct_texts": [distinct],
            "duplicate_files": [total - distinct],
        }
    )


@query(
    "extract_dedup",
    "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
)
def extract_dedup(sf_dir: str):
    """End-to-end html -> extract -> exact-dedup cascade (VERDICT r1 #10).

    Each document is wrapped into an html page (entity-escaped body,
    binary column — the input_hint page shape), the actor-pool extractor
    recovers the text, the BYTE-IDENTITY north-rule invariant is
    asserted distributed (extraction must reproduce the original text
    exactly — entity decoding inverts the escaping), and keep-first
    exact dedup runs on the EXTRACTED text. The oracle is the same
    min-per-text SQL as ``dedup_keep_first``: any extraction corruption
    surfaces as a hash mismatch.
    """
    import html as _html

    from doppel_ray.stages import extract as X

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def to_pages(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        payload = [
            f"<html><head><title>d</title></head><body>{_html.escape(t)}"
            f"</body></html>".encode()
            for t in texts
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "orig": batch["text"],
                "html": pa.array(payload, type=pa.large_binary()),
            }
        )

    pages = ds.map_batches(to_pages, batch_format="pyarrow")
    extracted = X.extract_text(pages, concurrency=2)

    def check_identity(batch: pa.Table) -> pa.Table:
        # north-rule invariant: extracted text byte-identical per doc
        import pyarrow.compute as pc

        # extractor keeps title chardata; body follows the fixed "d" prefix
        got = [t[1:] for t in batch["text"].to_pylist()]
        orig = batch["orig"].to_pylist()
        bad = [i for i, (g, o) in enumerate(zip(got, orig)) if g != o]
        if bad:
            raise AssertionError(
                f"extraction not byte-identical for {len(bad)} docs"
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": pa.array(got, type=pa.large_string()),
            }
        )

    clean = extracted.map_batches(check_identity, batch_format="pyarrow")
    return exact.dedup_keep_first(clean, id_col="doc_id")


@query(
    "lang_counts",
    "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
)
def lang_counts(sf_dir: str):
    """Plain grouped aggregate (groupby shuffle smoke check)."""
    ds = read_documents(sf_dir, columns=["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n"))


@query(
    "incremental_dedup",
    """
    SELECT min(doc_id) AS doc_id
    FROM documents
    WHERE doc_id % 2 = 1
      AND text NOT IN (SELECT text FROM documents WHERE doc_id % 2 = 0)
    GROUP BY text
    """,
)
def incremental_dedup(sf_dir: str):
    """Incremental-ingest dedup: the odd-doc_id half of the corpus plays
    the NEW crawl batch, the even half the existing index; survivors are
    new docs absent from the index, keep-first within the batch
    (stages/incremental.py — content-hash anti-join, payloads never
    shuffle)."""
    import pyarrow.compute as pc

    from doppel_ray.stages import incremental

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def side(parity: int):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.equal(pc.bit_wise_and(batch["doc_id"], 1), parity)
            )

        return fn

    new_ds = ds.map_batches(side(1), batch_format="pyarrow")
    index_ds = ds.map_batches(side(0), batch_format="pyarrow")
    return incremental.dedup_against_index(
        new_ds, index_ds, id_col="doc_id", text_col="text"
    )


@query("approx_distinct_texts")  # rows-only: approximate by design (HLL)
def approx_distinct_texts(sf_dir: str):
    """Distributed HyperLogLog distinct-text count (stages/hashes.py
    approx_distinct, p=14 ~ 0.8% error): the no-shuffle substitute for
    COUNT(DISTINCT text) at corpus scale. Accuracy pinned in
    tests/test_sketch.py; like ivf_topk, no SQL value-hash oracle."""
    import pandas as pd

    from doppel_ray.stages.hashes import approx_distinct

    ds = read_documents(sf_dir, columns=["text"])
    return pd.DataFrame({"approx_distinct": [round(approx_distinct(ds, "text"))]})


@query(
    "normalized_dedup",
    # same normalization rule as the MinHash shingler (functions/text.py
    # normalize_texts == lower + collapse-ws + trim), recomputed in SQL
    r"""
    SELECT min(doc_id) AS doc_id
    FROM documents
    GROUP BY trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
    """,
)
def normalized_dedup(sf_dir: str):
    """Fuzzy-exact dedup: keep-first per NORMALIZED text (case /
    whitespace-run / edge-space insensitive) — the standard cheap dedup
    pass between exact and MinHash. Composition: normalize kernel ->
    content hash -> groupby min id; normalized text is hashed, never
    shuffled."""
    from doppel_ray.functions.text import normalize_texts

    ds = read_documents(sf_dir, columns=["doc_id", "text"])

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": pa.array(
                    normalize_texts(batch["text"]), type=pa.large_string()
                ),
            }
        )

    return exact.dedup_keep_first(
        ds.map_batches(norm, batch_format="pyarrow"), id_col="doc_id"
    )


@query(
    "snapshot_diff",
    # Both snapshots derived DETERMINISTICALLY from documents on both
    # sides: old = docs with id % 10 != 0, texts of id % 7 == 0 carry a
    # ' v1' suffix; new = docs with id % 13 != 0 verbatim. Diff status
    # computed generically (full outer join), not from the constants.
    """
    WITH old AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' v1' ELSE text END AS text
      FROM documents WHERE doc_id % 10 != 0
    ),
    new AS (SELECT doc_id, text FROM documents WHERE doc_id % 13 != 0)
    SELECT coalesce(o.doc_id, n.doc_id) AS key,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.text != n.text THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.text != n.text
    """,
)
def snapshot_diff(sf_dir: str):
    """Snapshot diff between two corpus versions (stages/diff.py):
    narrow (key, hash, side) partials, ONE bucketed key shuffle,
    vectorized per-bucket status pivot — payloads never move, output
    bounded by churn."""
    import pyarrow.compute as pc

    from doppel_ray.stages.diff import snapshot_diff as diff

    docs = read_documents(sf_dir, columns=["doc_id", "text"])

    def make_old(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        b = batch.filter(pa.array(ids % 10 != 0))
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        text = pc.if_else(
            pa.array(ids % 7 == 0),
            pc.binary_join_element_wise(b["text"], " v1", ""),
            b["text"],
        )
        return pa.table({"doc_id": b["doc_id"], "text": text})

    def make_new(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 13 != 0))

    old = docs.map_batches(make_old, batch_format="pyarrow")
    new = docs.map_batches(make_new, batch_format="pyarrow")
    return finalize(
        diff(old, new),
        pa.schema([("key", pa.int64()), ("status", pa.string())]),
    )


@query(
    "training_shards",
    # the md5 shard rule is recomputed generically in SQL — same kernel
    # as the samplers (stages/sample.py _key_hashes, md5 mode)
    """
    SELECT md5_number_upper(CAST(doc_id AS VARCHAR)) % 16 AS shard,
           count(*) AS n
    FROM documents GROUP BY 1
    """,
)
def training_shards(sf_dir: str):
    """Resumable sharded training output (stages/output.py): writes the
    corpus as hash-sharded hive-partitioned Parquet to scratch, then
    returns the manifest's per-shard row counts — the deterministic
    shard assignment a resumable 100 TB write rests on, cross-checked
    against DuckDB recomputing the same md5 rule."""
    import os
    import shutil

    from doppel_ray.stages.output import write_training_shards

    out_dir = os.path.join(
        "/tmp/doppel_ray_scratch", "shards_" + sf_dir.strip("/").replace("/", "_")
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    ds = read_documents(sf_dir, columns=["doc_id", "text"])
    manifest = write_training_shards(
        ds, out_dir, num_shards=16, key_col="doc_id", method="md5"
    )
    rows = [
        {"shard": int(k), "n": v}
        for k, v in manifest["rows_per_shard"].items()
        if v > 0
    ]
    rows.sort(key=lambda r: r["shard"])
    return pa.Table.from_pylist(
        rows, schema=pa.schema([("shard", pa.int64()), ("n", pa.int64())])
    )
