"""Line-level (boilerplate) deduplication — the RefinedWeb/CCNet-style
cleanup that strips navigation bars, cookie banners and footers repeated
across many pages, applied per LINE rather than per document.

Shape (scale notes inline):

1. **count** — one ``map_batches`` explodes each doc into its non-empty
   lines via a vectorized Arrow split, dedupes ``(line, doc)`` pairs
   inside the batch (a doc is one row, so in-batch dedupe is globally
   exact), and ships only the line strings into a ``groupby(line)``
   count. The shuffle carries distinct (line, doc) pairs — bounded by
   corpus line volume, never payload bytes, and pre-deduped per batch.
2. **broadcast** — lines whose distinct-doc count >= ``min_docs`` are
   collected and broadcast once (``ray.put``). The broadcast is bounded
   by BOILERPLATE volume (lines repeated across documents), not corpus
   size — the same bound decontamination relies on for its benchmark
   gram set (stages/decontam.py). A corpus whose every line repeats
   would degenerate; ``frequent_limit`` guards that with a clear error
   instead of a silent driver OOM.
3. **rewrite** — one ``map_batches`` splits again (same Arrow kernel),
   drops lines in the broadcast set, and reassembles with ``\\n``. Empty
   lines are never counted or removed (they're structure, not content).

The counting key is the full line STRING, not a hash — exact semantics
with zero collision caveats; the lines shuffled are pre-deduped and the
broadcast set is exact.

Reference framing: this generalizes the reference's duplicate GROUPing
(finder.go:47-106) from whole files to intra-document lines — the unit a
web-corpus pipeline actually needs deduplicated for training data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset
from ray.data.aggregate import Count

from doppel_ray.stages.util import collect_table

#: broadcast-set guard: more frequent lines than this means the corpus
#: is pathological for the broadcast regime; fail loudly
DEFAULT_FREQUENT_LIMIT = 50_000_000


def _split_lines(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    if pa.types.is_null(arr.type):
        # an all-null batch infers type null, which split_pattern rejects
        arr = arr.cast(pa.string())
    return pc.split_pattern(arr, pattern="\n")


def frequent_lines(
    ds: Dataset,
    *,
    min_docs: int = 2,
    text_col: str = "text",
    frequent_limit: int = DEFAULT_FREQUENT_LIMIT,
) -> pa.Array:
    """Distinct non-empty lines appearing in >= ``min_docs`` documents."""

    def explode(batch: pa.Table) -> pa.Table:
        lines = _split_lines(batch[text_col])
        flat = pc.list_flatten(lines)
        row_idx = np.repeat(
            np.arange(len(lines), dtype=np.int64),
            np.asarray(pc.list_value_length(lines).fill_null(0)),
        )
        t = pa.table({"line": flat, "row": pa.array(row_idx)})
        t = t.filter(pc.not_equal(t["line"], ""))
        # in-batch (line, doc) dedupe: each doc is a single row, so this
        # makes the shipped pairs globally distinct
        df = t.to_pandas().drop_duplicates()
        return pa.table({"line": pa.array(df["line"], type=pa.string())})

    counts = (
        ds.select_columns([text_col])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("line")
        .aggregate(Count(alias_name="df"))
    )
    freq = counts.filter(expr=f"df >= {int(min_docs)}").select_columns(["line"])
    t = collect_table(freq)
    if t.num_rows > frequent_limit:
        raise RuntimeError(
            f"{t.num_rows} frequent lines exceed frequent_limit="
            f"{frequent_limit}; the broadcast regime does not fit this "
            f"corpus — raise min_docs or the limit"
        )
    return t["line"].combine_chunks() if t.num_rows else pa.array([], type=pa.string())


def dup_span_groups(
    ds: Dataset,
    *,
    span_lines: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Corpus-duplicated line spans — the detection core of C4's
    "three-sentence span" dedup (Raffel et al. 2020 §2.2), with LINES
    standing in for sentences: every window of ``span_lines``
    consecutive lines whose joined text occurs more than once anywhere
    in the corpus, with its occurrence count and first occurrence
    (lexicographic min over the zero-padded ``doc:pos`` key, so "first"
    is deterministic and layout-independent — the stable-group-id
    stance of SURVEY.md G4).

    Scale shape: one ``map_batches`` explodes each doc into its stride-1
    line windows (windows never cross documents — a doc is one row);
    the ``groupby(span)`` shuffle carries the span strings plus a narrow
    key column; singleton spans are pruned by the HAVING filter after a
    combiner-friendly count. Returns (span, cnt, first_doc, first_pos).

    Removal is deliberately NOT implemented here: C4's "remove all but
    one occurrence" is order-dependent for OVERLAPPING duplicate windows
    and the paper does not pin a tie-break; consumers get the exact
    duplicate-span relation and apply their own policy.
    """
    if span_lines < 1:
        raise ValueError(f"span_lines must be >= 1, got {span_lines}")

    def explode(batch: pa.Table) -> pa.Table:
        lines = _split_lines(batch[text_col])
        n_per_row = np.asarray(pc.list_value_length(lines).fill_null(0))
        flat = np.asarray(pc.list_flatten(lines).to_pandas(), dtype=object)
        total = len(flat)
        m = total - span_lines + 1
        if m <= 0:
            return pa.table(
                {
                    "span": pa.array([], type=pa.string()),
                    "key": pa.array([], type=pa.string()),
                }
            )
        # windows of span_lines consecutive lines, joined with \n
        span = flat[:m].copy()
        for j in range(1, span_lines):
            span = span + "\n"
            span = span + flat[j : m + j]
        # a window is valid iff its two endpoints are in the same doc
        row_of = np.repeat(np.arange(len(n_per_row), dtype=np.int64), n_per_row)
        valid = row_of[:m] == row_of[span_lines - 1 : span_lines - 1 + m]
        starts = np.nonzero(valid)[0]
        docs = np.asarray(batch[id_col].to_pandas())[row_of[starts]]
        # position of the window within its own document
        doc_start = np.zeros(len(n_per_row), dtype=np.int64)
        np.cumsum(n_per_row[:-1], out=doc_start[1:])
        pos = starts - doc_start[row_of[starts]]
        keys = np.char.add(
            np.char.add(
                np.char.zfill(docs.astype("U"), 12), np.array(":", dtype="U1")
            ),
            np.char.zfill(pos.astype("U"), 7),
        )
        return pa.table(
            {
                "span": pa.array(span[starts], type=pa.string()),
                "key": pa.array(keys.astype(object), type=pa.string()),
            }
        )

    from ray.data.aggregate import Count, Min

    g = (
        ds.select_columns([id_col, text_col])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("span")
        .aggregate(Count(alias_name="cnt"), Min("key", alias_name="first_key"))
        .filter(expr="cnt > 1")
    )

    def parse(batch: pa.Table) -> pa.Table:
        import pandas as pd

        fk = batch["first_key"].to_pandas()
        parts = fk.str.split(":", expand=True)
        if len(fk) == 0:
            parts = pd.DataFrame({0: [], 1: []})
        return pa.table(
            {
                "span": batch["span"],
                "cnt": batch["cnt"],
                "first_doc": pa.array(
                    parts[0].astype("int64") if len(fk) else [], type=pa.int64()
                ),
                "first_pos": pa.array(
                    parts[1].astype("int64") if len(fk) else [], type=pa.int64()
                ),
            }
        )

    return g.map_batches(parse, batch_format="pyarrow")


def remove_boilerplate_lines(
    ds: Dataset,
    *,
    min_docs: int = 2,
    text_col: str = "text",
    out_col: str = "text_clean",
    removed_col: str = "n_removed",
    frequent_limit: int = DEFAULT_FREQUENT_LIMIT,
) -> Dataset:
    """Rewrite ``text_col``: drop every non-empty line that appears in
    >= ``min_docs`` distinct documents; append the cleaned text and the
    per-doc removed-line count."""
    freq = frequent_lines(
        ds, min_docs=min_docs, text_col=text_col, frequent_limit=frequent_limit
    )
    ref = ray.put(freq)

    def rewrite(batch: pa.Table) -> pa.Table:
        from doppel_ray.stages.util import cached_get

        bad: pa.Array = cached_get(ref)
        lines = _split_lines(batch[text_col])
        flat = pc.list_flatten(lines)
        n_per_row = np.asarray(pc.list_value_length(lines).fill_null(0))
        drop = pc.is_in(flat, value_set=bad).to_numpy(zero_copy_only=False)
        # empty lines are never removed (and can't be in `bad`)
        removed = np.zeros(len(lines), dtype=np.int64)
        np.add.at(
            removed,
            np.repeat(np.arange(len(lines), dtype=np.int64), n_per_row),
            drop.astype(np.int64),
        )
        flat_py = flat.to_pylist()
        out_texts = []
        pos = 0
        for n in n_per_row:
            kept = [
                flat_py[pos + j] for j in range(n) if not drop[pos + j]
            ]
            out_texts.append("\n".join(kept))
            pos += n
        out = batch
        for name, arr in (
            (out_col, pa.array(out_texts, type=pa.string())),
            (removed_col, pa.array(removed)),
        ):
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, arr)
        return out

    return ds.map_batches(rewrite, batch_format="pyarrow")


#: ord-key packing: ord = doc_id * POS_LIMIT + pos must order exactly
#: like (doc_id, pos) lexicographic, so pos must stay below this
POS_LIMIT = 1 << 20


def dedup_lines_keep_first(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "text_clean",
    removed_col: str = "n_removed",
    frequent_limit: int = DEFAULT_FREQUENT_LIMIT,
) -> Dataset:
    """C4-style keep-FIRST line dedup (Raffel et al. 2020 §2.2, applied
    per line): every non-empty line that occurs more than once in the
    corpus — across documents OR repeated inside one — keeps exactly its
    first occurrence (lexicographic min over (doc_id, pos)) and loses
    all later ones. Contrast ``remove_boilerplate_lines``, which removes
    ALL occurrences of frequent lines: keep-first preserves one copy of
    legitimate content that happens to repeat.

    Scale shape: pass 1 explodes lines with a packed int64 order key and
    pre-combines per batch (min ord + occurrence count per distinct
    line), so the ``groupby(line)`` shuffle carries one narrow partial
    row per (batch, line); the duplicated subset (count >= 2) is
    collected and broadcast once — bounded by DUPLICATED-line volume,
    the same bound remove_boilerplate_lines relies on, guarded by
    ``frequent_limit``. Pass 2 rewrites each doc in one vectorized
    map_batches (ListArray rebuild + binary_join, no Python line loop).
    Empty lines are structure, not content: never counted, never
    removed. Requires 0 <= doc_id < 2^43 and per-doc line count <
    2^20 (raises otherwise).
    """
    import pandas as pd
    from ray.data.aggregate import Min, Sum

    def explode(batch: pa.Table) -> pa.Table:
        lines = _split_lines(batch[text_col])
        n_per_row = np.asarray(pc.list_value_length(lines).fill_null(0))
        if len(n_per_row) and n_per_row.max() >= POS_LIMIT:
            raise ValueError(
                f"a document has >= {POS_LIMIT} lines; ord-key packing "
                "would break (doc_id, pos) ordering"
            )
        ids = np.asarray(batch[id_col].to_pandas(), dtype=np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() >= (1 << 43)):
            raise ValueError("doc_id out of [0, 2^43) for ord-key packing")
        flat = pc.list_flatten(lines)
        row_of = np.repeat(np.arange(len(n_per_row), dtype=np.int64), n_per_row)
        doc_start = np.zeros(len(n_per_row), dtype=np.int64)
        np.cumsum(n_per_row[:-1], out=doc_start[1:])
        pos = np.arange(len(row_of), dtype=np.int64) - doc_start[row_of]
        ord_key = ids[row_of] * POS_LIMIT + pos
        df = pd.DataFrame(
            {"line": flat.to_pandas(), "ord": ord_key}
        )
        df = df[df["line"] != ""]
        part = df.groupby("line", sort=False)["ord"].agg(["min", "size"])
        return pa.table(
            {
                "line": pa.array(part.index, type=pa.string()),
                "min_ord": pa.array(part["min"].to_numpy(), type=pa.int64()),
                "n": pa.array(part["size"].to_numpy(), type=pa.int64()),
            }
        )

    counts = (
        ds.select_columns([id_col, text_col])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("line")
        .aggregate(Min("min_ord", alias_name="first_ord"), Sum("n", alias_name="n"))
        .filter(expr="n >= 2")
        .select_columns(["line", "first_ord"])
    )
    t = collect_table(counts)
    if t.num_rows > frequent_limit:
        raise RuntimeError(
            f"{t.num_rows} duplicated lines exceed frequent_limit="
            f"{frequent_limit}; the broadcast regime does not fit this "
            "corpus — shard the rewrite by line-hash join instead"
        )
    first_of = dict(
        zip(t["line"].to_pylist(), t["first_ord"].to_pylist())
    ) if t.num_rows else {}
    ref = ray.put(first_of)

    def rewrite(batch: pa.Table) -> pa.Table:
        from doppel_ray.stages.util import cached_get

        first: dict = cached_get(ref)
        lines = _split_lines(batch[text_col])
        n_per_row = np.asarray(pc.list_value_length(lines).fill_null(0))
        ids = np.asarray(batch[id_col].to_pandas(), dtype=np.int64)
        flat = pc.list_flatten(lines)
        row_of = np.repeat(np.arange(len(n_per_row), dtype=np.int64), n_per_row)
        doc_start = np.zeros(len(n_per_row), dtype=np.int64)
        np.cumsum(n_per_row[:-1], out=doc_start[1:])
        pos = np.arange(len(row_of), dtype=np.int64) - doc_start[row_of]
        ord_key = ids[row_of] * POS_LIMIT + pos
        ser = flat.to_pandas()
        # only duplicated lines pay the dict lookup; everything else keeps
        firsts = ser.map(first)
        dup = firsts.notna().to_numpy()
        drop = np.zeros(len(ser), dtype=bool)
        if dup.any():
            drop[dup] = (
                firsts.to_numpy(dtype=object)[dup].astype(np.int64)
                != ord_key[dup]
            )
        removed = np.zeros(len(n_per_row), dtype=np.int64)
        np.add.at(removed, row_of, drop.astype(np.int64))
        keep = ~drop
        kept_vals = flat.filter(pa.array(keep))
        kept_per_row = n_per_row - removed
        offsets = np.concatenate(
            [[0], np.cumsum(kept_per_row)]
        ).astype(np.int32)
        kept_lists = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            kept_vals.combine_chunks()
            if isinstance(kept_vals, pa.ChunkedArray)
            else kept_vals,
        )
        out_texts = pc.binary_join(kept_lists, "\n")
        out = batch
        for name, arr in (
            (out_col, out_texts.cast(pa.string())),
            (removed_col, pa.array(removed)),
        ):
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, arr)
        return out

    return ds.map_batches(rewrite, batch_format="pyarrow")
