"""Token-stream sequence packing — the GPT-pretraining layout step:
conceptually concatenate every document's whitespace tokens in ascending
``doc_id`` order into one stream and cut it into consecutive training
sequences of exactly ``seq_tokens`` tokens (the "concat-then-split"
packing of GPT-2/3-style pipelines; no padding, documents may span
sequence boundaries). The operator emits the ASSIGNMENT relation — one
row per (document, sequence) overlap with exact token spans — leaving
text materialization to consumers (the spans are integer token slices
of each doc, so a downstream ``map_batches`` over (doc_id, text) can
render any sequence's payload without another shuffle).

Scale shape — a distributed prefix sum (no global sort, no all-to-all
over payloads):

1. **narrow count pass** — one ``map_batches`` emits (doc_id, n_tokens)
   using the shared Arrow-native tokenizer (stages/decontam.py
   ``_flat_tokens``; boundaries pinned byte-identical to RE2 ``\\S+``).
   Payload text never leaves this stage.
2. **range partials** — docs are binned into contiguous id ranges
   (``rng = doc_id // range_size``); a combiner-first
   ``groupby(rng).sum(n)`` ships one partial per (block, range). The
   collected range table is bounded by ``#distinct ranges`` (dense ids:
   corpus/range_size; guarded by ``ranges_limit`` for sparse/hashed id
   spaces where the range trick degenerates — raise ``range_size``).
3. **driver exclusive-prefix over ranges** — a tiny sorted cumsum,
   broadcast once via ``ray.put``.
4. **in-range cumsum + window emission** — ranges are co-located with
   ``bucketed_group_apply`` (exact e.g. hash co-location, many ranges
   per bucket); within a range, sort by doc_id, local cumsum + the
   broadcast range offset gives each doc's global token interval
   [c-n, c), and the sequences it overlaps are ``(c-n)//S ..
   (c-1)//S`` — emitted vectorized (np.repeat row expansion). All
   integer arithmetic: results are layout-invariant and bit-identical
   to a SQL window-cumsum oracle.

The reference has no packing stage (it dedups filesystems); this is
part of the training-data surface mandated by the build brief, using
the same stable-ordering stance as SURVEY.md G4 (doc_id order, not
arrival order, so re-runs and resumes agree).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from doppel_ray.stages.exact import bucketed_group_apply
from doppel_ray.stages.util import cached_get, collect_table

#: driver guard: the per-range offset table is the only driver-side
#: state; past this many distinct ranges the range partitioning is
#: degenerate for the id space (raise range_size instead)
DEFAULT_RANGES_LIMIT = 4_000_000

_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("seq_id", pa.int64()),
        ("doc_tok_start", pa.int64()),
        ("doc_tok_end", pa.int64()),
        ("seq_tok_start", pa.int64()),
    ]
)


def pack_token_stream(
    ds: Dataset,
    *,
    seq_tokens: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    range_size: int = 65_536,
    ranges_limit: int = DEFAULT_RANGES_LIMIT,
) -> Dataset:
    """Assign every document's tokens to fixed-size training sequences.

    Returns one row per (document, sequence) overlap:

    - ``doc_id``, ``seq_id`` — the document and the training sequence
      (sequences numbered from 0 in global token order);
    - ``doc_tok_start``/``doc_tok_end`` — the [start, end) token slice
      of THIS doc that lands in THIS sequence;
    - ``seq_tok_start`` — where that slice begins inside the sequence.

    Docs with zero tokens emit no rows. Every sequence is exactly
    ``seq_tokens`` long except the final partial one.
    """
    if seq_tokens < 1:
        raise ValueError(f"seq_tokens must be >= 1, got {seq_tokens}")
    if range_size < 1:
        raise ValueError(f"range_size must be >= 1, got {range_size}")

    from doppel_ray.stages.decontam import _flat_tokens

    def count_tokens(batch: pa.Table) -> pa.Table:
        _, counts = _flat_tokens(batch[text_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.asarray(counts, dtype=np.int64)
        keep = n > 0
        ids, n = ids[keep], n[keep]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n": pa.array(n),
                "rng": pa.array(ids // np.int64(range_size)),
            }
        )

    narrow = ds.select_columns([id_col, text_col]).map_batches(
        count_tokens, batch_format="pyarrow"
    )
    # the count pass re-runs per consumer otherwise (it is the only
    # expensive map here: full-text tokenize); both the partials
    # groupby and the emission shuffle read it
    narrow = narrow.materialize()

    partials = collect_table(
        narrow.groupby("rng").aggregate(Sum("n", alias_name="rng_n")),
        pa.schema([("rng", pa.int64()), ("rng_n", pa.int64())]),
    )
    if partials.num_rows > ranges_limit:
        raise RuntimeError(
            f"{partials.num_rows} distinct id ranges exceed "
            f"ranges_limit={ranges_limit}; the id space is too sparse for "
            f"range_size={range_size} — raise range_size"
        )
    rng = partials["rng"].to_numpy(zero_copy_only=False).astype(np.int64)
    rng_n = partials["rng_n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(rng, kind="stable")
    rng, rng_n = rng[order], rng_n[order]
    offsets = np.zeros(len(rng), dtype=np.int64)
    np.cumsum(rng_n[:-1], out=offsets[1:])
    ref = ray.put({int(r): int(o) for r, o in zip(rng, offsets)})

    S = int(seq_tokens)

    def emit(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        off_of = cached_get(ref)
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        rg = g["rng"].to_numpy(zero_copy_only=False).astype(np.int64)
        # within the bucket: sort by (rng, doc_id); cumsum resets per rng
        o = np.lexsort((ids, rg))
        ids, n, rg = ids[o], n[o], rg[o]
        cs = np.cumsum(n)
        starts = np.flatnonzero(np.r_[True, rg[1:] != rg[:-1]])
        run_len = np.diff(np.r_[starts, len(n)])
        run_base = cs[starts] - n[starts]  # stream pos before each range
        local_c = cs - np.repeat(run_base, run_len)  # cumsum within range
        rng_off = np.array(
            [off_of[int(r)] for r in rg[starts]], dtype=np.int64
        )
        gc = local_c + np.repeat(rng_off, run_len)  # global end position
        gstart = gc - n
        first = gstart // S
        last = (gc - 1) // S
        k = last - first + 1
        total = int(k.sum())
        rep = np.repeat(np.arange(len(n), dtype=np.int64), k)
        j = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(k) - k, k)
        seq_id = first[rep] + j
        lo = np.maximum(gstart[rep], seq_id * S)
        hi = np.minimum(gc[rep], (seq_id + 1) * S)
        return pa.table(
            {
                "doc_id": pa.array(ids[rep]),
                "seq_id": pa.array(seq_id),
                "doc_tok_start": pa.array(lo - gstart[rep]),
                "doc_tok_end": pa.array(hi - gstart[rep]),
                "seq_tok_start": pa.array(lo - seq_id * S),
            }
        )

    return bucketed_group_apply(narrow, "rng", emit)


def pack_bins_nfd(
    ds: Dataset,
    capacity: int,
    *,
    len_col: str,
    id_col: str = "doc_id",
    num_buckets: int = 8,
) -> Dataset:
    """Doc-INTEGRAL bin packing (cf. "best-fit packing", Ding et al.
    2024): assign whole documents to bins of at most ``capacity`` length
    units with next-fit-decreasing inside hash buckets — the packing
    regime that avoids `pack_token_stream`'s cross-document truncation
    at the cost of some slack per bin.

    Determinism/scale contract: bucket = md5_low64(str(id)) %
    ``num_buckets`` (the sampler hash, == DuckDB ``md5_number_upper``),
    docs order by (len DESC, id) within the bucket, and the next-fit
    walk is a pure function of that order — so the assignment is
    bit-identical at any block layout and SQL-recomputable with a
    recursive CTE. ONE bucketed shuffle of the narrow (id, len)
    relation; the per-bucket walk is sequential by nature (packing is
    order-dependent), so ``num_buckets`` is the parallelism unit — size
    it so one bucket's (id, len) pairs fit one task's pass, the module's
    standing partitioning assumption. Docs longer than ``capacity``
    raise (chunk them first: `chunk_documents`).

    Returns ``(id_col, bucket, bin)`` — global bin identity is the
    (bucket, bin) pair.
    """
    import pandas as pd

    from doppel_ray.functions.text import md5_token_hash64
    from doppel_ray.stages.exact import bucketed_group_apply

    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        lens = batch[len_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(lens) and int(lens.max()) > capacity:
            raise ValueError(
                f"document longer than capacity {capacity}; chunk first"
            )
        h = md5_token_hash64(ids.astype(str)) % np.uint64(num_buckets)
        return pa.table(
            {
                id_col: pa.array(ids.astype(np.int64), type=pa.int64()),
                "len": pa.array(lens, type=pa.int64()),
                # "pk_bucket", not "bucket": bucketed_group_apply owns
                # the latter name internally and would clobber it
                "pk_bucket": pa.array(h.astype(np.int64), type=pa.int64()),
            }
        )

    narrow = ds.select_columns([id_col, len_col]).map_batches(
        add_bucket, batch_format="pyarrow"
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = []
        for b, sub in df.groupby("pk_bucket", sort=False):
            sub = sub.sort_values(
                ["len", id_col], ascending=[False, True]
            )
            bins = np.empty(len(sub), dtype=np.int64)
            fill, cur = 0, 0
            for i, ln in enumerate(sub["len"].to_numpy()):
                if fill + ln > capacity:
                    cur += 1
                    fill = 0
                bins[i] = cur
                fill += ln
            out.append(
                pd.DataFrame(
                    {
                        id_col: sub[id_col].to_numpy(),
                        "bucket": b,
                        "bin": bins,
                    }
                )
            )
        if not out:
            return pa.schema(
                [(id_col, pa.int64()), ("bucket", pa.int64()), ("bin", pa.int64())]
            ).empty_table()
        return pa.Table.from_pandas(pd.concat(out), preserve_index=False)

    return bucketed_group_apply(narrow, "pk_bucket", per_bucket)
