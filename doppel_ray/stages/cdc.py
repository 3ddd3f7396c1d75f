"""Sub-file storage dedup over payload columns — the generalization of
doppel's whole-file duplicate detection (reference internal/scanner
hashing, SURVEY.md H1/H2) to CHUNK granularity, the shape backup/object
stores and crawl archives use to dedup pages that share templates:

- **Fixed-block dedup** (`block_dedup_stats`): split each text payload
  into fixed-width blocks, hash each block (md5-low64 == DuckDB
  ``md5_number_upper``), count blocks whose content recurs corpus-wide.
  The SQL-exact baseline — boundary positions are arithmetic, so a
  DuckDB oracle recomputes the identical relation.
- **Content-defined chunking** (`cdc_chunks` / `cdc_dedup_stats`): the
  real storage-dedup path — boundaries where a rolling 16-byte window
  hash hits a mask, so an INSERTION only reshapes chunks near the edit
  instead of shifting every downstream block (the fixed-block failure
  mode). FastCDC-style min-length clamp. Byte-level and not
  SQL-expressible: the driver row is rows-only; semantics are pinned
  against a pure-Python reference chunker in tests/test_cdc.py.

Scale shape (both variants): per-batch vectorized hashing emits narrow
``(hash, len)`` partials; the duplicated-hash set resolves through the
bucketed argsort+reduceat count (the stages/tokenwindows.py idiom) and
broadcasts under a guard; a second streaming pass rolls per-source /
corpus stats — the payload bytes never shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

from doppel_ray.functions.text import md5_token_hash64

#: duplicated-hash keys above which the broadcast set refuses (same
#: stance as tokenwindows.BLOOM_PREFILTER_LIMIT, but chunk stats have
#: no string re-verify stage, so we raise rather than Bloom)
DUP_SET_LIMIT = 50_000_000

_GEAR_P = np.uint64(0x9E3779B97F4A7C15)


def _dup_hash_set(partials: Dataset, num_buckets: int = 64) -> np.ndarray:
    """Narrow (h, c) partials -> sorted int64 array of hashes with
    corpus-wide count > 1 (bucketed argsort+reduceat count)."""
    from doppel_ray.stages.exact import bucketed_group_apply
    from doppel_ray.stages.util import collect_table

    def per_bucket(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h, c = h[order], c[order]
        edge = np.flatnonzero(np.diff(h)) + 1
        starts = np.concatenate(([0], edge)) if len(h) else np.empty(0, int)
        tot = np.add.reduceat(c, starts) if len(c) else c
        keys = h[starts][tot > 1] if len(c) else h
        return pa.table({"h": pa.array(keys, type=pa.int64())})

    t = collect_table(
        bucketed_group_apply(
            partials, "h", per_bucket,
            num_buckets=num_buckets, materialize_input=True,
        ),
        schema=pa.schema([("h", pa.int64())]),
    )
    keys = t["h"].to_numpy(zero_copy_only=False)
    if len(keys) > DUP_SET_LIMIT:
        raise ValueError(
            f"{len(keys)} duplicated chunk hashes exceed DUP_SET_LIMIT; "
            "shard the corpus or raise the limit with matching memory"
        )
    return np.sort(keys)


# ---------------------------------------------------------------- fixed


def _text_blocks(batch: pa.Table, text_col: str, block: int):
    """Yield (source_like_table, hash array) of all fixed-width blocks:
    vectorized slicing — one Arrow slice kernel per block SLOT, never a
    per-row loop."""
    arr = batch[text_col]
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_null(arr.type):
        arr = arr.cast(pa.string())
    arr = pc.fill_null(arr, "")
    lens = pc.utf8_length(arr).to_numpy(zero_copy_only=False)
    max_len = int(lens.max()) if len(lens) else 0
    rows, hashes = [], []
    for start in range(0, max_len, block):
        sl = pc.utf8_slice_codeunits(arr, start, start + block)
        live = np.flatnonzero(lens > start)
        if len(live) == 0:
            break
        vals = sl.take(pa.array(live)).to_numpy(zero_copy_only=False)
        rows.append(live)
        hashes.append(md5_token_hash64(vals).view(np.int64))
    if not rows:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(rows), np.concatenate(hashes)


def block_dedup_stats(
    ds: Dataset,
    *,
    block: int = 64,
    text_col: str = "text",
    group_col: str = "source",
    num_buckets: int = 64,
) -> Dataset:
    """Per-``group_col`` fixed-block dedup stats: ``(group, n_blocks,
    n_dup_blocks)`` where a block is "dup" iff its content occurs more
    than once CORPUS-WIDE. Exactly SQL-recomputable (md5_number_upper
    over substr slots)."""
    if block < 1:
        raise ValueError(f"block must be >= 1, got {block}")
    narrow = ds.select_columns([group_col, text_col])

    def hash_partial(batch: pa.Table) -> pa.Table:
        _, h = _text_blocks(batch, text_col, block)
        uniq, cnt = np.unique(h, return_counts=True)
        return pa.table(
            {
                "h": pa.array(uniq, type=pa.int64()),
                "c": pa.array(cnt, type=pa.int64()),
            }
        )

    dup = _dup_hash_set(
        narrow.map_batches(hash_partial, batch_format="pyarrow"),
        num_buckets=num_buckets,
    )
    import ray

    ref = ray.put(dup)

    def stats_partial(batch: pa.Table) -> pa.Table:
        from doppel_ray.stages.util import cached_get

        rows, h = _text_blocks(batch, text_col, block)
        d = cached_get(ref)
        if len(h):
            pos = np.searchsorted(d, h)
            pos[pos == len(d)] = 0
            hit = (d[pos] == h) if len(d) else np.zeros(len(h), bool)
        else:
            hit = np.zeros(0, bool)
        src = np.asarray(batch[group_col].to_pylist(), dtype=object)
        import pandas as pd

        df = pd.DataFrame({"g": src[rows], "d": hit.astype(np.int64)})
        agg = df.groupby("g", sort=False)["d"].agg(["size", "sum"])
        return pa.table(
            {
                group_col: pa.array(agg.index.to_numpy(), type=pa.string()),
                "nb": pa.array(
                    agg["size"].to_numpy().astype(np.int64), type=pa.int64()
                ),
                "nd": pa.array(
                    agg["sum"].to_numpy().astype(np.int64), type=pa.int64()
                ),
            }
        )

    return (
        narrow.map_batches(stats_partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(
            Sum("nb", alias_name="n_blocks"),
            Sum("nd", alias_name="n_dup_blocks"),
        )
    )


# ------------------------------------------------------------------ cdc


def _chunk_doc(buf: bytes, window: int, mask: int, min_len: int):
    """Pure reference boundary rule for ONE payload (also the test
    oracle): candidate boundary AFTER byte i when the polynomial hash of
    bytes[i-window+1 : i+1] & mask == 0; accepted if the resulting chunk
    is >= min_len; final chunk runs to the end."""
    n = len(buf)
    if n == 0:
        return []
    b = np.frombuffer(buf, dtype=np.uint8).astype(np.uint64)
    cuts = [0]
    if n >= window:
        pw = np.empty(window, dtype=np.uint64)
        pw[-1] = np.uint64(1)
        for j in range(window - 2, -1, -1):
            pw[j] = pw[j + 1] * _GEAR_P
        h = np.zeros(n - window + 1, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(window):
                h += b[j : n - window + 1 + j] * pw[j]
        cand = np.flatnonzero((h & np.uint64(mask)) == 0) + window
        last = 0
        for c in cand:
            if c - last >= min_len and c < n:
                cuts.append(int(c))
                last = int(c)
    cuts.append(n)
    return [(cuts[i], cuts[i + 1]) for i in range(len(cuts) - 1)]


def cdc_chunks(
    ds: Dataset,
    *,
    payload_col: str = "html",
    id_col: str = "doc_id",
    window: int = 16,
    boundary_bits: int = 6,
    min_len: int = 32,
) -> Dataset:
    """``(doc_id, chunk_idx, chunk_hash, chunk_len)`` — content-defined
    chunks per payload (module docstring). The rolling window hash is
    vectorized (``window`` shifted adds over the batch's concatenated
    byte buffer); only the sparse boundary-acceptance walk (~1 per
    2^boundary_bits bytes) and the per-chunk blake2b run in Python."""
    if window < 2 or boundary_bits < 1 or min_len < 1:
        raise ValueError("bad window/boundary_bits/min_len")
    mask = (1 << boundary_bits) - 1

    def fn(batch: pa.Table) -> pa.Table:
        payloads = batch[payload_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_id, out_idx, out_h, out_len = [], [], [], []
        for did, buf in zip(ids, payloads):
            if buf is None:
                continue
            if isinstance(buf, str):
                buf = buf.encode()
            for k, (a, bnd) in enumerate(
                _chunk_doc(buf, window, mask, min_len)
            ):
                out_id.append(int(did))
                out_idx.append(k)
                out_h.append(
                    int.from_bytes(
                        hashlib.blake2b(
                            buf[a:bnd], digest_size=8
                        ).digest(),
                        "little",
                        signed=False,
                    )
                    - (1 << 63)
                )
                out_len.append(bnd - a)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "chunk_idx": pa.array(out_idx, type=pa.int64()),
                "chunk_hash": pa.array(out_h, type=pa.int64()),
                "chunk_len": pa.array(out_len, type=pa.int64()),
            }
        )

    return ds.select_columns([id_col, payload_col]).map_batches(
        fn, batch_format="pyarrow"
    )


def cdc_dedup_stats(
    ds: Dataset,
    *,
    payload_col: str = "html",
    id_col: str = "doc_id",
    window: int = 16,
    boundary_bits: int = 6,
    min_len: int = 32,
    num_buckets: int = 64,
) -> pa.Table:
    """ONE-row corpus dedup report over content-defined chunks:
    ``(n_chunks, n_unique_chunks, total_bytes, dup_bytes,
    dedup_ratio_bp)`` — ``dup_bytes`` = bytes saved storing each
    distinct chunk once (sum of (count-1) * len over duplicated chunk
    hashes; 64-bit collision bound documented in novelty.py's stance).
    All-integer, layout-invariant."""
    chunks = cdc_chunks(
        ds, payload_col=payload_col, id_col=id_col,
        window=window, boundary_bits=boundary_bits, min_len=min_len,
    )

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "h": batch["chunk_hash"].to_numpy(zero_copy_only=False),
                "l": batch["chunk_len"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("h", sort=False)["l"].agg(["size", "first"])
        return pa.table(
            {
                "h": pa.array(g.index.to_numpy(), type=pa.int64()),
                "c": pa.array(
                    g["size"].to_numpy().astype(np.int64), type=pa.int64()
                ),
                "l": pa.array(
                    g["first"].to_numpy().astype(np.int64), type=pa.int64()
                ),
            }
        )

    from doppel_ray.stages.exact import bucketed_group_apply
    from doppel_ray.stages.util import collect_table

    def per_bucket(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        g = df.groupby("h", sort=False).agg(
            c=("c", "sum"), l=("l", "first")
        )
        n_unique = len(g)
        n_chunks = int(g["c"].sum())
        total = int((g["c"] * g["l"]).sum())
        dup = g[g["c"] > 1]
        dup_bytes = int(((dup["c"] - 1) * dup["l"]).sum())
        return pa.table(
            {
                "n_chunks": pa.array([n_chunks], type=pa.int64()),
                "n_unique_chunks": pa.array([n_unique], type=pa.int64()),
                "total_bytes": pa.array([total], type=pa.int64()),
                "dup_bytes": pa.array([dup_bytes], type=pa.int64()),
            }
        )

    folded = collect_table(
        bucketed_group_apply(
            chunks.map_batches(partial, batch_format="pyarrow"),
            "h", per_bucket,
            num_buckets=num_buckets, materialize_input=True,
        ),
        schema=pa.schema(
            [
                ("n_chunks", pa.int64()),
                ("n_unique_chunks", pa.int64()),
                ("total_bytes", pa.int64()),
                ("dup_bytes", pa.int64()),
            ]
        ),
    )
    import pandas as pd

    s = folded.to_pandas().sum()
    total = int(s["total_bytes"])
    dup_bytes = int(s["dup_bytes"])
    ratio_bp = (10_000 * dup_bytes) // total if total else 0
    return pa.table(
        {
            "n_chunks": pa.array([int(s["n_chunks"])], type=pa.int64()),
            "n_unique_chunks": pa.array(
                [int(s["n_unique_chunks"])], type=pa.int64()
            ),
            "total_bytes": pa.array([total], type=pa.int64()),
            "dup_bytes": pa.array([dup_bytes], type=pa.int64()),
            "dedup_ratio_bp": pa.array([ratio_bp], type=pa.int64()),
        }
    )
