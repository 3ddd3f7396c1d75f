"""Token-budget mixture filling — the data-mixture construction step of
a pretraining pipeline: given a per-stratum (domain / source / language)
TOKEN budget, deterministically keep each stratum's documents in stable
hash order until its budget is filled ("sample 30B tokens of web, 5B of
code, all of books"). Hash order makes the selection a pure function of
the record key — identical at any cluster size, block layout, or run
count, and exactly reproducible in SQL as a windowed cumulative sum:

    sum(n_tokens) OVER (PARTITION BY stratum
                        ORDER BY md5_number_upper(key::VARCHAR), key)
        <= budget[stratum]

Scale shape — a distributed THRESHOLD computation, not a global sort
(the same two-pass idea as distributed quantiles; packing.py uses the
range-prefix variant):

1. **narrow pass** (one tokenize of the corpus): (key, stratum,
   n_tokens, h = md5-low64(key)) — payload text never leaves this
   stage; materialized because three consumers read it.
2. **coarse histogram** — bucket = top ``coarse_bits`` of h; a
   combiner-first ``groupby(stratum, bucket).sum(n)`` ships one partial
   per (block, stratum, bucket). The collected table is bounded by
   #strata x 2^coarse_bits, independent of corpus size.
3. **driver prefix over buckets** — per stratum, a tiny cumsum in
   bucket order finds the MARGINAL bucket b* (where the budget runs
   out) and the residual budget r entering it. Buckets < b* are kept
   whole; buckets > b* are dropped whole.
4. **marginal resolve** — only bucket-b* rows (expected corpus /
   2^coarse_bits per stratum; guarded by ``marginal_limit``) are
   collected, sorted by (h, key), and prefix-filled with r, yielding a
   per-stratum cutoff pair (h*, key*).
5. **final filter** — one vectorized ``map_batches`` over the narrow
   table: keep iff bucket < b*, or bucket == b* and (h, key) <=
   (h*, key*). Integer-only decisions -> bit-identical to the SQL twin.

The kept relation is (key, stratum, n_tokens); payloads rejoin via
``exact.semi_filter`` on the key, so nothing wide ever shuffles.

The reference has no mixture stage (it dedups filesystems); this is the
training-data surface mandated by the build brief, sharing the
determinism stance of stages/sample.py (SURVEY.md G4: selection is a
function of keys, never execution order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from doppel_ray.functions.text import md5_token_hash64
from doppel_ray.stages.util import cached_get, collect_table

#: cap on collected marginal-bucket rows (per call, all strata): past
#: this the coarse histogram is too coarse for the corpus — raise
#: ``coarse_bits`` (each extra bit halves the marginal bucket).
DEFAULT_MARGINAL_LIMIT = 5_000_000


def _narrow_schema(key_col: str, stratum_col: str) -> pa.Schema:
    return pa.schema(
        [
            (key_col, pa.int64()),
            (stratum_col, pa.string()),
            ("n_tokens", pa.int64()),
            ("h", pa.uint64()),
        ]
    )


def token_budget_fill(
    ds: Dataset,
    stratum_col: str,
    budgets: dict,
    *,
    key_col: str = "doc_id",
    text_col: str = "text",
    default_budget: int = 0,
    coarse_bits: int = 12,
    marginal_limit: int = DEFAULT_MARGINAL_LIMIT,
) -> Dataset:
    """Keep each stratum's docs in md5(key) hash order while the running
    token total stays within ``budgets[stratum]`` (``default_budget``
    for unlisted strata).

    Returns (key_col, stratum_col, n_tokens) for every kept doc. The
    kept set per stratum is the maximal prefix of the stratum's docs —
    ordered by (md5-low64(str(key)), key) — whose cumulative
    ``n_tokens`` is <= the budget; whole documents only, zero-token
    docs pass whenever the budget is not yet exceeded. Distinct keys
    are assumed (document ids); duplicate keys would share a hash and
    still order deterministically via the key tie-break.
    """
    for s, b in budgets.items():
        if int(b) < 0:
            raise ValueError(f"budget for stratum {s!r} must be >= 0, got {b}")
    if default_budget < 0:
        raise ValueError(f"default_budget must be >= 0, got {default_budget}")
    if not 1 <= coarse_bits <= 32:
        raise ValueError(f"coarse_bits must be in [1, 32], got {coarse_bits}")

    from doppel_ray.stages.decontam import _flat_tokens

    shift = np.uint64(64 - coarse_bits)

    def narrow_pass(batch: pa.Table) -> pa.Table:
        _, counts = _flat_tokens(batch[text_col])
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = md5_token_hash64(
            np.asarray([str(k) for k in keys], dtype=object)
        )
        return pa.table(
            {
                key_col: pa.array(keys),
                stratum_col: batch[stratum_col],
                "n_tokens": pa.array(np.asarray(counts, dtype=np.int64)),
                "h": pa.array(h, type=pa.uint64()),
            }
        )

    narrow = (
        ds.select_columns([key_col, stratum_col, text_col])
        .map_batches(narrow_pass, batch_format="pyarrow")
        .materialize()  # tokenize once; histogram + marginal + filter read it
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column("bucket", pa.array((h >> shift).astype(np.int64)))

    coarse = collect_table(
        narrow.map_batches(add_bucket, batch_format="pyarrow")
        .groupby([stratum_col, "bucket"])
        .aggregate(Sum("n_tokens", alias_name="bn")),
        pa.schema(
            [(stratum_col, pa.string()), ("bucket", pa.int64()), ("bn", pa.int64())]
        ),
    )

    # driver prefix over the (strata x buckets)-bounded histogram
    strata = coarse[stratum_col].to_numpy(zero_copy_only=False)
    bkt = coarse["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    bn = coarse["bn"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((bkt, strata))
    strata, bkt, bn = strata[order], bkt[order], bn[order]

    marginal: dict[str, int] = {}  # stratum -> marginal bucket b*
    residual: dict[str, int] = {}  # stratum -> budget entering b*
    keep_all: set[str] = set()
    i = 0
    while i < len(strata):
        j = i
        while j < len(strata) and strata[j] == strata[i]:
            j += 1
        s = strata[i]
        budget = int(budgets.get(s, default_budget))
        cum = np.cumsum(bn[i:j])
        over = np.flatnonzero(cum > budget)
        if len(over) == 0:
            keep_all.add(s)
        else:
            m = int(over[0])
            marginal[s] = int(bkt[i + m])
            residual[s] = budget - (int(cum[m - 1]) if m > 0 else 0)
        i = j

    # collect ONLY the marginal buckets and resolve each stratum's
    # exact cutoff (h*, key*) with a driver-side prefix fill
    marg_ref = ray.put(dict(marginal))

    def marginal_filter(batch: pa.Table) -> pa.Table:
        mb = cached_get(marg_ref)
        if not mb or batch.num_rows == 0:
            return batch.slice(0, 0)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (h >> shift).astype(np.int64)
        # vectorized stratum -> b* lookup: one Python pass over the
        # (few) DISTINCT strata in the batch, then pure numpy
        enc = batch[stratum_col].combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        tgt_by_code = np.fromiter(
            (mb.get(s, -1) for s in enc.dictionary.to_pylist()),
            dtype=np.int64,
            count=len(enc.dictionary),
        )
        return batch.filter(pa.array(b == tgt_by_code[codes]))

    marg = collect_table(
        narrow.map_batches(marginal_filter, batch_format="pyarrow"),
        _narrow_schema(key_col, stratum_col),
    )
    if marg.num_rows > marginal_limit:
        raise RuntimeError(
            f"{marg.num_rows} marginal-bucket rows exceed "
            f"marginal_limit={marginal_limit}; raise coarse_bits "
            f"(currently {coarse_bits}) to shrink the marginal bucket"
        )

    # cutoff[stratum] = (h*, key*): the LAST kept row in bucket b*; a
    # stratum whose marginal bucket keeps nothing gets no entry (only
    # earlier buckets survive, and for b*=first bucket, nothing does)
    cutoff: dict[str, tuple[int, int]] = {}
    mh = marg["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
    mk = marg[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    mn = marg["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
    ms = np.asarray(marg[stratum_col].to_pylist(), dtype=object)
    order = np.lexsort((mk, mh, ms))
    mh, mk, mn, ms = mh[order], mk[order], mn[order], ms[order]
    i = 0
    while i < len(ms):
        j = i
        while j < len(ms) and ms[j] == ms[i]:
            j += 1
        cum = np.cumsum(mn[i:j])
        kept = np.flatnonzero(cum <= residual[ms[i]])
        if len(kept):
            last = i + int(kept[-1])
            cutoff[ms[i]] = (int(mh[last]), int(mk[last]))
        i = j

    thr_ref = ray.put((dict(marginal), dict(cutoff), set(keep_all)))

    def final_filter(batch: pa.Table) -> pa.Table:
        mb, cut, full = cached_get(thr_ref)
        if batch.num_rows == 0:
            return batch
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (h >> shift).astype(np.int64)
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-DISTINCT-stratum thresholds, broadcast to rows via codes
        enc = batch[stratum_col].combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        dic = enc.dictionary.to_pylist()
        d_full = np.fromiter((s in full for s in dic), dtype=bool, count=len(dic))
        d_bstar = np.fromiter(
            (mb.get(s, -1) for s in dic), dtype=np.int64, count=len(dic)
        )
        d_hs = np.fromiter(
            (cut[s][0] if s in cut else 0 for s in dic),
            dtype=np.uint64,
            count=len(dic),
        )
        d_ks = np.fromiter(
            (cut[s][1] if s in cut else 0 for s in dic),
            dtype=np.int64,
            count=len(dic),
        )
        d_has_cut = np.fromiter(
            (s in cut for s in dic), dtype=bool, count=len(dic)
        )
        bstar, hs, ks = d_bstar[codes], d_hs[codes], d_ks[codes]
        in_marginal = d_has_cut[codes] & (b == bstar)
        keep = (
            d_full[codes]
            | (~d_full[codes] & (b < bstar))
            | (in_marginal & ((h < hs) | ((h == hs) & (k <= ks))))
        )
        return batch.filter(pa.array(keep))

    return narrow.map_batches(final_filter, batch_format="pyarrow").drop_columns(
        ["h"]
    )
