"""Misra-Gries heavy hitters — frequent tokens over the corpus WITHOUT
a full token shuffle. The classic deterministic frequent-items summary
(Misra & Gries 1982), distributed via the mergeable-summaries result
(Agarwal et al. 2012): per-block summaries of at most ``capacity``
counters merge by plain counter addition, and the total undercount is
bounded by the sum of per-block decrements.

Guarantees (pinned in tests/test_heavyhitters.py):

- ``est <= true`` for every emitted token (pure undercount);
- ``true - est <= total_decrement`` where ``total_decrement`` is the
  summed per-block decrement (itself ``<= n_tokens / (capacity + 1)``);
- every token with ``true > total_decrement`` survives into the merged
  summary — no false negatives above the error bound.

Scale shape: tokenize + exact in-batch counts (one ``np.unique`` over
dictionary codes), MG-compress to ``capacity`` counters per block, then
ONE narrow ``groupby(token).sum`` over block summaries — shuffle volume
is ``capacity x blocks`` (token, int) rows, independent of corpus token
count. When ``capacity`` exceeds a block's distinct-token count the
block's decrement is zero; with zero total decrement the result is
EXACT — which is how the driver query pairs with a plain SQL
``GROUP BY/HAVING`` oracle while the lossy regime stays test-covered.

The reference's analogue is the size->hash group cascade (it counts
files per key exactly); this is the sketch-regime counterpart for
corpus-scale token statistics, alongside the HLL distinct sketch
(functions/sketch.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from doppel_ray.stages.util import collect_table

_SUMMARY_SCHEMA = pa.schema(
    [("token", pa.string()), ("est", pa.int64()), ("dec", pa.int64())]
)


def _mg_compress(
    tokens: np.ndarray, counts: np.ndarray, capacity: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Exact counts -> MG summary of <= capacity counters.

    Returns (tokens, decremented counts, decrement). The decrement is
    the (capacity+1)-th largest count (0 when everything fits): every
    counter drops by it and non-positive counters vanish — the batch
    form of MG's one-at-a-time eviction."""
    if len(tokens) <= capacity:
        return tokens, counts, 0
    # (capacity+1)-th largest via argpartition: O(n)
    kth = np.partition(counts, len(counts) - capacity - 1)[
        len(counts) - capacity - 1
    ]
    dec = int(kth)
    keep = counts > dec
    return tokens[keep], counts[keep] - dec, dec


def frequent_tokens(
    ds: Dataset,
    *,
    capacity: int = 65_536,
    min_count: int = 1,
    text_col: str = "text",
    lowercase: bool = False,
) -> tuple[pa.Table, int]:
    """(merged summary table, total_decrement).

    The table has (token, est) sorted by est DESC, token ASC, filtered
    to ``est >= min_count``. ``total_decrement`` is the global
    undercount bound: ``est <= true <= est + total_decrement`` for
    emitted tokens, and any token with ``true > total_decrement`` is
    guaranteed present (before the ``min_count`` filter).
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")

    from doppel_ray.stages.decontam import _flat_tokens

    def block_summary(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch[text_col])
        if lowercase:
            import pyarrow.compute as pc

            flat = pc.utf8_lower(flat)
        if len(flat) == 0:
            return _SUMMARY_SCHEMA.empty_table()
        enc = flat.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        cnt = np.bincount(codes, minlength=len(enc.dictionary)).astype(np.int64)
        toks = np.asarray(enc.dictionary, dtype=object)
        toks, cnt, dec = _mg_compress(toks, cnt, capacity)
        return pa.table(
            {
                "token": pa.array(toks, type=pa.string()),
                "est": pa.array(cnt),
                # ship the block decrement on every row and recover it
                # as max() per... no: ship it once on a sentinel row
                "dec": pa.array(np.zeros(len(cnt), dtype=np.int64)),
            }
        ).cast(_SUMMARY_SCHEMA) if dec == 0 else pa.concat_tables(
            [
                pa.table(
                    {
                        "token": pa.array(toks, type=pa.string()),
                        "est": pa.array(cnt),
                        "dec": pa.array(np.zeros(len(cnt), dtype=np.int64)),
                    }
                ).cast(_SUMMARY_SCHEMA),
                pa.table(
                    {
                        "token": pa.array([""], type=pa.string()),
                        "est": pa.array([0], type=pa.int64()),
                        "dec": pa.array([dec], type=pa.int64()),
                    }
                ).cast(_SUMMARY_SCHEMA),
            ]
        )

    merged = collect_table(
        ds.select_columns([text_col])
        .map_batches(block_summary, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("est", alias_name="est"), Sum("dec", alias_name="dec")),
        pa.schema(
            [("token", pa.string()), ("est", pa.int64()), ("dec", pa.int64())]
        ),
    )
    total_dec = int(
        np.nansum(merged["dec"].to_numpy(zero_copy_only=False))
    )
    toks = np.asarray(merged["token"].to_pylist(), dtype=object)
    est = merged["est"].to_numpy(zero_copy_only=False).astype(np.int64)
    real = est > 0  # drops the zero-est sentinel rows (and "" if only sentinel)
    toks, est = toks[real], est[real]
    keep = est >= min_count
    toks, est = toks[keep], est[keep]
    order = np.lexsort((toks, -est))
    return (
        pa.table(
            {
                "token": pa.array(toks[order], type=pa.string()),
                "est": pa.array(est[order]),
            }
        ),
        total_dec,
    )
