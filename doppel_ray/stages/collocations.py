"""Collocation mining: top-k bigrams by LIFT — the monotone twin of
PMI (PMI = ln(lift)), kept in exact-IEEE territory so a DuckDB oracle
reproduces the score doubles bit-identically (ln is NOT bit-stable
across engines — see stages/sample.py weighted_sample — but multiply
and divide are correctly rounded everywhere, so a fixed operation
order makes lift exact).

Convention: joint from the bigram distribution, marginals from the
unigram distribution —

    lift(x, y) = (c_xy / N_big) / ((c_x / N_uni) * (c_y / N_uni))
               = ((c_xy * N_uni) * N_uni) / ((N_big * c_x) * c_y)

computed in float64 with EXACTLY that association on both engines.

Scale shape:

- Bigram relation: per-batch value_counts combiner (doc boundaries
  masked), ONE narrow (bigram, partial) groupby — shuffle carries
  distinct bigrams per batch, never the token stream.
- Unigram relation: same shape, vocabulary-bounded (Heaps' law), then
  collected ONCE and broadcast (``vocab_limit`` guard raises toward a
  join-based variant rather than silently collecting a corpus-sized
  table).
- Scoring: one zero-shuffle map over the bigram relation; top-k via the
  block-pruned `rank.global_topk` (survivor union is k x blocks rows,
  corpus-size independent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

from doppel_ray.functions.analysis import WS_TOKEN_RE

#: unigram vocabulary rows above which the broadcast lookup refuses
#: (Heaps' law keeps real corpora far below this; raising beats
#: silently materializing a corpus-sized table on the driver)
VOCAB_LIMIT = 5_000_000


def _token_lists(batch: pa.Table, text_col: str) -> pd.Series:
    import pyarrow.compute as pc

    s = pc.utf8_lower(
        pc.fill_null(batch[text_col].combine_chunks(), "")
    ).to_pandas()
    return s.str.findall(WS_TOKEN_RE)


def bigram_relation(ds: Dataset, *, text_col: str = "text") -> Dataset:
    """``(bigram, n)`` counts — combiner-first, boundary-masked."""

    def partial(batch: pa.Table) -> pa.Table:
        toks = _token_lists(batch, text_col)
        lens = toks.str.len().to_numpy()
        flat = toks.explode().dropna().to_numpy()
        if len(flat) < 2:
            return pa.table(
                {
                    "bigram": pa.array([], type=pa.string()),
                    "pn": pa.array([], type=pa.int64()),
                }
            )
        ends = np.cumsum(lens[lens > 0]) - 1
        keep = np.ones(len(flat) - 1, dtype=bool)
        keep[ends[ends < len(flat) - 1]] = False
        bg = pd.Series(flat[:-1][keep]) + " " + pd.Series(flat[1:][keep])
        vc = bg.value_counts()
        return pa.table(
            {
                "bigram": pa.array(vc.index.to_numpy(), type=pa.string()),
                "pn": pa.array(vc.to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    return (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("pn", alias_name="n"))
    )


def unigram_relation(ds: Dataset, *, text_col: str = "text") -> Dataset:
    """``(tok, c)`` counts — combiner-first."""

    def partial(batch: pa.Table) -> pa.Table:
        toks = _token_lists(batch, text_col)
        flat = toks.explode().dropna()
        vc = flat.value_counts()
        return pa.table(
            {
                "tok": pa.array(vc.index.to_numpy(), type=pa.string()),
                "pc": pa.array(vc.to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    return (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("tok")
        .aggregate(Sum("pc", alias_name="c"))
    )


def bigram_lift_topk(
    ds: Dataset,
    *,
    k: int = 20,
    min_count: int = 10,
    text_col: str = "text",
    vocab_limit: int = VOCAB_LIMIT,
) -> Dataset:
    """Top-``k`` bigrams by lift (module docstring), support floor
    ``min_count``, ties broken by bigram string."""
    if k <= 0 or min_count < 1:
        raise ValueError(f"bad k={k} / min_count={min_count}")

    import ray

    from doppel_ray.stages.util import collect_table

    uni = collect_table(
        unigram_relation(ds, text_col=text_col),
        schema=pa.schema([("tok", pa.string()), ("c", pa.int64())]),
    )
    if uni.num_rows > vocab_limit:
        raise ValueError(
            f"unigram vocabulary {uni.num_rows} exceeds vocab_limit "
            f"{vocab_limit}; raise the limit only with driver memory to match"
        )
    counts = uni["c"].to_numpy(zero_copy_only=False)
    n_uni = np.float64(int(counts.sum()))
    lookup = dict(zip(uni["tok"].to_pylist(), counts.tolist()))
    ref = ray.put(lookup)

    big = bigram_relation(ds, text_col=text_col).materialize()
    n_big = np.float64(int(big.sum("n")))

    def score(batch: pa.Table) -> pa.Table:
        from doppel_ray.stages.util import cached_get

        lk = cached_get(ref)
        bg = batch["bigram"].to_pandas()
        sp = bg.str.split(" ", n=1, expand=True)
        cx = sp[0].map(lk).to_numpy(np.float64)
        cy = sp[1].map(lk).to_numpy(np.float64)
        c = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        # FIXED association — must match the oracle SQL parenthesization
        lift = ((c * n_uni) * n_uni) / ((n_big * cx) * cy)
        return batch.append_column("lift", pa.array(lift, type=pa.float64()))

    from doppel_ray.stages.rank import global_topk

    scored = big.filter(expr=f"n >= {min_count}").map_batches(
        score, batch_format="pyarrow"
    )
    return global_topk(scored, ["lift", "bigram"], ascending=[False, True], k=k)
