"""BPE merge learning (tokenizer training) over a corpus — the
Sennrich et al. (2016) byte-pair-encoding procedure: start from
characters, repeatedly merge the most frequent adjacent symbol pair.

Not in the reference (doppel has no text ops); included because a
training-data pipeline that ships tokens must first TRAIN the tokenizer
on the corpus it curated.

Ray-Data design
---------------
The classic scale insight: BPE statistics live on the WORD-TYPE table,
not the corpus. ONE corpus-wide pass + groupby builds ``(word, freq)``
— after that, every merge iteration touches only distinct word types
(a ~1e8-bounded relation at web scale, vs 1e12 docs), so:

1. ``word_freqs``: flat-token explode (shared RE2-parity tokenizer,
   decontam.py note) with per-batch pre-aggregation, then one narrow
   groupby-sum shuffle. This is the only corpus-width stage.
2. ``learn_bpe``: when the word-type count fits ``driver_word_limit``,
   the textbook driver loop runs on the collected table (exact, fast);
   above it, each merge round is ONE narrow shuffle over the word-type
   table: per-batch vectorized pair counting -> groupby-sum ->
   per-block top-1 -> driver argmax (constant rows) -> broadcast merge
   application. The per-word merge application is a Python loop over
   SHORT symbol lists on the word-type relation — bounded by types x
   word length, never by corpus size (documented partitioning
   assumption).

Determinism: ties break by (count DESC, pair lexicographic ASC), so
merges are reproducible at any parallelism or block layout.

Words carry a terminal ``</w>`` marker (the original formulation), so
learned units never span word boundaries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

EOW = "</w>"

MERGES_SCHEMA = pa.schema(
    [
        ("rank", pa.int64()),
        ("left", pa.string()),
        ("right", pa.string()),
        ("pair_count", pa.int64()),
    ]
)

#: word-type count at or below which the merge loop runs on the driver
#: (exact same output as the distributed path; tested equivalent)
DRIVER_WORD_LIMIT = 200_000


def word_freqs(ds: Dataset, *, text_col: str = "text", lowercase: bool = True) -> Dataset:
    """Corpus -> ``(word, freq)`` word-type table: the one corpus-width
    stage. Per-batch pre-aggregation keeps the shuffle at distinct
    words per block, not tokens."""
    import pyarrow.compute as pc

    from doppel_ray.stages.decontam import _flat_tokens

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if lowercase:
            texts = pc.utf8_lower(texts)
        flat, _ = _flat_tokens(texts)
        if len(flat) == 0:
            return pa.schema([("word", pa.string()), ("freq", pa.int64())]).empty_table()
        s = pd.Series(flat.to_pandas()).value_counts()
        return pa.table(
            {
                "word": pa.array(s.index.to_numpy(dtype=object), type=pa.string()),
                "freq": pa.array(s.to_numpy(dtype=np.int64), type=pa.int64()),
            }
        )

    return (
        ds.select_columns([text_col])
        .map_batches(fn, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("freq", alias_name="freq"))
    )


def _pair_counts_df(words: list[list[str]], freqs: np.ndarray) -> pd.Series:
    """(left+sep+right) -> weighted count over a word-symbol batch."""
    counts: dict[tuple[str, str], int] = {}
    for syms, f in zip(words, freqs):
        f = int(f)
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + f
    return pd.Series(counts, dtype=np.int64)


def _apply_merge(syms: list[str], left: str, right: str, joined: str) -> list[str]:
    out = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _best_pair(counts: pd.Series) -> tuple[tuple[str, str], int] | None:
    if counts.empty:
        return None
    m = int(counts.max())
    best = min(p for p, c in counts.items() if c == m)
    return best, m


def _learn_driver(words: list[list[str]], freqs: np.ndarray, n_merges: int) -> list[dict]:
    merges = []
    words = [list(w) for w in words]
    for rank in range(n_merges):
        best = _best_pair(_pair_counts_df(words, freqs))
        if best is None or best[1] < 1:
            break
        (l, r), cnt = best
        merges.append({"rank": rank, "left": l, "right": r, "pair_count": cnt})
        joined = l + r
        words = [
            _apply_merge(w, l, r, joined) if joined in "".join(w) else w
            for w in words
        ]
    return merges


def _symbolize(word: str) -> list[str]:
    return list(word) + [EOW]


def learn_bpe(
    ds: Dataset,
    n_merges: int,
    *,
    text_col: str = "text",
    lowercase: bool = True,
    driver_word_limit: int = DRIVER_WORD_LIMIT,
) -> pa.Table:
    """Learn ``n_merges`` BPE merges; returns the MERGES_SCHEMA table
    ordered by rank. Driver and distributed paths produce identical
    merges (tested); the gate is the word-type count."""
    wf = word_freqs(ds, text_col=text_col, lowercase=lowercase).materialize()
    n_types = wf.count()
    if n_types <= driver_word_limit:
        rows = wf.take_all()
        words = [_symbolize(r["word"]) for r in rows]
        freqs = np.array([r["freq"] for r in rows], dtype=np.int64)
        merges = _learn_driver(words, freqs, n_merges)
        return pa.Table.from_pylist(merges, schema=MERGES_SCHEMA)
    return _learn_distributed(wf, n_merges)


# symbol lists travel the shuffle as a single string joined on \x1f
# (unit separator — cannot appear in \S+ tokens of scraped text)
_SEP = "\x1f"


def _learn_distributed(wf: Dataset, n_merges: int) -> pa.Table:
    """One narrow shuffle per merge round over the word-type table."""
    import pyarrow.compute as pc

    def to_syms(batch: pa.Table) -> pa.Table:
        syms = [_SEP.join(_symbolize(w)) for w in batch["word"].to_pylist()]
        return pa.table(
            {"syms": pa.array(syms, type=pa.string()), "freq": batch["freq"]}
        )

    cur = wf.map_batches(to_syms, batch_format="pyarrow").materialize()
    merges: list[dict] = []
    for rank in range(n_merges):

        def count_pairs(batch: pa.Table) -> pa.Table:
            words = [s.split(_SEP) for s in batch["syms"].to_pylist()]
            freqs = batch["freq"].to_numpy(zero_copy_only=False)
            s = _pair_counts_df(words, freqs)
            if s.empty:
                return pa.schema(
                    [("pair", pa.string()), ("cnt", pa.int64())]
                ).empty_table()
            return pa.table(
                {
                    "pair": pa.array(
                        [l + _SEP + r for l, r in s.index], type=pa.string()
                    ),
                    "cnt": pa.array(s.to_numpy(), type=pa.int64()),
                }
            )

        def block_top(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            cnt = batch["cnt"].to_numpy(zero_copy_only=False)
            m = cnt.max()
            cand = batch.filter(pa.array(cnt == m))
            best = min(cand["pair"].to_pylist())
            return pa.table(
                {"pair": pa.array([best]), "cnt": pa.array([int(m)], type=pa.int64())}
            )

        tops = (
            cur.map_batches(count_pairs, batch_format="pyarrow")
            .groupby("pair")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .map_batches(block_top, batch_format="pyarrow")
            .take_all()
        )
        if not tops:
            break
        m = max(t["cnt"] for t in tops)
        if m < 1:
            break
        best = min(t["pair"] for t in tops if t["cnt"] == m)
        l, r = best.split(_SEP)
        merges.append({"rank": rank, "left": l, "right": r, "pair_count": int(m)})
        joined = l + r

        def apply(batch: pa.Table, _l=l, _r=r, _j=joined) -> pa.Table:
            out = []
            for s in batch["syms"].to_pylist():
                syms = s.split(_SEP)
                out.append(_SEP.join(_apply_merge(syms, _l, _r, _j)))
            return pa.table(
                {"syms": pa.array(out, type=pa.string()), "freq": batch["freq"]}
            )

        cur = cur.map_batches(apply, batch_format="pyarrow").materialize()
    return pa.Table.from_pylist(merges, schema=MERGES_SCHEMA)


class BPEEncoder:
    """Actor-pool BPE encoder: applies a learned merge list (rank order)
    to count subword units per document. Merge ranks live in a dict
    built ONCE per actor (``__init__``); each batch tokenizes
    vectorized, encodes each DISTINCT word once (per-actor memo — web
    text is Zipfian, so the memo hit rate is the token/type ratio), and
    sums unit counts per doc.

    Encoding uses the standard greedy lowest-rank-pair loop (the
    inverse of training, so train->encode round-trips: a word seen in
    training encodes to the units training left it with)."""

    def __init__(self, merges: list[tuple[str, str]], *, text_col: str = "text",
                 lowercase: bool = True):
        self.ranks = {pair: i for i, pair in enumerate(merges)}
        self.text_col = text_col
        self.lowercase = lowercase
        self._memo: dict[str, int] = {}

    def _encode_len(self, word: str) -> int:
        n = self._memo.get(word)
        if n is not None:
            return n
        syms = _symbolize(word)
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = self.ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        n = len(syms)
        if len(self._memo) < 1_000_000:  # bound actor memory
            self._memo[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from doppel_ray.stages.decontam import _flat_tokens

        texts = batch[self.text_col]
        if self.lowercase:
            texts = pc.utf8_lower(texts)
        flat, counts = _flat_tokens(texts)
        words = flat.to_pylist()
        lens = np.fromiter(
            (self._encode_len(w) for w in words), dtype=np.int64, count=len(words)
        )
        bounds = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        per_doc = np.add.reduceat(
            np.concatenate([lens, [0]]), bounds[:-1]
        ) * (counts > 0)
        return batch.drop_columns([self.text_col]).append_column(
            "n_bpe_units", pa.array(per_doc.astype(np.int64), type=pa.int64())
        )


def encode_unit_counts(
    ds: Dataset,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    lowercase: bool = True,
    concurrency: int | tuple[int, int] | None = None,
) -> Dataset:
    """Per-doc BPE unit counts under a learned merge list — the
    train->apply half of the tokenizer story (stateful actor pool,
    merges + memo in ``__init__``). Default concurrency is the
    autoscaling ``(1, 4)`` pool (see lm.perplexity_scores: a fixed
    pool deadlocks against upstream blocking split tasks on small
    CPU budgets)."""
    return ds.map_batches(
        BPEEncoder,
        fn_constructor_kwargs={
            "merges": merges,
            "text_col": text_col,
            "lowercase": lowercase,
        },
        batch_format="pyarrow",
        concurrency=concurrency or (1, 4),
    )
