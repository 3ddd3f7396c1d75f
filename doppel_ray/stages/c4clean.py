"""C4-style heuristic cleaning (Raffel et al. 2020, §2.2 "C4") — the
standard line- and page-level rules a web-corpus curation pipeline runs
before dedup:

Line rules (a line survives iff ALL hold):

1. ends in terminal punctuation (``.`` ``!`` ``?`` ``"``),
2. has at least ``min_words`` whitespace-separated words,
3. does not mention "javascript" (case-insensitive — the classic
   "please enable JavaScript" boilerplate).

Page rules (evaluated on the ORIGINAL text; first match wins, in this
order, mirrored verbatim by the SQL oracle):

1. ``lorem_ipsum`` — contains "lorem ipsum" (case-insensitive),
2. ``brace`` — contains ``{`` (code/JSON leakage),
3. ``too_few_lines`` — fewer than ``min_lines`` surviving lines.

Output columns: ``text_clean`` (surviving lines joined with ``\\n`` —
computed for every page, including dropped ones, so the columns are
orthogonal), ``n_kept``/``n_dropped`` line counts, ``kept`` bool, and
``drop_reason`` (empty string when kept — not NULL, so value-hash
comparison against SQL is exact).

Scale shape: ONE ``map_batches`` pass — Arrow split into lines, RE2
kernels (``pyarrow.compute`` ``count_substring_regex`` /
``match_substring_regex`` — the same regex engine DuckDB uses, so the
word/punctuation semantics are engine-identical) on the flattened line
array, segment-reduce back per document. No shuffle, no driver state,
corpus-width independent. The only per-row Python is the kept-line
re-join, bounded per batch (same idiom as stages/linededup.py).

Reference framing: generalizes the reference's file-exclusion
predicates (internal/filter/filter.go) from path/size rules on files to
content rules on web pages — the filter stage a corpus pipeline runs
where doppel runs its name/size filters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

#: line must end in one of these to survive (C4 terminal punctuation)
TERMINAL_RE = r'[.!?"]$'
#: whitespace-separated word counter (RE2 ``\S`` — ASCII whitespace,
#: matching DuckDB's regexp_extract_all on the same pattern)
WORD_RE = r"\S+"
JAVASCRIPT_RE = r"(?i)javascript"
LOREM_RE = r"(?i)lorem ipsum"

REASON_LOREM = "lorem_ipsum"
REASON_BRACE = "brace"
REASON_FEW = "too_few_lines"


def _line_kept_mask(flat: pa.Array, min_words: int) -> np.ndarray:
    term = pc.match_substring_regex(flat, pattern=TERMINAL_RE)
    n_words = pc.count_substring_regex(flat, pattern=WORD_RE)
    js = pc.match_substring_regex(flat, pattern=JAVASCRIPT_RE)
    keep = pc.and_(
        pc.and_(term, pc.greater_equal(n_words, min_words)), pc.invert(js)
    )
    return keep.fill_null(False).to_numpy(zero_copy_only=False)


def c4_clean(
    ds: Dataset,
    *,
    text_col: str = "text",
    min_words: int = 5,
    min_lines: int = 3,
) -> Dataset:
    """Append C4 cleaning columns (see module docstring) to ``ds``."""
    if min_words < 1 or min_lines < 1:
        raise ValueError(
            f"min_words/min_lines must be >= 1, got {min_words}/{min_lines}"
        )

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].combine_chunks()
        lines = pc.split_pattern(texts, pattern="\n")
        flat = pc.list_flatten(lines)
        n_per_row = np.asarray(pc.list_value_length(lines).fill_null(0))
        keep = _line_kept_mask(flat, min_words)

        row_of = np.repeat(np.arange(len(lines), dtype=np.int64), n_per_row)
        n_kept = np.zeros(len(lines), dtype=np.int64)
        np.add.at(n_kept, row_of, keep.astype(np.int64))
        n_dropped = n_per_row.astype(np.int64) - n_kept

        flat_py = flat.to_pylist()
        out_texts = []
        pos = 0
        for n in n_per_row:
            out_texts.append(
                "\n".join(flat_py[pos + j] for j in range(n) if keep[pos + j])
            )
            pos += n

        lorem = (
            pc.match_substring_regex(texts, pattern=LOREM_RE)
            .fill_null(False)
            .to_numpy(zero_copy_only=False)
        )
        brace = (
            pc.match_substring(texts, pattern="{")
            .fill_null(False)
            .to_numpy(zero_copy_only=False)
        )
        few = n_kept < min_lines
        reason = np.select(
            [lorem, brace, few], [REASON_LOREM, REASON_BRACE, REASON_FEW], ""
        )

        out = batch
        for name, arr in (
            ("text_clean", pa.array(out_texts, type=pa.string())),
            ("n_kept", pa.array(n_kept)),
            ("n_dropped", pa.array(n_dropped)),
            ("kept", pa.array(reason == "")),
            ("drop_reason", pa.array(reason, type=pa.string())),
        ):
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, arr)
        return out

    return ds.map_batches(fn, batch_format="pyarrow")
