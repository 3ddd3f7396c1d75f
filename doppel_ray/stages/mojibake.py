"""Mojibake detection + repair (ftfy-lite): fix the most common
UTF-8-decoded-as-Latin-1 artifacts a web crawl carries ("cafÃ©",
"donâ€™t", "naÃ¯ve") and count them per class for the encoding audit
that decides whether a source needs a real transcoding pass.

Only the unambiguous double-encoding signatures are repaired — each
LHS below is the Latin-1 rendering of a UTF-8 byte sequence that has
essentially zero legitimate occurrence in real text (`Ã©` etc. appear
in natural text only AS mojibake). A full ftfy re-decodes heuristically
per string; this stage is the vectorized, deterministic 95% case.

Cross-engine contract (the stages/pii.py pattern): the repair is a
fixed chain of LITERAL replacements over the module constant, counts
are taken BEFORE rewriting, and :func:`fixed_sql` / :func:`count_sql`
emit DuckDB ``replace``/substring-count expressions from the SAME
constant — so an oracle matches hash-exactly. Literal (not regex)
matching on both engines sidesteps RE2-dialect concerns entirely.

Scale shape: pure vectorized ``map_batches`` (Arrow C kernels
``replace_substring`` / ``count_substring``) — zero shuffle,
corpus-width independent.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

#: (mojibake literal, repaired literal) — chain order is the contract;
#: longer sequences first so e.g. `â€™` wins before any `Â`-class rule
MOJIBAKE_FIXES: tuple[tuple[str, str], ...] = (
    ("â€™", "’"),   # â€™  -> right single quote
    ("â€œ", "“"),   # â€œ  -> left double quote
    # NOTE: no bare "â€" rule — it is a PREFIX of the sequences
    # above (and of â€¦ / â€\x9d), so a chain entry for it would
    # corrupt later rules; unhandled â€-class sequences stay as-is
    ("â€“", "–"),   # â€“  -> en dash
    ("Ã©", "é"),         # Ã©   -> é
    ("Ã¨", "è"),         # Ã¨   -> è
    ("Ã¼", "ü"),         # Ã¼   -> ü
    ("Ã¶", "ö"),         # Ã¶   -> ö
    ("Ã¤", "ä"),         # Ã¤   -> ä
    ("Ã±", "ñ"),         # Ã±   -> ñ
    ("Ã¯", "ï"),         # Ã¯   -> ï
    ("Â ", " "),              # Â<nbsp> -> space
)


def _chunked(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_null(arr.type):
        arr = arr.cast(pa.string())
    return pc.fill_null(arr, "")


def fix_text(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Apply the repair chain (fixed order, literal replaces)."""
    out = _chunked(arr)
    for bad, good in MOJIBAKE_FIXES:
        out = pc.replace_substring(out, pattern=bad, replacement=good)
    return out


def mojibake_count(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Total mojibake hits per row, counted BEFORE any rewriting
    (non-overlapping occurrences per literal, summed across the
    chain)."""
    a = _chunked(arr)
    total = None
    for bad, _ in MOJIBAKE_FIXES:
        c = pc.count_substring(a, pattern=bad)
        total = c if total is None else pc.add(total, c)
    return pc.cast(total, pa.int64())


def fixed_sql(col: str) -> str:
    """DuckDB expression applying the SAME repair chain."""
    expr = col
    for bad, good in MOJIBAKE_FIXES:
        b = bad.replace("'", "''")
        g = good.replace("'", "''")
        expr = f"replace({expr}, '{b}', '{g}')"
    return expr


def count_sql(col: str) -> str:
    """DuckDB expression counting the SAME non-overlapping hits before
    rewriting: (len(x) - len(replace(x, bad, ''))) / len(bad) per
    literal, in CODEPOINTS (length/replace are codepoint-wise in DuckDB,
    matching Arrow's count_substring occurrence count)."""
    terms = []
    for bad, _ in MOJIBAKE_FIXES:
        b = bad.replace("'", "''")
        terms.append(
            f"(length({col}) - length(replace({col}, '{b}', ''))) "
            f"// {len(bad)}"
        )
    return "(" + " + ".join(terms) + ")::BIGINT"


def fix_mojibake(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """``(id, text_fixed, n_mojibake)`` — repaired text plus the
    pre-repair hit count for the per-source encoding audit."""

    def fn(batch: pa.Table) -> pa.Table:
        arr = batch[text_col]
        return pa.table(
            {
                id_col: batch[id_col],
                "text_fixed": fix_text(arr).cast(pa.string()),
                "n_mojibake": mojibake_count(arr),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow"
    )
