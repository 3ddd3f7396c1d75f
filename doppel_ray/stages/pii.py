"""PII detection + redaction over a text column — the pre-release
scrub every public training corpus runs (emails / IPs / phone numbers /
SSN-style ids → placeholder tokens, per-class hit counts for audit).
The reference (doppel) has no text-rewriting layer; this extends the
engine along the curation axis the north rule's web-page corpus needs.

Relationship to ``functions.analysis.PII_RULES`` (the earlier
email/phone/IP mask behind the ``pii_masked`` query): this module is
the full-featured successor — it adds the SSN-style ``<ID>`` class,
per-class audit counts in one call, and the ``*_sql()`` emitters that
derive the DuckDB oracle from the SAME constants. The analysis-suite
rules stay as-is because their patterns are shared verbatim with other
analysis oracles; new call sites should use this module.

Cross-engine contract
---------------------
Exactly the links.py pattern: every transform is a fixed chain of RE2
operations over module-level pattern constants, and
:func:`redacted_sql` / :func:`count_sql` emit the DuckDB expressions
from the SAME constants (pyarrow.compute and DuckDB both run RE2), so
an oracle matches hash-exactly. No Python ``re`` anywhere.

Redaction chain (fixed order; each one global RE2 pass):

1. emails   → ``<EMAIL>``
2. SSN-ish  → ``<ID>``     (3-2-4 digit groups; disjoint from phones)
3. phones   → ``<PHONE>``  (US 3-3-4 with ``-``/``.`` separators, or
   ``+``-prefixed international runs of 7-15 digits)
4. IPv4     → ``<IP>``

Counts are taken BEFORE any replacement (all four patterns are
pairwise non-overlapping on match starts except phone/ip digit runs,
which the chain order resolves identically on both engines because
counting precedes rewriting).

Scale shape
-----------
Pure vectorized ``map_batches`` — zero shuffle, corpus-width
independent; the patterns compile once inside Arrow's RE2 cache per
worker. At 100 TB this stage is embarrassingly parallel and its cost
is one RE2 scan per pattern per byte.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

#: (class, RE2 pattern, replacement token) — chain order is the contract
PII_PASSES: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    ("id", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<ID>"),
    (
        "phone",
        r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b|\+[0-9]{7,15}",
        "<PHONE>",
    ),
    ("ip", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
)


def _chunked(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def redact_text(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized redacted form of a text column (chain above)."""
    a = pc.cast(arr, pa.string())
    for _, pat, tok in PII_PASSES:
        a = pc.replace_substring_regex(a, pattern=pat, replacement=tok)
    return _chunked(a)


def pii_counts(arr: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Per-class match counts on the ORIGINAL text (int64 columns,
    keyed ``n_<class>``)."""
    a = pc.cast(arr, pa.string())
    return {
        f"n_{name}": _chunked(
            pc.cast(pc.count_substring_regex(a, pattern=pat), pa.int64())
        )
        for name, pat, _ in PII_PASSES
    }


def redacted_sql(col: str) -> str:
    """DuckDB expression computing :func:`redact_text` of ``col`` from
    the same constants. DuckDB '...' literals are escape-free; only
    quotes double."""
    e = col
    for _, pat, tok in PII_PASSES:
        p = pat.replace("'", "''")
        e = f"regexp_replace({e}, '{p}', '{tok}', 'g')"
    return e


def count_sql(col: str, name: str) -> str:
    """DuckDB expression for the ``n_<name>`` count column."""
    pat = {n: p for n, p, _ in PII_PASSES}[name].replace("'", "''")
    return f"len(regexp_extract_all({col}, '{pat}'))::BIGINT"


def redact_pii(
    ds: Dataset,
    *,
    text_col: str = "text",
    out_col: str = "text_redacted",
    with_counts: bool = True,
) -> Dataset:
    """Add ``out_col`` (redacted text) and, when ``with_counts``, the
    four ``n_<class>`` audit columns. One map_batches, zero shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        cols = {n: batch[n] for n in batch.column_names}
        if with_counts:
            cols.update(pii_counts(text))
        cols[out_col] = redact_text(text)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")
