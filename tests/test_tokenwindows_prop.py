"""Property-based coverage (hypothesis) for the span-removal hash path:
on arbitrary small corpora the 128-bit hash-pair grouping must agree
with the exact string-verify path, h1 must stay bit-identical to the
shared prefilter kernel, and the rewrite must obey the Lee-et-al
invariants (first occurrence survives; token counts balance)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from doppel_ray.stages.decontam import _flat_tokens, _ngram_hashes
from doppel_ray.stages.tokenwindows import (
    _ngram_hash_pairs,
    _per_bucket_pairs_hash128,
    _per_bucket_removal_pairs,
)

# small vocab => forced window collisions across docs; '  ' runs and
# empty docs exercise the tokenizer edge cases
_doc = st.lists(
    st.sampled_from(["a", "b", "c", "ab", "x1", ""]), min_size=0, max_size=24
).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=16)


def _occurrences(texts: list[str], w: int) -> pd.DataFrame:
    """Brute-force every within-doc w-token window occurrence."""
    rows = []
    for doc_id, t in enumerate(texts):
        toks = t.split()
        for i in range(len(toks) - w + 1):
            rows.append((doc_id, i, " ".join(toks[i : i + w])))
    return pd.DataFrame(rows, columns=["doc_id", "pos", "win"])


def _expected_pairs(texts: list[str], w: int) -> set[tuple[int, int]]:
    occ = _occurrences(texts, w)
    if occ.empty:
        return set()
    first = occ.sort_values(["doc_id", "pos"]).groupby("win").head(1)
    first_keys = set(map(tuple, first[["doc_id", "pos"]].values.tolist()))
    dup = occ.groupby("win")["win"].transform("size") > 1
    out = set()
    for d, p in occ.loc[dup, ["doc_id", "pos"]].values.tolist():
        if (d, p) not in first_keys:
            out.add((d, p))
    return out


@settings(max_examples=60, deadline=None)
@given(_corpus, st.sampled_from([2, 3, 5]))
def test_h1_matches_shared_prefilter_kernel(texts, w):
    flat, counts = _flat_tokens(pa.array(texts, type=pa.string()))
    s1, h1_ref, d1 = _ngram_hashes(flat, counts, w)
    s2, h1, h2, d2 = _ngram_hash_pairs(flat, counts, w)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(h1_ref, h1)
    # the second roll is genuinely different from the first
    if len(h1):
        assert not np.array_equal(h1, h2)


@settings(max_examples=60, deadline=None)
@given(_corpus, st.sampled_from([2, 3]))
def test_hash128_bucket_kernel_matches_brute_force(texts, w):
    """Feed ALL survivor occurrences (no prefilter) through the hash128
    per-bucket kernel as one bucket: the emitted (doc, pos) set must be
    exactly the brute-force non-first duplicated occurrences."""
    flat, counts = _flat_tokens(pa.array(texts, type=pa.string()))
    starts, h1, h2, doc_idx = _ngram_hash_pairs(flat, counts, w)
    doc_start = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=doc_start[1:])
    pos = starts - doc_start[doc_idx]
    t = pa.table(
        {
            "h1": pa.array(h1.view(np.int64), type=pa.int64()),
            "h2": pa.array(h2.view(np.int64), type=pa.int64()),
            "doc_id": pa.array(doc_idx, type=pa.int64()),
            "pos": pa.array(pos, type=pa.int64()),
        }
    )
    got = _per_bucket_pairs_hash128(t).to_pandas()
    got_set = set(map(tuple, got.values.tolist()))
    assert got_set == _expected_pairs(texts, w)


@settings(max_examples=60, deadline=None)
@given(_corpus, st.sampled_from([2, 3]))
def test_string_bucket_kernel_matches_brute_force(texts, w):
    """Same property for the exact string path's bucket kernel (the two
    kernels are therefore pinned equal to each other on arbitrary input,
    not just the fixed fixtures)."""
    occ = _occurrences(texts, w)
    t = pa.table(
        {
            "win_text": pa.array(occ["win"], type=pa.string()),
            "key": pa.array(
                [
                    f"{int(d):019d}:{int(p):07d}"
                    for d, p in occ[["doc_id", "pos"]].values.tolist()
                ],
                type=pa.string(),
            ),
        }
    )
    got = _per_bucket_removal_pairs(t).to_pandas()
    got_set = set(map(tuple, got.values.tolist()))
    assert got_set == _expected_pairs(texts, w)
