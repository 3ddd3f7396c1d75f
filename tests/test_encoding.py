"""encoding_profile cross-engine parity on NON-ASCII text (the driver
corpus is pure ASCII, so the multibyte path needs its own gate)."""

import duckdb
import pyarrow as pa
import pyarrow.compute as pc

TEXTS = [
    "plain ascii",
    "café naïve",            # 2-byte sequences
    "日本語 text",         # 3-byte CJK
    "emoji \U0001f600 four bytes",     # 4-byte astral
    "",
]


def test_nonascii_counts_match_duckdb():
    t = pa.array(TEXTS, type=pa.string())
    chars = pc.utf8_length(t).to_pylist()
    nbytes = pc.binary_length(t).to_pylist()
    nonascii = pc.count_substring_regex(
        t, pattern=r"[^\x00-\x7F]"
    ).to_pylist()
    con = duckdb.connect()
    want = con.execute(
        r"""
        SELECT length(s), strlen(s),
               len(regexp_extract_all(s, '[^\x00-\x7F]'))
        FROM (SELECT unnest(?::VARCHAR[]) AS s)
        """,
        [TEXTS],
    ).fetchall()
    for i, (c, b, n) in enumerate(want):
        assert chars[i] == c
        assert nbytes[i] == b
        assert nonascii[i] == n
    # the fixture actually exercises the multibyte path
    assert sum(nonascii) >= 6
    assert any(b > c for c, b, _ in want)
