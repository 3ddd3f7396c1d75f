"""URL canonicalization — the web-corpus primitive that collapses crawl
aliases (`HTTP://Example.COM:80/a/?b=2&a=1#x` == `http://example.com/a?a=1&b=2`)
before URL-level dedup.

Rules (each deterministic and mirrored verbatim by the DuckDB oracle in
pipelines/analysis_queries.py; parity pinned in tests/test_linededup_pii.py):

1. strip the fragment (``#...``),
2. lowercase scheme and authority,
3. drop the scheme's default port (``:80`` http, ``:443`` https),
4. strip trailing slashes from the path (empty path -> ``/``),
5. sort query parameters bytewise (codepoint order == DuckDB's binary
   collation ``list_sort``).

Rows that don't parse as ``scheme://authority...`` pass through
unchanged (opaque ids, relative paths).

Everything is vectorized pandas/RE2 except the per-row query-param
re-join, which runs only on rows that HAVE a query string (same bounded
per-row join as linededup's reassembly).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?]*)(?:\?(.*))?$"

#: scheme -> default port suffix removed from the authority
DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def canonicalize_urls(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Canonical form of each URL (see module rules); non-URLs unchanged."""
    s = (
        urls.to_pandas()
        if isinstance(urls, (pa.Array, pa.ChunkedArray))
        else pd.Series(urls)
    ).astype(object)
    orig = s.copy()
    s = s.str.replace(r"#.*$", "", regex=True)
    parts = s.str.extract(_URL_RE)
    parsed = parts[0].notna()

    scheme = parts[0].str.lower()
    auth = parts[1].str.lower()
    for sch, port in DEFAULT_PORTS.items():
        hit = parsed & (scheme == sch) & auth.str.endswith(port, na=False)
        auth = auth.mask(hit, auth.str[: -len(port)])
    path = parts[2].str.replace(r"/+$", "", regex=True)
    path = path.mask(parsed & (path == ""), "/")

    q = parts[3]
    has_q = parsed & q.notna()
    if has_q.any():
        sorted_q = q[has_q].map(lambda v: "&".join(sorted(v.split("&"))))
        q = q.copy()
        q[has_q] = sorted_q

    canon = scheme + "://" + auth + path
    canon = canon.mask(has_q, canon + "?" + q)
    out = canon.where(parsed, orig)
    return pa.array(out, type=pa.string())


#: host = authority up to the first ``:`` (port) — lowercased. Userinfo
#: (``user@host``) is not split out; crawl URLs don't carry it.
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)"


def extract_hosts(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Lowercased host of each URL; empty string for rows that don't
    parse as ``scheme://...`` (mirrored by the SQL
    ``lower(regexp_extract(u, _HOST_RE, 1))``, which also yields ''
    on no-match)."""
    s = (
        urls.to_pandas()
        if isinstance(urls, (pa.Array, pa.ChunkedArray))
        else pd.Series(urls)
    ).astype(object)
    host = s.str.extract(_HOST_RE, expand=False).str.lower().fillna("")
    return pa.array(host, type=pa.string())
