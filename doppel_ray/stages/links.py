"""Crawl-graph operators: href extraction from HTML, URL
canonicalization, SURT keys, and host-level link-graph assembly — the
web-curation stages that turn a raw page corpus into the link structure
a crawler/ranker consumes (frontier selection, per-host authority
priors for `stages/graph.pagerank`). The reference (doppel) is a file
deduplicator with no URL layer; this family extends the engine along
the north rule's Common-Crawl page shape (``url``, ``html`` columns).

Cross-engine contract
---------------------
Every string transform here is a fixed chain of RE2 operations
(``pyarrow.compute`` kernels and DuckDB's regexp functions share the
RE2 engine), so a DuckDB oracle applying the *same* pattern chain —
emitted by :func:`canonical_sql` / :func:`surt_sql` / :func:`host_sql`
from the same module-level pattern constants — matches hash-exactly.
No Python ``re`` anywhere: one regex dialect on both sides.

Canonicalization rules (fixed order; each a global RE2 pass):

1. strip the fragment (``#...``),
2. lowercase the scheme+authority (path/query case is preserved),
3. drop default ports (``http://…:80``, ``https://…:443``),
4. drop ``utm_*`` tracking params (three passes that together remove
   any number of them while keeping the remaining query intact),
5. strip one trailing ``/``.

Strings that don't look like absolute URLs pass through unchanged
(rule 2's authority match fails ⇒ identity), so the kernel is safe on
dirty crawl data.

Scale shape
-----------
All per-row work is Arrow-kernel vectorized ``map_batches`` (zero
shuffle). ``extract_links`` explodes pages to (src, dst) edge rows via
``split_pattern`` + offset arithmetic — no per-row Python loop; an
unterminated ``href="`` is dropped exactly as RE2's
``href="([^"]*)"`` would drop it. ``host_edges`` pre-aggregates
(src_host, dst_host) counts inside each batch before ONE narrow
two-key groupby — the shuffle carries distinct host pairs (bounded by
hosts², not by links).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

#: scheme+authority of an absolute URL (RFC 3986 scheme grammar)
AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
#: host capture of a (lowercased) absolute URL — no port/userinfo chars
HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/:?#]+)"

#: the canonicalization chain: (pattern, replacement) global RE2 passes
#: applied AFTER the fragment strip + authority lowercasing
_CANON_PASSES: tuple[tuple[str, str], ...] = (
    (r"^(http://[^/:?#]*):80([/?#][\s\S]*)?$", r"\1\2"),
    (r"^(https://[^/:?#]*):443([/?#][\s\S]*)?$", r"\1\2"),
    (r"&utm_[a-zA-Z0-9_]*=[^&#]*", ""),
    (r"\?utm_[a-zA-Z0-9_]*=[^&#]*&", "?"),
    (r"\?utm_[a-zA-Z0-9_]*=[^&#]*$", ""),
    (r"/$", ""),
)
_FRAGMENT_RE = r"#[\s\S]*$"


def _chunked(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def canonicalize_urls(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized canonical form of a URL column (rules above)."""
    arr = pc.cast(arr, pa.string())  # join kernels reject mixed widths
    a = pc.replace_substring_regex(
        arr, pattern=_FRAGMENT_RE, replacement=""
    )
    m = pc.extract_regex(a, pattern=f"(?P<auth>{AUTH_RE})")
    auth = pc.struct_field(m, "auth")
    rest = pc.replace_substring_regex(a, pattern=AUTH_RE, replacement="")
    lowered = pc.binary_join_element_wise(pc.utf8_lower(auth), rest, "")
    a = pc.if_else(pc.is_valid(auth), lowered, a)
    for pat, rep in _CANON_PASSES:
        a = pc.replace_substring_regex(a, pattern=pat, replacement=rep)
    return _chunked(a)


def canonical_sql(col: str) -> str:
    """DuckDB expression computing :func:`canonicalize_urls` of ``col``
    — built from the SAME pattern constants, so the two sides cannot
    drift. DuckDB '...' literals are escape-free (no backslash
    processing), so patterns embed verbatim; only quotes double."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    e = f"regexp_replace({col}, '{q(_FRAGMENT_RE)}', '', 'g')"
    e = (
        f"CASE WHEN regexp_matches({e}, '{q(AUTH_RE)}') THEN "
        f"lower(regexp_extract({e}, '{q(AUTH_RE)}')) || "
        f"regexp_replace({e}, '{q(AUTH_RE)}', '') ELSE {e} END"
    )
    for pat, rep in _CANON_PASSES:
        e = f"regexp_replace({e}, '{q(pat)}', '{q(rep)}', 'g')"
    return e


def host_of(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Host of each (canonical-cased) absolute URL; null when the
    string isn't an absolute URL."""
    arr = pc.cast(arr, pa.string())  # int32-offset lists downstream
    m = pc.extract_regex(
        arr, pattern=HOST_RE.replace("(", "(?P<h>", 1)
    )
    return _chunked(pc.struct_field(m, "h"))


def host_sql(col: str) -> str:
    pat = HOST_RE.replace("'", "''")
    return (
        f"CASE WHEN regexp_matches({col}, '{pat}') THEN "
        f"regexp_extract({col}, '{pat}', 1) ELSE NULL END"
    )


def surt_key(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """SURT-style sort key: reversed host labels (``www.`` dropped)
    joined with ``,`` then ``)`` then the path+query — the
    web-archive-standard key that clusters a domain's subtree under one
    prefix (so a range partition on it co-locates a site). Null when
    the input isn't an absolute URL.

    Label reversal is pure offset arithmetic over ONE flat split array
    (no per-row Python), then an element-wise ``binary_join``.
    """
    arr = pc.cast(arr, pa.string())
    host = host_of(arr)
    h = pc.replace_substring_regex(host, pattern=r"^www\.", replacement="")
    parts = _chunked(pc.split_pattern(h, "."))
    offs = parts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    base = offs[:-1] - offs[0]
    counts = np.diff(offs)
    tot = int(offs[-1] - offs[0])
    idx_in = np.arange(tot, dtype=np.int64) - np.repeat(base, counts)
    perm = np.repeat(base, counts) + np.repeat(counts - 1, counts) - idx_in
    rev_flat = pc.take(parts.values, pa.array(perm + offs[0], type=pa.int64()))
    rev = pa.ListArray.from_arrays(
        pa.array(offs - offs[0], type=pa.int32()),
        rev_flat,
        mask=pa.array(np.asarray(parts.is_null())),
    )
    joined = pc.binary_join(rev, ",")
    path = pc.replace_substring_regex(
        arr, pattern=r"^[a-z][a-z0-9+.-]*://[^/?#]*", replacement=""
    )
    out = pc.binary_join_element_wise(joined, ")", path, "")
    return _chunked(pc.if_else(pc.is_valid(host), out, pa.nulls(len(host), pa.string())))


def surt_sql(col: str) -> str:
    pat = HOST_RE.replace("'", "''")
    return (
        f"CASE WHEN regexp_matches({col}, '{pat}') THEN "
        f"array_to_string(list_reverse(string_split(regexp_replace("
        f"regexp_extract({col}, '{pat}', 1), '^www\\.', ''), '.')), ',')"
        f" || ')' || regexp_replace({col}, "
        f"'^[a-z][a-z0-9+.-]*://[^/?#]*', '') ELSE NULL END"
    )


def _extract_hrefs(html: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """All complete ``href="…"`` values in each string + the row index
    of each hit — semantics identical to RE2
    ``regexp_extract_all(s, 'href="([^"]*)"', 1)``."""
    frags = _chunked(pc.split_pattern(html, 'href="'))
    offs = frags.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offs)
    rows = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    pos = np.arange(int(offs[-1] - offs[0]), dtype=np.int64) - np.repeat(
        offs[:-1] - offs[0], counts
    )
    keep = pos > 0  # fragment 0 precedes the first href=" marker
    cand = pc.take(
        frags.values, pa.array(np.nonzero(keep)[0] + offs[0], type=pa.int64())
    )
    rows = rows[keep]
    # an unterminated href (no closing quote) is not a match
    closed = pc.match_substring(cand, '"').to_numpy(zero_copy_only=False)
    closed = np.asarray(closed, dtype=bool)
    href = pc.replace_substring_regex(
        cand.filter(pa.array(closed)), pattern=r'(?s)".*$', replacement=""
    )
    return _chunked(href), rows[closed]


def extract_links(
    ds: Dataset,
    *,
    html_col: str = "html",
    url_col: str = "url",
    absolute_only: bool = True,
    canonicalize: bool = True,
) -> Dataset:
    """Page corpus → (src_url, dst_url) edge relation.

    One vectorized ``map_batches`` row expansion (no shuffle); binary
    html is decoded as UTF-8. ``absolute_only`` drops relative hrefs
    (scheme-relative and path-relative) — resolving those needs the
    base URL per row and is a per-row operation by nature; a crawler
    resolves at fetch time, a corpus-graph build keeps absolute edges.
    ``canonicalize`` applies :func:`canonicalize_urls` to both sides.
    """

    def fn(batch: pa.Table) -> pa.Table:
        html = batch[html_col]
        if pa.types.is_binary(html.type) or pa.types.is_large_binary(html.type):
            html = pc.cast(html, pa.large_string())
        html = pc.fill_null(_chunked(html), "")
        href, rows = _extract_hrefs(html)
        src = pc.take(
            _chunked(batch[url_col]), pa.array(rows, type=pa.int64())
        )
        if absolute_only:
            keep = pc.match_substring_regex(href, AUTH_RE)
            keep = pc.fill_null(keep, False)
            href = href.filter(keep)
            src = src.filter(keep)
        if canonicalize:
            src = canonicalize_urls(src)
            href = canonicalize_urls(href)
        return pa.table({"src_url": src, "dst_url": pc.cast(href, pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


#: URL-feature RE2 patterns (shared with :func:`url_features_sql`)
PATH_SEG_RE = r"/[^/?#]"  #: one path segment start (depth = match count)
QPARAM_RE = r"[?&][^=&#]+="  #: one query parameter
MEDIA_EXT_RE = r"\.(?:jpg|jpeg|png|gif|webp|mp4|webm|mp3|pdf|zip)([?#]|$)"
TLD_RE = r"^[a-z][a-z0-9+.-]*://[^/:?#]*\.([a-z]{2,})(?:[/:?#]|$)"


def url_features(arr: pa.Array | pa.ChunkedArray) -> dict[str, pa.Array]:
    """Frontier-policy URL features, all vectorized RE2 on the
    canonical-cased URL: path ``depth``, query-parameter count
    ``n_params``, ``is_media`` extension flag, url ``n_chars``, and the
    ``tld``. The signals crawl schedulers and quality filters cut on
    (deep calendar-trap paths, parameter explosions, media payloads)."""
    a = pc.cast(arr, pa.string())
    rest = pc.replace_substring_regex(a, pattern=AUTH_RE, replacement="")
    path = pc.replace_substring_regex(
        rest, pattern=r"[?#][\s\S]*$", replacement=""
    )
    tld = pc.struct_field(
        pc.extract_regex(a, pattern=TLD_RE.replace("([a-z]", "(?P<t>[a-z]", 1)),
        "t",
    )
    return {
        "depth": _chunked(
            pc.cast(pc.count_substring_regex(path, pattern=PATH_SEG_RE), pa.int64())
        ),
        "n_params": _chunked(
            pc.cast(pc.count_substring_regex(a, pattern=QPARAM_RE), pa.int64())
        ),
        "is_media": _chunked(
            pc.fill_null(pc.match_substring_regex(a, MEDIA_EXT_RE), False)
        ),
        "n_chars": _chunked(pc.cast(pc.utf8_length(a), pa.int64())),
        "tld": _chunked(tld),
    }


def url_features_sql(col: str) -> dict[str, str]:
    """DuckDB expressions for :func:`url_features` from the same
    constants."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    path = (
        f"regexp_replace(regexp_replace({col}, '{q(AUTH_RE)}', ''),"
        f" '[?#][\\s\\S]*$', '')"
    )
    return {
        "depth": f"len(regexp_extract_all({path}, '{q(PATH_SEG_RE)}'))::BIGINT",
        "n_params": f"len(regexp_extract_all({col}, '{q(QPARAM_RE)}'))::BIGINT",
        "is_media": f"regexp_matches({col}, '{q(MEDIA_EXT_RE)}')",
        "n_chars": f"length({col})::BIGINT",
        "tld": (
            f"CASE WHEN regexp_matches({col}, '{q(TLD_RE)}') THEN "
            f"regexp_extract({col}, '{q(TLD_RE)}', 1) ELSE NULL END"
        ),
    }


#: page-metadata RE2 patterns (named groups; shared with the oracle
#: emitters in pipelines/link_queries.py by construction in fixtures)
TITLE_RE = r"(?s)<title>(?P<v>[^<]*)</title>"
H1_RE = r"(?s)<h1>(?P<v>[^<]*)</h1>"
META_DESC_RE = r'<meta name="description" content="(?P<v>[^"]*)"'


def extract_page_metadata(
    ds: Dataset,
    *,
    html_col: str = "html",
    url_col: str = "url",
) -> Dataset:
    """HTML -> (url, title, h1, description): the metadata sidecar a
    crawl index stores next to extracted text (titles feed retrieval
    and dedup tie-breaks, descriptions feed snippets). First occurrence
    of each tag wins (RE2 leftmost match); missing tags are null. Three
    vectorized extract_regex passes, zero shuffles."""

    def fn(batch: pa.Table) -> pa.Table:
        html = pc.cast(_chunked(batch[html_col]), pa.large_string())
        html = pc.fill_null(html, "")

        def grab(pat: str) -> pa.Array:
            return _chunked(
                pc.cast(
                    pc.struct_field(pc.extract_regex(html, pattern=pat), "v"),
                    pa.string(),
                )
            )

        return pa.table(
            {
                "url": pc.cast(batch[url_col], pa.string()),
                "title": grab(TITLE_RE),
                "h1": grab(H1_RE),
                "description": grab(META_DESC_RE),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def extract_sitemap_urls(
    ds: Dataset,
    *,
    xml_col: str = "xml",
    canonicalize: bool = True,
) -> Dataset:
    """Sitemap (sitemaps.org urlset XML) -> one ``loc`` URL per row,
    with the optional sibling ``<lastmod>`` date string when present in
    the same ``<url>`` element. The seed-discovery companion to
    :func:`extract_links`: crawlers bootstrap frontiers from sitemaps
    before any page is fetched.

    Same zero-shuffle row-expansion shape as href extraction: split on
    the ``<loc>`` open tag, one RE2 pass recovers the loc value and the
    lastmod that follows before the element closes (missing lastmod ->
    null). An unterminated ``<loc>`` is dropped exactly as RE2 would
    drop it.
    """

    def fn(batch: pa.Table) -> pa.Table:
        # unconditional cast: handles binary payloads AND the null-typed
        # column an all-None block materializes as
        xml = pc.cast(_chunked(batch[xml_col]), pa.large_string())
        xml = pc.fill_null(xml, "")
        frags = _chunked(pc.split_pattern(xml, "<loc>"))
        offs = frags.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        pos = np.arange(int(offs[-1] - offs[0]), dtype=np.int64) - np.repeat(
            offs[:-1] - offs[0], counts
        )
        keep = pos > 0
        cand = pc.take(
            frags.values,
            pa.array(np.nonzero(keep)[0] + offs[0], type=pa.int64()),
        )
        url = pc.struct_field(
            pc.extract_regex(cand, pattern=r"^(?P<u>[^<]*)</loc>"), "u"
        )
        # lastmod scope = this <url> element: truncate the fragment at
        # its closing tag, then extract (RE2 has no lookahead)
        head = pc.replace_substring_regex(
            cand, pattern=r"(?s)</url>[\s\S]*$", replacement=""
        )
        lastmod = pc.struct_field(
            pc.extract_regex(
                head, pattern=r"(?s)<lastmod>(?P<m>[^<]*)</lastmod>"
            ),
            "m",
        )
        ok = pc.is_valid(url)
        url, lastmod = url.filter(ok), lastmod.filter(ok)
        if canonicalize:
            url = canonicalize_urls(url)
        return pa.table(
            {
                "url": pc.cast(url, pa.string()),
                "lastmod": pc.cast(lastmod, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


#: anchor text of an ``href="…"`` fragment: skip the rest of the tag's
#: attributes, take the text up to the next tag. RE2 on the SAME
#: fragments `_extract_hrefs` scans, so hrefs and texts stay aligned.
ANCHOR_TEXT_RE = r'^[^"]*"[^>]*>([^<]*)<'


def extract_anchor_texts(
    ds: Dataset,
    *,
    html_col: str = "html",
    url_col: str = "url",
    canonicalize: bool = True,
) -> Dataset:
    """Page corpus → (src_url, dst_url, anchor_text) rows for absolute
    links whose tag closes with visible text (``<a href="u">t</a>``) —
    the anchor-text relation rankers aggregate per target. Same
    zero-shuffle row-expansion shape as :func:`extract_links`; an href
    with no parseable anchor text (self-closing, nested tag first) is
    dropped, exactly as RE2 leaves ``ANCHOR_TEXT_RE`` unmatched."""

    def fn(batch: pa.Table) -> pa.Table:
        html = batch[html_col]
        if pa.types.is_binary(html.type) or pa.types.is_large_binary(html.type):
            html = pc.cast(html, pa.large_string())
        html = pc.fill_null(_chunked(html), "")
        frags = _chunked(pc.split_pattern(html, 'href="'))
        offs = frags.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        rows = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        pos = np.arange(int(offs[-1] - offs[0]), dtype=np.int64) - np.repeat(
            offs[:-1] - offs[0], counts
        )
        keep = pos > 0
        cand = pc.take(
            frags.values,
            pa.array(np.nonzero(keep)[0] + offs[0], type=pa.int64()),
        )
        rows = rows[keep]
        href = pc.struct_field(
            pc.extract_regex(cand, pattern=r'^(?P<h>[^"]*)"'), "h"
        )
        text = pc.struct_field(
            pc.extract_regex(
                cand, pattern=ANCHOR_TEXT_RE.replace("(", "(?P<t>", 1)
            ),
            "t",
        )
        ok_np = np.asarray(
            pc.and_(pc.is_valid(href), pc.is_valid(text)).to_numpy(
                zero_copy_only=False
            ),
            dtype=bool,
        )
        ok = pa.array(ok_np)
        href, text, rows = href.filter(ok), text.filter(ok), rows[ok_np]
        src = pc.take(
            _chunked(pc.cast(batch[url_col], pa.string())),
            pa.array(rows, type=pa.int64()),
        )
        abs_keep = pc.fill_null(
            pc.match_substring_regex(href, AUTH_RE), False
        )
        href, text, src = (
            href.filter(abs_keep),
            text.filter(abs_keep),
            src.filter(abs_keep),
        )
        if canonicalize:
            src = canonicalize_urls(src)
            href = canonicalize_urls(href)
        return pa.table(
            {
                "src_url": pc.cast(src, pa.string()),
                "dst_url": pc.cast(href, pa.string()),
                "anchor_text": pc.cast(text, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def host_edges(links: Dataset) -> Dataset:
    """(src_url, dst_url) edges → (src_host, dst_host, n_links) host
    graph. Per-batch pre-aggregation makes the ONE two-key shuffle
    carry distinct host pairs, not raw links; rows where either side
    has no parseable host are dropped."""

    def partial(batch: pa.Table) -> pa.Table:
        sh = host_of(batch["src_url"])
        dh = host_of(batch["dst_url"])
        t = pa.table({"src_host": sh, "dst_host": dh}).drop_null()
        g = (
            t.to_pandas()
            .groupby(["src_host", "dst_host"], sort=False, as_index=False)
            .size()
        )
        return pa.table(
            {
                "src_host": pa.array(g["src_host"], type=pa.string()),
                "dst_host": pa.array(g["dst_host"], type=pa.string()),
                "n_links": pa.array(
                    g["size"].to_numpy().astype(np.int64), type=pa.int64()
                ),
            }
        )

    return (
        links.map_batches(partial, batch_format="pyarrow")
        .groupby(["src_host", "dst_host"])
        .aggregate(Sum("n_links", alias_name="n_links"))
    )
