"""Crawl-graph operators (stages/links.py): URL canonicalization rule
table + DuckDB parity via the module's own SQL emitters, SURT keys,
vectorized href extraction vs a regex brute force, host-edge assembly,
and layout invariance."""

from __future__ import annotations

import re

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from doppel_ray.stages import links as L

URLS = [
    "HTTP://SITE3.EXAMPLE/Page/9?utm_source=x&utm_b=2#frag",
    "http://site3.example:80/Page/9/",
    "https://Site3.example:443/Page/9?a=1&utm_c=3",
    "http://a.com/?utm_a=1&utm_b=2",
    "http://a.com/x?a=1&utm_b=2&c=3",
    "http://a.com/x?utm_a=1&b=2&utm_c=3",
    "not a url",
    "http://a.com//",
    "ftp://Other.Host:80/z",
    "",
    None,
    "https://www.sub2.site11.example/p/9?q=1",
]


class TestCanonicalize:
    def test_rule_table(self):
        got = L.canonicalize_urls(pa.array(URLS, pa.string())).to_pylist()
        assert got[0] == "http://site3.example/Page/9"  # case+utm+frag
        assert got[1] == "http://site3.example/Page/9"  # :80 + trailing /
        assert got[2] == "https://site3.example/Page/9?a=1"  # :443, keeps ?a=1
        assert got[3] == "http://a.com"  # all-utm query drops wholesale
        assert got[4] == "http://a.com/x?a=1&c=3"  # mid utm, seps repaired
        assert got[5] == "http://a.com/x?b=2"  # leading utm, ? repaired
        assert got[6] == "not a url"  # non-URL: identity
        assert got[7] == "http://a.com/"  # one trailing slash stripped
        assert got[8] == "ftp://other.host:80/z"  # :80 is http-only
        assert got[9] == ""
        assert got[10] is None

    def test_duckdb_parity(self):
        vals = [u for u in URLS if u is not None]
        got = L.canonicalize_urls(pa.array(vals, pa.string())).to_pylist()
        want = [
            r[0]
            for r in duckdb.execute(
                f"SELECT {L.canonical_sql('u')} FROM "
                "(SELECT unnest(?::VARCHAR[]) AS u)",
                [vals],
            ).fetchall()
        ]
        assert got == want

    def test_large_string_input(self):
        arr = pa.array(["HTTP://A.B/x/"], pa.large_string())
        assert L.canonicalize_urls(arr).to_pylist() == ["http://a.b/x"]


class TestSurtAndHost:
    def test_surt_values(self):
        got = L.surt_key(pa.array(URLS, pa.string())).to_pylist()
        assert got[-1] == "example,site11,sub2)/p/9?q=1"  # www. dropped
        assert got[6] is None  # non-URL
        assert got[0] is None  # uppercase scheme: host grammar is
        # canonical-cased — canonicalize first on raw crawl data

    def test_surt_and_host_duckdb_parity(self):
        vals = [u for u in URLS if u is not None]
        arr = pa.array(vals, pa.string())
        got_s = L.surt_key(arr).to_pylist()
        got_h = L.host_of(arr).to_pylist()
        rows = duckdb.execute(
            f"SELECT {L.surt_sql('u')}, {L.host_sql('u')} FROM "
            "(SELECT unnest(?::VARCHAR[]) AS u)",
            [vals],
        ).fetchall()
        assert got_s == [r[0] for r in rows]
        assert got_h == [r[1] for r in rows]


HTML = [
    '<a href="http://a.example/1">x</a> text <a href="http://b.example/2">y',
    "no links at all",
    None,
    '<p href="unterminated',
    '<a href="/relative/path">r</a><a href="HTTP://C.Example/3/">z</a>',
    '<img href="http://a.example/1">',  # dup target, any tag counts
]


def _pages(html: list[str | None]) -> rd.Dataset:
    t = pa.table(
        {
            "url": pa.array(
                [f"https://src{i}.example/p/{i}" for i in range(len(html))],
                pa.string(),
            ),
            "html": pa.array(
                [h.encode() if h is not None else None for h in html],
                pa.large_binary(),
            ),
        }
    )
    return rd.from_arrow(t).repartition(3)


class TestExtractLinks:
    def _brute(self, absolute_only=True):
        out = []
        for i, h in enumerate(HTML):
            for m in re.findall(r'href="([^"]*)"', h or ""):
                if absolute_only and not re.match(
                    r"^[a-zA-Z][a-zA-Z0-9+.-]*://", m
                ):
                    continue
                out.append((f"https://src{i}.example/p/{i}", m))
        return out

    def test_matches_regex_brute_force(self, ray_session):
        got = sorted(
            (r["src_url"], r["dst_url"])
            for r in L.extract_links(
                _pages(HTML), canonicalize=False
            ).take_all()
        )
        assert got == sorted(self._brute())

    def test_relative_links_kept_when_asked(self, ray_session):
        got = {
            r["dst_url"]
            for r in L.extract_links(
                _pages(HTML), absolute_only=False, canonicalize=False
            ).take_all()
        }
        assert "/relative/path" in got
        assert "unterminated" not in got  # no closing quote: not a match

    def test_canonicalized_edges(self, ray_session):
        got = {
            r["dst_url"] for r in L.extract_links(_pages(HTML)).take_all()
        }
        assert "http://c.example/3" in got  # lowered + trailing / stripped
        assert "HTTP://C.Example/3/" not in got

    def test_layout_invariant(self, ray_session):
        a = sorted(map(str, L.extract_links(_pages(HTML)).take_all()))
        b = sorted(
            map(
                str,
                L.extract_links(
                    _pages(HTML * 3).repartition(7)
                ).take_all(),
            )
        )
        assert len(b) == 3 * len(a)


class TestHostEdges:
    def test_counts(self, ray_session):
        edges = L.extract_links(_pages(HTML))
        got = {
            (r["src_host"], r["dst_host"]): r["n_links"]
            for r in L.host_edges(edges).take_all()
        }
        assert got[("src0.example", "a.example")] == 1
        assert got[("src0.example", "b.example")] == 1
        assert got[("src4.example", "c.example")] == 1
        assert got[("src5.example", "a.example")] == 1
        assert len(got) == 4


class TestAnchorTexts:
    def test_extraction(self, ray_session):
        got = {
            (r["dst_url"], r["anchor_text"])
            for r in L.extract_anchor_texts(_pages(HTML)).take_all()
        }
        # closed tag with text -> kept; unterminated tag (no '>') after
        # the second href of HTML[0] -> '>y' IS parseable text? no '<'
        # follows, so ANCHOR_TEXT_RE fails -> dropped
        assert ("http://a.example/1", "x") in got
        assert not any(u == "http://b.example/2" for u, _ in got)
        # img tag: '>' closes the tag but no text before next '<'... the
        # fragment is 'http://a.example/1">' with nothing after -> dropped
        # relative href dropped; canonicalized absolute kept with text
        assert ("http://c.example/3", "z") in got
        assert len(got) == 2

    def test_empty_text_kept_when_closed(self, ray_session):
        rows = L.extract_anchor_texts(
            _pages(['<a href="http://a.example/1"></a>tail'])
        ).take_all()
        assert len(rows) == 1
        assert rows[0]["anchor_text"] == ""

    def test_layout_invariant(self, ray_session):
        a = sorted(map(str, L.extract_anchor_texts(_pages(HTML)).take_all()))
        b = sorted(
            map(
                str,
                L.extract_anchor_texts(
                    _pages(HTML * 4).repartition(5)
                ).take_all(),
            )
        )
        assert len(b) == 4 * len(a)


class TestUrlFeatures:
    def test_feature_table(self):
        urls = pa.array(
            [
                "https://www.a.example/d/seg/p9?a=1&b=2",
                "https://a.example",
                "https://a.example/img.jpg?x=1",
                "http://a.co/p.PDF",  # case-sensitive ext: not media
                "not a url",
                None,
            ],
            pa.string(),
        )
        f = L.url_features(urls)
        assert f["depth"].to_pylist() == [3, 0, 1, 1, 0, None]
        assert f["n_params"].to_pylist() == [2, 0, 1, 0, 0, None]
        assert f["is_media"].to_pylist() == [
            False, False, True, False, False, False,
        ]
        assert f["tld"].to_pylist() == [
            "example", "example", "example", "co", None, None,
        ]

    def test_duckdb_parity(self):
        import duckdb

        urls = [
            "https://www.a.example/d/seg/p9?a=1&b=2",
            "https://a.example",
            "https://a.example/img.jpg?x=1",
            "http://a.co/deep/1/2/3/4.zip",
            "not a url",
        ]
        f = L.url_features(pa.array(urls, pa.string()))
        sql = L.url_features_sql("u")
        want = duckdb.execute(
            f"SELECT {sql['depth']}, {sql['n_params']}, {sql['is_media']},"
            f" {sql['n_chars']}, {sql['tld']} FROM "
            "(SELECT unnest(?::VARCHAR[]) AS u)",
            [urls],
        ).fetchall()
        for i, row in enumerate(want):
            assert f["depth"][i].as_py() == row[0]
            assert f["n_params"][i].as_py() == row[1]
            assert f["is_media"][i].as_py() == row[2]
            assert f["n_chars"][i].as_py() == row[3]
            assert f["tld"][i].as_py() == row[4]


class TestSitemapUrls:
    XML = [
        "<urlset><url><loc>https://a.example/1</loc>"
        "<lastmod>2026-02-03</lastmod></url>"
        "<url><loc>https://a.example/2</loc></url></urlset>",
        "<urlset><url><loc>HTTP://B.Example/x/#f</loc></url></urlset>",
        "no sitemap content",
        None,
        "<urlset><loc>unterminated",
        # lastmod belongs to the NEXT element, not this loc
        "<url><loc>https://c.example/3</loc></url>"
        "<url><loc>https://c.example/4</loc>"
        "<lastmod>2026-05-06</lastmod></url>",
    ]

    def _ds(self):
        return rd.from_items([{"xml": x} for x in self.XML])

    def test_extraction(self, ray_session):
        got = {
            (r["url"], r["lastmod"])
            for r in L.extract_sitemap_urls(self._ds()).take_all()
        }
        assert got == {
            ("https://a.example/1", "2026-02-03"),
            ("https://a.example/2", None),
            ("http://b.example/x", None),  # canonicalized, frag gone
            ("https://c.example/3", None),  # next element's lastmod NOT taken
            ("https://c.example/4", "2026-05-06"),
        }

    def test_layout_invariant(self, ray_session):
        base = sorted(
            map(str, L.extract_sitemap_urls(self._ds()).take_all())
        )
        many = rd.from_items([{"xml": x} for x in self.XML * 5]).repartition(7)
        got = sorted(map(str, L.extract_sitemap_urls(many).take_all()))
        assert len(got) == 5 * len(base)
