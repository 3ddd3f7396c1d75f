"""Line-level boilerplate dedup (stages/linededup.py) and PII masking
(functions/analysis.py PII_RULES) — semantics, scale-guard, and DuckDB
parity for the shared RE2 patterns."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from doppel_ray.functions import analysis as A
from doppel_ray.stages import linededup


def _docs(texts: list[str]) -> rd.Dataset:
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }
    )
    return rd.from_arrow(t).repartition(3)


class TestLineDedup:
    def test_repeated_lines_removed_unique_kept(self, ray_session):
        texts = [
            "HEADER\nbody one\nFOOTER",
            "HEADER\nbody two\nFOOTER",
            "HEADER\nbody three\nFOOTER\nextra",
        ]
        out = {
            r["doc_id"]: r
            for r in linededup.remove_boilerplate_lines(
                _docs(texts), min_docs=2
            ).take_all()
        }
        assert out[0]["text_clean"] == "body one"
        assert out[1]["text_clean"] == "body two"
        assert out[2]["text_clean"] == "body three\nextra"
        assert all(r["n_removed"] == 2 for r in out.values())

    def test_empty_lines_never_counted_or_removed(self, ray_session):
        texts = ["a\n\nb", "c\n\nd", "e\n\nf"]
        out = {
            r["doc_id"]: r
            for r in linededup.remove_boilerplate_lines(
                _docs(texts), min_docs=2
            ).take_all()
        }
        # "" appears in all 3 docs but must survive (it's structure)
        assert out[0]["text_clean"] == "a\n\nb"
        assert all(r["n_removed"] == 0 for r in out.values())

    def test_repeat_within_one_doc_not_frequent(self, ray_session):
        # df counts DISTINCT docs: a line repeated inside one doc only
        # is not boilerplate
        texts = ["same\nsame\nsame", "other\nlines\nhere"]
        out = {
            r["doc_id"]: r
            for r in linededup.remove_boilerplate_lines(
                _docs(texts), min_docs=2
            ).take_all()
        }
        assert out[0]["text_clean"] == "same\nsame\nsame"
        assert out[0]["n_removed"] == 0

    def test_all_lines_removed_yields_empty_text(self, ray_session):
        texts = ["only", "only"]
        out = {
            r["doc_id"]: r
            for r in linededup.remove_boilerplate_lines(
                _docs(texts), min_docs=2
            ).take_all()
        }
        assert out[0]["text_clean"] == "" and out[0]["n_removed"] == 1

    def test_frequent_limit_guard(self, ray_session):
        texts = ["dup\nx", "dup\ny"]
        with pytest.raises(RuntimeError, match="frequent_limit"):
            linededup.remove_boilerplate_lines(
                _docs(texts), min_docs=2, frequent_limit=0
            ).take_all()

    def test_matches_duckdb_on_random_corpus(self, ray_session):
        """Full parity on a corpus with mixed-frequency lines."""
        import duckdb

        rng = np.random.default_rng(23)
        pool = [f"line {i}" for i in range(12)]
        texts = [
            "\n".join(rng.choice(pool, size=rng.integers(2, 6)))
            for _ in range(40)
        ]
        got = sorted(
            (r["doc_id"], r["text_clean"], r["n_removed"])
            for r in linededup.remove_boilerplate_lines(
                _docs(texts), min_docs=3
            ).take_all()
        )
        con = duckdb.connect()
        con.register(
            "documents",
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts),
                }
            ),
        )
        want = con.execute(
            """
            WITH ls AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
            lines AS (
              SELECT doc_id, i AS pos, ls[i] AS line
              FROM ls, UNNEST(generate_series(1, len(ls))) AS u(i)
            ),
            freq AS (
              SELECT line FROM lines WHERE line <> ''
              GROUP BY line HAVING count(DISTINCT doc_id) >= 3
            ),
            marked AS (
              SELECT l.doc_id, l.pos, l.line, f.line IS NOT NULL AS is_freq
              FROM lines l LEFT JOIN freq f ON l.line = f.line
            )
            SELECT doc_id,
                   coalesce(string_agg(CASE WHEN NOT is_freq THEN line END,
                            chr(10) ORDER BY pos), '') AS text_clean,
                   sum(CASE WHEN is_freq THEN 1 ELSE 0 END)::BIGINT AS n_removed
            FROM marked GROUP BY doc_id ORDER BY doc_id
            """
        ).fetchall()
        assert got == [tuple(r) for r in want]


class TestLineDedupKeepFirst:
    def test_first_occurrence_kept_rest_removed(self, ray_session):
        # "SHARED" appears in docs 0,1,2 — only doc 0 (min doc_id) keeps
        # it; "twice" repeats INSIDE doc 1 — first copy (lowest pos) kept
        texts = [
            "SHARED\nalpha",
            "twice\ntwice\nSHARED",
            "SHARED\nbeta\ntwice",
        ]
        out = {
            r["doc_id"]: r
            for r in linededup.dedup_lines_keep_first(_docs(texts)).take_all()
        }
        assert out[0]["text_clean"] == "SHARED\nalpha"
        assert out[0]["n_removed"] == 0
        assert out[1]["text_clean"] == "twice"
        assert out[1]["n_removed"] == 2
        assert out[2]["text_clean"] == "beta"
        assert out[2]["n_removed"] == 2

    def test_empty_lines_are_structure(self, ray_session):
        texts = ["a\n\nb", "c\n\nd"]
        out = {
            r["doc_id"]: r
            for r in linededup.dedup_lines_keep_first(_docs(texts)).take_all()
        }
        assert out[0]["text_clean"] == "a\n\nb"
        assert out[1]["text_clean"] == "c\n\nd"
        assert all(r["n_removed"] == 0 for r in out.values())

    def test_unique_lines_untouched(self, ray_session):
        texts = ["one\ntwo", "three\nfour"]
        out = {
            r["doc_id"]: r
            for r in linededup.dedup_lines_keep_first(_docs(texts)).take_all()
        }
        assert out[0]["text_clean"] == "one\ntwo"
        assert out[1]["text_clean"] == "three\nfour"

    def test_frequent_limit_guard(self, ray_session):
        texts = ["dup\nx", "dup\ny"]
        with pytest.raises(RuntimeError, match="frequent_limit"):
            linededup.dedup_lines_keep_first(
                _docs(texts), frequent_limit=0
            ).take_all()

    def test_doc_id_bound_guard(self, ray_session):
        t = pa.table(
            {
                "doc_id": pa.array([1 << 43], pa.int64()),
                "text": pa.array(["a"]),
            }
        )
        # the ValueError surfaces wrapped in Ray's task-error hierarchy
        with pytest.raises(Exception, match="ord-key"):
            linededup.dedup_lines_keep_first(rd.from_arrow(t)).take_all()

    def test_matches_duckdb_on_random_corpus(self, ray_session):
        """Keep-first parity vs a window-function oracle on a corpus with
        heavy inter- and intra-doc line repetition."""
        import duckdb

        rng = np.random.default_rng(31)
        pool = [f"line {i}" for i in range(10)] + [""]
        texts = [
            "\n".join(rng.choice(pool, size=rng.integers(2, 7)))
            for _ in range(50)
        ]
        got = sorted(
            (r["doc_id"], r["text_clean"], r["n_removed"])
            for r in linededup.dedup_lines_keep_first(_docs(texts)).take_all()
        )
        con = duckdb.connect()
        con.register(
            "documents",
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts),
                }
            ),
        )
        want = con.execute(
            """
            WITH ls AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
            lines AS (
              SELECT doc_id, i AS pos, ls[i] AS line
              FROM ls, UNNEST(generate_series(1, len(ls))) AS u(i)
            ),
            marked AS (
              SELECT doc_id, pos, line,
                     count(*) OVER (PARTITION BY line) AS cnt,
                     row_number() OVER (
                       PARTITION BY line ORDER BY doc_id, pos
                     ) AS rn
              FROM lines
            )
            SELECT doc_id,
                   coalesce(string_agg(
                     CASE WHEN line = '' OR cnt = 1 OR rn = 1 THEN line END,
                     chr(10) ORDER BY pos), '') AS text_clean,
                   sum(CASE WHEN line <> '' AND cnt > 1 AND rn > 1
                            THEN 1 ELSE 0 END)::BIGINT AS n_removed
            FROM marked GROUP BY doc_id ORDER BY doc_id
            """
        ).fetchall()
        assert got == [tuple(r) for r in want]


class TestSpanDedup:
    def test_duplicated_span_found_with_first_occurrence(self, ray_session):
        texts = [
            "a\nb\nc\nunique one",
            "x\na\nb\nc\ny",
            "only\ntwo",  # shorter than the span: no windows
        ]
        rows = linededup.dup_span_groups(_docs(texts)).take_all()
        assert len(rows) == 1
        r = rows[0]
        assert r["span"] == "a\nb\nc"
        assert r["cnt"] == 2
        assert (r["first_doc"], r["first_pos"]) == (0, 0)

    def test_windows_never_cross_documents(self, ray_session):
        # "b\nc\nd" exists only across the doc boundary: must not match
        texts = ["a\nb\nc", "d\ne\nf", "b\nc\nd"]
        assert linededup.dup_span_groups(_docs(texts)).take_all() == []

    def test_repeat_within_one_doc_counts(self, ray_session):
        texts = ["p\nq\nr\np\nq\nr"]  # windows 0 and 3 are identical
        rows = linededup.dup_span_groups(_docs(texts)).take_all()
        spans = {r["span"]: r for r in rows}
        assert spans["p\nq\nr"]["cnt"] == 2
        assert spans["p\nq\nr"]["first_pos"] == 0

    def test_validation_and_null(self, ray_session):
        with pytest.raises(ValueError, match="span_lines"):
            linededup.dup_span_groups(_docs(["x"]), span_lines=0)
        assert linededup.dup_span_groups(_docs([None, None])).take_all() == []

    def test_matches_duckdb_on_random_corpus(self, ray_session):
        import duckdb

        rng = np.random.default_rng(31)
        pool = [f"l{i}" for i in range(6)]
        texts = [
            "\n".join(rng.choice(pool, size=rng.integers(1, 9)))
            for _ in range(30)
        ]
        got = sorted(
            (r["span"], r["cnt"], r["first_doc"], r["first_pos"])
            for r in linededup.dup_span_groups(_docs(texts)).take_all()
        )
        con = duckdb.connect()
        con.register(
            "documents",
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts),
                }
            ),
        )
        want = con.execute(
            """
            WITH ls AS (SELECT doc_id, string_split(text, chr(10)) AS ls
                        FROM documents),
            spans AS (
              SELECT doc_id, i - 1 AS pos,
                     array_to_string(ls[i:i+2], chr(10)) AS span
              FROM ls, UNNEST(generate_series(1, len(ls) - 2)) AS u(i)
            ),
            g AS (
              SELECT span, count(*)::BIGINT AS cnt,
                     min(lpad(CAST(doc_id AS VARCHAR), 12, '0') || ':' ||
                         lpad(CAST(pos AS VARCHAR), 7, '0')) AS fk
              FROM spans GROUP BY span HAVING count(*) > 1
            )
            SELECT span, cnt,
                   CAST(split_part(fk, ':', 1) AS BIGINT),
                   CAST(split_part(fk, ':', 2) AS BIGINT)
            FROM g ORDER BY span
            """
        ).fetchall()
        assert got == [tuple(r) for r in want]


class TestPIIMasking:
    def test_mask_and_counts(self, ray_session):
        texts = pa.array(
            [
                "mail a.b+c@foo-bar.example.org now",
                "call 415-555-0042 or 212-555-1234",
                "host 10.0.0.1 and 192.168.255.3",
                "clean text with no pii at all",
                "combo bob@x.io via 10.1.2.3 tel 650-555-9999",
            ]
        )
        masked = A.mask_pii(texts).to_pylist()
        assert masked[0] == "mail <EMAIL> now"
        assert masked[1] == "call <PHONE> or <PHONE>"
        assert masked[2] == "host <IP> and <IP>"
        assert masked[3] == "clean text with no pii at all"
        assert masked[4] == "combo <EMAIL> via <IP> tel <PHONE>"
        c = A.pii_counts(texts)
        assert c["n_email"].tolist() == [1, 0, 0, 0, 1]
        assert c["n_phone"].tolist() == [0, 2, 0, 0, 1]
        assert c["n_ip"].tolist() == [0, 0, 2, 0, 1]

    def test_email_masked_before_ip_phone(self, ray_session):
        # an email whose domain looks IP-ish must be consumed by the
        # EMAIL rule, not double-masked
        out = A.mask_pii(pa.array(["x user1@10.0.0.1.example.com y"])).to_pylist()
        assert out == ["x <EMAIL> y"]

    def test_duckdb_pattern_parity(self, ray_session):
        import duckdb

        texts = [
            "a@b.co 1.2.3.4 415-555-0000",
            "no pii",
            "deep.name+tag@sub.domain.io and 255.255.255.255",
        ]
        got = A.mask_pii(pa.array(texts)).to_pylist()
        con = duckdb.connect()
        want = [
            con.execute(
                f"""SELECT regexp_replace(regexp_replace(regexp_replace(?,
                    '{A.EMAIL_RE}', '<EMAIL>', 'g'),
                    '{A.PHONE_RE}', '<PHONE>', 'g'),
                    '{A.IPV4_RE}', '<IP>', 'g')""",
                [t],
            ).fetchone()[0]
            for t in texts
        ]
        assert got == want


class TestUrlCanonicalization:
    def test_rules(self, ray_session):
        from doppel_ray.functions import urls as U

        got = U.canonicalize_urls(
            pa.array(
                [
                    "HTTP://Example.COM:80/A/b/?z=1&a=2#frag",
                    "https://host.io:443/x",
                    "https://host.io:8443/x",          # non-default port kept
                    "http://a.b/p///",
                    "http://a.b",                       # empty path -> /
                    "http://a.b/?",                     # empty query kept
                    "not a url at all",                 # passthrough
                    "ftp://Mixed.Case/Path/",           # unknown scheme: no port rule
                ]
            )
        ).to_pylist()
        assert got == [
            "http://example.com/A/b?a=2&z=1",
            "https://host.io/x",
            "https://host.io:8443/x",
            "http://a.b/p",
            "http://a.b/",
            "http://a.b/?",
            "not a url at all",
            "ftp://mixed.case/Path",
        ]

    def test_extract_hosts(self, ray_session):
        from doppel_ray.functions import urls as U

        got = U.extract_hosts(
            pa.array(
                [
                    "https://News.Example.COM/a/b",
                    "http://host.io:8443/x?q=1",
                    "https://plain",
                    "not a url",
                    "ftp://Mixed.Case:21/f",
                    None,
                ]
            )
        ).to_pylist()
        assert got == [
            "news.example.com",
            "host.io",
            "plain",
            "",
            "mixed.case",
            "",
        ]

    def test_extract_hosts_duckdb_parity(self, ray_session):
        import duckdb

        from doppel_ray.functions import urls as U

        fixtures = [
            "https://News.Example.COM/a/b",
            "http://host.io:8443/x?q=1",
            "https://plain",
            "not a url",
            "ftp://Mixed.Case:21/f",
        ]
        got = U.extract_hosts(pa.array(fixtures)).to_pylist()
        con = duckdb.connect()
        con.register("t", pa.table({"u": pa.array(fixtures)}))
        want = [
            r[0]
            for r in con.execute(
                "SELECT lower(regexp_extract(u,"
                " '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1)) FROM t"
            ).fetchall()
        ]
        assert got == want

    def test_duckdb_parity(self, ray_session):
        """The generic SQL canonicalization (url_dup_groups oracle) and
        the Python kernel agree on adversarial inputs."""
        import duckdb

        from doppel_ray.functions import urls as U

        fixtures = [
            "HTTP://Example.COM:80/A/b/?z=1&a=2#frag",
            "https://host.io:443/x?x=1",
            "https://host.io:8443/x",
            "http://a.b/p///",
            "http://a.b",
            "http://UPPER.host/Q?c=3&b=2&a=1",
            "http://h/path?single",
            "http://h:80/",
        ]
        got = U.canonicalize_urls(pa.array(fixtures)).to_pylist()
        con = duckdb.connect()
        con.register("t", pa.table({"u": pa.array(fixtures)}))
        want = [
            r[0]
            for r in con.execute(
                r"""
            WITH nofrag AS (SELECT regexp_replace(u, '#.*$', '') AS u FROM t),
            parts AS (
              SELECT u,
                lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth,
                regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?]*)', 1) AS pth,
                CASE WHEN strpos(u, '?') > 0 THEN regexp_extract(u, '\?(.*)$', 1) END AS q
              FROM nofrag
            ),
            norm AS (
              SELECT scheme,
                CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$', '')
                     WHEN scheme = 'https' THEN regexp_replace(auth, ':443$', '')
                     ELSE auth END AS auth,
                CASE WHEN regexp_replace(pth, '/+$', '') = '' THEN '/'
                     ELSE regexp_replace(pth, '/+$', '') END AS pth,
                q
              FROM parts
            )
            SELECT scheme || '://' || auth || pth ||
                   CASE WHEN q IS NOT NULL
                        THEN '?' || array_to_string(list_sort(string_split(q, '&')), '&')
                        ELSE '' END
            FROM norm
            """
            ).fetchall()
        ]
        assert got == want
