"""C4-style cleaning (stages/c4clean.py) — line rules, page-drop
reasons and priority, null tolerance, and DuckDB parity on a random
multi-line corpus using the stage's own RE2 constants."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from doppel_ray.stages import c4clean as C4


def _docs(texts: list[str | None]) -> rd.Dataset:
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    return rd.from_arrow(t).repartition(3)


def _run(texts, **kw):
    return {r["doc_id"]: r for r in C4.c4_clean(_docs(texts), **kw).take_all()}


GOOD = "This line has plenty of words and ends properly."


class TestLineRules:
    def test_terminal_punctuation_required(self, ray_session):
        out = _run([GOOD + "\n" + "this long line is missing its terminal mark"])
        assert out[0]["text_clean"] == GOOD
        assert out[0]["n_kept"] == 1 and out[0]["n_dropped"] == 1

    @pytest.mark.parametrize("punct", [".", "!", "?", '"'])
    def test_all_terminal_marks_accepted(self, ray_session, punct):
        line = "five or more words right here" + punct
        out = _run([line])
        assert out[0]["n_kept"] == 1

    def test_min_words(self, ray_session):
        out = _run([GOOD + "\nshort line."])
        assert out[0]["text_clean"] == GOOD
        out = _run([GOOD + "\nfive words are just enough."], min_words=5)
        assert out[0]["n_kept"] == 2

    def test_javascript_line_dropped_case_insensitive(self, ray_session):
        out = _run(
            [GOOD + "\nPlease enable JAVASCRIPT to see this page content."]
        )
        assert out[0]["text_clean"] == GOOD

    def test_empty_text_and_null(self, ray_session):
        out = _run(["", None])
        assert out[0]["n_kept"] == 0 and out[0]["kept"] is False
        assert out[0]["drop_reason"] == C4.REASON_FEW
        assert out[1]["n_kept"] == 0 and out[1]["drop_reason"] == C4.REASON_FEW


class TestPageRules:
    def _page3(self, extra=""):
        # three good lines -> survives unless a page rule fires
        return "\n".join([GOOD, GOOD, GOOD]) + extra

    def test_clean_page_kept(self, ray_session):
        out = _run([self._page3()])
        assert out[0]["kept"] is True and out[0]["drop_reason"] == ""

    def test_lorem_ipsum_drops(self, ray_session):
        out = _run([self._page3("\nSome Lorem Ipsum filler appears right here.")])
        assert out[0]["drop_reason"] == C4.REASON_LOREM

    def test_brace_drops(self, ray_session):
        out = _run([self._page3("\nvar x = { key: 1 } appears somewhere here.")])
        assert out[0]["drop_reason"] == C4.REASON_BRACE

    def test_too_few_lines_drops(self, ray_session):
        out = _run([GOOD + "\n" + GOOD], min_lines=3)
        assert out[0]["drop_reason"] == C4.REASON_FEW
        # text_clean still computed for dropped pages
        assert out[0]["text_clean"] == GOOD + "\n" + GOOD

    def test_reason_priority_lorem_over_brace(self, ray_session):
        out = _run(["lorem ipsum { and a brace"])
        assert out[0]["drop_reason"] == C4.REASON_LOREM

    def test_validation(self, ray_session):
        with pytest.raises(ValueError, match="min_words"):
            C4.c4_clean(_docs([GOOD]), min_words=0)


class TestDuckDBParity:
    def test_random_corpus(self, ray_session):
        import duckdb

        rng = np.random.default_rng(7)
        pool = [
            GOOD,
            "short stub.",
            "a longer line that never terminates with punctuation",
            "Please enable javascript for the full experience here.",
            "Lorem ipsum dolor sit amet consectetur adipiscing elit.",
            "An object { literal } lives inside this line.",
            "Another perfectly fine sentence closes with a question mark?",
            '"A quoted sentence counts as terminal punctuation too."',
        ]
        texts = [
            "\n".join(rng.choice(pool, size=rng.integers(1, 6)))
            for _ in range(60)
        ]
        got = sorted(
            (
                r["doc_id"],
                r["text_clean"],
                r["n_kept"],
                r["n_dropped"],
                r["kept"],
                r["drop_reason"],
            )
            for r in C4.c4_clean(_docs(texts)).take_all()
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
            rf"""
            WITH ls AS (
              SELECT doc_id, text AS t, string_split(text, chr(10)) AS ls
              FROM documents
            ),
            lines AS (
              SELECT doc_id, i AS pos, ls[i] AS line
              FROM ls, UNNEST(generate_series(1, len(ls))) AS u(i)
            ),
            flags AS (
              SELECT doc_id, pos, line,
                regexp_matches(line, '{C4.TERMINAL_RE}')
                  AND length(regexp_extract_all(line, '{C4.WORD_RE}')) >= 5
                  AND NOT regexp_matches(line, '{C4.JAVASCRIPT_RE}') AS keep
              FROM lines
            ),
            per_doc AS (
              SELECT doc_id,
                coalesce(string_agg(CASE WHEN keep THEN line END,
                                    chr(10) ORDER BY pos), '') AS text_clean,
                sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
                sum(CASE WHEN keep THEN 0 ELSE 1 END)::BIGINT AS n_dropped
              FROM flags GROUP BY doc_id
            )
            SELECT p.doc_id, p.text_clean, p.n_kept, p.n_dropped,
              NOT (regexp_matches(l.t, '{C4.LOREM_RE}')
                   OR strpos(l.t, chr(123)) > 0 OR p.n_kept < 3) AS kept,
              CASE
                WHEN regexp_matches(l.t, '{C4.LOREM_RE}') THEN '{C4.REASON_LOREM}'
                WHEN strpos(l.t, chr(123)) > 0 THEN '{C4.REASON_BRACE}'
                WHEN p.n_kept < 3 THEN '{C4.REASON_FEW}'
                ELSE '' END AS drop_reason
            FROM per_doc p JOIN ls l USING (doc_id) ORDER BY p.doc_id
            """
        ).fetchall()
        want = sorted(
            (r[0], r[1], r[2], r[3], bool(r[4]), r[5]) for r in want
        )
        assert got == want
