"""HTML->text extraction tests: the north-rule byte-identity invariant
(extracted text per url byte-identical to the planted text column), tag
and entity semantics, and error accounting."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from doppel_ray.stages import extract


class TestParser:
    def test_basic_extraction(self):
        p = extract._TextParser()
        assert p.extract("<html><body>hello world</body></html>") == "hello world"

    def test_script_style_dropped(self):
        p = extract._TextParser()
        html = "<body>a<script>var x=1;</script>b<style>.c{}</style>c</body>"
        assert p.extract(html) == "abc"

    def test_entities_decoded(self):
        p = extract._TextParser()
        assert p.extract("<p>a &amp; b &lt;c&gt;</p>") == "a & b <c>"

    def test_nested_skip(self):
        p = extract._TextParser()
        html = "<script>x<script>y</script>z</script>after"
        # nested skip depth: everything inside outer script dropped
        assert p.extract(html).endswith("after")

    def test_reuse_is_clean(self):
        p = extract._TextParser()
        assert p.extract("<b>one</b>") == "one"
        assert p.extract("<i>two</i>") == "two"


class TestStage:
    def test_byte_identity_on_synth_corpus(self, synth_corpus, ray_session):
        """North-rule invariant: extracting the html column reproduces the
        text column byte-for-byte for every url."""
        pages = synth_corpus.pages.select(["url", "html", "text"])
        renamed = pages.rename_columns(["url", "html", "expected"])
        out = extract.extract_text(
            rd.from_arrow(renamed), concurrency=2
        ).take_all()
        assert len(out) == pages.num_rows
        for r in out:
            assert r["text"] == r["expected"], r["url"]
            assert r["extract_errors"] == 0

    def test_broken_encoding_counted_not_dropped(self, ray_session):
        t = pa.table(
            {
                "url": ["good", "bad"],
                "html": pa.array(
                    [b"<b>fine</b>", b"<b>\xff\xfe broken</b>"],
                    type=pa.binary(),
                ),
            }
        )
        out = extract.extract_text(rd.from_arrow(t), concurrency=1).take_all()
        by_url = {r["url"]: r for r in out}
        assert by_url["good"]["extract_errors"] == 0
        assert by_url["bad"]["extract_errors"] == 1
        assert "broken" in by_url["bad"]["text"]
