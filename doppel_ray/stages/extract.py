"""HTML -> text extraction as an actor-pool Ray Data stage.

The corpus schema (BASELINE.json input_hint) carries the raw page as an
opaque ``html: binary`` column next to the extracted ``text``; the
north-rule invariant is that extracted text per url is byte-identical to
the expected extraction. This stage implements extraction with the
stdlib ``html.parser`` (no external deps): visible character data only,
``script``/``style``/``template`` subtrees dropped, entities decoded
(``convert_charrefs=True``), document order preserved verbatim — no
whitespace mangling, so extraction is reproducible byte-for-byte.

The parser object is built once per actor (``__init__``) and reset per
document — the per-worker reusable-state pattern of the reference's
hasher pools (reference internal/finder/finder.go:163-166).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa

from ray.data import Dataset

_SKIP_TAGS = {"script", "style", "template"}


class _TextParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self._chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth == 0:
            self._chunks.append(data)

    def extract(self, html: str) -> str:
        self.reset()
        self._chunks = []
        self._skip_depth = 0
        self.feed(html)
        self.close()
        return "".join(self._chunks)


class HtmlTextExtractor:
    """Actor-pool extraction stage: ``html: binary`` -> ``out_col`` text.

    Undecodable bytes are replaced (errors='replace') and counted in an
    ``extract_errors`` column rather than dropping rows (the reference's
    log-count-drop error policy, finder.go:168-172, minus the drop: a
    page with broken encoding still dedups on what decoded).
    """

    def __init__(self, html_col: str = "html", out_col: str = "text"):
        self.html_col = html_col
        self.out_col = out_col
        self.parser = _TextParser()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts: list[str] = []
        errors: list[int] = []
        for buf in batch[self.html_col].to_pylist():
            if buf is None:
                texts.append("")
                errors.append(1)
                continue
            raw = bytes(buf)
            try:
                s = raw.decode("utf-8")
                err = 0
            except UnicodeDecodeError:
                s = raw.decode("utf-8", errors="replace")
                err = 1
            try:
                texts.append(self.parser.extract(s))
            except Exception:
                # parser wedged on pathological input: fresh instance
                self.parser = _TextParser()
                texts.append("")
                err = 1
            errors.append(err)
        if self.out_col in batch.column_names:
            batch = batch.drop_columns([self.out_col])
        if "extract_errors" in batch.column_names:
            batch = batch.drop_columns(["extract_errors"])
        return batch.append_column(
            self.out_col, pa.array(texts, type=pa.large_string())
        ).append_column("extract_errors", pa.array(errors, type=pa.int64()))


def extract_text(
    ds: Dataset,
    *,
    html_col: str = "html",
    out_col: str = "text",
    concurrency: int | tuple[int, int] = 4,
    batch_size: int = 256,
) -> Dataset:
    """Attach extracted text; actor pool sized by ``concurrency`` (html
    payloads are wide — keep batches modest, SURVEY.md §4 memory row)."""
    return ds.map_batches(
        HtmlTextExtractor,
        fn_constructor_kwargs={"html_col": html_col, "out_col": out_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
