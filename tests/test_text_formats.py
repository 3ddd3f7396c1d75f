"""JSONL/CSV ingestion + JSONL export: format-agnostic corpus boundary.

The contract: a corpus ingested from JSONL or CSV is row-identical (same
schema, same values) to the Parquet read, so every downstream stage works
unchanged; export round-trips.
"""

from __future__ import annotations

import csv
import json
import os

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus_files(tmp_path_factory):
    """The sf0.001 documents table re-serialized as JSONL and CSV."""
    root = tmp_path_factory.mktemp("textfmt")
    tbl = pq.read_table(os.path.join(SF, "documents.parquet"))
    rows = tbl.to_pylist()
    jl = root / "docs.jsonl"
    with open(jl, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    cv = root / "docs.csv"
    with open(cv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=tbl.column_names)
        w.writeheader()
        w.writerows(rows)
    return str(jl), str(cv), tbl


def _sorted_pylist(ds):
    return sorted(ds.take_all(), key=lambda r: r["doc_id"])


class TestJsonlIngest:
    def test_matches_parquet(self, ray_session, corpus_files):
        from doppel_ray.sources.text_formats import read_documents_jsonl

        jl, _, tbl = corpus_files
        got = _sorted_pylist(read_documents_jsonl(jl))
        want = sorted(tbl.to_pylist(), key=lambda r: r["doc_id"])
        assert got == want

    def test_projection(self, ray_session, corpus_files):
        from doppel_ray.sources.text_formats import read_documents_jsonl

        jl, _, _ = corpus_files
        ds = read_documents_jsonl(jl, columns=["doc_id", "lang"])
        row = ds.take(1)[0]
        assert set(row) == {"doc_id", "lang"}

    def test_missing_column_raises(self, ray_session, tmp_path):
        from doppel_ray.sources.text_formats import read_documents_jsonl

        p = tmp_path / "bad.jsonl"
        p.write_text('{"doc_id": 1, "text": "x"}\n')
        with pytest.raises(Exception, match="missing"):
            read_documents_jsonl(str(p)).take_all()

    def test_downstream_stage_runs_unchanged(self, ray_session, corpus_files):
        """The exact-dup hashing stage consumes the JSONL read as-is."""
        from doppel_ray.sources.text_formats import read_documents_jsonl
        from doppel_ray.stages import textstats

        jl, _, tbl = corpus_files
        ds = read_documents_jsonl(jl, columns=["doc_id", "text"])
        out = textstats.add_quality_columns(ds)
        assert out.count() == tbl.num_rows


class TestCsvIngest:
    def test_matches_parquet(self, ray_session, corpus_files):
        from doppel_ray.sources.text_formats import read_documents_csv

        _, cv, tbl = corpus_files
        got = _sorted_pylist(read_documents_csv(cv))
        want = sorted(tbl.to_pylist(), key=lambda r: r["doc_id"])
        # CSV cannot distinguish empty string from missing; the synthetic
        # corpus has no empty text, so row equality is exact
        assert got == want


class TestJsonlExport:
    def test_round_trip(self, ray_session, corpus_files, tmp_path):
        from doppel_ray.sources.text_formats import (
            read_documents_jsonl,
            write_jsonl,
        )

        jl, _, tbl = corpus_files
        ds = read_documents_jsonl(jl)
        out = str(tmp_path / "export")
        write_jsonl(ds, out)
        back = read_documents_jsonl(
            [os.path.join(out, f) for f in sorted(os.listdir(out))]
        )
        assert _sorted_pylist(back) == sorted(
            tbl.to_pylist(), key=lambda r: r["doc_id"]
        )
