"""Checkpoint/resume + lineage tests (north rule: resumable from
checkpoint with per-partition lineage + metrics records)."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from doppel_ray import config as C
from doppel_ray.pipelines import job
from doppel_ray.state import checkpoint as ckpt


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory, synth_corpus):
    d = tmp_path_factory.mktemp("pages")
    pq.write_table(synth_corpus.pages, str(d / "pages.parquet"))
    return str(d)


def _groups_set(ds):
    rows = ds.take_all()
    return {(r["group_id"], r["count"], r["size"]) for r in rows}


class TestFingerprints:
    def test_chained_invalidation(self, tmp_path):
        fp1 = ckpt.fingerprint("stage", {"a": 1}, "parent")
        assert fp1 == ckpt.fingerprint("stage", {"a": 1}, "parent")
        assert fp1 != ckpt.fingerprint("stage", {"a": 2}, "parent")
        assert fp1 != ckpt.fingerprint("stage", {"a": 1}, "other-parent")

    def test_input_fingerprint_tracks_mtime(self, tmp_path):
        f = tmp_path / "x.parquet"
        f.write_bytes(b"abc")
        fp1 = ckpt.input_fingerprint(str(tmp_path))
        f.write_bytes(b"abcd")
        assert ckpt.input_fingerprint(str(tmp_path)) != fp1


class TestResume:
    def test_second_run_resumes_everything(self, corpus_dir, tmp_path):
        root = str(tmp_path / "ck")
        r1 = job.run_dedup_job(corpus_dir, root, near=True)
        assert r1.resumed_stages == []
        assert set(r1.computed_stages) == {
            "exact_groups",
            "minhash_edges",
            "clusters",
        }
        g1 = _groups_set(r1.groups)
        assert g1, "synth corpus has planted exact-dup groups"

        r2 = job.run_dedup_job(corpus_dir, root, near=True)
        assert r2.computed_stages == []
        assert set(r2.resumed_stages) == {
            "exact_groups",
            "minhash_edges",
            "clusters",
        }
        assert _groups_set(r2.groups) == g1

    def test_partial_resume_recomputes_only_missing(self, corpus_dir, tmp_path):
        root = str(tmp_path / "ck")
        job.run_dedup_job(corpus_dir, root, near=True)
        os.remove(os.path.join(root, "stage=clusters", ckpt.MANIFEST))
        r = job.run_dedup_job(corpus_dir, root, near=True)
        assert set(r.resumed_stages) == {"exact_groups", "minhash_edges"}
        assert r.computed_stages == ["clusters"]

    def test_config_change_invalidates_suffix(self, corpus_dir, tmp_path):
        root = str(tmp_path / "ck")
        job.run_dedup_job(corpus_dir, root, near=True)
        cfg = C.default_config()
        cfg.dedup.threshold = 0.7
        r = job.run_dedup_job(corpus_dir, root, cfg, near=True)
        assert r.resumed_stages == ["exact_groups"]
        assert set(r.computed_stages) == {"minhash_edges", "clusters"}

    def test_incomplete_stage_dir_rebuilt(self, corpus_dir, tmp_path):
        """A killed run leaves parquet without a manifest — must rebuild."""
        root = str(tmp_path / "ck")
        r1 = job.run_dedup_job(corpus_dir, root, near=False)
        g1 = _groups_set(r1.groups)
        os.remove(os.path.join(root, "stage=exact_groups", ckpt.MANIFEST))
        r2 = job.run_dedup_job(corpus_dir, root, near=False)
        assert r2.computed_stages == ["exact_groups"]
        assert _groups_set(r2.groups) == g1


class TestLineageMetrics:
    def test_manifest_partition_lineage(self, corpus_dir, tmp_path):
        root = str(tmp_path / "ck")
        r = job.run_dedup_job(corpus_dir, root, near=False)
        with open(os.path.join(root, "stage=exact_groups", ckpt.MANIFEST)) as f:
            man = json.load(f)
        assert man["stage"] == "exact_groups"
        assert man["rows"] == sum(p["rows"] for p in man["partitions"])
        for p in man["partitions"]:
            path = os.path.join(root, "stage=exact_groups", p["file"])
            assert pq.read_metadata(path).num_rows == p["rows"]

    def test_metrics_jsonl(self, corpus_dir, tmp_path):
        root = str(tmp_path / "ck")
        job.run_dedup_job(corpus_dir, root, near=True)
        with open(os.path.join(root, "metrics.jsonl")) as f:
            recs = [json.loads(line) for line in f]
        assert {r["stage"] for r in recs} == {
            "exact_groups",
            "minhash_edges",
            "clusters",
        }
        for r in recs:
            assert r["wall_s"] >= 0 and "partitions" in r


def test_job_checkpoint_signatures_stage(tmp_path, corpus_dir):
    """--checkpoint-signatures: the signing pass checkpoints as its own
    stage, resumes on rerun, and edges match the default path."""
    from doppel_ray.pipelines.job import run_dedup_job

    src = corpus_dir
    base = run_dedup_job(src, str(tmp_path / "ck0"), near=True)
    want = {
        (r["url_a"], r["url_b"]) for r in base.edges.take_all()
    }
    r1 = run_dedup_job(
        src, str(tmp_path / "ck1"), near=True, checkpoint_signatures=True
    )
    assert "signatures" in r1.computed_stages
    got = {(r["url_a"], r["url_b"]) for r in r1.edges.take_all()}
    assert got == want
    r2 = run_dedup_job(
        src, str(tmp_path / "ck1"), near=True, checkpoint_signatures=True
    )
    assert "signatures" in r2.resumed_stages
    assert "minhash_edges" in r2.resumed_stages


class TestCurationJob:
    def test_resume_and_policy_invalidation(self, corpus_dir, tmp_path):
        root = str(tmp_path / "ck")
        r1 = job.run_curation_job(
            corpus_dir, root, blocked_url_prefixes=("https://dup0.example/",)
        )
        assert r1.resumed_stages == []
        assert set(r1.computed_stages) == {"funnel_ledger", "status_counts"}
        counts1 = {
            r["status"]: r["n"] for r in r1.status_counts.take_all()
        }
        # the blocked prefix captures planted dup cluster 0 wholesale
        assert counts1.get("blocked", 0) > 0
        assert counts1.get("kept", 0) > 0
        # other planted exact clusters still produce duplicates
        assert counts1.get("duplicate", 0) > 0
        n_pages = sum(counts1.values())
        led = r1.ledger.take_all()
        assert len(led) == n_pages  # ledger partitions the corpus

        # identical rerun resumes both stages with identical counts
        r2 = job.run_curation_job(
            corpus_dir, root, blocked_url_prefixes=("https://dup0.example/",)
        )
        assert r2.computed_stages == []
        assert set(r2.resumed_stages) == {"funnel_ledger", "status_counts"}
        counts2 = {
            r["status"]: r["n"] for r in r2.status_counts.take_all()
        }
        assert counts2 == counts1

        # policy change invalidates the chain; blocked pool shrinks
        r3 = job.run_curation_job(corpus_dir, root)
        assert set(r3.computed_stages) == {"funnel_ledger", "status_counts"}
        counts3 = {
            r["status"]: r["n"] for r in r3.status_counts.take_all()
        }
        assert counts3.get("blocked", 0) == 0
        assert sum(counts3.values()) == n_pages


class TestSpanRemovalJob:
    def test_resume_and_window_invalidation(self, corpus_dir, tmp_path):
        root = str(tmp_path / "ck")
        r1 = job.run_span_removal_job(corpus_dir, root, window=6)
        assert r1.resumed_stages == []
        # only the compact pair relation checkpoints; the rewrite
        # re-derives from it (compact-artifacts-only contract)
        assert r1.computed_stages == ["removal_pairs"]
        docs1 = r1.docs.take_all()
        n_docs = len(docs1)
        assert n_docs > 0
        removed1 = sum(r["n_removed"] for r in docs1)
        # the synth corpus plants exact-dup families: removal is
        # non-vacuous (every non-first family member loses its windows)
        assert removed1 > 0

        # identical rerun resumes the pair stage; the recomputed rewrite
        # is identical
        r2 = job.run_span_removal_job(corpus_dir, root, window=6)
        assert r2.computed_stages == []
        assert r2.resumed_stages == ["removal_pairs"]
        docs2 = {r["doc_id"]: r["text"] for r in r2.docs.take_all()}
        assert docs2 == {r["doc_id"]: r["text"] for r in docs1}

        # window change invalidates the pair stage
        r3 = job.run_span_removal_job(corpus_dir, root, window=7)
        assert r3.computed_stages == ["removal_pairs"]
        assert len(r3.docs.take_all()) == n_docs

    def test_zero_duplicate_corpus(self, tmp_path):
        # all-unique corpus: the pair relation is EMPTY — the empty
        # checkpoint must round-trip through Parquet and the rebuild
        # must pass every doc through (ws-normalized) on run and resume
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        corpus = str(tmp_path / "uniq")
        import os

        os.makedirs(corpus)
        rows = []
        for i in range(30):
            rows.append(
                {
                    "url": f"https://u{i}.example/p",
                    "warc_ts": pd.Timestamp("2025-01-01"),
                    "html": b"",
                    "text": " ".join(f"t{i}_{j}" for j in range(20)),
                    "lang": "en",
                }
            )
        pq.write_table(
            pa.Table.from_pandas(pd.DataFrame(rows)),
            os.path.join(corpus, "p.parquet"),
        )
        root = str(tmp_path / "ck0")
        r1 = job.run_span_removal_job(corpus, root, window=6)
        d1 = r1.docs.to_pandas()
        assert r1.pairs.count() == 0
        assert len(d1) == 30 and int(d1["n_removed"].sum()) == 0
        r2 = job.run_span_removal_job(corpus, root, window=6)
        assert r2.resumed_stages == ["removal_pairs"]
        d2 = r2.docs.to_pandas()
        assert len(d2) == 30 and int(d2["n_removed"].sum()) == 0
