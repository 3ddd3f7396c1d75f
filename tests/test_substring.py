"""Suffix-array / anchor-gram exact-substring containment tests: kernel
contracts vs naive implementations, pipeline equality with the brute-force
containment relation on the synth corpus, and the short-doc probe path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from doppel_ray.functions import suffix as S
from doppel_ray.functions import text as T
from doppel_ray.stages import substring


class TestKernels:
    def test_suffix_array_matches_naive(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            data = bytes(
                rng.integers(97, 102, size=int(rng.integers(1, 300))).astype(
                    np.uint8
                )
            )
            sa = S.suffix_array(data)
            naive = sorted(range(len(data)), key=lambda i: data[i:])
            assert sa.tolist() == naive

    def test_sa_find_all_matches_naive(self):
        data = b"abracadabra banana cadabra abra"
        sa = S.suffix_array(data)
        for probe in [b"abra", b"a", b"banana", b"zzz", b"cadabra", b""]:
            got = S.sa_find_all(data, sa, probe).tolist()
            want = [
                i
                for i in range(len(data))
                if probe and data[i : i + len(probe)] == probe
            ]
            assert got == want, probe

    def test_window_hash_matches_horner(self):
        rng = np.random.default_rng(1)
        d = bytes(rng.integers(0, 256, 100).astype(np.uint8))
        wh = S.window_hashes(d, 7)

        def horner(win):
            h = 0
            for c in win:
                h = (h * S._R + c) % (1 << 64)
            return h

        for i in [0, 1, 50, 93]:
            assert int(wh[i]) == horner(d[i : i + 7])

    def test_window_hash_content_only(self):
        assert S.window_hashes(b"xxhello worldyy", 5)[2] == S.window_hashes(
            b"hello world", 5
        )[0]

    def test_contained_anchors_subset_of_container(self):
        rng = np.random.default_rng(2)
        inner = bytes(rng.integers(97, 123, 500).astype(np.uint8))
        outer = b"PREFIX" * 20 + inner + b"SUFFIX" * 30
        ai = S.anchor_grams(inner, 24, 16)
        ao = S.anchor_grams(outer, 24, 16)
        assert len(ai) > 0
        assert set(ai.tolist()) <= set(ao.tolist())


def _truth(pages: pa.Table, cfg: substring.ContainmentConfig):
    texts = (
        [s.encode() for s in T.normalize_texts(pages["text"])]
        if cfg.normalize
        else [s.encode() for s in pages["text"].to_pylist()]
    )
    urls = pages["url"].to_pylist()
    truth = set()
    for i, (u, t) in enumerate(zip(urls, texts)):
        if len(t) < cfg.min_contained_size:
            continue
        for j, (v, s) in enumerate(zip(urls, texts)):
            if i != j and len(t) < len(s) and t in s:
                truth.add((u, v))
    return truth


class TestPipeline:
    def test_matches_brute_force_on_synth(self, synth_corpus):
        cfg = substring.ContainmentConfig(num_buckets=8)
        pages = synth_corpus.pages.select(["url", "text"])
        truth = _truth(pages, cfg)
        assert truth, "synth corpus must plant containment pairs"
        edges = substring.containment_edges(rd.from_arrow(pages), cfg).take_all()
        got = {(r["url_a"], r["url_b"]) for r in edges}
        assert got == truth
        assert len(edges) == len(got), "duplicate edges emitted"
        for r in edges:
            assert r["size_a"] < r["size_b"]

    def test_routed_verify_matches_broadcast(self, synth_corpus):
        """Candidate sets past ``broadcast_limit`` verify through the
        two-pass bucketed text join (stages/textjoin.py) — forcing the
        limit to 0 must reproduce the broadcast path's exact edge set
        (VERDICT r2 #3: no unbounded driver text broadcast)."""
        cfg = substring.ContainmentConfig(num_buckets=8, broadcast_limit=0)
        pages = synth_corpus.pages.select(["url", "text"])
        truth = _truth(pages, cfg)
        assert truth
        edges = substring.containment_edges(rd.from_arrow(pages), cfg).take_all()
        got = {(r["url_a"], r["url_b"]) for r in edges}
        assert got == truth
        assert len(edges) == len(got)

    def test_probe_path_short_docs(self, ray_session):
        """Docs far below the anchor window still get containment edges
        via the broadcast probe scan."""
        long_a = "the quick brown fox jumps over the lazy dog " * 20
        t = pa.table(
            {
                "url": ["short1", "short2", "long1", "long2", "unrelated"],
                "text": [
                    "lazy dog",            # 8 bytes, < window
                    "quick brown fox",     # < window
                    long_a,
                    "totally different content with a lazy dog inside " * 10,
                    "nothing shared here at all zzz " * 8,
                ],
            }
        )
        cfg = substring.ContainmentConfig(num_buckets=4)
        edges = substring.containment_edges(rd.from_arrow(t), cfg).take_all()
        got = {(r["url_a"], r["url_b"]) for r in edges}
        assert ("short1", "long1") in got
        # the suffix-array probe branch (above sa_min_probes, default now
        # in the hundreds) must return the same edges as bytes.find
        sa_cfg = substring.ContainmentConfig(num_buckets=4, sa_min_probes=1)
        sa_edges = substring.containment_edges(rd.from_arrow(t), sa_cfg).take_all()
        assert {(r["url_a"], r["url_b"]) for r in sa_edges} == got
        assert ("short1", "long2") in got
        assert ("short2", "long1") in got
        assert not any(a == "unrelated" or b == "unrelated" for a, b in got)

    def test_probe_sharding_past_probe_cap(self, ray_session):
        """More anchor-less short docs than probe_cap: sharded broadcast
        rounds must scan EVERY probe (r1 dropped the overflow)."""
        n_short = 12
        shorts = [f"needle{i:02d}x" for i in range(n_short)]  # < window
        containers = [
            f"padding words before {s} and padding words after " * 3
            for s in shorts
        ]
        t = pa.table(
            {
                "url": [f"s{i:02d}" for i in range(n_short)]
                + [f"c{i:02d}" for i in range(n_short)],
                "text": shorts + containers,
            }
        )
        cfg = substring.ContainmentConfig(probe_cap=5, num_buckets=4)
        edges = substring.containment_edges(rd.from_arrow(t), cfg).take_all()
        got = {(r["url_a"], r["url_b"]) for r in edges}
        for i in range(n_short):
            assert (f"s{i:02d}", f"c{i:02d}") in got, f"probe {i} lost"
        assert len(edges) == len(got), "duplicate edges across shards"

    def test_normalize_false_raw_semantics(self, ray_session):
        t = pa.table(
            {
                "url": ["a", "b", "c"],
                "text": [
                    "Hello World FRAGMENT",
                    "xx hello world fragment yy",  # case differs from a
                    "zz Hello World FRAGMENT ww",
                ],
            }
        )
        cfg = substring.ContainmentConfig(normalize=False, num_buckets=4)
        edges = substring.containment_edges(rd.from_arrow(t), cfg).take_all()
        got = {(r["url_a"], r["url_b"]) for r in edges}
        assert got == {("a", "c")}
