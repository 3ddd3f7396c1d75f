"""SimHash candidate-generation tests: kernel contracts, the pigeonhole
exactness guarantee (bands > max_hamming => every pair within distance d
shares a block, so the pipeline must find EXACTLY the brute-force pairs
when no hot-block capping kicks in), and capped-hot-block connectivity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from doppel_ray.functions import text as T
from doppel_ray.stages import simhash


def _truth_pairs(pages: pa.Table, cfg: simhash.SimHashConfig):
    """Brute-force all-pairs Hamming <= max_hamming at the same config."""
    urls = pages["url"].to_pylist()
    texts = (
        T.normalize_texts(pages["text"])
        if cfg.normalize
        else pages["text"].to_pandas()
    )
    sh = T.simhash_signatures(texts).view(np.uint64)
    n = len(urls)
    truth = {}
    for i in range(n):
        d = T.hamming_distance64(np.full(n - i - 1, sh[i]), sh[i + 1 :])
        for off in np.nonzero(d <= cfg.max_hamming)[0]:
            j = i + 1 + off
            key = (min(urls[i], urls[j]), max(urls[i], urls[j]))
            truth[key] = int(d[off])
    return truth


class TestKernels:
    def test_identical_texts_identical_fingerprint(self):
        s = pd.Series(["the quick brown fox jumps over the lazy dog"] * 2)
        sh = T.simhash_signatures(s)
        assert sh[0] == sh[1]

    def test_small_edit_small_hamming(self):
        base = " ".join(f"tok{i}" for i in range(200))
        edited = base.replace("tok117", "zzz")
        sh = T.simhash_signatures(pd.Series([base, edited])).view(np.uint64)
        d = T.hamming_distance64(sh[:1], sh[1:])
        assert 0 < d[0] <= 12

    def test_unrelated_texts_far_apart(self):
        rng = np.random.default_rng(7)
        a = " ".join(f"a{i}" for i in rng.integers(0, 10**6, 300))
        b = " ".join(f"b{i}" for i in rng.integers(0, 10**6, 300))
        sh = T.simhash_signatures(pd.Series([a, b])).view(np.uint64)
        assert T.hamming_distance64(sh[:1], sh[1:])[0] > 15

    def test_hamming_distance64(self):
        a = np.array([0, 0xFFFFFFFFFFFFFFFF, 0b1011], dtype=np.uint64)
        b = np.array([0, 0, 0b0011], dtype=np.uint64)
        assert T.hamming_distance64(a, b).tolist() == [0, 64, 1]

    def test_explode_blocks_covers_word(self):
        t = pa.table({"url": ["u"], "simhash": pa.array([-1], pa.int64())})
        out = simhash._explode_blocks(t, bands=4)
        assert out.num_rows == 4
        assert len(set(out["block_key"].to_pylist())) == 4


class TestPipeline:
    def test_pigeonhole_exact_vs_brute_force(self, synth_corpus):
        """Uncapped: pipeline edges == brute-force pairs (set AND distances)."""
        cfg = simhash.SimHashConfig(band_cap=10**9, num_buckets=8)
        pages = synth_corpus.pages.select(["url", "text"])
        truth = _truth_pairs(pages, cfg)
        edges = simhash.simhash_edges(rd.from_arrow(pages), cfg).take_all()
        got = {
            (min(r["url_a"], r["url_b"]), max(r["url_a"], r["url_b"])): r["hamming"]
            for r in edges
        }
        assert got == truth
        assert len(edges) == len(got), "duplicate pairs emitted"

    def test_exact_dups_found_at_distance_zero(self, synth_corpus):
        cfg = simhash.SimHashConfig(band_cap=10**9, num_buckets=8)
        pages = synth_corpus.pages.select(["url", "text"])
        edges = simhash.simhash_edges(rd.from_arrow(pages), cfg).take_all()
        got = {(r["url_a"], r["url_b"]) for r in edges}
        # every planted exact-dup pair must appear with hamming 0
        by_cluster: dict[int, list[str]] = {}
        for url, cid in synth_corpus.exact_clusters.items():
            by_cluster.setdefault(cid, []).append(url)
        ham0 = {
            (min(r["url_a"], r["url_b"]), max(r["url_a"], r["url_b"]))
            for r in edges
            if r["hamming"] == 0
        }
        for members in by_cluster.values():
            members.sort()
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    assert (members[i], members[j]) in ham0

    def test_prune_exact_matches_unpruned(self, synth_corpus):
        """prune_exact (collapse classes -> band reps -> distributed
        reattach) must reproduce the unpruned pipeline's edges exactly
        (pairs AND distances) on a corpus with real exact-dup clusters."""
        pages = synth_corpus.pages.select(["url", "text"])
        cfg_off = simhash.SimHashConfig(
            band_cap=10**9, num_buckets=8, prune_exact=False
        )
        cfg_on = simhash.SimHashConfig(band_cap=10**9, num_buckets=8)
        e_off = simhash.simhash_edges(rd.from_arrow(pages), cfg_off).take_all()
        e_on = simhash.simhash_edges(rd.from_arrow(pages), cfg_on).take_all()

        def norm(rows):
            return {
                (min(r["url_a"], r["url_b"]), max(r["url_a"], r["url_b"])): r["hamming"]
                for r in rows
            }

        assert norm(e_on) == norm(e_off)
        assert len(e_on) == len(norm(e_on)), "duplicate pairs emitted"

    def test_mega_exact_group_full_clique_over_cap(self):
        """80 identical docs (> band_cap): pre-pruning collapses them to
        one rep, expansion restores the full 3160-pair clique at h=0 —
        the r1 ring would have surfaced only 79 pairs."""
        n = 80
        urls = [f"u{i:03d}" for i in range(n)]
        t = pa.table({"url": urls, "text": ["same boilerplate text here"] * n})
        cfg = simhash.SimHashConfig(band_cap=5, num_buckets=4)
        edges = simhash.simhash_edges(rd.from_arrow(t), cfg).take_all()
        pairs = {(r["url_a"], r["url_b"]) for r in edges}
        assert len(edges) == len(pairs) == n * (n - 1) // 2
        assert all(r["hamming"] == 0 for r in edges)
        assert all(r["url_a"] < r["url_b"] for r in edges)

    def test_dropped_tally_survives_hamming_filter(self):
        """ADVICE r2: a hot block's ring-prune tally must not vanish when
        the pair that would carry it fails the Hamming filter."""
        import numpy as np

        def g(simhashes, urls):
            n = len(urls)
            return pa.table(
                {
                    "block_key": pa.array([1] * n, type=pa.int64()),
                    "url": pa.array(urls, type=pa.string()),
                    "simhash": pa.array(
                        np.asarray(simhashes, dtype=np.uint64).view(np.int64)
                    ),
                }
            )

        # 4 rows, cap=2 -> ring pairs (u0,u1),(u1,u2),(u2,u3); tally = 6-3 = 3.
        # u0 is far from u1 (first ring pair fails), u1..u3 identical.
        far = (1 << 40) - 1  # popcount 40 > max_hamming
        t = simhash._emit_pairs_bucket(
            g([far, 7, 7, 7], ["u0", "u1", "u2", "u3"]), cap=2, max_hamming=3
        )
        assert sum(t["dropped"].to_pylist()) == 3
        assert all(a != b for a, b in zip(t["url_a"].to_pylist(), t["url_b"].to_pylist()))

        # every ring pair fails -> the tally rides a self-pair marker row
        t2 = simhash._emit_pairs_bucket(
            g([far, 7, far, 7], ["u0", "u1", "u2", "u3"]), cap=2, max_hamming=3
        )
        assert sum(t2["dropped"].to_pylist()) == 3
        markers = [
            (a, b)
            for a, b in zip(t2["url_a"].to_pylist(), t2["url_b"].to_pylist())
            if a == b
        ]
        assert len(markers) == 1

    def test_capped_hot_block_keeps_connectivity(self):
        """A mega-cluster of identical docs above the cap still comes out
        connected (ring emission), with dropped-pair counts surfaced."""
        n = 40
        urls = [f"u{i:03d}" for i in range(n)]
        t = pa.table({"url": urls, "text": ["same boilerplate text here"] * n})
        cfg = simhash.SimHashConfig(band_cap=5, num_buckets=4)
        edges = simhash.simhash_edges(rd.from_arrow(t), cfg).take_all()
        from doppel_ray.state.unionfind import UnionFind

        uf = UnionFind()
        for r in edges:
            uf.union(r["url_a"], r["url_b"])
        roots = {uf.find(u) for u in urls}
        assert len(roots) == 1


class TestMd5TokenHashMode:
    """token_hash="md5" makes fingerprints SQL-reproducible (the
    simhash_near_dup oracle recomputes them with md5_number_upper)."""

    def test_md5_token_hash_matches_duckdb(self):
        import duckdb

        toks = np.array(["the", "quick", "brown", "fox", "éclair", ""])
        got = T.md5_token_hash64(toks)
        con = duckdb.connect()
        want = np.array(
            [
                con.execute("SELECT md5_number_upper(?)", [t]).fetchone()[0]
                for t in toks
            ],
            dtype=np.uint64,
        )
        assert (got == want).all()

    def test_md5_fingerprints_match_reference_vote(self):
        """md5 mode uses the same majority-vote signer: recompute one doc
        by hand from per-token md5 bit votes."""
        import hashlib

        text = "alpha beta alpha gamma"
        sig = np.uint64(
            T.simhash_signatures(pd.Series([text]), token_hash="md5")[0]
        )
        toks = text.split()
        hs = [
            int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
            for t in toks
        ]
        for j in range(64):
            votes = sum((h >> j) & 1 for h in hs)
            bit = 1 if 2 * votes > len(toks) else 0
            assert (int(sig) >> j) & 1 == bit, f"bit {j}"

    def test_zero_token_doc_is_zero_fingerprint(self):
        sigs = T.simhash_signatures(pd.Series(["", "   "]), token_hash="md5")
        assert list(np.asarray(sigs).view(np.uint64)) == [0, 0]

    def test_edges_identical_semantics_across_hash_modes(self):
        """The hash mode changes WHICH fingerprints docs get, not the
        pair semantics: exact duplicates pair at hamming 0 either way."""
        t = pa.table(
            {
                "url": ["a", "b", "c"],
                "text": ["same text here"] * 2 + ["completely different words"],
            }
        )
        for mode in ("pandas", "md5"):
            cfg = simhash.SimHashConfig(token_hash=mode, num_buckets=4)
            edges = simhash.simhash_edges(rd.from_arrow(t), cfg).take_all()
            pairs = {(r["url_a"], r["url_b"]) for r in edges}
            assert ("a", "b") in pairs
            assert not any("c" in p for p in pairs)


class TestExpandPaths:
    """Broadcast and join expansion paths produce the identical edge set
    (expand_edges auto-gates on measured member count)."""

    def _edges(self, broadcast_limit: int):
        from doppel_ray.stages import prune

        edges = rd.from_arrow(
            pa.table(
                {
                    "url_a": ["r1", "r2", "x"],
                    "url_b": ["r2", "y", "y"],
                    "hamming": pa.array([2, 1, 3], type=pa.int64()),
                }
            )
        )
        members = rd.from_arrow(
            pa.table(
                {
                    "rep": ["r1", "r1", "r1", "r2", "r2"],
                    "url": ["r1", "m1", "m2", "r2", "m3"],
                }
            )
        )
        out = prune.expand_edges(
            edges,
            members,
            num_buckets=4,
            value_col="hamming",
            value_type=pa.int64(),
            identity_value=0,
            broadcast_limit=broadcast_limit,
        ).take_all()
        return sorted((r["url_a"], r["url_b"], r["hamming"]) for r in out)

    def test_broadcast_equals_join_path(self):
        fast = self._edges(broadcast_limit=1_000_000)  # broadcast
        slow = self._edges(broadcast_limit=0)          # bucketed joins
        assert fast == slow
        # spot-check semantics: intra cliques at 0, cross expansion
        assert ("m1", "m2", 0) in fast          # r1-class clique pair
        assert ("m1", "m3", 2) in fast          # r1-r2 edge cross product
        assert ("m3", "y", 1) in fast           # r2-y edge expanded
        assert ("x", "y", 3) in fast            # edge between non-class urls
