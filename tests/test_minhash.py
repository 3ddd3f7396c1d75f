"""MinHash/LSH near-dedup tests: kernel contracts, the dup-pair recall
harness vs the brute-force exact-Jaccard oracle (north rule: recall >=
0.99 at the same shingle/signature config), hot-band capping, and
clustering equivalence."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from doppel_ray.functions import text as T
from doppel_ray.stages import cluster, minhash
from doppel_ray.state.unionfind import UnionFind

CFG = minhash.MinHashConfig()


def _truth_pairs(pages: pa.Table, threshold: float) -> set[tuple[str, str]]:
    """Brute-force all-pairs exact Jaccard at the pipeline's shingle config."""
    urls = pages["url"].to_pylist()
    norm = T.normalize_texts(pages["text"])
    sh = T.unique_shingles([s.encode() for s in norm], CFG.shingle_n)
    truth = set()
    n = len(urls)
    for i in range(n):
        for j in range(i + 1, n):
            if len(sh[i]) == 0 and len(sh[j]) == 0:
                sim = 1.0
            else:
                sim = T.exact_jaccard(sh[i], sh[j])
            if sim >= threshold:
                truth.add((min(urls[i], urls[j]), max(urls[i], urls[j])))
    return truth


class TestKernels:
    def test_signature_estimates_jaccard(self):
        a, b = T.make_permutations(256, 7)
        d1 = b"the quick brown fox jumps over the lazy dog and runs away fast"
        d2 = b"the quick brown fox jumps over the lazy cat and runs away fast"
        sigs = T.minhash_signatures([d1, d2], 5, a, b)
        est = (sigs[0] == sigs[1]).mean()
        sh = T.unique_shingles([d1, d2], 5)
        true = T.exact_jaccard(sh[0], sh[1])
        assert abs(est - true) < 0.15

    def test_batch_independence(self):
        a, b = T.make_permutations(64, 7)
        docs = [b"alpha beta gamma", b"delta epsilon zeta", b"eta theta iota"]
        full = T.minhash_signatures(docs, 4, a, b)
        solo = T.minhash_signatures([docs[1]], 4, a, b)
        assert (full[1] == solo[0]).all()

    def test_identical_docs_share_all_bands(self):
        a, b = T.make_permutations(128, 7)
        sigs = T.minhash_signatures([b"same text here"] * 2, 5, a, b)
        keys = T.band_keys(sigs, 32)
        assert (keys[0] == keys[1]).all()

    def test_disjoint_docs_share_no_bands(self):
        a, b = T.make_permutations(128, 7)
        sigs = T.minhash_signatures(
            [b"aaaa bbbb cccc dddd eeee", b"ffff gggg hhhh iiii jjjj"], 5, a, b
        )
        keys = T.band_keys(sigs, 32)
        assert (keys[0] != keys[1]).all()

    def test_empty_and_short_docs(self):
        a, b = T.make_permutations(32, 7)
        sigs = T.minhash_signatures([b"", b"ab", b""], 5, a, b)
        assert (sigs[0] == sigs[2]).all()  # both empty -> same signature

    def test_unique_shingles_sorted_unique(self):
        sh = T.unique_shingles([b"abababab"], 2)[0]
        assert (np.diff(sh.view(np.int64)) != 0).all()
        assert len(sh) == 2  # "ab" and "ba"


class TestOPHKernel:
    """One-permutation hashing + densification (the default signer)."""

    def _sigs(self, docs, num_perm=128, seed=42, n=5):
        h, off = T.shingle_hashes(docs, n)
        return T.oph_signatures(h, off, num_perm, seed)

    def test_identical_docs_identical_signatures(self):
        s = self._sigs([b"the same document text here"] * 2)
        assert (s[0] == s[1]).all()

    def test_batch_independence(self):
        docs = [b"alpha beta gamma words", b"delta epsilon zeta more", b"eta theta"]
        full = self._sigs(docs)
        solo = self._sigs([docs[1]])
        assert (full[1] == solo[0]).all()

    def test_estimates_jaccard(self):
        rng = np.random.default_rng(5)
        words = [f"w{i}" for i in range(400)]
        base = [words[i] for i in rng.integers(0, 400, 300)]
        mut = list(base)
        for p in rng.choice(300, 40, replace=False):
            mut[p] = words[int(rng.integers(0, 400))] + "x"
        d1 = " ".join(base).encode()
        d2 = " ".join(mut).encode()
        sigs = self._sigs([d1, d2], num_perm=256)
        est = (sigs[0] == sigs[1]).mean()
        sh = T.unique_shingles([d1, d2], 5)
        true = T.exact_jaccard(sh[0], sh[1])
        assert abs(est - true) < 0.15

    def test_short_doc_densification_deterministic(self):
        s1 = self._sigs([b"tiny"])  # fewer shingles than bins
        s2 = self._sigs([b"tiny"])
        assert (s1 == s2).all()
        MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
        assert (s1 != MAX).all(), "densification left empty bins"

    def test_empty_docs_share_signature(self):
        s = self._sigs([b"", b""])
        assert (s[0] == s[1]).all()

    def test_disjoint_docs_share_no_bands(self):
        sigs = self._sigs(
            [b"aaaa bbbb cccc dddd eeee", b"ffff gggg hhhh iiii jjjj"]
        )
        keys = T.band_keys(sigs, 32)
        assert (keys[0] != keys[1]).all()


class TestRecallHarness:
    """The north-rule acceptance gate at test scale."""

    @pytest.fixture(scope="class")
    def result(self, synth_corpus, pages_ds):
        edges = minhash.near_dup_edges(pages_ds, CFG)
        rows = edges.take_all()
        truth = _truth_pairs(synth_corpus.pages, CFG.threshold)
        return rows, truth

    def test_dup_pair_recall_ge_099(self, result):
        rows, truth = result
        found = {(r["url_a"], r["url_b"]) for r in rows}
        assert len(truth) > 1000  # fixture really exercises the gate
        recall = len(truth & found) / len(truth)
        assert recall >= 0.99, f"recall {recall:.4f}"

    def test_precision_is_exact(self, result):
        # verification computes exact Jaccard -> no false positives
        rows, truth = result
        found = {(r["url_a"], r["url_b"]) for r in rows}
        assert found <= truth

    def test_similarity_values_verified(self, result):
        rows, _ = result
        assert all(r["similarity"] >= CFG.threshold for r in rows)
        assert all(r["kind"] == "minhash" for r in rows)


class TestHotBandCapping:
    def test_capped_band_stays_connected_and_reports_drops(self, pages_ds):
        cfg = minhash.MinHashConfig(band_cap=5)
        pairs = minhash.candidate_pairs(pages_ds, cfg)
        tbl = pairs.take_all()
        dropped = sum(r["dropped"] for r in tbl)
        assert dropped > 0  # the 50-copy cluster exceeded the cap
        # ring emission keeps every capped component connected:
        uf = UnionFind()
        uf.add_edges((r["url_a"], r["url_b"]) for r in tbl)
        comp = uf.components()
        dup50 = [u for u in comp[uf.find("https://dup3.example/copy/0")]]
        assert len([u for u in dup50 if u.startswith("https://dup3.example/")]) == 50


class TestUnionFind:
    def test_basic(self):
        uf = UnionFind()
        uf.add_edges([("a", "b"), ("b", "c"), ("x", "y")])
        assert uf.find("a") == uf.find("c") != uf.find("x")
        labels = uf.labels()
        assert labels["c"] == "a" and labels["y"] == "x"

    def test_components_sorted(self):
        uf = UnionFind()
        uf.add_edges([("q", "p"), ("r", "q")])
        assert uf.components()[uf.find("p")] == ["p", "q", "r"]


class TestClustering:
    def test_assign_clusters_broadcast(self):
        ds = rd.from_arrow(
            pa.table({"url": ["a", "b", "c", "d"], "x": [1, 2, 3, 4]})
        )
        out = cluster.assign_clusters(ds, {"b": "a", "a": "a"})
        got = {r["url"]: r["cluster_id"] for r in out.take_all()}
        assert got == {"a": "a", "b": "a", "c": "c", "d": "d"}

    def test_distributed_matches_unionfind(self):
        edges = rd.from_arrow(
            pa.table(
                {
                    "url_a": ["a", "b", "x", "m"],
                    "url_b": ["b", "c", "y", "n"],
                }
            )
        )
        dist = {
            r["url"]: r["cluster_id"]
            for r in cluster.cluster_edges_distributed(edges).take_all()
        }
        uf = cluster.cluster_edges(edges)
        assert dist == uf
        assert dist["c"] == "a" and dist["y"] == "x" and dist["n"] == "m"

    def test_distributed_random_graph_matches_unionfind(self, ray_session):
        """Random multi-component graph incl. a long chain (multi-round
        propagation): distributed labels == driver union-find labels."""
        rng = np.random.default_rng(11)
        ua, ub = [], []
        # 30 random components of ~8 nodes
        for c in range(30):
            nodes = [f"n{c:02d}_{i}" for i in range(8)]
            for i in range(7):
                j = int(rng.integers(0, i + 1))
                ua.append(nodes[j]); ub.append(nodes[i + 1])
        # one 40-node chain => needs several propagation rounds
        chain = [f"chain{i:03d}" for i in range(40)]
        for i in range(39):
            ua.append(chain[i + 1]); ub.append(chain[i])
        edges = rd.from_arrow(pa.table({"url_a": ua, "url_b": ub}))
        dist = {
            r["url"]: r["cluster_id"]
            for r in cluster.cluster_edges_distributed(
                edges, num_buckets=8
            ).take_all()
        }
        assert dist == cluster.cluster_edges(edges)

    def test_distributed_raises_when_not_converged(self, ray_session):
        chain = [f"c{i:02d}" for i in range(20)]
        edges = rd.from_arrow(
            pa.table({"url_a": chain[:-1], "url_b": chain[1:]})
        )
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="did not converge"):
            cluster.cluster_edges_distributed(edges, max_rounds=2, num_buckets=4)


class TestScaleMode:
    def test_scale_mode_identical_edges(self, synth_corpus, ray_session):
        """scale_mode (distributed dedupe-in-join + two-pass hash-join
        verify, no driver data paths) must produce exactly the edges of
        the default configuration."""
        import ray.data as rd

        ds = rd.from_arrow(synth_corpus.pages.select(["url", "text"]))
        e1 = minhash.near_dup_edges(ds, minhash.MinHashConfig()).take_all()
        e2 = minhash.near_dup_edges(
            ds, minhash.MinHashConfig(scale_mode=True)
        ).take_all()
        s1 = {(r["url_a"], r["url_b"], round(r["similarity"], 9)) for r in e1}
        s2 = {(r["url_a"], r["url_b"], round(r["similarity"], 9)) for r in e2}
        assert s1 == s2 and len(e2) == len(s2)


class TestPairComplete:
    """ADVICE r1 (high): pair-complete contracts must emit the FULL
    clique even when an identical-text group exceeds band_cap."""

    def _identical_corpus(self, n: int):
        t = pa.table(
            {
                "url": [f"{i:012d}" for i in range(n)],
                "text": ["exactly the same document text here"] * n,
            }
        )
        return rd.from_arrow(t)

    def test_exact_mode_full_cliques_over_cap(self, ray_session):
        n = 80  # > default band_cap=64 -> ring would emit only 79 edges
        ds = self._identical_corpus(n)
        cfg = minhash.MinHashConfig(
            threshold=1.0, normalize=False, verify_mode="exact", num_buckets=8
        )
        edges = minhash.near_dup_edges(ds, cfg).take_all()
        pairs = {(r["url_a"], r["url_b"]) for r in edges}
        assert len(edges) == len(pairs) == n * (n - 1) // 2  # 3160
        assert all(r["similarity"] == 1.0 for r in edges)
        assert all(r["url_a"] < r["url_b"] for r in edges)

    def test_jaccard_threshold_one_full_cliques_over_cap(self, ray_session):
        n = 70
        ds = self._identical_corpus(n)
        cfg = minhash.MinHashConfig(threshold=1.0, band_cap=16, num_buckets=8)
        edges = minhash.near_dup_edges(ds, cfg).take_all()
        pairs = {(r["url_a"], r["url_b"]) for r in edges}
        assert len(edges) == len(pairs) == n * (n - 1) // 2

    def test_mixed_classes_in_hot_band_stay_separate(self, ray_session):
        """Two identical-text groups + uniques: cliques per group, no
        cross-group pairs, even with a tiny cap forcing rings."""
        na, nb = 30, 25
        urls = [f"a{i:04d}" for i in range(na)] + [f"b{i:04d}" for i in range(nb)]
        texts = ["group alpha text body repeated"] * na + [
            "group beta document content words"
        ] * nb
        ds = rd.from_arrow(pa.table({"url": urls, "text": texts}))
        cfg = minhash.MinHashConfig(
            threshold=1.0, normalize=False, verify_mode="exact",
            band_cap=4, num_buckets=8,
        )
        edges = minhash.near_dup_edges(ds, cfg).take_all()
        pairs = {(r["url_a"], r["url_b"]) for r in edges}
        assert len(pairs) == na * (na - 1) // 2 + nb * (nb - 1) // 2
        assert not any(a.startswith("a") and b.startswith("b") for a, b in pairs)

    def test_pair_complete_matches_oracle_on_synth(self, synth_corpus, ray_session):
        """Synth corpus (50-copy + skew clusters): exact-mode edges ==
        the identical-text self-join, pairwise complete."""
        pages = synth_corpus.pages.select(["url", "text"])
        ds = rd.from_arrow(pages)
        cfg = minhash.MinHashConfig(
            threshold=1.0, normalize=False, verify_mode="exact",
            band_cap=8, num_buckets=8,
        )
        edges = minhash.near_dup_edges(ds, cfg).take_all()
        got = {(r["url_a"], r["url_b"]) for r in edges}
        texts = pages["text"].to_pylist()
        urls = pages["url"].to_pylist()
        groups: dict[str, list[str]] = {}
        for u, t in zip(urls, texts):
            groups.setdefault(t, []).append(u)
        truth = set()
        for members in groups.values():
            members.sort()
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    truth.add((members[i], members[j]))
        assert got == truth


class TestAutoScaleMode:
    def test_auto_engages_distributed_path(self, synth_corpus, ray_session):
        """driver_verify_limit=10 forces the auto selector into the
        fully-distributed verify; edges must equal the driver regime's."""
        ds = rd.from_arrow(synth_corpus.pages.select(["url", "text"]))
        e_driver = minhash.near_dup_edges(
            ds, minhash.MinHashConfig(scale_mode=False)
        ).take_all()
        e_auto = minhash.near_dup_edges(
            ds, minhash.MinHashConfig(driver_verify_limit=10)
        ).take_all()
        s1 = {(r["url_a"], r["url_b"], round(r["similarity"], 9)) for r in e_driver}
        s2 = {(r["url_a"], r["url_b"], round(r["similarity"], 9)) for r in e_auto}
        assert s1 == s2 and len(e_auto) == len(s2)


class TestSaltedHotBands:
    def test_salted_clusters_match_unsalted(self, ray_session):
        """A mega-cluster of identical docs far above band_cap: salting
        must keep every doc in ONE connected component and retain at
        least the unsalted (ring) pair count."""
        import ray.data as rd

        n = 120
        urls = [f"u{i:04d}" for i in range(n)]
        texts = ["identical boilerplate page text here " * 3] * n
        extra = [(f"x{i}", f"unique document number {i} with words {i*7}") for i in range(40)]
        t = pa.table(
            {
                "url": urls + [u for u, _ in extra],
                "text": texts + [s for _, s in extra],
            }
        )
        ds = rd.from_arrow(t)
        cfg_ring = minhash.MinHashConfig(band_cap=16, num_buckets=8)
        cfg_salt = minhash.MinHashConfig(
            band_cap=16, num_buckets=8, salt_hot_bands=True, n_salts=4
        )
        ring_pairs = minhash.collect_table(
            minhash.candidate_pairs(ds, cfg_ring), minhash.PAIRS_SCHEMA
        )
        salt_pairs = minhash.collect_table(
            minhash.candidate_pairs(ds, cfg_salt), minhash.PAIRS_SCHEMA
        )
        assert salt_pairs.num_rows >= ring_pairs.num_rows

        from doppel_ray.state.unionfind import UnionFind

        uf = UnionFind()
        for a, b in zip(
            salt_pairs["url_a"].to_pylist(), salt_pairs["url_b"].to_pylist()
        ):
            uf.union(a, b)
        roots = {uf.find(u) for u in urls}
        assert len(roots) == 1, "salting broke mega-band connectivity"
        # no rep marker rows leak into the pair output
        assert all(d >= 0 for d in salt_pairs["dropped"].to_pylist())

    def test_salted_edges_equal_default_edges(self, synth_corpus, ray_session):
        """On the synth corpus (includes boilerplate skew docs), the full
        near-dup pipeline yields identical verified edges with salting."""
        import ray.data as rd

        ds = rd.from_arrow(synth_corpus.pages.select(["url", "text"]))
        e1 = minhash.near_dup_edges(
            ds, minhash.MinHashConfig(band_cap=1 << 30)
        ).take_all()
        e2 = minhash.near_dup_edges(
            ds,
            minhash.MinHashConfig(
                band_cap=8, salt_hot_bands=True, n_salts=4
            ),
        ).take_all()
        s1 = {(r["url_a"], r["url_b"]) for r in e1}
        s2 = {(r["url_a"], r["url_b"]) for r in e2}
        # salting retains all unsalted-uncapped pairs within subgroups or
        # recovers them transitively; verified edge set must cluster the
        # same docs — compare connected components
        from doppel_ray.state.unionfind import UnionFind

        def comps(pairs):
            uf = UnionFind()
            for a, b in pairs:
                uf.union(a, b)
            lbl = uf.labels()
            groups = {}
            for u, c in lbl.items():
                groups.setdefault(c, set()).add(u)
            return {frozenset(g) for g in groups.values()}

        assert comps(s1) == comps(s2)


class TestDupFractionGate:
    """VERDICT r2 #1: prune_exact is gated on a measured dup fraction
    (KMV distinct sketch) so unique-heavy corpora skip the class-resolve
    shuffle + anti-join entirely."""

    def _keyed(self, n_unique: int, n_dup: int):
        rng = np.random.default_rng(7)
        # KMV assumes keys uniform over the FULL uint64 range (sip64's
        # codomain) — draw uint64 and view as int64 like the real eq_key
        uniq = rng.integers(0, 2**64, size=n_unique, dtype=np.uint64).view(
            np.int64
        )
        dup = np.repeat(uniq[: max(1, n_dup // 4)], 4)[:n_dup]
        keys = np.concatenate([uniq, dup])
        t = pa.table(
            {
                "url": [f"u{i}" for i in range(len(keys))],
                "eq_key": pa.array(keys, type=pa.int64()),
            }
        )
        return rd.from_arrow(t), 1.0 - n_unique / len(keys)

    def test_estimate_accuracy(self, ray_session):
        for n_unique, n_dup in [(20000, 0), (15000, 5000), (10000, 10000)]:
            keyed, truth = self._keyed(n_unique, n_dup)
            est = minhash._dup_fraction_estimate(keyed)
            assert abs(est - truth) < 0.05, (n_unique, n_dup, est, truth)

    def test_unique_corpus_skips_prune(self, ray_session):
        t = pa.table(
            {
                "url": [f"u{i:05d}" for i in range(500)],
                "text": [f"totally unique document number {i} about topic {i * 13}" for i in range(500)],
            }
        )
        pruned, members = minhash._prune_exact_classes(
            rd.from_arrow(t), minhash.MinHashConfig()
        )
        assert members is None
        assert pruned.count() == 500

    def test_gate_on_vs_off_identical_edges(self, synth_corpus, ray_session):
        """Forcing the prune on (gate 0.0) and off (prune_exact=False)
        must both yield the auto-gated configuration's edge set."""
        ds = rd.from_arrow(synth_corpus.pages.select(["url", "text"]))
        edge_sets = []
        for cfg in (
            minhash.MinHashConfig(prune_min_dup_fraction=0.0),
            minhash.MinHashConfig(prune_exact=False),
            minhash.MinHashConfig(),
        ):
            edges = minhash.near_dup_edges(ds, cfg).take_all()
            edge_sets.append(
                {(r["url_a"], r["url_b"], round(r["similarity"], 9)) for r in edges}
            )
        assert edge_sets[0] == edge_sets[1] == edge_sets[2]


class TestDistributedCliqueExpansion:
    """VERDICT r2 #8 / ADVICE r2 medium: above clique_driver_edge_limit,
    pair-complete expansion runs on distributed labels (no driver
    union-find); pruned classes fold in as star edges, never as a
    driver-collected quadratic pair stream."""

    def test_distributed_path_full_clique_over_cap(self, ray_session):
        n = 80
        t = pa.table(
            {
                "url": [f"{i:012d}" for i in range(n)],
                "text": ["exactly the same document text here"] * n,
            }
        )
        ds = rd.from_arrow(t)
        cfg = minhash.MinHashConfig(
            threshold=1.0, normalize=False, verify_mode="exact",
            num_buckets=8, clique_driver_edge_limit=0,
        )
        edges = minhash.near_dup_edges(ds, cfg).take_all()
        pairs = {(r["url_a"], r["url_b"]) for r in edges}
        assert len(edges) == len(pairs) == n * (n - 1) // 2
        assert all(r["url_a"] < r["url_b"] for r in edges)
        assert all(r["similarity"] == 1.0 for r in edges)

    def test_distributed_path_matches_driver_path(self, ray_session):
        na, nb = 30, 25
        urls = [f"a{i:04d}" for i in range(na)] + [f"b{i:04d}" for i in range(nb)]
        texts = ["group alpha text body repeated"] * na + [
            "group beta document content words"
        ] * nb
        ds = rd.from_arrow(pa.table({"url": urls, "text": texts}))
        base = dict(
            threshold=1.0, normalize=False, verify_mode="exact",
            band_cap=4, num_buckets=8,
        )
        e_driver = minhash.near_dup_edges(
            ds, minhash.MinHashConfig(**base)
        ).take_all()
        e_dist = minhash.near_dup_edges(
            ds, minhash.MinHashConfig(**base, clique_driver_edge_limit=0)
        ).take_all()
        s1 = {(r["url_a"], r["url_b"]) for r in e_driver}
        s2 = {(r["url_a"], r["url_b"]) for r in e_dist}
        assert s1 == s2
        assert len(e_dist) == len(s2)

    def test_distributed_path_in_scale_mode(self, synth_corpus, ray_session):
        """scale_mode=True + distributed cliques: zero driver data paths
        end to end, edges equal the driver regime's."""
        pages = synth_corpus.pages.select(["url", "text"])
        ds = rd.from_arrow(pages)
        base = dict(
            threshold=1.0, normalize=False, verify_mode="exact",
            band_cap=8, num_buckets=8,
        )
        e_ref = minhash.near_dup_edges(
            ds, minhash.MinHashConfig(**base)
        ).take_all()
        e_dist = minhash.near_dup_edges(
            ds,
            minhash.MinHashConfig(
                **base, scale_mode=True, clique_driver_edge_limit=0
            ),
        ).take_all()
        assert {(r["url_a"], r["url_b"]) for r in e_ref} == {
            (r["url_a"], r["url_b"]) for r in e_dist
        }


class TestDedupeCollectRegime:
    def test_forced_shuffle_dedupe_identical_edges(self, synth_corpus, ray_session):
        """dedupe_collect_limit=0 forces the bucketed dedupe shuffle
        before the driver collect; edges must be unchanged."""
        ds = rd.from_arrow(synth_corpus.pages.select(["url", "text"]))
        e1 = minhash.near_dup_edges(ds, minhash.MinHashConfig()).take_all()
        e2 = minhash.near_dup_edges(
            ds, minhash.MinHashConfig(dedupe_collect_limit=0)
        ).take_all()
        s1 = {(r["url_a"], r["url_b"], round(r["similarity"], 9)) for r in e1}
        s2 = {(r["url_a"], r["url_b"], round(r["similarity"], 9)) for r in e2}
        assert s1 == s2 and len(e2) == len(s2)


class TestBandTuner:
    def test_s_curve_matches_monte_carlo(self):
        """1-(1-s^r)^b vs direct simulation of banded-collision events."""
        rng = np.random.default_rng(3)
        b, r, s = 8, 4, 0.7
        trials = 20000
        # each of b*r rows agrees independently with prob s
        agree = rng.random((trials, b, r)) < s
        hit = agree.all(axis=2).any(axis=1).mean()
        assert abs(minhash.lsh_candidate_probability(s, b, r) - hit) < 0.01

    def test_default_config_is_tuned_for_its_threshold(self):
        # the repo default (128 perms, tau=0.8) should be what the tuner
        # picks — 32 bands x 4 rows
        assert minhash.tune_bands(0.8, 128) == (32, 4)

    def test_higher_threshold_prefers_longer_rows(self):
        b_lo, r_lo = minhash.tune_bands(0.5, 128)
        b_hi, r_hi = minhash.tune_bands(0.95, 128)
        assert r_hi >= r_lo and b_hi <= b_lo

    def test_recall_floor_met_and_product_exact(self):
        for t in (0.3, 0.6, 0.8, 0.9):
            b, r = minhash.tune_bands(t, 256)
            assert b * r == 256
            assert minhash.lsh_candidate_probability(t, b, r) >= 0.99

    def test_fallback_when_floor_unreachable(self):
        # num_perm=2 can't hit 0.99 recall at tau=0.9: falls back to the
        # highest-recall split instead of failing
        b, r = minhash.tune_bands(0.9, 2, min_recall=0.99)
        assert b * r == 2

    def test_validation(self):
        with pytest.raises(ValueError):
            minhash.tune_bands(1.0, 128)
        with pytest.raises(ValueError):
            minhash.tune_bands(0.8, 1)

    def test_tuned_config_constructor(self):
        cfg = minhash.MinHashConfig.tuned(0.8, 128, band_cap=32)
        assert (cfg.bands, cfg.rows_per_band) == (32, 4)
        assert cfg.threshold == 0.8 and cfg.band_cap == 32
        cfg9 = minhash.MinHashConfig.tuned(0.9, 128)
        assert cfg9.bands * cfg9.rows_per_band == 128
