"""Exact-dedup cascade tests, mirroring the reference's canonical duplicate
fixtures (reference internal/finder/finder_test.go:17-182): 3 copies of A +
2 copies of B + 1 unique => exactly 2 groups with counts {3,2}; edge cases
no-dups/all-dups/single/empty; plus the brute-force oracle over the full
synthetic corpus. Conformance = set-of-sets group membership, never group
ids or order (finder_test.go:91-131; SURVEY.md G4)."""

from __future__ import annotations

import collections

import pyarrow as pa
import pytest
import ray.data as rd

from doppel_ray.stages import exact


def _pages(texts: list[str]) -> rd.Dataset:
    n = len(texts)
    return rd.from_arrow(
        pa.table(
            {
                "url": [f"u://{i}" for i in range(n)],
                "text": pa.array(texts, type=pa.large_string()),
            }
        )
    )


def _memberships(groups: list[dict]) -> set[frozenset]:
    return {frozenset(g["files"]) for g in groups}


class TestCanonicalFixture:
    # reference finder_test.go:33-73 shape
    TEXTS = ["AAAA", "AAAA", "AAAA", "BB", "BB", "unique content"]

    def test_two_groups(self):
        groups = exact.exact_duplicate_groups(_pages(self.TEXTS)).take_all()
        assert sorted(g["count"] for g in groups) == [2, 3]
        ms = _memberships(groups)
        assert frozenset({"u://0", "u://1", "u://2"}) in ms
        assert frozenset({"u://3", "u://4"}) in ms

    def test_group_fields(self):
        groups = exact.exact_duplicate_groups(_pages(self.TEXTS)).take_all()
        g3 = next(g for g in groups if g["count"] == 3)
        assert g3["group_id"] == "u://0"  # min url, stable
        assert g3["size"] == 4
        assert g3["wasted_space"] == 8  # size*(count-1), finder.go:127-130
        assert g3["files"] == ["u://0", "u://1", "u://2"]

    def test_no_duplicates(self):
        groups = exact.exact_duplicate_groups(_pages(["a", "b", "c"])).take_all()
        assert groups == []

    def test_all_duplicates(self):
        groups = exact.exact_duplicate_groups(_pages(["z"] * 4)).take_all()
        assert len(groups) == 1 and groups[0]["count"] == 4

    def test_single_row(self):
        assert exact.exact_duplicate_groups(_pages(["only"])).take_all() == []

    def test_same_size_different_content(self):
        # same length => survives size prune, separated by hashes
        groups = exact.exact_duplicate_groups(_pages(["abcd", "wxyz"])).take_all()
        assert groups == []

    def test_empty_texts_group_together(self):
        # size<=0 => quick hash 0 (hasher.go:47-49); still grouped as dups
        groups = exact.exact_duplicate_groups(_pages(["", "", "x"])).take_all()
        assert len(groups) == 1
        assert groups[0]["count"] == 2 and groups[0]["size"] == 0


class TestAgainstOracle:
    def test_matches_bruteforce_on_synth_corpus(self, synth_corpus, pages_ds):
        # oracle: group rows by exact text bytes
        by_text = collections.defaultdict(list)
        urls = synth_corpus.pages["url"].to_pylist()
        texts = synth_corpus.pages["text"].to_pylist()
        for u, t in zip(urls, texts):
            by_text[t].append(u)
        want = {frozenset(v) for v in by_text.values() if len(v) > 1}

        groups = exact.exact_duplicate_groups(pages_ds).take_all()
        assert _memberships(groups) == want
        # planted cluster sizes all present (FIXTURES.md: {2,3,5,50}+skew)
        counts = sorted(g["count"] for g in groups)
        for planted in (2, 3, 5, 50):
            assert planted in counts

    def test_cascade_equals_no_cascade(self, pages_ds):
        a = exact.exact_duplicate_groups(pages_ds, cascade=True).take_all()
        b = exact.exact_duplicate_groups(pages_ds, cascade=False).take_all()
        assert _memberships(a) == _memberships(b)

    def test_determinism_two_runs(self, pages_ds):
        a = exact.exact_duplicate_groups(pages_ds).take_all()
        b = exact.exact_duplicate_groups(pages_ds).take_all()
        key = lambda g: g["group_id"]
        assert sorted(a, key=key) == sorted(b, key=key)


class TestKeepFirst:
    def test_keeps_min_id_per_text(self):
        ds = _pages(["a", "b", "a", "a", "c"])
        kept = sorted(r["url"] for r in exact.dedup_keep_first(ds).take_all())
        assert kept == ["u://0", "u://1", "u://4"]


class TestTextPassThrough:
    def test_text_byte_identity(self, synth_corpus, pages_ds):
        """North-rule invariant: text passes through the hash stages
        byte-identical per url (no unicode/pandas round-trip damage)."""
        from doppel_ray.stages import hashes

        ds = hashes.add_content_hash(
            hashes.add_quick_hash(hashes.add_size(pages_ds))
        )
        out = {r["url"]: r["text"] for r in ds.select_columns(["url", "text"]).take_all()}
        want = dict(
            zip(
                synth_corpus.pages["url"].to_pylist(),
                synth_corpus.pages["text"].to_pylist(),
            )
        )
        assert out == want


class TestFromArrowBlocks:
    def test_slices_and_small_table_passthrough(self, ray_session):
        import pyarrow as pa

        from doppel_ray.stages.util import from_arrow_blocks

        big = pa.table({"x": list(range(5000))})
        ds = from_arrow_blocks(big, 4)
        assert ds.num_blocks() == 4
        assert sorted(r["x"] for r in ds.take_all()) == list(range(5000))
        small = pa.table({"x": list(range(10))})
        assert from_arrow_blocks(small, 64).num_blocks() == 1
        empty = pa.table({"x": pa.array([], type=pa.int64())})
        assert from_arrow_blocks(empty, 8).count() == 0


def test_normalized_dedup_collapses_case_and_ws(ray_session):
    """Non-vacuous gate for the normalized_dedup query semantics: case,
    whitespace-run and edge-space variants of one text form ONE group."""
    import duckdb
    import ray.data as rd

    from doppel_ray.functions.text import normalize_texts
    from doppel_ray.stages import exact as X

    texts = [
        "The Quick  Brown fox",
        "the quick brown fox",          # case + ws-run variant
        "  the QUICK brown fox \n",     # edge-space + case variant
        "a different document",
        "A  DIFFERENT document",        # variant of the second group
        "and a singleton",
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )

    def norm(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text": pa.array(
                    normalize_texts(batch["text"]), type=pa.large_string()
                ),
            }
        )

    got = sorted(
        r["doc_id"]
        for r in X.dedup_keep_first(
            ds.map_batches(norm, batch_format="pyarrow"), id_col="doc_id"
        ).take_all()
    )
    con = duckdb.connect()
    con.register("docs", pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}))
    want = sorted(
        r[0]
        for r in con.execute(
            r"SELECT min(doc_id) FROM docs GROUP BY trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
        ).fetchall()
    )
    assert got == want == [0, 3, 5]


def test_normalize_matches_duckdb_on_unicode_ws():
    """normalize_texts must reproduce the oracle expression
    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) exactly,
    including NBSP (RE2 \\s is ASCII-only) — regression for the
    normalized_dedup / minhash-shingle oracle parity."""
    import duckdb

    from doppel_ray.functions.text import normalize_texts

    samples = ["Foo\xa0Bar", "  A  B  ", "x\ty\nz", "\va b"]
    ours = list(normalize_texts(pa.array(samples)))
    con = duckdb.connect()
    theirs = [
        con.execute(
            r"SELECT trim(regexp_replace(lower(?), '\s+', ' ', 'g'))", [s]
        ).fetchone()[0]
        for s in samples
    ]
    assert ours == theirs


class TestSemiFilterSearchsorted:
    """The large-int-set semi_filter regime (broadcast sorted array +
    np.searchsorted per batch) must agree exactly with the pc.is_in
    regime, both directions."""

    def _ds(self):
        import numpy as np

        rng = np.random.default_rng(7)
        keys = rng.integers(0, 10_000, size=5_000).astype("int64")
        return (
            rd.from_arrow(
                pa.table({"k": keys, "row": np.arange(len(keys))})
            ).repartition(8),
            keys,
        )

    @pytest.mark.parametrize("invert", [False, True])
    def test_matches_is_in_regime(self, ray_session, monkeypatch, invert):
        import numpy as np

        ds, keys = self._ds()
        vals = pa.array(
            np.unique(keys[: len(keys) // 3]), type=pa.int64()
        )
        want = sorted(
            r["row"]
            for r in exact.semi_filter(
                ds, "k", vals, invert=invert
            ).take_all()
        )
        monkeypatch.setattr(exact, "_SEARCHSORTED_LIMIT", 10)
        got = sorted(
            r["row"]
            for r in exact.semi_filter(
                ds, "k", vals, invert=invert
            ).take_all()
        )
        assert got == want
        # sanity: the searchsorted regime actually ran (limit exceeded)
        assert len(vals) > 10

    def test_no_match_values(self, ray_session, monkeypatch):
        ds, _ = self._ds()
        monkeypatch.setattr(exact, "_SEARCHSORTED_LIMIT", 2)
        vals = pa.array([10**9, 10**9 + 1, 10**9 + 2], type=pa.int64())
        assert exact.semi_filter(ds, "k", vals).count() == 0
        assert exact.semi_filter(ds, "k", vals, invert=True).count() == 5000


def test_cluster_edges_vectorized_matches_unionfind(ray_session):
    """The numpy hook-and-compress cluster_edges must label every node
    with the lexicographic-min url of its component — pinned against
    the original driver UnionFind on a random multi-component graph."""
    import numpy as np

    from doppel_ray.stages.cluster import cluster_edges
    from doppel_ray.state.unionfind import UnionFind

    rng = np.random.default_rng(3)
    ua, ub = [], []
    for c in range(50):
        nodes = [f"n{rng.integers(0, 10**6):06d}_{c}_{i}" for i in range(12)]
        for i in range(11):
            j = int(rng.integers(0, i + 1))
            ua.append(nodes[j]); ub.append(nodes[i + 1])
    # long chain forces many compress rounds; duplicate + self edges
    chain = [f"ch{i:04d}" for i in range(200)]
    ua += chain[:-1] + ["ch0000", "n_self"]
    ub += chain[1:] + ["ch0001", "n_self"]
    t = pa.table({"url_a": ua, "url_b": ub})
    uf = UnionFind()
    uf.add_edges(zip(ua, ub))
    assert cluster_edges(t) == uf.labels()
    assert cluster_edges(rd.from_arrow(t).repartition(6)) == uf.labels()


def test_cluster_edges_empty(ray_session):
    from doppel_ray.stages.cluster import cluster_edges

    assert cluster_edges(pa.table({"url_a": pa.array([], pa.string()), "url_b": pa.array([], pa.string())})) == {}
