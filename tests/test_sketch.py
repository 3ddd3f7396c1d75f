"""HyperLogLog sketch: estimation accuracy, merge laws, distributed
stage agreement with the exact distinct count."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from doppel_ray.functions import sketch as SK


class TestHLLKernel:
    def test_accuracy_across_cardinalities(self):
        for n in [100, 5_000, 100_000]:
            reg = SK.empty_registers(14)
            SK.add_values(reg, [f"value-{i}" for i in range(n)])
            est = SK.estimate(reg)
            # p=14 -> sigma ~ 1.04/sqrt(2^14) ~ 0.81%; allow 4 sigma
            assert abs(est - n) / n < 0.033, (n, est)

    def test_duplicates_do_not_inflate(self):
        reg = SK.empty_registers(14)
        vals = [f"v{i % 500}" for i in range(50_000)]
        SK.add_values(reg, vals)
        est = SK.estimate(reg)
        assert abs(est - 500) / 500 < 0.05

    def test_merge_equals_union_and_is_commutative(self):
        a = SK.empty_registers(14)
        b = SK.empty_registers(14)
        SK.add_values(a, [f"a{i}" for i in range(3000)])
        SK.add_values(b, [f"b{i}" for i in range(4000)])
        both = SK.empty_registers(14)
        SK.add_values(both, [f"a{i}" for i in range(3000)])
        SK.add_values(both, [f"b{i}" for i in range(4000)])
        m1 = SK.merge(a.copy(), b)
        m2 = SK.merge(b.copy(), a)
        assert (m1 == m2).all()
        assert (m1 == both).all()  # merge == single-sketch union, exactly

    def test_empty_and_bad_p(self):
        assert SK.estimate(SK.empty_registers(14)) == 0.0
        with pytest.raises(ValueError):
            SK.empty_registers(8)


class TestApproxDistinctStage:
    def test_agrees_with_exact(self, ray_session):
        import ray.data as rd

        from doppel_ray.stages.hashes import approx_distinct

        texts = [f"doc {i % 2000} body" for i in range(20_000)]
        ds = rd.from_arrow(pa.table({"text": pa.array(texts)})).repartition(8)
        est = approx_distinct(ds, "text")
        assert abs(est - 2000) / 2000 < 0.05

    def test_block_layout_invariance(self, ray_session):
        import ray.data as rd

        from doppel_ray.stages.hashes import approx_distinct

        t = pa.table({"text": pa.array([f"x{i}" for i in range(5000)])})
        e1 = approx_distinct(rd.from_arrow(t), "text")
        e4 = approx_distinct(rd.from_arrow(t).repartition(16), "text")
        assert e1 == e4  # register max-merge is layout-independent


class TestBloomFilter:
    def test_no_false_negatives_and_fp_rate(self):
        keys = [f"key-{i}" for i in range(50_000)]
        bf = SK.BloomFilter(len(keys), bits_per_key=10)
        bf.add_values(keys)
        assert bf.contains_values(keys).all()  # members ALWAYS hit
        probe = [f"other-{i}" for i in range(50_000)]
        fp = bf.contains_values(probe).mean()
        assert fp < 0.03  # theory ~1% at 10 bits/key, k=7

    def test_int_keys(self):
        import pandas as pd

        keys = pd.Series(np.arange(10_000, dtype=np.int64) * 7919)
        bf = SK.BloomFilter(len(keys))
        bf.add_values(keys)
        assert bf.contains_values(keys).all()


class TestBloomPrunePath:
    def test_bloom_prune_equals_exact_groups(self, ray_session, monkeypatch):
        """Force the Bloom regime: final duplicate groups must be
        IDENTICAL to the exact-broadcast path (FPs are re-verified by
        the group emission)."""
        import ray.data as rd

        from doppel_ray.stages import exact

        texts = [f"unique doc {i}" for i in range(500)]
        for i in range(0, 60, 3):
            texts[i] = f"dup body {i % 5}"  # 5 groups of 4
        t = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        )

        def groups():
            ds = rd.from_arrow(t).repartition(8)
            out = exact.exact_duplicate_groups(ds, id_col="doc_id").take_all()
            return sorted(
                (r["group_id"], r["count"], tuple(sorted(r["files"])))
                for r in out
            )

        want = groups()
        assert len(want) == 5  # fixture is live
        monkeypatch.setattr(exact, "BLOOM_KEY_LIMIT", 0)
        assert groups() == want

    def test_allow_bloom_false_forces_exact_semi(self, ray_session, monkeypatch):
        """Terminal consumers (exact_dup_media) must get the exact
        semi-join even past BLOOM_KEY_LIMIT — allow_bloom=False routes
        around the Bloom regime entirely (ADVICE r3 medium)."""
        import ray.data as rd

        from doppel_ray.stages import exact

        called = {"bloom": 0}
        real_bloom = exact.bloom_semi_filter

        def spy(ds, key, values):
            called["bloom"] += 1
            return real_bloom(ds, key, values)

        monkeypatch.setattr(exact, "bloom_semi_filter", spy)
        monkeypatch.setattr(exact, "BLOOM_KEY_LIMIT", 0)

        t = pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "k": pa.array(["a", "a", "b", "b", "c", "d"]),
            }
        )
        ds = rd.from_arrow(t).repartition(3)
        rows = exact.prune_singletons(ds, "k", allow_bloom=False).take_all()
        assert called["bloom"] == 0
        assert sorted(r["doc_id"] for r in rows) == [0, 1, 2, 3]
        # default path still takes the Bloom regime past the limit
        ds2 = rd.from_arrow(t).repartition(3)
        rows2 = exact.prune_singletons(ds2, "k").take_all()
        assert called["bloom"] == 1
        assert {r["doc_id"] for r in rows2} >= {0, 1, 2, 3}

    def test_exact_dup_media_terminal_no_bloom(self, ray_session, monkeypatch):
        """exact_dup_media is terminal: with BLOOM_KEY_LIMIT forced to 0
        its output must still be exactly the duplicated-payload rows."""
        import ray.data as rd

        from doppel_ray.stages import exact, multimodal as M

        monkeypatch.setattr(exact, "BLOOM_KEY_LIMIT", 0)
        payloads = [b"img-%d" % i for i in range(20)]
        payloads[3] = payloads[7] = b"same-bytes"
        t = pa.table(
            {
                "media_id": pa.array(range(20), pa.int64()),
                "image": pa.array(payloads, pa.large_binary()),
            }
        )
        rows = M.exact_dup_media(rd.from_arrow(t).repartition(4)).take_all()
        assert sorted(r["media_id"] for r in rows) == [3, 7]


class TestBottomKSample:
    """Mergeable bottom-k row sample (quantile sketch)."""

    def test_quantile_accuracy(self):
        rng = np.random.default_rng(17)
        n = 200_000
        vals = rng.gamma(2.0, 50.0, n)
        ids = np.arange(n)
        import pandas as pd

        from doppel_ray.functions.hashing import sip64

        h = sip64(pd.Series(ids).astype(str))
        s = SK.BottomKSample(4096).add(h, vals)
        sv = np.sort(vals)
        import math

        for p in (0.1, 0.5, 0.9, 0.99):
            est = s.quantile(p)
            achieved = (vals <= est).sum() / n
            assert abs(achieved - p) < 0.03, (p, achieved)

    def test_merge_equals_whole_and_layout_invariance(self):
        rng = np.random.default_rng(23)
        n = 50_000
        vals = rng.normal(0, 1, n)
        import pandas as pd

        from doppel_ray.functions.hashing import sip64

        h = sip64(pd.Series(np.arange(n)).astype(str))
        whole = SK.BottomKSample(512).add(h, vals)
        # merge of arbitrary disjoint splits == whole, any order
        for seed in (1, 2):
            perm = np.random.default_rng(seed).permutation(n)
            parts = np.array_split(perm, 7)
            m = SK.BottomKSample(512)
            for idx in parts:
                m = m.merge(SK.BottomKSample(512).add(h[idx], vals[idx]))
            assert np.array_equal(
                np.sort(m.hashes), np.sort(whole.hashes)
            )
            assert np.array_equal(np.sort(m.values), np.sort(whole.values))

    def test_serialization_roundtrip_and_validation(self):
        rng = np.random.default_rng(9)
        import pandas as pd

        from doppel_ray.functions.hashing import sip64

        h = sip64(pd.Series(range(100)).astype(str))
        s = SK.BottomKSample(64).add(h, rng.normal(0, 1, 100))
        r = SK.BottomKSample.from_bytes(s.to_bytes(), 64)
        assert np.array_equal(np.sort(r.hashes), np.sort(s.hashes))
        with pytest.raises(ValueError):
            SK.BottomKSample(4)
        with pytest.raises(ValueError):
            SK.BottomKSample(64).quantile(0.5)

    def test_distributed_approx_quantiles(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from doppel_ray.stages.hashes import approx_quantiles

        rng = np.random.default_rng(31)
        n = 30_000
        df = pd.DataFrame(
            {"id": np.arange(n), "v": rng.integers(0, 1000, n).astype(np.int64)}
        )
        est = approx_quantiles(
            rd.from_pandas(df).repartition(9), "v", "id", [0.5, 0.9]
        )
        sv = np.sort(df.v.to_numpy())
        for p, e in est:
            achieved = (df.v <= e).sum() / n
            assert abs(achieved - p) < 0.04, (p, achieved)
        # layout invariance: different block count, identical estimates
        est2 = approx_quantiles(
            rd.from_pandas(df).repartition(3), "v", "id", [0.5, 0.9]
        )
        assert est == est2


class TestGroupedApproxDistinct:
    def test_accuracy_and_layout_invariance(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from doppel_ray.stages.hashes import grouped_approx_distinct

        rng = np.random.default_rng(7)
        # three groups with very different value cardinalities
        rows = []
        for g, card in (("a", 50), ("b", 2000), ("c", 12000)):
            vals = rng.integers(0, card, card * 3)
            rows += [{"g": g, "v": f"{g}-{int(v)}"} for v in vals]
        df = pd.DataFrame(rows)
        exact = df.groupby("g")["v"].nunique()
        outs = []
        for p_ in (1, 9):
            got = (
                grouped_approx_distinct(
                    rd.from_pandas(df).repartition(p_), "g", "v", p=12
                )
                .to_pandas()
                .sort_values("g", ignore_index=True)
            )
            outs.append(got)
            for _, r in got.iterrows():
                assert abs(r.approx_distinct - exact[r.g]) <= 0.05 * exact[r.g]
        # deterministic: register folds are md5-based, merge is max
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_validation(self, ray_session):
        import pandas as pd
        import pytest as _pytest
        import ray.data as rd

        from doppel_ray.stages.hashes import grouped_approx_distinct

        df = pd.DataFrame({"g": ["a"], "v": ["x"]})
        with _pytest.raises(ValueError):
            grouped_approx_distinct(rd.from_pandas(df), "g", "v", p=2)
