"""Text-analysis tests: Arrow/DuckDB RE2 count agreement (the oracle
contract), quality features, language-ID accuracy on labeled fixtures,
and fingerprint invariants."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from doppel_ray.functions import analysis as A
from doppel_ray.stages import textstats

SAMPLES = [
    "The cat and the dog sat on the mat.",
    "",
    "   ",
    "one",
    "héllo wörld! ça va? 100% sûr...",
    "a b  c\td\ne",
    "!!! ??? ...",
    "x" * 500,
]


class TestTokenCounts:
    def test_matches_duckdb_re2(self):
        """The exact patterns shipped to the SQL oracles must count
        identically in DuckDB on arbitrary unicode input."""
        con = duckdb.connect()
        arr = pa.array(SAMPLES)
        for pattern in (A.WS_TOKEN_RE, A.BPE_TOKEN_RE, A.PUNCT_RE):
            ours = A.token_counts(arr, pattern).tolist()
            theirs = [
                con.execute(
                    "SELECT length(regexp_extract_all(?, ?))", [s, pattern]
                ).fetchone()[0]
                for s in SAMPLES
            ]
            assert ours == theirs, pattern

    def test_basic_counts(self):
        arr = pa.array(["a b  c", "", "one two three four"])
        assert A.token_counts(arr).tolist() == [3, 0, 4]


class TestQuality:
    def test_features_shapes_and_ranges(self):
        arr = pa.array(SAMPLES)
        f = A.quality_features(arr)
        n = len(SAMPLES)
        for k, v in f.items():
            assert len(v) == n, k
        assert (f["punct_ratio"] >= 0).all() and (f["punct_ratio"] <= 1).all()
        assert f["n_tokens"][1] == 0 and f["punct_ratio"][1] == 0.0
        q = A.quality_score(f)
        assert ((q >= 0) & (q <= 1)).all()

    def test_score_orders_sensibly(self):
        good = "the quick brown fox jumps over the lazy dog " * 10
        junk = "!@# $%^ &*( )!@ #$% " * 10
        q = A.quality_score(A.quality_features(pa.array([good, junk])))
        assert q[0] > q[1]

    def test_stopword_counts(self):
        arr = pa.array(["the The THE a an", "zero matches present?", "it was not"])
        got = A.stopword_counts(arr)
        assert got.tolist() == [5, 0, 3]


class TestLangID:
    def test_labeled_fixture_accuracy(self):
        fixtures = {
            "en": "The cat and the dog sat on the mat with a hat for it was warm.",
            "de": "Der Hund und die Katze sind nicht mit der Maus zu dem Haus.",
            "fr": "Le chat et le chien sont dans la maison avec une souris pour le fromage.",
            "es": "El perro y el gato están en la casa con un ratón para el queso.",
            "it": "Il cane e il gatto sono nella casa con un topo per il formaggio e non si sa.",
            "pt": "O cachorro e o gato estão em uma casa com um rato para o queijo e mais.",
            "nl": "De hond en de kat zijn in het huis met een muis voor de kaas en ik ben je.",
            "zh": "你好世界这是一个测试文档中文内容很多",
            "ru": "Привет мир это тестовый документ на русском языке",
        }
        pred = A.lang_id(pa.array(list(fixtures.values())))
        assert list(pred) == list(fixtures.keys())

    def test_garbage_is_und(self):
        pred = A.lang_id(pa.array(["zzz qqq xxx www", ""]))
        assert list(pred) == ["und", "und"]


class TestFingerprints:
    def test_identical_texts_share_fingerprint(self):
        arr = pa.array(["some document text here"] * 2 + ["different entirely!"])
        fp = A.doc_fingerprints(arr)
        assert fp[0] == fp[1]
        assert fp[0] != fp[2]

    def test_contained_doc_fp_among_container_windows(self):
        from doppel_ray.functions import suffix as S

        inner = "a distinctive inner fragment of reasonable length"
        outer = "prefix material " + inner + " suffix material"
        fp = A.doc_fingerprints(pa.array([inner]))
        wh = S.window_hashes(outer.encode(), 16)
        assert fp[0] in wh

    def test_short_and_empty_docs(self):
        fp = A.doc_fingerprints(pa.array(["", "ab", "ab"]))
        assert fp[1] == fp[2]


class TestStages:
    def test_add_quality_columns(self, ray_session):
        ds = rd.from_arrow(pa.table({"url": ["a", "b"], "text": ["hi there", ""]}))
        out = textstats.add_quality_columns(ds).take_all()
        assert {"n_chars", "quality", "stopword_ratio"} <= set(out[0].keys())

    def test_add_lang_id_and_fingerprints(self, ray_session):
        ds = rd.from_arrow(
            pa.table({"url": ["a"], "text": ["the cat and the dog sat for it"]})
        )
        out = textstats.add_fingerprints(textstats.add_lang_id(ds)).take_all()
        assert out[0]["lang_pred"] == "en"
        assert isinstance(out[0]["fingerprint"], int)


class TestRepetitionFeatures:
    def _brute(self, text, n=2):
        import re
        from collections import Counter

        tk = re.findall(r"\S+", text)
        grams = [tuple(tk[i : i + n]) for i in range(len(tk) - n + 1)]
        if not grams:
            return None
        c = Counter(grams)
        tot = len(grams)
        return (
            sum(v for v in c.values() if v > 1) / tot,
            max(c.values()) / tot,
        )

    def test_matches_bruteforce(self):
        texts = [
            "a b a b c",
            "q q q q",
            "all unique words here now",
            "x",          # 1 token: no 2-grams
            "",           # empty
            "  spaced   out   tokens  spaced   out  ",
            "repeat me repeat me repeat me",
        ]
        f = textstats.repetition_features(
            pa.chunked_array([pa.array(texts)]), n=2
        )
        for i, t in enumerate(texts):
            want = self._brute(t)
            if want is None:
                assert not f["has_ngrams"][i]
                assert f["dup_2gram_frac"][i] == 0.0
                assert f["top_2gram_frac"][i] == 0.0
            else:
                assert f["has_ngrams"][i]
                assert f["dup_2gram_frac"][i] == want[0]
                assert f["top_2gram_frac"][i] == want[1]

    def test_trigrams(self):
        texts = ["a b c a b c a b c", "d e f g", "z z"]
        f3 = textstats.repetition_features(
            pa.chunked_array([pa.array(texts)]), n=3
        )
        for i, t in enumerate(texts):
            want = self._brute(t, n=3)
            if want is None:
                assert not f3["has_ngrams"][i]
            else:
                assert f3["dup_3gram_frac"][i] == want[0]
                assert f3["top_3gram_frac"][i] == want[1]

    def test_struct_fallback_regime(self):
        """When V**n overflows int64 the kernel switches to the struct
        key; an n/vocab combination past the guard (7**80 >> 2**62) must
        still match brute force exactly."""
        long_doc = " ".join("t%d" % (i % 7) for i in range(200))
        arr = pa.chunked_array([pa.array([long_doc])])
        f = textstats.repetition_features(arr, n=80)
        want = self._brute(long_doc, n=80)
        assert f["dup_80gram_frac"][0] == want[0]
        assert f["top_80gram_frac"][0] == want[1]


class TestChunkDocuments:
    def _run(self, texts, **kw):
        import ray.data as rd

        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts),
                }
            )
        )
        out = textstats.chunk_documents(ds, **kw).take_all()
        return sorted(
            (r["doc_id"], r["chunk_idx"], r["n_tokens"], r["chunk_text"])
            for r in out
        )

    def test_non_overlapping(self):
        got = self._run(["a b c d e f g", "x y", ""], chunk_tokens=3)
        assert got == [
            (0, 0, 3, "a b c"),
            (0, 1, 3, "d e f"),
            (0, 2, 1, "g"),
            (1, 0, 2, "x y"),
        ]

    def test_overlap_stops_at_doc_end(self):
        # stride 2, chunk 3 over 7 tokens: [0:3],[2:5],[4:7] — no window
        # past the one that reaches the end
        got = self._run(["a b c d e f g"], chunk_tokens=3, stride=2)
        assert [g[3] for g in got] == ["a b c", "c d e", "e f g"]

    def test_drop_final_partial(self):
        got = self._run(["a b c d e"], chunk_tokens=3, drop_final_partial=True)
        assert [g[3] for g in got] == ["a b c"]
        # a doc SHORTER than one chunk still yields its (only) window
        got1 = self._run(["a b"], chunk_tokens=3, drop_final_partial=True)
        assert [g[3] for g in got1] == ["a b"]

    def test_ws_runs_collapse_in_chunk_text(self):
        got = self._run(["a   b \n c"], chunk_tokens=2)
        assert [g[3] for g in got] == ["a b", "c"]

    def test_bad_params(self):
        import pytest

        with pytest.raises(ValueError):
            self._run(["a"], chunk_tokens=0)


class TestTokenLenPercentileFilter:
    def test_keeps_p_fraction_and_cutoff_is_tight(self, ray_session):
        """~p of the corpus survives (exact up to ties at the cutoff)
        and every kept value <= every dropped value would have been
        violated — i.e. the cutoff is the quantile element itself."""
        from doppel_ray.pipelines import registry
        from doppel_ray.sources.parquet import read_documents
        from doppel_ray.stages import textstats

        sf = "/root/testdata/sf0.001"
        out = registry()["token_len_percentile_filter"](sf).to_pandas()
        scored = (
            textstats.add_quality_columns(read_documents(sf, columns=["doc_id", "text"]))
            .select_columns(["doc_id", "mean_token_len"])
            .to_pandas()
        )
        n = len(scored)
        vals = sorted(scored["mean_token_len"])
        import math

        cutoff = vals[max(math.ceil(0.9 * n) - 1, 0)]
        want = scored[scored["mean_token_len"] <= cutoff]
        assert len(out) == len(want)
        assert set(out["doc_id"]) == set(want["doc_id"])
        # at least p of the corpus survives; the overshoot is only ties
        assert len(out) >= math.ceil(0.9 * n) - 1

    def test_continuous_path_runs(self, ray_session):
        """driver_limit=64 must route the near-unique float column down
        the bucketed cumulative walk (not the driver histogram) — pin by
        calling the quantile engine the query uses with its gate."""
        from doppel_ray.sources.parquet import read_documents
        from doppel_ray.stages import quantiles, textstats
        from doppel_ray.stages.hashes import approx_distinct

        sf = "/root/testdata/sf0.001"
        scored = (
            textstats.add_quality_columns(read_documents(sf, columns=["doc_id", "text"]))
            .select_columns(["doc_id", "mean_token_len"])
            .materialize()
        )
        assert approx_distinct(scored, "mean_token_len") > 64
        walk = quantiles.exact_quantiles(
            scored, "mean_token_len", [0.9], driver_limit=64
        )
        hist = quantiles.exact_quantiles(
            scored, "mean_token_len", [0.9], driver_limit=10**6
        )
        assert walk == hist


def test_sources_per_lang_distinct_is_exact(ray_session):
    """Distinct-per-group must match a driver-side pandas nunique."""
    import pandas as pd
    import pyarrow.parquet as pq

    from doppel_ray.pipelines import registry

    sf = "/root/testdata/sf0.001"
    out = (
        registry()["sources_per_lang"](sf)
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    df = pq.read_table(f"{sf}/documents.parquet", columns=["lang", "source"]).to_pandas()
    want = (
        df.groupby("lang")
        .agg(n_sources=("source", "nunique"), n_docs=("source", "size"))
        .reset_index()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.astype({"n_sources": "int64", "n_docs": "int64"}), want
    )
