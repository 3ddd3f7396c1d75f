"""Tests for the compression signal and the interpolated-bigram LM
perplexity scorer: exact equivalence to direct zlib / a brute-force
reference model, empty/null handling, and block-layout invariance."""

from __future__ import annotations

import collections
import math
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from doppel_ray.stages import lm, textstats

SF = "/root/testdata/sf0.001"

TEXTS = [
    "the cat sat on the mat",
    "the cat sat on the cat",
    "a completely different sentence with rare words",
    "the the the the the the",
    "",
    "zzz qqq xxx vvv",
    "the mat sat on a cat and the cat sat",
]


def _ds(texts=TEXTS):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )


def _reference_model(texts, vocab_size, add_k=0.5):
    """Brute-force trainer mirroring the documented probability model."""
    uni = collections.Counter()
    for t in texts:
        uni.update(t.lower().split())
    total = sum(uni.values())
    top = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    vocab = {w: None for w, _ in top}
    bi = collections.Counter()
    uni_v = collections.Counter()
    for t in texts:
        toks = [w if w in vocab else lm.UNK for w in t.lower().split()]
        uni_v.update(toks)
        bi.update(zip(toks, toks[1:]))
    return vocab, uni_v, bi, total


def _reference_ppl(text, vocab, uni_v, bi, total, lam=0.7, add_k=0.5):
    toks = [w if w in vocab else lm.UNK for w in text.lower().split()]
    if not toks:
        return None, 0
    V1 = len(vocab) + 1
    denom = total + add_k * V1

    def p_uni(w):
        return (uni_v.get(w, 0) + add_k) / denom

    logs = [math.log(p_uni(toks[0]))]
    for prev, w in zip(toks, toks[1:]):
        c_prev = uni_v.get(prev, 0)
        p_bi = bi.get((prev, w), 0) / c_prev if c_prev > 0 else 0.0
        logs.append(math.log(max(lam * p_bi + (1 - lam) * p_uni(w), 1e-300)))
    return math.exp(-sum(logs) / len(toks)), len(toks)


class TestCompressionSignal:
    def test_matches_direct_zlib(self, ray_session):
        tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        out = (
            textstats.add_compression_signal(rd.from_arrow(tbl))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        for did, txt in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
            b = (txt or "").encode()
            assert out.loc[did, "raw_len"] == len(b)
            assert out.loc[did, "comp_len"] == len(zlib.compress(b, 6))

    def test_null_text_is_empty(self, ray_session):
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1], type=pa.int64()),
                    "text": pa.array([None], type=pa.string()),
                }
            )
        )
        row = textstats.add_compression_signal(ds).take_all()[0]
        assert row["raw_len"] == 0 and row["comp_len"] == len(zlib.compress(b"", 6))


class TestBigramLM:
    def test_matches_reference(self, ray_session):
        model = lm.train_bigram_lm(_ds(), vocab_size=8, max_bigrams=1000)
        vocab, uni_v, bi, total = _reference_model(TEXTS, 8)
        assert sorted(model["vocab_sorted"].tolist()) == sorted(vocab)
        assert model["total_tokens"] == total
        got = (
            lm.perplexity_scores(_ds(), model)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        for i, t in enumerate(TEXTS):
            want_ppl, want_n = _reference_ppl(t, vocab, uni_v, bi, total)
            assert got.loc[i, "n_tokens"] == want_n
            if want_ppl is None:
                assert np.isnan(got.loc[i, "ppl"])
            else:
                assert abs(got.loc[i, "ppl"] - want_ppl) < 1e-9 * want_ppl

    def test_layout_invariant(self, ray_session):
        m1 = lm.train_bigram_lm(_ds(), vocab_size=8, max_bigrams=1000)
        m2 = lm.train_bigram_lm(
            _ds().repartition(5), vocab_size=8, max_bigrams=1000
        )
        assert m1["vocab_sorted"].tolist() == m2["vocab_sorted"].tolist()
        assert m1["uni_counts"].tolist() == m2["uni_counts"].tolist()
        assert m1["pair_keys"].tolist() == m2["pair_keys"].tolist()
        assert m1["pair_counts"].tolist() == m2["pair_counts"].tolist()
        s1 = lm.perplexity_scores(_ds(), m1).to_pandas().sort_values("doc_id")
        s2 = (
            lm.perplexity_scores(_ds().repartition(3), m2)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert np.allclose(
            s1["ppl"].to_numpy(), s2["ppl"].to_numpy(), equal_nan=True
        )

    def test_fluent_scores_lower_than_gibberish(self, ray_session):
        # sanity: with the FULL vocab (no <unk> bucket to hide in),
        # frequent-word prose with seen bigrams gets lower ppl than
        # singleton-word soup with unseen bigrams. (At tiny vocab_size
        # the OOV mass concentrates in <unk>, making unk-soup "common"
        # — that regime is covered by test_matches_reference instead.)
        model = lm.train_bigram_lm(_ds(), vocab_size=100, max_bigrams=1000)
        got = (
            lm.perplexity_scores(_ds(), model)
            .to_pandas()
            .set_index("doc_id")["ppl"]
        )
        assert got[0] < got[5]  # "the cat sat on the mat" vs "zzz qqq xxx vvv"

    def test_validates_params(self):
        import pytest

        with pytest.raises(ValueError):
            lm.train_bigram_lm(_ds(), vocab_size=0)
