"""BPE merge-learning tests: vs the canonical Sennrich reference loop
(regex-based merge application), driver == distributed equivalence,
tie-break determinism, and EOW boundary semantics."""

from __future__ import annotations

import collections
import re

import pyarrow as pa
import ray.data as rd

from doppel_ray.stages import bpe


def _reference_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str, int]]:
    """Sennrich et al. (2016) reference: word-freq dict, space-joined
    symbol strings, regex merge application."""
    vocab = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[" ".join(list(w) + [bpe.EOW])] += 1
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for word, f in vocab.items():
            syms = word.split(" ")
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        m = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == m)
        merges.append((best[0], best[1], m))
        pat = re.compile(
            r"(?<!\S)" + re.escape(best[0] + " " + best[1]) + r"(?!\S)"
        )
        vocab = collections.Counter(
            {pat.sub(best[0] + best[1], w): f for w, f in vocab.items()}
        )
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest low newer",
]


def _ds():
    return rd.from_arrow(pa.table({"text": pa.array(TEXTS, type=pa.string())}))


class TestBPE:
    def test_matches_reference(self, ray_session):
        want = _reference_bpe(TEXTS, 12)
        got = bpe.learn_bpe(_ds(), 12)
        assert [
            (r["left"], r["right"], r["pair_count"]) for r in got.to_pylist()
        ] == want
        assert got["rank"].to_pylist() == list(range(len(want)))

    def test_distributed_equals_driver(self, ray_session):
        drv = bpe.learn_bpe(_ds(), 10)
        dist = bpe.learn_bpe(_ds(), 10, driver_word_limit=0)
        assert drv.to_pylist() == dist.to_pylist()

    def test_eow_blocks_cross_word_merges(self, ray_session):
        # "ab ab" -> merge (a, b) then (ab, </w>); never (b, a) across words
        ds = rd.from_arrow(pa.table({"text": pa.array(["ab ab ab"])}))
        got = bpe.learn_bpe(ds, 2).to_pylist()
        assert (got[0]["left"], got[0]["right"]) == ("a", "b")
        assert (got[1]["left"], got[1]["right"]) == ("ab", bpe.EOW)

    def test_tie_break_lexicographic(self, ray_session):
        # "xy" and "pq" each appear 3 times: (p,q) wins the tie over (x,y)
        ds = rd.from_arrow(
            pa.table({"text": pa.array(["xy pq", "xy pq", "pq xy"])})
        )
        got = bpe.learn_bpe(ds, 1).to_pylist()
        assert (got[0]["left"], got[0]["right"]) == ("p", "q")

    def test_word_freqs(self, ray_session):
        wf = {
            r["word"]: r["freq"]
            for r in bpe.word_freqs(_ds()).take_all()
        }
        assert wf["low"] == 4 and wf["newer"] == 3 and wf["widest"] == 1


def _reference_encode_len(word: str, merges: list[tuple[str, str]]) -> int:
    """Brute-force greedy encoder: repeatedly apply the LOWEST-rank
    applicable merge (the standard BPE inference loop)."""
    ranks = {p: i for i, p in enumerate(merges)}
    syms = list(word) + [bpe.EOW]
    while len(syms) > 1:
        cands = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
            if (a, b) in ranks
        ]
        if not cands:
            break
        _, i = min(cands)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return len(syms)


class TestBPEEncode:
    def test_matches_reference_encoder(self, ray_session):
        merges_tbl = bpe.learn_bpe(_ds(), 12)
        merges = [(r["left"], r["right"]) for r in merges_tbl.to_pylist()]
        got = {
            r["doc_id"]: r["n_bpe_units"]
            for r in bpe.encode_unit_counts(
                rd.from_arrow(
                    pa.table(
                        {
                            "doc_id": pa.array(range(len(TEXTS)), type=pa.int64()),
                            "text": pa.array(TEXTS, type=pa.string()),
                        }
                    )
                ),
                merges,
            ).take_all()
        }
        for i, t in enumerate(TEXTS):
            want = sum(_reference_encode_len(w, merges) for w in t.lower().split())
            assert got[i] == want, (i, t)

    def test_null_and_empty_texts(self, ray_session):
        merges = [("l", "o")]
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                    "text": pa.array(["lo lo", None, ""], type=pa.string()),
                }
            )
        )
        got = {
            r["doc_id"]: r["n_bpe_units"]
            for r in bpe.encode_unit_counts(ds, merges).take_all()
        }
        # "lo" -> [lo, </w>] = 2 units, twice
        assert got == {0: 4, 1: 0, 2: 0}

    def test_no_merges_counts_chars_plus_eow(self, ray_session):
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([0], type=pa.int64()),
                    "text": pa.array(["abc de"], type=pa.string()),
                }
            )
        )
        got = bpe.encode_unit_counts(ds, []).take_all()[0]
        assert got["n_bpe_units"] == (3 + 1) + (2 + 1)
