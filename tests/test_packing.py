"""Token-stream sequence packing (stages/packing.py): span exactness,
boundary straddling, empty docs, layout invariance, range partitioning
equivalence, and DuckDB window-cumsum parity on a random corpus."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from doppel_ray.stages import packing


def _docs(texts: list[str | None], ids: list[int] | None = None) -> rd.Dataset:
    t = pa.table(
        {
            "doc_id": pa.array(
                ids if ids is not None else range(len(texts)), pa.int64()
            ),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    return rd.from_arrow(t).repartition(3)


def _rows(ds):
    return sorted(
        (
            r["doc_id"],
            r["seq_id"],
            r["doc_tok_start"],
            r["doc_tok_end"],
            r["seq_tok_start"],
        )
        for r in ds.take_all()
    )


class TestPackTokenStream:
    def test_docs_straddle_sequence_boundaries(self, ray_session):
        # token stream: d0 has 3 tokens, d1 has 4, d2 has 2; S=4
        # seq0 = d0[0:3] + d1[0:1]; seq1 = d1[1:4] + d2[0:1]; seq2 = d2[1:2]
        out = _rows(
            packing.pack_token_stream(
                _docs(["a b c", "d e f g", "h i"]), seq_tokens=4
            )
        )
        assert out == [
            (0, 0, 0, 3, 0),
            (1, 0, 0, 1, 3),
            (1, 1, 1, 4, 0),
            (2, 1, 0, 1, 3),
            (2, 2, 1, 2, 0),
        ]

    def test_empty_and_null_docs_emit_nothing(self, ray_session):
        out = _rows(
            packing.pack_token_stream(
                _docs(["a b", "", None, "c"]), seq_tokens=8
            )
        )
        # the empty/null docs vanish; c follows b in the stream
        assert out == [(0, 0, 0, 2, 0), (3, 0, 0, 1, 2)]

    def test_sequences_are_exactly_full(self, ray_session):
        rng = np.random.default_rng(7)
        texts = [
            " ".join(f"t{i}_{j}" for j in range(rng.integers(1, 30)))
            for i in range(40)
        ]
        S = 16
        out = _rows(packing.pack_token_stream(_docs(texts), seq_tokens=S))
        total = sum(len(t.split()) for t in texts)
        per_seq: dict[int, int] = {}
        for _, seq, lo, hi, _ in out:
            per_seq[seq] = per_seq.get(seq, 0) + (hi - lo)
        n_seq = max(per_seq) + 1
        assert sum(per_seq.values()) == total
        for s in range(n_seq - 1):
            assert per_seq[s] == S
        assert 0 < per_seq[n_seq - 1] <= S
        # slices within each doc are contiguous from 0 to n_tokens
        by_doc: dict[int, list[tuple[int, int]]] = {}
        for d, _, lo, hi, _ in out:
            by_doc.setdefault(d, []).append((lo, hi))
        for d, spans in by_doc.items():
            spans.sort()
            assert spans[0][0] == 0
            assert spans[-1][1] == len(texts[d].split())
            for (_, h1), (l2, _) in zip(spans, spans[1:]):
                assert h1 == l2

    def test_layout_and_range_size_invariance(self, ray_session):
        texts = [f"w{i} " * (i % 5 + 1) for i in range(30)]
        base = _rows(packing.pack_token_stream(_docs(texts), seq_tokens=7))
        other_layout = _rows(
            packing.pack_token_stream(
                rd.from_arrow(
                    pa.table(
                        {
                            "doc_id": pa.array(range(30), pa.int64()),
                            "text": pa.array(texts),
                        }
                    )
                ).repartition(11),
                seq_tokens=7,
            )
        )
        tiny_ranges = _rows(
            packing.pack_token_stream(_docs(texts), seq_tokens=7, range_size=4)
        )
        assert base == other_layout == tiny_ranges

    def test_guards(self, ray_session):
        with pytest.raises(ValueError, match="seq_tokens"):
            packing.pack_token_stream(_docs(["x"]), seq_tokens=0)
        with pytest.raises(ValueError, match="range_size"):
            packing.pack_token_stream(_docs(["x"]), range_size=0)
        with pytest.raises(RuntimeError, match="ranges_limit"):
            packing.pack_token_stream(
                _docs(["a", "b", "c"]), range_size=1, ranges_limit=2
            ).take_all()

    def test_matches_duckdb_on_random_sparse_ids(self, ray_session):
        import duckdb

        rng = np.random.default_rng(23)
        ids = sorted(rng.choice(100_000, size=50, replace=False).tolist())
        texts = [
            " ".join(rng.choice([f"w{k}" for k in range(9)], size=m))
            for m in rng.integers(0, 25, size=50)
        ]
        S = 13
        got = _rows(
            packing.pack_token_stream(
                _docs(texts, ids=ids), seq_tokens=S, range_size=1000
            )
        )
        con = duckdb.connect()
        con.register(
            "documents",
            pa.table(
                {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)},
            ),
        )
        want = con.execute(
            rf"""
            WITH n AS (
              SELECT doc_id,
                     len(regexp_extract_all(text, '\S+'))::BIGINT AS n
              FROM documents
            ),
            c AS (
              SELECT doc_id, n,
                     (sum(n) OVER (ORDER BY doc_id))::BIGINT AS c
              FROM n WHERE n > 0
            ),
            x AS (
              SELECT doc_id, n, c, u.seq_id
              FROM c, UNNEST(generate_series((c - n) // {S},
                                             (c - 1) // {S})) AS u(seq_id)
            )
            SELECT doc_id, seq_id,
                   greatest(c - n, seq_id * {S}) - (c - n) AS lo,
                   least(c, (seq_id + 1) * {S}) - (c - n) AS hi,
                   greatest(c - n, seq_id * {S}) - seq_id * {S} AS st
            FROM x ORDER BY doc_id, seq_id
            """
        ).fetchall()
        assert got == [tuple(r) for r in want]


import pandas as pd


class TestPackBinsNFD:
    @staticmethod
    def _brute(df, capacity, num_buckets):
        import hashlib

        rows = []
        for _, r in df.iterrows():
            h = int.from_bytes(
                hashlib.md5(str(int(r.doc_id)).encode()).digest()[:8],
                "little",
            )
            rows.append((int(r.doc_id), int(r.L), h % num_buckets))
        out = {}
        import collections

        byb = collections.defaultdict(list)
        for d, ln, b in rows:
            byb[b].append((d, ln))
        for b, items in byb.items():
            items.sort(key=lambda x: (-x[1], x[0]))
            fill, cur = 0, 0
            for d, ln in items:
                if fill + ln > capacity:
                    cur, fill = cur + 1, 0
                out[d] = (b, cur)
                fill += ln
        return out

    def test_matches_brute_and_bins_fit(self, ray_session):
        from doppel_ray.stages.packing import pack_bins_nfd

        rng = np.random.default_rng(5)
        df = pd.DataFrame(
            {
                "doc_id": np.arange(300, dtype=np.int64),
                "L": rng.integers(10, 500, 300).astype(np.int64),
            }
        )
        want = self._brute(df, 1000, 4)
        for p in (1, 7):
            got = pack_bins_nfd(
                rd.from_pandas(df).repartition(p),
                1000,
                len_col="L",
                num_buckets=4,
            ).to_pandas()
            assert {
                int(r.doc_id): (int(r.bucket), int(r.bin))
                for _, r in got.iterrows()
            } == want
        # every bin's total fits capacity
        merged = got.merge(df, on="doc_id")
        fills = merged.groupby(["bucket", "bin"])["L"].sum()
        assert (fills <= 1000).all()

    def test_oversize_and_validation(self, ray_session):
        from doppel_ray.stages.packing import pack_bins_nfd

        df = pd.DataFrame(
            {"doc_id": np.array([1], dtype=np.int64),
             "L": np.array([5000], dtype=np.int64)}
        )
        with pytest.raises(Exception, match="capacity"):
            pack_bins_nfd(
                rd.from_pandas(df), 1000, len_col="L"
            ).to_pandas()
        with pytest.raises(ValueError):
            pack_bins_nfd(rd.from_pandas(df), 0, len_col="L")
