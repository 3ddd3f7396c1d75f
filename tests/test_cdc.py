"""Sub-file storage dedup (stages/cdc.py): reference-chunker parity,
the insertion-robustness property that motivates CDC over fixed
blocks, min-length clamp, layout invariance, fixed-block DuckDB
parity, validation."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from doppel_ray.stages import cdc


def _ref_chunks(buf: bytes, window=16, bits=6, min_len=32):
    return cdc._chunk_doc(buf, window, (1 << bits) - 1, min_len)


class TestCDCChunks:
    def test_matches_reference_and_layout(self, ray_session):
        rng = np.random.default_rng(3)
        docs = {
            i: bytes(rng.integers(0, 256, rng.integers(10, 2000)).tolist())
            for i in range(40)
        }
        tbl = pa.table(
            {
                "doc_id": pa.array(list(docs), type=pa.int64()),
                "html": pa.array(list(docs.values()), type=pa.binary()),
            }
        )
        for p in (1, 7):
            got = (
                cdc.cdc_chunks(rd.from_arrow(tbl).repartition(p))
                .to_pandas()
                .sort_values(["doc_id", "chunk_idx"], ignore_index=True)
            )
            rows = []
            for d, buf in docs.items():
                for k, (a, b) in enumerate(_ref_chunks(buf)):
                    h = int.from_bytes(
                        hashlib.blake2b(buf[a:b], digest_size=8).digest(),
                        "little",
                    ) - (1 << 63)
                    rows.append((d, k, h, b - a))
            want = pd.DataFrame(
                rows, columns=["doc_id", "chunk_idx", "chunk_hash", "chunk_len"]
            ).sort_values(["doc_id", "chunk_idx"], ignore_index=True)
            pd.testing.assert_frame_equal(got, want)

    def test_chunks_cover_payload_with_min_len(self):
        rng = np.random.default_rng(9)
        buf = bytes(rng.integers(0, 256, 5000).tolist())
        ch = _ref_chunks(buf)
        assert ch[0][0] == 0 and ch[-1][1] == len(buf)
        for (a, b), (c, d) in zip(ch, ch[1:]):
            assert b == c
        # every chunk except possibly the final tail respects min_len
        assert all(b - a >= 32 for a, b in ch[:-1])

    def test_insertion_locality(self):
        # THE CDC property: inserting bytes near the front leaves the
        # tail chunk set intact, where fixed blocks would shift it all
        rng = np.random.default_rng(11)
        buf = bytes(rng.integers(0, 256, 4000).tolist())
        edited = buf[:100] + b"XYZ" + buf[100:]

        def tail_hashes(b):
            return {
                hashlib.blake2b(b[a:e], digest_size=8).digest()
                for a, e in _ref_chunks(b)
            }

        shared = tail_hashes(buf) & tail_hashes(edited)
        assert len(shared) >= 0.7 * len(tail_hashes(buf))

    def test_empty_and_null_payloads(self, ray_session):
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "html": pa.array([b"", None, b"abc"], type=pa.binary()),
            }
        )
        got = cdc.cdc_chunks(rd.from_arrow(tbl)).to_pandas()
        assert got.doc_id.tolist() == [3]
        assert got.chunk_len.tolist() == [3]

    def test_validation(self, ray_session):
        tbl = pa.table(
            {
                "doc_id": pa.array([1], type=pa.int64()),
                "html": pa.array([b"x"], type=pa.binary()),
            }
        )
        with pytest.raises(ValueError):
            cdc.cdc_chunks(rd.from_arrow(tbl), window=1)


class TestCDCStats:
    def test_report_matches_reference(self, ray_session):
        rng = np.random.default_rng(5)
        header = bytes(rng.integers(0, 256, 400).tolist())
        docs = {}
        for i in range(30):
            body = bytes(rng.integers(0, 256, rng.integers(50, 900)).tolist())
            docs[i] = (header if i % 2 == 0 else b"") + body
        tbl = pa.table(
            {
                "doc_id": pa.array(list(docs), type=pa.int64()),
                "html": pa.array(list(docs.values()), type=pa.binary()),
            }
        )
        got = cdc.cdc_dedup_stats(rd.from_arrow(tbl).repartition(4)).to_pandas()

        counts: dict[bytes, list] = {}
        for buf in docs.values():
            for a, b in _ref_chunks(buf):
                h = hashlib.blake2b(buf[a:b], digest_size=8).digest()
                e = counts.setdefault(h, [0, b - a])
                e[0] += 1
        n_chunks = sum(c for c, _ in counts.values())
        total = sum(c * l for c, l in counts.values())
        dup = sum((c - 1) * l for c, l in counts.values() if c > 1)
        assert got.n_chunks.iloc[0] == n_chunks
        assert got.n_unique_chunks.iloc[0] == len(counts)
        assert got.total_bytes.iloc[0] == total
        assert got.dup_bytes.iloc[0] == dup
        assert dup > 0  # shared header makes the report non-vacuous


class TestFixedBlocks:
    def test_matches_duckdb(self, ray_session):
        import duckdb

        rng = np.random.default_rng(17)
        intro = "SHARED64" * 8  # 64 chars, one aligned block
        rows = []
        for i in range(60):
            body = "".join(
                rng.choice(list("abcdefgh "), rng.integers(20, 300))
            )
            rows.append(
                {
                    "source": f"s{i % 4}",
                    "text": (intro if i % 3 == 0 else "") + body,
                }
            )
        df = pd.DataFrame(rows)
        got = (
            cdc.block_dedup_stats(
                rd.from_pandas(df).repartition(5), block=64
            )
            .to_pandas()
            .sort_values("source", ignore_index=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        want = con.execute(
            """
            WITH blocks AS (
              SELECT source, md5_number_upper(substr(text, i, 64)) AS h
              FROM t, UNNEST(generate_series(1, length(text), 64)) AS u(i)
            ),
            dup AS (SELECT h FROM blocks GROUP BY h HAVING count(*) > 1)
            SELECT source, count(*)::BIGINT AS n_blocks,
                   count(*) FILTER (WHERE h IN (SELECT h FROM dup))::BIGINT
                     AS n_dup_blocks
            FROM blocks GROUP BY source ORDER BY source
            """
        ).df()
        assert got.n_blocks.tolist() == want.n_blocks.tolist()
        assert got.n_dup_blocks.tolist() == want.n_dup_blocks.tolist()
        assert got.n_dup_blocks.sum() > 0
