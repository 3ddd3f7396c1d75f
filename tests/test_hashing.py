"""Unit tests for the vectorized hash kernels, mirroring the reference's
hasher contracts (reference internal/scanner/hasher_test.go:37-317)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from doppel_ray.functions import hashing


def _qh(texts: list[str]) -> np.ndarray:
    return hashing.quick_hash(pa.array(texts, type=pa.large_string()))


class TestQuickHash:
    def test_empty_is_zero(self):
        # size<=0 => hash 0 (reference hasher.go:47-49)
        assert _qh([""])[0] == 0

    def test_identical_equal(self):
        h = _qh(["hello world"] * 2)
        assert h[0] == h[1] != 0

    def test_different_small_differ(self):
        h = _qh(["hello", "world"])
        assert h[0] != h[1]

    def test_middle_mutation_same_quick_hash(self):
        # The sampled-hash semantic contract (hasher_test.go:231-317):
        # 24 KiB texts differing only at offset 9216 (outside the first/last
        # 8 KiB windows) share the quick hash.
        base = "a" * 8192 + "b" * 8192 + "c" * 8192
        mut = base[:9216] + "Z" + base[9217:]
        assert len(base) == len(mut) == 24576
        h = _qh([base, mut])
        assert h[0] == h[1]

    def test_mutation_inside_window_differs(self):
        base = "a" * 24576
        mut = "Z" + base[1:]
        h = _qh([base, mut])
        assert h[0] != h[1]

    def test_band_8k_to_16k_uses_first_8k_only(self):
        # (8 KiB, 16 KiB): only the first 8 KiB feeds the hash
        # (reference hasher.go:70-75 branch)
        base = "x" * 12000
        mut = base[:11999] + "Z"  # differs only in the tail
        h = _qh([base, mut])
        assert h[0] == h[1]

    def test_exactly_16k_uses_suffix(self):
        # size >= 16 KiB hashes first+last 8 KiB: tail change matters
        base = "x" * 16384
        mut = base[:16383] + "Z"
        h = _qh([base, mut])
        assert h[0] != h[1]

    @pytest.mark.parametrize("n", [13, 8191, 8192, 8193, 16383, 16384, 24576])
    def test_size_boundaries_deterministic(self, n):
        t = "y" * n
        assert _qh([t])[0] == _qh([t])[0]

    def test_string_vs_large_string_agree(self):
        t = ["abc", "", "x" * 20000]
        a = hashing.quick_hash(pa.array(t, type=pa.string()))
        b = hashing.quick_hash(pa.array(t, type=pa.large_string()))
        assert (a == b).all()


class TestContentHash:
    def test_matches_direct_blake2b(self):
        # equality vs directly-computed digest (hasher_test.go:37-117 analog)
        texts = ["", "hello", "x" * 1024]
        got = hashing.content_hash(pa.array(texts, type=pa.large_string()))
        want = [hashlib.blake2b(t.encode(), digest_size=16).hexdigest() for t in texts]
        assert got == want

    def test_distinguishes_middle_mutation(self):
        base = "a" * 24576
        mut = base[:9216] + "Z" + base[9217:]
        got = hashing.content_hash(pa.array([base, mut], type=pa.large_string()))
        assert got[0] != got[1]

    def test_chunked_array(self):
        ch = pa.chunked_array([pa.array(["a", "b"]), pa.array(["a"])])
        got = hashing.content_hash(ch)
        assert got[0] == got[2] != got[1]


class TestHelpers:
    def test_byte_lengths_utf8(self):
        arr = pa.array(["abc", "", "héllo"], type=pa.large_string())
        assert hashing.byte_lengths(arr).tolist() == [3, 0, 6]

    def test_sip64_deterministic(self):
        a = hashing.sip64(["x", "y"])
        b = hashing.sip64(["x", "y"])
        assert (a == b).all() and a[0] != a[1]

    def test_mix_columns(self):
        a = np.array([1, 2], dtype=np.uint64)
        b = np.array([3, 4], dtype=np.uint64)
        m1 = hashing.mix_columns_u64([a, b])
        m2 = hashing.mix_columns_u64([a, b])
        assert (m1 == m2).all()
        assert m1[0] != hashing.mix_columns_u64([b, a])[0]  # order-sensitive
