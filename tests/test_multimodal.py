"""Multimodal plumbing tests: binary payload schema, actor-pool decode
(stubbed codec, real plumbing), real numpy resize + feature extraction,
and byte-identical media dedup."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from doppel_ray.stages import multimodal as M


def _media_table(n: int = 12) -> pa.Table:
    imgs = [
        M.fake_image_bytes(16 + (i % 3) * 8, 20 + (i % 2) * 4, 3, seed=i % 5)
        for i in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array([f"m{i:03d}" for i in range(n)]),
            "image": pa.array(imgs, type=pa.binary()),
            "media_type": pa.array(["image/rawi"] * n),
        }
    )


class TestDecode:
    def test_rawi_roundtrip(self):
        buf = M.fake_image_bytes(8, 6, 3, seed=1)
        px, h, w, c = M._decode_rawi(buf)
        assert (h, w, c) == (8, 6, 3)
        assert M.fake_image_bytes(8, 6, 3, seed=1) == buf  # deterministic

    def test_decode_stage_schema(self, ray_session):
        ds = rd.from_arrow(_media_table(6))
        out = M.decode_resize_featurize(ds, M.MediaPipelineConfig(concurrency=2))
        rows = out.take_all()
        assert len(rows) == 6
        r = rows[0]
        assert r["height"] == 64 and r["width"] == 64
        assert len(r["pixels"]) == 64 * 64 * 3
        assert len(r["feat"]) == 3 + 3 + 8  # mean + std + hist bins
        assert r["media_id"].startswith("m")

    def test_decoder_error_fallback(self):
        import pytest

        with pytest.raises(NotImplementedError):
            M.ImageDecoder(fallback="error")


class TestResize:
    def test_nearest_neighbor_correctness(self):
        img = np.arange(4 * 6 * 1, dtype=np.uint8).reshape(4, 6, 1)
        batch = pa.table(
            {
                "pixels": pa.array([img.tobytes()], type=pa.large_binary()),
                "height": pa.array([4], type=pa.int64()),
                "width": pa.array([6], type=pa.int64()),
                "channels": pa.array([1], type=pa.int64()),
            }
        )
        out = M.ImageResizer(out_h=2, out_w=3)(batch)
        got = np.frombuffer(out["pixels"][0].as_py(), dtype=np.uint8).reshape(2, 3, 1)
        want = img[[0, 2]][:, [0, 2, 4]]
        np.testing.assert_array_equal(got, want)


class TestMediaDedup:
    def test_exact_dup_media(self, ray_session):
        imgs = [
            M.fake_image_bytes(8, 8, 3, seed=0),
            M.fake_image_bytes(8, 8, 3, seed=0),  # dup of 0
            M.fake_image_bytes(8, 8, 3, seed=1),
            M.fake_image_bytes(8, 8, 3, seed=2),
            M.fake_image_bytes(8, 8, 3, seed=2),  # dup of 3
            M.fake_image_bytes(8, 8, 3, seed=3),
        ]
        t = pa.table(
            {
                "media_id": pa.array([f"m{i}" for i in range(6)]),
                "image": pa.array(imgs, type=pa.binary()),
            }
        )
        out = M.exact_dup_media(rd.from_arrow(t)).take_all()
        ids = sorted(r["media_id"] for r in out)
        assert ids == ["m0", "m1", "m3", "m4"]
