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


class TestVideoFrameSampling:
    def _videos(self, specs):
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "media_id": pa.array([s[0] for s in specs]),
                    "video": pa.array(
                        [
                            M.fake_video_bytes(n, h, w, 3, seed=i)
                            for i, (_, n, h, w) in enumerate(specs)
                        ],
                        type=pa.large_binary(),
                    ),
                }
            )
        )

    def test_uniform_sampling_rows_and_indices(self):
        ds = self._videos([("v0", 20, 8, 8), ("v1", 3, 4, 6), ("v2", 1, 4, 4)])
        out = ds.map_batches(
            M.VideoFrameSampler,
            fn_constructor_kwargs={"num_frames": 4},
            batch_format="pyarrow",
            concurrency=2,
        ).take_all()
        by_id = {}
        for r in out:
            by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
        # 20 frames -> 4 uniform indices incl. first and last
        assert sorted(by_id["v0"]) == [0, 6, 12, 19]
        # shorter than num_frames -> every frame once
        assert sorted(by_id["v1"]) == [0, 1, 2]
        assert sorted(by_id["v2"]) == [0]

    def test_every_kth_and_frame_bytes(self):
        import numpy as np

        specs = [("v0", 10, 6, 5)]
        ds = self._videos(specs)
        out = ds.map_batches(
            M.VideoFrameSampler,
            fn_constructor_kwargs={"every": 3},
            batch_format="pyarrow",
            concurrency=2,
        ).take_all()
        assert sorted(r["frame_idx"] for r in out) == [0, 3, 6, 9]
        # frame pixel payload must match the encoded frame exactly
        buf = M.fake_video_bytes(10, 6, 5, 3, seed=0)
        frames = np.frombuffer(buf[20:], dtype=np.uint8).reshape(10, 6, 5, 3)
        for r in out:
            got = np.frombuffer(r["pixels"], dtype=np.uint8).reshape(6, 5, 3)
            assert (got == frames[r["frame_idx"]]).all()

    def test_chains_into_resize_and_features(self):
        ds = self._videos([("v0", 6, 12, 10), ("v1", 2, 8, 8)])
        out = M.sample_frames_featurize(
            ds, M.MediaPipelineConfig(batch_size=8, concurrency=2, out_h=4, out_w=4),
            num_frames=3,
        ).take_all()
        assert len(out) == 3 + 2
        for r in out:
            assert r["height"] == 4 and r["width"] == 4
            assert len(r["feat"]) == 3 + 3 + 8  # mean, std, hist bins

    def test_error_fallback_raises(self):
        import pytest as _pytest

        with _pytest.raises(NotImplementedError):
            M.VideoFrameSampler(fallback="error")


class TestAudioFeatures:
    def test_known_signals(self):
        import ray.data as rd

        sr = 16000
        silence = np.zeros(sr, dtype=np.int16)
        # constant positive signal: zero RMS? no - rms=const, zcr=0
        const = np.full(sr, 1000, dtype=np.int16)
        # alternating sign every sample: zcr ~= 1
        alt = np.tile(np.array([2000, -2000], dtype=np.int16), sr // 2)
        ds = rd.from_arrow(
            pa.table(
                {
                    "media_id": pa.array(["sil", "const", "alt"]),
                    "audio": pa.array(
                        [
                            M.encode_audio_pcm(silence, sr),
                            M.encode_audio_pcm(const, sr),
                            M.encode_audio_pcm(alt, sr),
                        ],
                        type=pa.large_binary(),
                    ),
                }
            )
        )
        out = {
            r["media_id"]: r
            for r in ds.map_batches(
                M.AudioFeatures,
                fn_constructor_kwargs={"n_windows": 4},
                batch_format="pyarrow",
                concurrency=2,
            ).take_all()
        }
        for r in out.values():
            assert len(r["feat"]) == 8
            assert r["duration_s"] == 1.0 and r["sample_rate"] == sr
        f_sil, f_const, f_alt = out["sil"]["feat"], out["const"]["feat"], out["alt"]["feat"]
        assert all(v == 0.0 for v in f_sil)                 # silent: rms=zcr=0
        assert all(v > 0 for v in f_const[:4])              # constant: rms>0
        assert all(v == 0.0 for v in f_const[4:])           # constant: zcr=0
        assert all(v > 0.99 for v in f_alt[4:])             # alternating: zcr~1

    def test_deterministic_and_error_fallback(self):
        import pytest as _pytest

        buf = M.fake_audio_bytes(1234, 8000, seed=3)
        assert buf == M.fake_audio_bytes(1234, 8000, seed=3)
        with _pytest.raises(NotImplementedError):
            M.AudioFeatures(fallback="error")


class TestNullPayloads:
    """A single null media cell must not kill the pipeline (ADVICE r3):
    null video -> no frames emitted; null audio -> zero-feature row."""

    def test_video_null_payload_emits_no_frames(self):
        good = M.fake_video_bytes(n_frames=4, height=2, width=2, seed=1)
        ds = rd.from_arrow(
            pa.table(
                {
                    "media_id": pa.array(["ok", "null", "empty"]),
                    "video": pa.array([good, None, b""], type=pa.large_binary()),
                }
            )
        )
        rows = ds.map_batches(
            M.VideoFrameSampler,
            fn_constructor_kwargs={"num_frames": 2},
            batch_format="pyarrow",
            concurrency=2,
        ).take_all()
        assert {r["media_id"] for r in rows} == {"ok"}
        assert len(rows) == 2

    def test_audio_null_payload_zero_features(self):
        good = M.fake_audio_bytes(1600, 16000, seed=2)
        ds = rd.from_arrow(
            pa.table(
                {
                    "media_id": pa.array(["ok", "null"]),
                    "audio": pa.array([good, None], type=pa.large_binary()),
                }
            )
        )
        out = {
            r["media_id"]: r
            for r in ds.map_batches(
                M.AudioFeatures,
                fn_constructor_kwargs={"n_windows": 4},
                batch_format="pyarrow",
                concurrency=2,
            ).take_all()
        }
        assert len(out) == 2
        null_row = out["null"]
        assert all(v == 0.0 for v in null_row["feat"])
        assert null_row["duration_s"] == 0.0 and null_row["sample_rate"] == 0
