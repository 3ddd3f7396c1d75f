"""Multimodal columns: image/audio payloads as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The container ships no image/audio codec libraries, so the DECODE step is
stubbed exactly as the driver contract allows: ``ImageDecoder`` tries the
real libraries (PIL) in ``__init__`` and otherwise uses a deterministic
fake codec over a self-describing raw format (``RAWI`` header + uint8
pixel buffer) — the Ray-side plumbing (schema, actor signature, batch
sizing, output layout) is real and tested end-to-end. Everything AFTER
decode (resize, frame sampling, feature extraction) is real vectorized
numpy over the decoded buffers.

Layout conventions (the contract between stages):

* encoded:  (id: string|int64, image: binary, media_type: string)
* decoded:  (..., pixels: binary raw uint8 HxWxC, height/width/channels:
  int64) — pixels stay an opaque Arrow binary buffer (zero-copy through
  the object store), never a Python list of ints.
* features: (..., feat: list<float>)

Batch-size guidance (SURVEY.md §4 memory row): payload columns are wide —
size ``batch_size`` so batch_bytes x concurrency fits the worker heap
(e.g. 1 MiB images -> batch_size 64 at 16 actors ~ 1 GiB resident).
"""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ray.data import Dataset

_MAGIC = b"RAWI"


def fake_image_bytes(height: int, width: int, channels: int = 3, seed: int = 0) -> bytes:
    """Deterministic synthetic 'encoded image': RAWI header + seeded
    uint8 pixels. Stands in for JPEG/PNG payloads in tests/benches."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)
    return _MAGIC + struct.pack("<III", height, width, channels) + pixels.tobytes()


def _decode_rawi(buf: bytes) -> tuple[np.ndarray, int, int, int]:
    if buf[:4] != _MAGIC:
        raise ValueError("not a RAWI payload")
    h, w, c = struct.unpack("<III", buf[4:16])
    pixels = np.frombuffer(buf, dtype=np.uint8, offset=16).reshape(h, w, c)
    return pixels, h, w, c


class ImageDecoder:
    """Actor-pool decode stage: binary image column -> raw pixel buffer +
    dimension columns.

    Real-codec path: ``__init__`` imports PIL once per actor (the
    per-actor setup the reference does per worker, finder.go:163-166);
    absent codecs, ``fallback='rawi'`` decodes the deterministic synthetic
    format and ``fallback='error'`` raises NotImplementedError — the
    clearly-marked stub the environment mandates.
    """

    def __init__(self, in_col: str = "image", fallback: str = "rawi"):
        self.in_col = in_col
        self.fallback = fallback
        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None
            if fallback == "error":
                raise NotImplementedError(
                    "no image codec available (PIL missing) and fallback "
                    "disabled; install pillow or use fallback='rawi'"
                )

    def _decode_one(self, buf: bytes) -> tuple[np.ndarray, int, int, int]:
        if self._pil is not None and buf[:4] != _MAGIC:  # pragma: no cover
            import io

            img = np.asarray(self._pil.open(io.BytesIO(buf)).convert("RGB"))
            return img, img.shape[0], img.shape[1], img.shape[2]
        return _decode_rawi(buf)

    def __call__(self, batch: pa.Table) -> pa.Table:
        bufs = batch[self.in_col].to_pylist()
        pixels, hs, ws, cs = [], [], [], []
        for buf in bufs:
            p, h, w, c = self._decode_one(buf)
            pixels.append(p.tobytes())
            hs.append(h)
            ws.append(w)
            cs.append(c)
        out = batch.drop_columns([self.in_col])
        return (
            out.append_column("pixels", pa.array(pixels, type=pa.large_binary()))
            .append_column("height", pa.array(hs, type=pa.int64()))
            .append_column("width", pa.array(ws, type=pa.int64()))
            .append_column("channels", pa.array(cs, type=pa.int64()))
        )


class ImageResizer:
    """Actor-pool resize stage over DECODED buffers: real nearest-neighbor
    resampling in numpy (no codec needed), index grids precomputed per
    actor per target size."""

    def __init__(self, out_h: int = 64, out_w: int = 64):
        self.out_h = out_h
        self.out_w = out_w
        self._grids: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}

    def _grid(self, h: int, w: int) -> tuple[np.ndarray, np.ndarray]:
        key = (h, w)
        g = self._grids.get(key)
        if g is None:
            rows = (np.arange(self.out_h) * h // self.out_h).astype(np.intp)
            cols = (np.arange(self.out_w) * w // self.out_w).astype(np.intp)
            g = self._grids[key] = (rows, cols)
        return g

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = batch["height"].to_pylist()
        ws = batch["width"].to_pylist()
        cs = batch["channels"].to_pylist()
        out_px = []
        for buf, h, w, c in zip(batch["pixels"].to_pylist(), hs, ws, cs):
            img = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, c)
            rows, cols = self._grid(h, w)
            out_px.append(img[rows[:, None], cols[None, :], :].tobytes())
        n = batch.num_rows
        out = batch.drop_columns(["pixels", "height", "width"])
        return (
            out.append_column("pixels", pa.array(out_px, type=pa.large_binary()))
            .append_column(
                "height", pa.array([self.out_h] * n, type=pa.int64())
            )
            .append_column("width", pa.array([self.out_w] * n, type=pa.int64()))
        )


class ImageFeatures:
    """Per-channel mean/std + 8-bin grayscale histogram features (real
    numpy over decoded buffers) -> feat: list<float> for the ANN stages."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for buf, h, w, c in zip(
            batch["pixels"].to_pylist(),
            batch["height"].to_pylist(),
            batch["width"].to_pylist(),
            batch["channels"].to_pylist(),
        ):
            img = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, c).astype(np.float64)
            gray = img.mean(axis=2)
            hist, _ = np.histogram(gray, bins=8, range=(0, 256))
            hist = hist / max(1, gray.size)
            f = np.concatenate(
                [img.mean(axis=(0, 1)) / 255.0, img.std(axis=(0, 1)) / 255.0, hist]
            )
            feats.append(f.astype(np.float32))
        return batch.append_column(
            "feat", pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32()))
        )


@dataclass(frozen=True)
class MediaPipelineConfig:
    batch_size: int = 64       # payload columns are wide; keep batches small
    concurrency: int = 4       # actor-pool size; scale to cluster
    out_h: int = 64
    out_w: int = 64


def decode_resize_featurize(
    ds: Dataset, cfg: MediaPipelineConfig | None = None
) -> Dataset:
    """encoded images -> decoded -> resized -> feature vectors, each step
    an actor-pool ``map_batches`` (state built once per actor)."""
    cfg = cfg or MediaPipelineConfig()
    decoded = ds.map_batches(
        ImageDecoder,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.concurrency,
    )
    resized = decoded.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"out_h": cfg.out_h, "out_w": cfg.out_w},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.concurrency,
    )
    return resized.map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.concurrency,
    )


_MAGIC_V = b"RAWV"


def fake_video_bytes(
    n_frames: int, height: int, width: int, channels: int = 3, seed: int = 0
) -> bytes:
    """Deterministic synthetic 'encoded video': RAWV header + seeded
    uint8 frame stack. Stands in for MP4/WebM payloads in tests."""
    rng = np.random.default_rng(seed)
    frames = rng.integers(
        0, 256, size=(n_frames, height, width, channels), dtype=np.uint8
    )
    return (
        _MAGIC_V
        + struct.pack("<IIII", n_frames, height, width, channels)
        + frames.tobytes()
    )


class VideoFrameSampler:
    """Actor-pool frame-sampling stage: binary video column -> one row
    per sampled frame, in the DECODED image layout (pixels/height/width/
    channels + frame_idx/n_frames), so ``ImageResizer``/``ImageFeatures``
    chain directly onto the output.

    Sampling policy: ``num_frames`` uniformly-spaced frame indices
    (first frame always included; fewer if the video is shorter), or
    ``every``-th frame when set. Real codecs would slot into
    ``_decode_header``/``_frame`` exactly like ``ImageDecoder``'s PIL
    path; absent codecs the deterministic RAWV format decodes (fallback
    'rawi'-style contract) and ``fallback='error'`` raises the mandated
    NotImplementedError.

    Scale: one video row expands to ``num_frames`` frame rows — batch
    bytes grow by that factor, so size ``batch_size`` to
    payload x num_frames x concurrency (module docstring guidance).
    """

    def __init__(
        self,
        in_col: str = "video",
        num_frames: int = 8,
        every: int | None = None,
        fallback: str = "rawv",
    ):
        if fallback == "error":
            raise NotImplementedError(
                "no video codec available in this container; use the "
                "deterministic RAWV fallback or install a codec"
            )
        self.in_col = in_col
        self.num_frames = num_frames
        self.every = every

    def _indices(self, n: int) -> np.ndarray:
        if self.every is not None:
            return np.arange(0, n, self.every, dtype=np.int64)
        k = min(self.num_frames, n)
        return np.unique(np.linspace(0, n - 1, k).astype(np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep_cols = [c for c in batch.column_names if c != self.in_col]
        rep_idx: list[int] = []
        pixels, fidx, nf, hs, ws, cs = [], [], [], [], [], []
        for row, buf in enumerate(batch[self.in_col].to_pylist()):
            if buf is None or len(buf) == 0:
                # null payload -> no frames (mirrors decontam's null-text
                # handling: nulls are empty, never a crash)
                continue
            if buf[:4] != _MAGIC_V:
                raise ValueError("not a RAWV payload")
            n, h, w, c = struct.unpack("<IIII", buf[4:20])
            frame_bytes = h * w * c
            for i in self._indices(n):
                off = 20 + int(i) * frame_bytes
                pixels.append(buf[off : off + frame_bytes])
                fidx.append(int(i))
                nf.append(n)
                hs.append(h)
                ws.append(w)
                cs.append(c)
                rep_idx.append(row)
        out = batch.select(keep_cols).take(pa.array(rep_idx, type=pa.int64()))
        return (
            out.append_column("pixels", pa.array(pixels, type=pa.large_binary()))
            .append_column("frame_idx", pa.array(fidx, type=pa.int64()))
            .append_column("n_frames", pa.array(nf, type=pa.int64()))
            .append_column("height", pa.array(hs, type=pa.int64()))
            .append_column("width", pa.array(ws, type=pa.int64()))
            .append_column("channels", pa.array(cs, type=pa.int64()))
        )


def sample_frames_featurize(
    ds: Dataset,
    cfg: MediaPipelineConfig | None = None,
    *,
    in_col: str = "video",
    num_frames: int = 8,
) -> Dataset:
    """encoded videos -> sampled frames -> resized -> per-frame feature
    vectors; every step an actor-pool ``map_batches``."""
    cfg = cfg or MediaPipelineConfig()
    frames = ds.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"in_col": in_col, "num_frames": num_frames},
        batch_format="pyarrow",
        batch_size=max(1, cfg.batch_size // num_frames),
        concurrency=cfg.concurrency,
    )
    resized = frames.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"out_h": cfg.out_h, "out_w": cfg.out_w},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.concurrency,
    )
    return resized.map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.concurrency,
    )


_MAGIC_A = b"RAWA"


def fake_audio_bytes(n_samples: int, sample_rate: int = 16000, seed: int = 0) -> bytes:
    """Deterministic synthetic 'encoded audio': RAWA header + seeded
    int16 PCM samples. Stands in for WAV/FLAC payloads in tests."""
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-(2**15), 2**15, size=n_samples, dtype=np.int16)
    return _MAGIC_A + struct.pack("<II", n_samples, sample_rate) + pcm.tobytes()


def encode_audio_pcm(pcm: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Wrap an int16 PCM array in the RAWA container (test signals)."""
    pcm = np.asarray(pcm, dtype=np.int16)
    return _MAGIC_A + struct.pack("<II", len(pcm), sample_rate) + pcm.tobytes()


class AudioFeatures:
    """Actor-pool audio featurizer: binary audio column -> windowed RMS
    energy + zero-crossing-rate features (real numpy over decoded PCM) +
    duration/sample-rate metadata.

    The decode is the deterministic RAWA container (real codecs slot in
    exactly like ``ImageDecoder``'s PIL path; ``fallback='error'``
    raises the mandated NotImplementedError). Feature layout:
    ``feat = [rms_0..rms_{k-1}, zcr_0..zcr_{k-1}]`` over ``n_windows``
    equal time slices (RMS normalized to [0,1], ZCR = sign-change
    fraction per window).
    """

    def __init__(
        self, in_col: str = "audio", n_windows: int = 16, fallback: str = "rawa"
    ):
        if fallback == "error":
            raise NotImplementedError(
                "no audio codec available in this container; use the "
                "deterministic RAWA fallback or install a codec"
            )
        self.in_col = in_col
        self.n_windows = n_windows

    def _features(self, pcm: np.ndarray) -> np.ndarray:
        k = self.n_windows
        x = pcm.astype(np.float64) / 2**15
        n = len(x)
        if n == 0:
            return np.zeros(2 * k, dtype=np.float32)
        bounds = (np.arange(k + 1) * n) // k
        rms = np.empty(k)
        zcr = np.empty(k)
        sign = np.signbit(x)
        for i in range(k):
            lo, hi = bounds[i], max(bounds[i + 1], bounds[i] + 1)
            seg = x[lo:hi]
            rms[i] = np.sqrt(np.mean(seg * seg))
            zcr[i] = (
                np.count_nonzero(sign[lo + 1 : hi] != sign[lo : hi - 1])
                / max(1, hi - lo - 1)
            )
        return np.concatenate([rms, zcr]).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, durs, rates = [], [], []
        for buf in batch[self.in_col].to_pylist():
            if buf is None or len(buf) == 0:
                # null payload -> zero features (row alignment preserved)
                feats.append(
                    np.zeros(2 * self.n_windows, dtype=np.float32).tolist()
                )
                durs.append(0.0)
                rates.append(0)
                continue
            if buf[:4] != _MAGIC_A:
                raise ValueError("not a RAWA payload")
            n, sr = struct.unpack("<II", buf[4:12])
            pcm = np.frombuffer(buf, dtype=np.int16, offset=12, count=n)
            feats.append(self._features(pcm).tolist())
            durs.append(n / sr)
            rates.append(sr)
        out = batch.drop_columns([self.in_col])
        return (
            out.append_column("feat", pa.array(feats, type=pa.list_(pa.float32())))
            .append_column("duration_s", pa.array(durs, type=pa.float64()))
            .append_column("sample_rate", pa.array(rates, type=pa.int64()))
        )


def exact_dup_media(ds: Dataset, payload_col: str = "image") -> Dataset:
    """Byte-identical media dedup: content-hash the binary payload and
    group — the reference's full-hash semantics applied to an opaque
    payload column (hasher.go:22-42)."""
    def add_hash(batch: pa.Table) -> pa.Table:
        hs = [
            hashlib.blake2b(b or b"", digest_size=32).hexdigest()
            for b in batch[payload_col].to_pylist()
        ]
        return batch.append_column("media_hash", pa.array(hs, type=pa.string()))

    from doppel_ray.stages import exact

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    # terminal result, no downstream exact re-verify -> Bloom FPs would
    # surface unique media as 'duplicates'; force the exact semi-join
    return exact.prune_singletons(hashed, "media_hash", allow_bloom=False)
