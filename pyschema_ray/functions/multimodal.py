"""Multimodal column plumbing: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by actor-pool
``map_batches`` stages.

Decode support is REAL for the uncompressed formats (pure-numpy
codecs, no external library — ``codecs.py``): PPM and 24-bit BMP
images, PCM WAV audio, YUV4MPEG2 (y4m) video.  Compressed formats
(JPEG/PNG/FLAC/MP4...) need codec libraries this environment lacks
and raise ``NotImplementedError`` unless the stage is constructed
with ``fake=True`` (deterministic hash-derived outputs for plumbing
tests).  The Ray-side plumbing —
schema, batch sizing, actor signatures, output layout — is identical
on every path (tests/test_functions.py::test_multimodal_*,
tests/test_codecs.py).

Scale notes baked in: media batches must be SMALL (payloads are KB–MB
per row; default ``batch_size=32``) and stages should run as actor
pools so codec/model setup happens once per worker, with
``num_cpus``/``concurrency`` sized to keep payload bytes × in-flight
batches inside worker heaps.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

#: canonical media-column schema fragment
MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.string(), nullable=False),
    pa.field("payload", pa.binary()),            # opaque encoded bytes
    pa.field("media_type", pa.string()),         # "image" | "audio" | "video"
    pa.field("format", pa.string()),             # "jpeg", "wav", ...
    pa.field("width", pa.int32()),               # images/video
    pa.field("height", pa.int32()),
    pa.field("duration_ms", pa.int32()),         # audio/video
])

RECOMMENDED_MEDIA_BATCH_SIZE = 32


def _det_floats(seed_bytes: bytes, n: int) -> np.ndarray:
    """Deterministic pseudo-features from payload bytes (fake path)."""
    h = hashlib.sha256(seed_bytes).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return rng.standard_normal(n).astype(np.float32)


class ImageDecoder:
    """Actor-pool stage: decode + resize images to fixed (H, W) and emit
    a float feature vector.  Real implementation would hold the codec /
    preprocessing pipeline in ``__init__`` (once per actor)."""

    def __init__(self, height: int = 224, width: int = 224,
                 payload_col: str = "payload", fake: bool = False):
        self.height = height
        self.width = width
        self.payload_col = payload_col
        self.fake = fake
        # per-actor setup (once, never per batch): bind the codec
        # table here — a heavier real pipeline would load models too
        from . import codecs
        self._codecs = codecs

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if self.fake:
            return _det_floats(payload, 8)
        c = self._codecs
        fmt = c.sniff_format(payload)
        if fmt == "ppm":
            img = c.decode_ppm(payload)
        elif fmt == "bmp":
            img = c.decode_bmp(payload)
        elif fmt == "jpeg":
            from .jpeg import decode_jpeg
            img = decode_jpeg(payload)
            if img.ndim == 2:  # greyscale -> 3-channel for features
                img = np.repeat(img[:, :, None], 3, axis=2)
        elif fmt == "png":
            from .png import decode_png
            img = decode_png(payload)
        elif fmt == "gif":
            from .gif import decode_gif
            img = decode_gif(payload)
        else:
            raise NotImplementedError(
                f"no codec for format {fmt!r} in this environment "
                "(PPM/BMP/JPEG/PNG/GIF decode for real; construct with "
                "fake=True for plumbing tests of other formats)")
        return c.image_features(c.resize_nearest(img, self.height,
                                                 self.width))

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = [self._decode_one(p) if p is not None else None
                 for p in t[self.payload_col].to_pylist()]
        valid = [f if f is not None else np.zeros(8, np.float32)
                 for f in feats]
        flat = pa.array(np.concatenate(valid), pa.float32())
        col = pa.FixedSizeListArray.from_arrays(flat, 8)
        out = t.drop_columns([self.payload_col])  # payload not re-emitted
        return out.append_column("image_features", col)


class AudioFrameSampler:
    """Actor-pool stage: sample N fixed-position frames from an audio
    payload and emit per-frame energy.  Stubbed like ImageDecoder."""

    def __init__(self, n_frames: int = 4, payload_col: str = "payload",
                 fake: bool = False):
        self.n_frames = n_frames
        self.payload_col = payload_col
        self.fake = fake
        from . import codecs
        self._codecs = codecs

    def _decode_one(self, payload: bytes) -> np.ndarray:
        if self.fake:
            return np.abs(_det_floats(payload, self.n_frames))
        c = self._codecs
        if c.sniff_format(payload) != "wav":
            raise NotImplementedError(
                "only PCM WAV decodes for real in this environment; "
                "construct with fake=True for other formats")
        x, _rate = c.decode_wav(payload)
        if len(x) == 0:
            return np.zeros(self.n_frames, np.float32)
        # per-frame RMS energy over n_frames equal chunks
        bounds = np.linspace(0, len(x), self.n_frames + 1).astype(np.int64)
        return np.array(
            [np.sqrt(np.mean(np.square(x[a:b]))) if b > a else 0.0
             for a, b in zip(bounds[:-1], bounds[1:])], np.float32)

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = [self._decode_one(p) if p is not None
                 else np.zeros(self.n_frames, np.float32)
                 for p in t[self.payload_col].to_pylist()]
        flat = pa.array(np.concatenate(feats), pa.float32())
        col = pa.FixedSizeListArray.from_arrays(flat, self.n_frames)
        out = t.drop_columns([self.payload_col])
        return out.append_column("frame_energy", col)


def decode_images(ds, height: int = 224, width: int = 224,
                  fake: bool = False, concurrency=(1, 4),
                  batch_size: int = RECOMMENDED_MEDIA_BATCH_SIZE):
    """The canonical wiring: small batches, actor pool, payload dropped
    after decode so downstream blocks shrink."""
    return ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs=dict(height=height, width=width, fake=fake),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def sample_audio_frames(ds, n_frames: int = 4, fake: bool = False,
                        concurrency=(1, 4),
                        batch_size: int = RECOMMENDED_MEDIA_BATCH_SIZE):
    return ds.map_batches(
        AudioFrameSampler,
        fn_constructor_kwargs=dict(n_frames=n_frames, fake=fake),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


class VideoFrameSampler:
    """Actor-pool stage: sample ``n_frames`` frames at evenly spaced
    timestamps from a video payload and EXPLODE one row per frame
    (media_id, frame_index, timestamp_ms, frame_features) — the
    one-to-many layout downstream per-frame models consume.  REAL for
    uncompressed YUV4MPEG2 payloads (luma-plane features per sampled
    frame); compressed containers stay stubbed behind ``fake=True``."""

    def __init__(self, n_frames: int = 8, feature_dim: int = 8,
                 payload_col: str = "payload", fake: bool = False):
        self.n_frames = n_frames
        self.dim = feature_dim
        self.payload_col = payload_col
        self.fake = fake
        from . import codecs
        self._codecs = codecs
        self._y4m_cache: tuple | None = None  # (payload id, frames)

    def _decode_one(self, payload: bytes, frame_idx: int) -> np.ndarray:
        if self.fake:
            return _det_floats(payload + bytes([frame_idx]), self.dim)
        c = self._codecs
        if c.sniff_format(payload) != "y4m":
            raise NotImplementedError(
                "only uncompressed YUV4MPEG2 decodes for real in this "
                "environment; construct with fake=True for other formats")
        # frames decoded once per payload, reused across its samples
        if self._y4m_cache is None or self._y4m_cache[0] is not payload:
            frames, _w, _h, _fps = c.decode_y4m(payload)
            self._y4m_cache = (payload, frames)
        frames = self._y4m_cache[1]
        if not frames:
            return np.zeros(self.dim, np.float32)
        y = frames[min(int(frame_idx * len(frames) / self.n_frames),
                       len(frames) - 1)]
        f = y.astype(np.float32) / 255.0
        # dim-float luma summary: mean/std + quarter-region means,
        # padded/truncated to feature_dim
        q = [f[:f.shape[0] // 2, :f.shape[1] // 2].mean(),
             f[:f.shape[0] // 2, f.shape[1] // 2:].mean(),
             f[f.shape[0] // 2:, :f.shape[1] // 2].mean(),
             f[f.shape[0] // 2:, f.shape[1] // 2:].mean()]
        feat = np.array([f.mean(), f.std(), *q,
                         np.log1p(f.size) / 20.0,
                         f.shape[0] / max(f.shape[1], 1)], np.float32)
        if len(feat) < self.dim:
            feat = np.pad(feat, (0, self.dim - len(feat)))
        return feat[:self.dim]

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, fidx, ts, feats = [], [], [], []
        payloads = t[self.payload_col].to_pylist()
        durations = t["duration_ms"].to_pylist() \
            if "duration_ms" in t.column_names else [0] * t.num_rows
        media_ids = t["media_id"].to_pylist()
        for mid, p, dur in zip(media_ids, payloads, durations):
            if p is None:
                continue
            dur = dur or 0
            for i in range(self.n_frames):
                ids.append(mid)
                fidx.append(i)
                ts.append(int(dur * i / max(1, self.n_frames)))
                feats.append(self._decode_one(p, i))
        flat = pa.array(
            np.concatenate(feats) if feats else np.empty(0, np.float32),
            pa.float32())
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "frame_index": pa.array(fidx, pa.int32()),
            "timestamp_ms": pa.array(ts, pa.int32()),
            "frame_features": pa.FixedSizeListArray.from_arrays(flat,
                                                                self.dim),
        })


def sample_video_frames(ds, n_frames: int = 8, fake: bool = False,
                        concurrency=(1, 4),
                        batch_size: int = RECOMMENDED_MEDIA_BATCH_SIZE):
    return ds.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs=dict(n_frames=n_frames, fake=fake),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


class EmbeddingModel:
    """Actor-pool BATCHED-inference stage: feature vectors -> embedding
    via one whole-batch matrix multiply.  The projection stands in for
    a real model (load weights once in ``__init__``, never per batch);
    derived deterministically from ``seed`` so every actor agrees
    without a broadcast.  Consumes the ``image_features`` /
    ``frame_features`` columns the decode stages emit."""

    def __init__(self, in_dim: int = 8, out_dim: int = 16,
                 seed: int = 1234, features_col: str = "image_features",
                 out_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.weights = rng.standard_normal((in_dim, out_dim)) \
            .astype(np.float32)
        self.features_col = features_col
        self.out_col = out_col

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.features_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        d = col.type.list_size
        flat = col.values.slice(col.offset * d, len(col) * d)
        m = np.asarray(flat.to_numpy(zero_copy_only=False),
                       dtype=np.float32).reshape(-1, d)
        emb = m @ self.weights  # ONE matmul per batch — never per row
        out_flat = pa.array(emb.reshape(-1), pa.float32())
        return t.append_column(
            self.out_col,
            pa.FixedSizeListArray.from_arrays(out_flat, emb.shape[1]))


def embed_features(ds, in_dim: int = 8, out_dim: int = 16,
                   features_col: str = "image_features",
                   concurrency=(1, 4), batch_size: int = 256):
    """Feature -> embedding inference wiring (bigger batches than the
    decode stages: inputs are small fixed vectors, and batched matmul
    throughput grows with batch size)."""
    return ds.map_batches(
        EmbeddingModel,
        fn_constructor_kwargs=dict(in_dim=in_dim, out_dim=out_dim,
                                   features_col=features_col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def synth_real_media_table(n: int = 48, seed: int = 42) -> pa.Table:
    """Deterministic media table whose payloads are REAL encoded media
    (PPM / BMP / baseline-JPEG images, PCM WAV audio, YUV4MPEG2 video
    cycling by row) — decodable by the pure-numpy codecs with no fake
    flag."""
    from . import codecs

    from . import codecs as _c

    rng = np.random.default_rng(seed)
    payloads, fmts, types, widths, heights, durs = [], [], [], [], [], []
    for i in range(n):
        kind = i % 6
        if kind == 4:
            from .jpeg import encode_jpeg
            h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(encode_jpeg(img, quality=90,
                                        subsampling="420"))
            fmts.append("jpeg")
            types.append("image")
            widths.append(w)
            heights.append(h)
            durs.append(0)
            continue
        if kind == 5:
            from .png import encode_png
            h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(encode_png(img))
            fmts.append("png")
            types.append("image")
            widths.append(w)
            heights.append(h)
            durs.append(0)
            continue
        if kind == 3:
            h, w = 16, 16
            nframes = int(rng.integers(4, 12))
            frames = [rng.integers(0, 256, size=(h, w), dtype=np.uint8)
                      for _ in range(nframes)]
            payloads.append(_c.encode_y4m(frames, fps=25))
            fmts.append("y4m")
            types.append("video")
            widths.append(w)
            heights.append(h)
            durs.append(int(nframes * 1000 / 25))
        elif kind == 0:
            h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(codecs.encode_ppm(img))
            fmts.append("ppm")
            types.append("image")
            widths.append(w)
            heights.append(h)
            durs.append(0)
        elif kind == 1:
            h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(codecs.encode_bmp(img))
            fmts.append("bmp")
            types.append("image")
            widths.append(w)
            heights.append(h)
            durs.append(0)
        else:
            ns = int(rng.integers(1000, 8000))
            x = rng.standard_normal(ns).astype(np.float32) * 0.1
            payloads.append(codecs.encode_wav(x, 8000))
            fmts.append("wav")
            types.append("audio")
            widths.append(0)
            heights.append(0)
            durs.append(int(ns * 1000 / 8000))
    return pa.table({
        "media_id": pa.array([f"m-{i:06d}" for i in range(n)], pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array(types, pa.string()),
        "format": pa.array(fmts, pa.string()),
        "width": pa.array(widths, pa.int32()),
        "height": pa.array(heights, pa.int32()),
        "duration_ms": pa.array(durs, pa.int32()),
    }).cast(MEDIA_SCHEMA)


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table matching MEDIA_SCHEMA (payloads
    are seeded random bytes), for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(512, 4096)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array([f"m-{i:06d}" for i in range(n)], pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array(["image"] * n, pa.string()),
        "format": pa.array(["fake"] * n, pa.string()),
        "width": pa.array([640] * n, pa.int32()),
        "height": pa.array([480] * n, pa.int32()),
        "duration_ms": pa.array([0] * n, pa.int32()),
    }).cast(MEDIA_SCHEMA)
