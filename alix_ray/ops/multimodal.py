"""Multimodal column plumbing: decode / feature-extract / resize /
frame-sample stages for opaque ``binary`` media columns.

The Ray-side plumbing is real and tested — schema contracts, actor-pool
stage shapes, small-batch sizing for wide binary rows, typed metadata
output layout.  The actual media decoding is STUBBED: the image/audio
libraries are not available in this container, so each decoder either
raises ``NotImplementedError`` (strict mode) or produces a
deterministic fake derived from the payload bytes (plumbing mode, used
by tests).  Swap ``_decode_image``/``_decode_audio`` for PIL/libsndfile
calls in a real deployment; nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("meta", pa.string()),  # JSON typed metadata
    ]
)


def _decode_image(payload: bytes, strict: bool):
    if strict:
        raise NotImplementedError(
            "image decode requires PIL/opencv — not shipped in this container"
        )
    # deterministic fake: 8x8 grayscale derived from payload digest
    d = hashlib.blake2b(payload or b"", digest_size=64).digest()
    return np.frombuffer(d, np.uint8).reshape(8, 8)


def _decode_audio(payload: bytes, strict: bool):
    if strict:
        raise NotImplementedError(
            "audio decode requires libsndfile — not shipped in this container"
        )
    d = hashlib.blake2b(payload or b"", digest_size=64).digest()
    return (np.frombuffer(d, np.uint8).astype(np.float32) - 127.5) / 127.5


class ImageFeatures:
    """Actor-pool stage: decode → resize → feature vector.

    Use small ``batch_size`` (wide binary rows) and ``concurrency=N``;
    the expensive decoder state initializes once per actor.
    """

    def __init__(self, strict: bool = False, out_dim: int = 16):
        self.strict = strict
        self.out_dim = out_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ok = [], []
        for payload in batch["payload"].to_pylist():
            try:
                img = _decode_image(payload, self.strict)
                # "resize" + pooled features (deterministic stand-in)
                v = img.astype(np.float32).mean(axis=0)
                v = np.resize(v, self.out_dim) / 255.0
                feats.append(v.tolist())
                ok.append(True)
            except NotImplementedError:
                raise
            except Exception:
                feats.append([0.0] * self.out_dim)
                ok.append(False)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.array(feats, pa.list_(pa.float32())),
                "decoded": pa.array(ok, pa.bool_()),
            }
        )


class AudioFrames:
    """Actor-pool stage: decode → fixed-hop frame sampling (frame RMS)."""

    def __init__(self, strict: bool = False, hop: int = 16):
        self.strict = strict
        self.hop = hop

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch["payload"].to_pylist():
            wav = _decode_audio(payload, self.strict)
            n = (len(wav) // self.hop) * self.hop
            frames = wav[:n].reshape(-1, self.hop)
            out.append(np.sqrt((frames**2).mean(axis=1)).tolist())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "frame_rms": pa.array(out, pa.list_(pa.float32())),
            }
        )


def _probe_video(payload: bytes, strict: bool) -> tuple[int, float]:
    """(frame count, fps) from the container header — STUB: derives a
    deterministic fake from the payload digest."""
    if strict:
        raise NotImplementedError(
            "video demux requires ffmpeg/pyav — not shipped in this container"
        )
    d = hashlib.blake2b(payload or b"", digest_size=8).digest()
    n_frames = 32 + int.from_bytes(d[:2], "little") % 480
    fps = 24.0
    return n_frames, fps


class VideoFrameSample:
    """Actor-pool stage: demux → stride frame sampling → per-frame
    feature vector.  Only the SELECTED frames are decoded (stride
    sampling is the 100-TB discipline: decoding every frame of web
    video is ~30× the useful work); output rows are
    ``(media_id, frame_index, ts_sec, features)`` — one row per
    sampled frame, so downstream stages (dedup, ANN) treat frames as
    ordinary embedding rows."""

    def __init__(self, strict: bool = False, every_sec: float = 2.0,
                 out_dim: int = 16, max_frames: int = 16):
        self.strict = strict
        self.every_sec = every_sec
        self.out_dim = out_dim
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, fidx, ts, feats = [], [], [], []
        for media_id, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            n_frames, fps = _probe_video(payload, self.strict)
            stride = max(1, int(round(self.every_sec * fps)))
            sel = list(range(0, n_frames, stride))[: self.max_frames]
            for j in sel:
                # decode ONLY frame j (stub: digest over payload+index)
                d = hashlib.blake2b(
                    (payload or b"") + j.to_bytes(4, "little"),
                    digest_size=self.out_dim,
                ).digest()
                mids.append(media_id)
                fidx.append(j)
                ts.append(j / fps)
                feats.append(
                    (np.frombuffer(d, np.uint8).astype(np.float32) / 255.0)
                    .tolist()
                )
        return pa.table(
            {
                "media_id": pa.array(mids, pa.int64()),
                "frame_index": pa.array(fidx, pa.int32()),
                "ts_sec": pa.array(ts, pa.float32()),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def media_pipeline(ds: ray.data.Dataset, kind: str, concurrency: int = 2,
                   batch_size: int = 16, strict: bool = False):
    """Wire the right actor-pool stage for a media kind."""
    cls = {"image": ImageFeatures, "audio": AudioFrames,
           "video": VideoFrameSample}[kind]
    return ds.map_batches(
        cls,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,  # small: rows are wide binaries
        concurrency=concurrency,
    )
