"""Multimodal column plumbing: decode / feature-extract / resize /
frame-sample stages for opaque ``binary`` media columns.

The Ray-side plumbing is real and tested — schema contracts, actor-pool
stage shapes, small-batch sizing for wide binary rows, typed metadata
output layout.  Decoding is OPTIONAL-DEPENDENCY: when PIL / soundfile /
pyav import (a real deployment), the decoders use them; otherwise each
decoder raises ``NotImplementedError`` (strict mode) or produces a
deterministic fake derived from the payload bytes (plumbing mode, used
by tests — these libraries are not shipped in this container).  The
output schema is identical either way, so downstream stages never see
the difference.

Failure contract: in non-strict mode NOTHING raises per row — a
corrupt/truncated payload is quarantined to the digest stub (or a
zeroed feature row with ``decoded=False`` where the stage carries that
flag), because a single bad media row must never abort a crawl-scale
pipeline (Ray retries a deterministically-failing task into the same
error).  ``strict=True`` propagates both missing-library and
corrupt-payload errors.
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pyarrow as pa
import ray.data


def _pil_image():
    """PIL's Image module, or None when the library is absent."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


def _soundfile():
    try:
        import soundfile
        return soundfile
    except ImportError:
        return None


def _pyav():
    try:
        import av
        return av
    except ImportError:
        return None

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("meta", pa.string()),  # JSON typed metadata
    ]
)


def _stub_image(payload: bytes) -> np.ndarray:
    """Deterministic fake: 8x8 grayscale derived from payload digest."""
    d = hashlib.blake2b(payload or b"", digest_size=64).digest()
    return np.frombuffer(d, np.uint8).reshape(8, 8)


def _decode_image(payload: bytes, strict: bool) -> np.ndarray:
    """Grayscale (H, W) uint8 pixels — PIL when importable, else the
    digest stub (or NotImplementedError under strict).  With PIL
    present a corrupt payload RAISES the decoder error; the quarantine
    policy (zeroed row + ``decoded=False``) belongs to the stage, so
    it can mark the row rather than silently passing stub pixels."""
    Image = _pil_image()
    if Image is not None:
        with Image.open(io.BytesIO(payload or b"")) as im:
            return np.asarray(im.convert("L"), np.uint8)
    if strict:
        raise NotImplementedError(
            "image decode requires PIL — not shipped in this container"
        )
    return _stub_image(payload)


def _decode_audio(payload: bytes, strict: bool) -> np.ndarray:
    """Mono float32 waveform — soundfile when importable, else the
    digest stub (or NotImplementedError under strict)."""
    sf = _soundfile()
    if sf is not None:
        data, _sr = sf.read(io.BytesIO(payload or b""), dtype="float32")
        data = np.asarray(data, np.float32)
        if data.ndim > 1:  # downmix channels
            data = data.mean(axis=1).astype(np.float32)
        return data
    if strict:
        raise NotImplementedError(
            "audio decode requires libsndfile — not shipped in this container"
        )
    return _stub_audio(payload)


def _stub_audio(payload: bytes) -> np.ndarray:
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
            except Exception:
                if self.strict:
                    raise
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
            try:
                wav = _decode_audio(payload, self.strict)
            except Exception:
                if self.strict:
                    raise
                # corrupt payload: quarantine to the digest stub —
                # one bad media row must never abort the pipeline
                wav = _stub_audio(payload)
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
    """(frame count, fps) from the container header — pyav when
    importable, else a deterministic fake from the payload digest."""
    av = _pyav()
    if av is not None:
        try:
            with av.open(io.BytesIO(payload or b"")) as c:
                s = c.streams.video[0]
                fps = float(s.average_rate) if s.average_rate else 24.0
                n = int(s.frames or 0)
                if not n and c.duration:
                    n = int(c.duration / 1_000_000 * fps)
                return (n or 32), fps
        except Exception:
            if strict:
                raise
            # corrupt container: quarantine to the digest stub
    elif strict:
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

    def _frame_features(self, payload: bytes, sel: list[int]) -> dict:
        """Features for the SELECTED frame indices only.  With pyav:
        sequential demux, decoding stops at the last wanted frame (a
        container without an index can't random-seek reliably; the
        bound is max(sel), itself capped by max_frames·stride).
        Without: digest stub per (payload, frame index)."""
        av = _pyav()
        if av is not None and sel:
            try:
                want, out = set(sel), {}
                with av.open(io.BytesIO(payload or b"")) as c:
                    for i, frame in enumerate(
                            c.decode(c.streams.video[0])):
                        if i in want:
                            g = frame.to_ndarray(format="gray").astype(
                                np.float32)
                            out[i] = (np.resize(g.mean(axis=0),
                                                self.out_dim)
                                      / 255.0).tolist()
                        if i >= sel[-1]:
                            break
                for j in sel:  # truncated stream: pad missing frames
                    out.setdefault(j, [0.0] * self.out_dim)
                return out
            except Exception:
                if self.strict:
                    raise
                # corrupt container: quarantine to the digest stub
        return {
            j: (np.frombuffer(
                hashlib.blake2b((payload or b"") + j.to_bytes(4, "little"),
                                digest_size=self.out_dim).digest(),
                np.uint8).astype(np.float32) / 255.0).tolist()
            for j in sel
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, fidx, ts, feats = [], [], [], []
        for media_id, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            n_frames, fps = _probe_video(payload, self.strict)
            stride = max(1, int(round(self.every_sec * fps)))
            sel = list(range(0, n_frames, stride))[: self.max_frames]
            by_idx = self._frame_features(payload, sel)
            for j in sel:
                mids.append(media_id)
                fidx.append(j)
                ts.append(j / fps)
                feats.append(by_idx[j])
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
