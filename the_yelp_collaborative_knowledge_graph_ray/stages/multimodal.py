"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as an Arrow ``large_binary`` column
next to typed metadata (media_type, width/height/duration). Decode and
feature extraction run as actor-pool ``map_batches`` stages sized for large
payloads (small ``batch_size``, bytes-aware).

LOSSY external codecs (JPEG/FLAC/MP4 via PIL/ffmpeg/torchaudio) are NOT
available in this container, so THIS module's decode step is STUBBED:
:class:`MediaFeatureExtractor` raises ``NotImplementedError`` in ``real``
mode and uses a deterministic fake decode (payload bytes -> seeded feature
vector) in ``fake`` mode. The Ray-side plumbing — schema, broadcast config,
actor signature, batch sizing, output layout — is real and tested; swapping
``_decode_fake`` for a PIL/ffmpeg call changes nothing else. For formats
decodable with the standard library, ``stages/media_codecs.py`` implements
the decode FOR REAL with the same actor-pool seams, oracle-gated end to
end: RIFF/PCM WAV via ``wave``, binary P6 PPM via numpy, round 4's
zlib-DEFLATE **PNG** (chunk walk + CRC32 verification + all five scanline
filters — a genuine COMPRESSION boundary), and round 5's baseline
**JPEG** — a genuinely LOSSY codec (std Huffman entropy layer, Annex-K
quantization) made oracle-gateable by pinning the same integer DCT on
both ends, so the decoded plane is a deterministic integer function the
SQL twin replays. Round 5 also implements a real FLAC
subset (Rice-coded fixed-predictor frames, CRC-8/CRC-16/MD5 all
verified) and a real MJPEG-in-AVI video container decode (RIFF/LIST
walk, every frame through the pinned-DCT JPEG decoder), so the
remaining stub scope is inter-frame-predicted codecs alone —
H.264-class motion compensation is beyond a from-scratch stdlib
implementation, not merely lossy.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("media_type", pa.string()),      # "image" | "audio" | "video"
    ("payload", pa.large_binary()),   # opaque encoded bytes
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])

FEATURE_DIM = 32


def synthesize_media(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Deterministic fake media table derived from the documents table (the
    container has no real image/audio fixtures): payload = UTF-8 bytes of the
    text; metadata derived from doc_id. Exercises the binary-column path
    end-to-end."""
    def mk(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        kinds = np.array(["image", "audio", "video"])[ids % 3]
        payload = [t.encode("utf-8") for t in b["text"].to_pylist()]
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(kinds, pa.string()),
            "payload": pa.array(payload, pa.large_binary()),
            "width": pa.array((ids % 640 + 64).astype(np.int32)),
            "height": pa.array((ids % 480 + 48).astype(np.int32)),
            # seconds-scale spread at ANY doc_id range so the frame sampler
            # exercises 1..max_frames frames per video, not a fixed count
            "duration_ms": pa.array((ids % 90 * 1000).astype(np.int32)),
        }, schema=MEDIA_SCHEMA)

    return docs.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)


class MediaFeatureExtractor:
    """Actor-pool callable: decode + featurize one batch of media rows.

    ``mode="fake"`` — deterministic stand-in (sha256 of payload seeds a
    feature vector); ``mode="real"`` — raises NotImplementedError with the
    dependency that would be required (PIL / ffmpeg), marking the container
    boundary explicitly.
    """

    def __init__(self, mode: str = "fake", feature_dim: int = FEATURE_DIM):
        self.mode = mode
        self.dim = feature_dim
        # real codecs would be loaded HERE, once per actor

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "little")
        rng = np.random.RandomState(seed)
        v = rng.standard_normal(self.dim)
        return v / np.linalg.norm(v)

    def __call__(self, b: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError(
                "real media decode needs PIL/ffmpeg, not present in this "
                "container; run with mode='fake' for the plumbing path")
        feats = np.stack([self._decode_fake(p)
                          for p in b["payload"].to_pylist()])
        return pa.table({
            "media_id": b["media_id"],
            "media_type": b["media_type"],
            "feature": pa.array(feats.tolist(),
                                pa.list_(pa.float32(), self.dim)),
            "payload_bytes": pa.array(
                [len(p) for p in b["payload"].to_pylist()], pa.int64()),
        })


def extract_features(media: ray.data.Dataset, concurrency: int = 4,
                     batch_size: int = 256) -> ray.data.Dataset:
    """Small batch_size on purpose: batches of large binary payloads must be
    sized by bytes, not rows (SURVEY-level scale note)."""
    del concurrency
    from ..functions.broadcast import broadcast_map_batches
    return broadcast_map_batches(
        media, lambda: MediaFeatureExtractor(mode="fake"),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


class ImageResizer:
    """Actor-pool callable: resize image payloads. ``mode="real"`` marks the
    container boundary (needs PIL); ``mode="fake"`` is a deterministic
    byte-level stand-in — halve each dimension, keep the first quarter of
    the payload bytes — chosen so the DuckDB oracle can reproduce it exactly
    (hex-string slicing) and the plumbing is hash-verified end to end.
    """

    def __init__(self, mode: str = "fake", factor: int = 2):
        self.mode = mode
        self.factor = factor
        # a real resizer would initialize PIL/turbojpeg HERE, once per actor

    def __call__(self, b: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError(
                "real image resize needs PIL, not present in this container")
        keep = b.filter(pa.compute.equal(b["media_type"], "image"))
        f2 = self.factor * self.factor
        out_hex, n_bytes = [], []
        for p in keep["payload"].to_pylist():
            h = p.hex().upper()
            kb = (len(p) + f2 - 1) // f2
            out_hex.append(h[:kb * 2])
            n_bytes.append(kb)
        w = keep["width"].to_numpy() // self.factor
        hgt = keep["height"].to_numpy() // self.factor
        return pa.table({
            "media_id": keep["media_id"],
            "width": pa.array(w.astype(np.int32)),
            "height": pa.array(hgt.astype(np.int32)),
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "payload_hex": pa.array(out_hex, pa.string())})


class FrameSampler:
    """Actor-pool callable: sample frames from video payloads (one row per
    sampled frame — the explode-shaped multimodal stage). ``mode="real"``
    marks the ffmpeg boundary; ``mode="fake"`` slices the payload into n
    deterministic byte windows (n = min(duration/every_ms + 1, max_frames)),
    hex-reproducible by the SQL oracle.
    """

    def __init__(self, mode: str = "fake", every_ms: int = 1000,
                 max_frames: int = 8):
        self.mode = mode
        self.every_ms = every_ms
        self.max_frames = max_frames

    def __call__(self, b: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError(
                "real frame sampling needs ffmpeg, not in this container")
        keep = b.filter(pa.compute.equal(b["media_type"], "video"))
        mid, fidx, ts, fhex, fbytes = [], [], [], [], []
        for i in range(keep.num_rows):
            p = keep["payload"][i].as_py()
            dur = keep["duration_ms"][i].as_py()
            h = p.hex().upper()
            n = min(dur // self.every_ms + 1, self.max_frames)
            stride = max(1, len(p) // n)
            for k in range(n):
                sl = h[k * stride * 2: (k + 1) * stride * 2]
                mid.append(keep["media_id"][i].as_py())
                fidx.append(k)
                ts.append(k * self.every_ms)
                fhex.append(sl)
                fbytes.append(len(sl) // 2)
        return pa.table({
            "media_id": pa.array(mid, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int64()),
            "ts_ms": pa.array(ts, pa.int64()),
            "frame_bytes": pa.array(fbytes, pa.int64()),
            "frame_hex": pa.array(fhex, pa.string())})


def resize_images(media: ray.data.Dataset, concurrency: int = 4,
                  batch_size: int = 256) -> ray.data.Dataset:
    del concurrency
    from ..functions.broadcast import broadcast_map_batches
    return broadcast_map_batches(
        media, lambda: ImageResizer(mode="fake"),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


def sample_frames(media: ray.data.Dataset, concurrency: int = 4,
                  batch_size: int = 128) -> ray.data.Dataset:
    """Smaller batch_size than the scalar stages: output fan-out is up to
    max_frames rows per input row of large payload slices."""
    del concurrency
    from ..functions.broadcast import broadcast_map_batches
    return broadcast_map_batches(
        media, lambda: FrameSampler(mode="fake"),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)
