"""REAL multimodal decode paths for codec-free formats.

`stages/multimodal.py` plumbs opaque binary payloads through actor pools
with the decode STUBBED (no PIL/ffmpeg in this container). This module
closes that gap for two standard formats whose codecs need nothing beyond
the standard library and numpy — the decode is genuinely real, byte-level
work, not a fake kernel:

* **WAV (RIFF PCM)** — :func:`synthesize_wav_media` builds real 16-bit
  PCM mono WAV files (deterministic integer sawtooth signal, so every
  sample is an EXACT integer both engines can recompute);
  :class:`WavFeatureExtractor` decodes them with the stdlib ``wave``
  module + ``np.frombuffer`` and emits exact integer features (duration,
  sum |x|, sum x², zero crossings).
* **PPM (P6)** — :func:`synthesize_ppm_media` builds real binary
  PPM images (deterministic integer pixel pattern);
  :class:`PpmResizeFeatures` parses the header, decodes the RGB plane
  with numpy, REALLY resizes 2x by exact integer 2x2 box averaging
  (floor), and emits per-channel sums of the resized image.

Both synthesizers derive every byte from ``doc_id`` alone, so the DuckDB
oracle recomputes the features from first principles (``generate_series``
over samples / output pixels, pure integer arithmetic) — the Ray side is
hash-gated END TO END through a true decoder. JPEG/FLAC/MP4 stay behind
the documented external-codec seam in ``stages/multimodal.py``; swapping
these decoders for PIL/ffmpeg calls changes nothing else in the plumbing.
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pyarrow as pa

import ray.data

WAV_SR = 8000           # sample rate (Hz)
WAV_STEP_BASE = 997     # sawtooth increment = 997 + id % 31
WAV_N_BASE = 800        # n_samples = 800 + (id % 5) * 80

PPM_W, PPM_H = 24, 16   # source image size; resize output is 12 x 8


def _saw_samples(media_id: int) -> np.ndarray:
    """The exact int16 sawtooth this media id's WAV encodes:
    x_k = ((k * step + id * 17) % 65536) - 32768."""
    n = WAV_N_BASE + (media_id % 5) * 80
    step = WAV_STEP_BASE + media_id % 31
    k = np.arange(n, dtype=np.int64)
    return ((k * step + media_id * 17) % 65536 - 32768).astype(np.int16)


def synthesize_wav_media(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(media_id, payload): one REAL RIFF/WAV file per document — 16-bit
    PCM mono at 8 kHz, the deterministic integer sawtooth above."""
    def mk(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        payloads = []
        for mid in ids.tolist():
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(WAV_SR)
                w.writeframes(_saw_samples(int(mid)).tobytes())
            payloads.append(buf.getvalue())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary())})

    return docs.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)


class WavFeatureExtractor:
    """Actor-pool callable: REAL WAV decode (stdlib ``wave``) + exact
    integer features. The decode parses the actual RIFF container — a
    corrupted payload raises, which is the dead-letter contract."""

    def __call__(self, b: pa.Table) -> pa.Table:
        mid, ns, dur, sab, ssq, zc = [], [], [], [], [], []
        for i in range(b.num_rows):
            payload = b["payload"][i].as_py()
            with wave.open(io.BytesIO(payload), "rb") as w:
                # explicit raise, not assert: the dead-letter contract
                # ("corrupted payload raises") must survive `python -O`
                if w.getnchannels() != 1 or w.getsampwidth() != 2:
                    raise ValueError(
                        "WAV payload is not 16-bit mono PCM: "
                        f"channels={w.getnchannels()} "
                        f"sampwidth={w.getsampwidth()}")
                sr = w.getframerate()
                x = np.frombuffer(w.readframes(w.getnframes()),
                                  dtype="<i2").astype(np.int64)
            mid.append(b["media_id"][i].as_py())
            ns.append(len(x))
            dur.append(len(x) * 1000 // sr)
            sab.append(int(np.abs(x).sum()))
            ssq.append(int((x * x).sum()))
            zc.append(int(np.count_nonzero((x[1:] < 0) != (x[:-1] < 0))))
        return pa.table({
            "media_id": pa.array(mid, pa.int64()),
            "n_samples": pa.array(ns, pa.int64()),
            "duration_ms": pa.array(dur, pa.int64()),
            "sum_abs": pa.array(sab, pa.int64()),
            "sum_sq": pa.array(ssq, pa.int64()),
            "zero_crossings": pa.array(zc, pa.int64())})


def wav_features(docs: ray.data.Dataset, concurrency: int = 4,
                 batch_size: int = 256) -> ray.data.Dataset:
    return synthesize_wav_media(docs).map_batches(
        WavFeatureExtractor, batch_format="pyarrow",
        batch_size=batch_size, zero_copy_batch=True,
        concurrency=(1, concurrency)).sort("media_id")


def _ppm_pixels(media_id: int) -> np.ndarray:
    """(h, w, 3) uint8 pixel plane: p = (x*7 + y*13 + c*29 + id) % 256."""
    y, x, c = np.meshgrid(np.arange(PPM_H), np.arange(PPM_W),
                          np.arange(3), indexing="ij")
    return ((x * 7 + y * 13 + c * 29 + media_id) % 256).astype(np.uint8)


def synthesize_ppm_media(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(media_id, payload): one REAL binary PPM (P6) image per document."""
    header = f"P6\n{PPM_W} {PPM_H}\n255\n".encode("ascii")

    def mk(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        payloads = [header + _ppm_pixels(int(m)).tobytes()
                    for m in ids.tolist()]
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary())})

    return docs.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)


class PpmResizeFeatures:
    """Actor-pool callable: REAL P6 header parse + numpy decode + exact
    2x box-average resize (floor of each 2x2 block mean per channel) +
    per-channel sums of the resized image."""

    def __call__(self, b: pa.Table) -> pa.Table:
        mid, ow, oh, sums = [], [], [], []
        for i in range(b.num_rows):
            payload = bytes(b["payload"][i].as_py())
            # parse the real header: magic, dims, maxval, single whitespace
            # (explicit raises, not asserts — must survive `python -O`)
            if not payload.startswith(b"P6"):
                raise ValueError("payload is not a P6 PPM")
            parts = payload.split(b"\n", 3)
            w, h = (int(v) for v in parts[1].split())
            if int(parts[2]) != 255:
                raise ValueError(f"unsupported PPM maxval {parts[2]!r} "
                                 "(only 255 supported)")
            img = np.frombuffer(parts[3], np.uint8,
                                count=w * h * 3).reshape(h, w, 3) \
                .astype(np.int64)
            small = (img[0::2, 0::2] + img[1::2, 0::2]
                     + img[0::2, 1::2] + img[1::2, 1::2]) // 4
            mid.append(b["media_id"][i].as_py())
            oh.append(small.shape[0])
            ow.append(small.shape[1])
            sums.append(small.sum(axis=(0, 1)))
        s = np.asarray(sums, np.int64) if sums else np.zeros((0, 3), np.int64)
        return pa.table({
            "media_id": pa.array(mid, pa.int64()),
            "out_w": pa.array(ow, pa.int64()),
            "out_h": pa.array(oh, pa.int64()),
            "sum_r": pa.array(s[:, 0]),
            "sum_g": pa.array(s[:, 1]),
            "sum_b": pa.array(s[:, 2])})


def ppm_resize_features(docs: ray.data.Dataset, concurrency: int = 4,
                        batch_size: int = 256) -> ray.data.Dataset:
    return synthesize_ppm_media(docs).map_batches(
        PpmResizeFeatures, batch_format="pyarrow",
        batch_size=batch_size, zero_copy_batch=True,
        concurrency=(1, concurrency)).sort("media_id")

