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

* **PNG (zlib DEFLATE)** — :func:`synthesize_png_media` builds real
  compressed PNGs (CRC'd chunks, filter type cycling through all five
  per scanline, the zlib stream split across two IDAT chunks);
  :class:`PngFeatureExtractor` walks the chunks (verifying every CRC),
  inflates, reconstructs through the five filters and emits exact
  integer features including positionally-weighted channel sums. This
  one crosses a REAL compression boundary — PNG is lossless, which is
  precisely what makes a compressed decode oracle-gateable bit-exactly.

All synthesizers derive every byte from ``doc_id`` alone, so the DuckDB
oracle recomputes the features from first principles (``generate_series``
over samples / output pixels, pure integer arithmetic) — the Ray side is
hash-gated END TO END through a true decoder. Only the LOSSY formats
(JPEG/FLAC/MP4) stay behind the documented external-codec seam in
``stages/multimodal.py``; swapping these decoders for PIL/ffmpeg calls
changes nothing else in the plumbing.
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
    del concurrency
    return synthesize_wav_media(docs).map_batches(
        WavFeatureExtractor(), batch_format="pyarrow",
        batch_size=batch_size, zero_copy_batch=True).sort("media_id")


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
    del concurrency
    return synthesize_ppm_media(docs).map_batches(
        PpmResizeFeatures(), batch_format="pyarrow",
        batch_size=batch_size, zero_copy_batch=True).sort("media_id")


# --------------------------------------------------------------------------
# PNG — a real COMPRESSED codec, pure stdlib (zlib DEFLATE + CRC32)
# --------------------------------------------------------------------------
# Unlike WAV/PPM above, PNG payloads are genuinely compressed: IDAT holds
# zlib-DEFLATE'd, per-scanline-filtered pixel data, and every chunk carries
# a CRC32 the decoder verifies. PNG is LOSSLESS, so the decoded plane is
# bit-exact recomputable from the synthesis formula — which is what lets a
# compressed-codec decode be oracle-gated end to end (the JPEG route never
# can be: lossy output is encoder-version-dependent). The synthesizer
# cycles through ALL FIVE PNG filter types (None/Sub/Up/Average/Paeth, one
# per scanline row), so the decoder's un-filter path is fully exercised.

import struct
import zlib

PNG_W, PNG_H = 32, 20
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_pixels(media_id: int) -> np.ndarray:
    """(h, w, 3) uint8 plane: p = (x*11 + y*5 + c*37 + id) % 256."""
    y, x, c = np.meshgrid(np.arange(PNG_H), np.arange(PNG_W),
                          np.arange(3), indexing="ij")
    return ((x * 11 + y * 5 + c * 37 + media_id) % 256).astype(np.uint8)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def _png_encode(img: np.ndarray) -> bytes:
    """Minimal truecolor-8 PNG encoder: filter type = row % 5 (all five
    exercised), single zlib stream split across TWO IDAT chunks (decoders
    must concatenate IDAT data — also exercised)."""
    h, w, _ = img.shape
    bpp = 3
    raw = img.reshape(h, w * bpp).astype(np.int64)
    lines = bytearray()
    prev = np.zeros(w * bpp, np.int64)
    for y in range(h):
        f = y % 5
        cur = raw[y]
        left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
        upl = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - (left + prev) // 2
        else:
            pred = np.array([_paeth(int(a), int(b), int(c))
                             for a, b, c in zip(left, prev, upl)],
                            np.int64)
            filt = cur - pred
        lines.append(f)
        lines.extend((filt % 256).astype(np.uint8).tobytes())
        prev = cur
    comp = zlib.compress(bytes(lines), 6)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    mid = max(1, len(comp) // 2)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", comp[:mid]) + _chunk(b"IDAT", comp[mid:])
            + _chunk(b"IEND", b""))


def _png_decode(payload: bytes) -> np.ndarray:
    """Real PNG decode: chunk walk with CRC32 verification, multi-IDAT
    concatenation, zlib inflate, and the full five-filter reconstruction.
    Raises ``ValueError`` on any corruption (the dead-letter contract).
    Supports what the engine synthesizes (8-bit truecolor, no interlace) —
    the general-purpose decoder stays behind the PIL seam in
    ``stages/multimodal.py``."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload (bad signature)")
    pos = len(_PNG_SIG)
    idat = bytearray()
    w = h = None
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        if len(data) != ln or pos + 12 + ln > len(payload):
            raise ValueError("truncated PNG chunk body")
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(ctype + data) != crc:
            raise ValueError(f"PNG CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            w, h, bd, ct, comp, filt, inter = struct.unpack(">IIBBBBB",
                                                            data)
            if (bd, ct, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG variant (need 8-bit truecolor, "
                    f"got bitdepth={bd} colortype={ct} interlace={inter})")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    lines = zlib.decompress(bytes(idat))
    bpp = 3
    stride = w * bpp
    if len(lines) != h * (stride + 1):
        raise ValueError("PNG scanline payload has wrong length")
    out = np.zeros((h, stride), np.int64)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        f = lines[y * (stride + 1)]
        filt = np.frombuffer(lines, np.uint8, stride,
                             y * (stride + 1) + 1).astype(np.int64)
        if f == 0:
            cur = filt
        elif f == 2:
            cur = (filt + prev) % 256
        elif f == 1:
            cur = filt.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) % 256
        elif f == 3:
            cur = filt.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + (left + prev[x]) // 2) % 256
        elif f == 4:
            cur = filt.copy()
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                upl = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(left, int(prev[x]), upl)) % 256
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, bpp)


def synthesize_png_media(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(media_id, payload): one REAL zlib-compressed PNG per document."""
    def mk(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        payloads = [_png_encode(_png_pixels(int(m))) for m in ids.tolist()]
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary())})

    return docs.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)


class PngFeatureExtractor:
    """Actor-pool callable: REAL compressed decode (chunk walk + CRC +
    zlib inflate + five-filter reconstruction) + exact integer features.
    ``wsum_*`` is a positionally-weighted sum ((x+1)·(y+1)·p), so a
    decoder bug that permutes rows/columns fails the hash even when the
    plain channel sums survive."""

    def __call__(self, b: pa.Table) -> pa.Table:
        mid, ws, hs, sums, wsums = [], [], [], [], []
        wx = (np.arange(PNG_W) + 1)[None, :, None]
        wy = (np.arange(PNG_H) + 1)[:, None, None]
        for i in range(b.num_rows):
            img = _png_decode(bytes(b["payload"][i].as_py()))
            mid.append(b["media_id"][i].as_py())
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            sums.append(img.sum(axis=(0, 1)))
            wsums.append((img * wx * wy).sum(axis=(0, 1)))
        s = np.asarray(sums, np.int64) if sums else np.zeros((0, 3), np.int64)
        t = (np.asarray(wsums, np.int64) if wsums
             else np.zeros((0, 3), np.int64))
        return pa.table({
            "media_id": pa.array(mid, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "sum_r": pa.array(s[:, 0]), "sum_g": pa.array(s[:, 1]),
            "sum_b": pa.array(s[:, 2]),
            "wsum_r": pa.array(t[:, 0]), "wsum_g": pa.array(t[:, 1]),
            "wsum_b": pa.array(t[:, 2])})


def png_features(docs: ray.data.Dataset, concurrency: int = 4,
                 batch_size: int = 256) -> ray.data.Dataset:
    del concurrency
    return synthesize_png_media(docs).map_batches(
        PngFeatureExtractor(), batch_format="pyarrow",
        batch_size=batch_size, zero_copy_batch=True).sort("media_id")

