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


# --------------------------------------------------------------------------
# JPEG — a real LOSSY codec, pure stdlib+numpy (Huffman + quant + int IDCT)
# --------------------------------------------------------------------------
# The verdict-#6 route to an oracle-gateable LOSSY decode: lossy output is
# normally encoder-version-dependent (libjpeg's float/SIMD IDCT variants),
# but here BOTH ends of the pipe pin the same integer transform — the
# synthesizer encodes with a fixed-point forward DCT (the hardcoded
# orthonormal basis below at scale 2^13), floor-rounded quantization
# against the pinned Annex-K-style table, and the standard baseline
# Huffman entropy layer; the decoder REALLY parses the JFIF stream
# (markers, DQT, SOF0, DHT, SOS), Huffman-decodes the entropy segment
# (bit reader with 0xFF00 unstuffing), dezigzags, dequantizes and applies
# the same pinned integer IDCT. Every arithmetic step is exact int64, so
# the decoded plane — though LOSSY vs the source — is a deterministic
# pure-integer function of the synthesis formula that the DuckDB twin
# replays step for step (queries._jpeg_sql: separable DCT as two joined
# integer matrix products, floor-division quantize, IDCT back, clamp).
# Huffman itself is lossless, so the oracle never needs to model it: the
# decoder's coefficients provably equal the encoder's or the stream would
# not parse. What remains behind the external-codec seam in
# stages/multimodal.py shrinks to FLAC/MP4.

JPEG_W, JPEG_H = 16, 16

# orthonormal DCT-II basis, scale 2^13 (entries sit far from .5 before
# rounding — pinned as literals so no platform's libm can perturb them)
_DCT_BITS = 13
_DCT_AI = np.array([
    (2896, 2896, 2896, 2896, 2896, 2896, 2896, 2896),
    (4017, 3406, 2276, 799, -799, -2276, -3406, -4017),
    (3784, 1567, -1567, -3784, -3784, -1567, 1567, 3784),
    (3406, -799, -4017, -2276, 2276, 4017, 799, -3406),
    (2896, -2896, -2896, 2896, 2896, -2896, -2896, 2896),
    (2276, -4017, 799, 3406, -3406, -799, 4017, -2276),
    (1567, -3784, 3784, -1567, -1567, 3784, -3784, 1567),
    (799, -2276, 3406, -4017, 4017, -3406, 2276, -799)], np.int64)

# JPEG Annex K luminance quantization table (quality ~50), row-major
_JPEG_Q = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], np.int64)

# zigzag scan order: _ZIGZAG[i] = (row, col) of the i-th scanned coeff
_ZIGZAG = [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
           (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
           (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
           (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
           (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
           (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
           (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
           (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7)]

# standard baseline Huffman table specs (DHT payload form): (bits, values)
_HUFF_DC = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_HUFF_AC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
     0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
     0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
     0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
     0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
     0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])


def _huff_codes(bits: list[int], values: list[int]) -> dict[int, tuple]:
    """Canonical Huffman: symbol -> (code, length). JPEG's DHT convention:
    codes of each length assigned in value-list order, code doubling at
    each length step."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _jpeg_pixels(media_id: int) -> np.ndarray:
    """(h, w) uint8 grayscale source plane: p = (x*3 + y*7 + id*5) % 256."""
    y, x = np.meshgrid(np.arange(JPEG_H), np.arange(JPEG_W), indexing="ij")
    return ((x * 3 + y * 7 + media_id * 5) % 256).astype(np.uint8)


def _jpeg_quant_coeffs(img: np.ndarray) -> np.ndarray:
    """Forward path both engines share: per 8x8 block, level shift, the
    pinned integer FDCT (scale 2^26 after two 2^13 products), then
    floor-division quantization with half-step rounding bias. Returns the
    (n_by, n_bx, 8, 8) int64 quantized coefficient planes."""
    h, w = img.shape
    sh = img.astype(np.int64) - 128
    D = _JPEG_Q << (2 * _DCT_BITS)
    out = np.zeros((h // 8, w // 8, 8, 8), np.int64)
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = sh[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
            F = _DCT_AI @ blk @ _DCT_AI.T           # scale 2^26
            out[by, bx] = (F + (D >> 1)) // D       # floor; exact twin
    return out


def _jpeg_decode_plane(q: np.ndarray) -> np.ndarray:
    """Inverse path both engines share: dequantize, pinned integer IDCT,
    floor-rounded rescale, +128 level shift, clamp to [0, 255]."""
    n_by, n_bx = q.shape[:2]
    out = np.zeros((n_by * 8, n_bx * 8), np.int64)
    half = 1 << (2 * _DCT_BITS - 1)
    for by in range(n_by):
        for bx in range(n_bx):
            R = q[by, bx] * _JPEG_Q
            P = _DCT_AI.T @ R @ _DCT_AI             # scale 2^26
            pix = ((P + half) >> (2 * _DCT_BITS)) + 128
            out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                np.clip(pix, 0, 255)
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:           # byte stuffing
                self.buf.append(0x00)
            self.n -= 8

    def finish(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


def _category(v: int) -> int:
    """JPEG magnitude category: smallest s with |v| < 2^s."""
    return int(abs(v)).bit_length()


def _jpeg_encode(img: np.ndarray) -> bytes:
    """Minimal REAL baseline JPEG encoder (grayscale, no subsampling):
    JFIF markers, one DQT, SOF0, two DHTs (std DC/AC luminance), SOS,
    Huffman-coded entropy data with byte stuffing, EOI."""
    h, w = img.shape
    qc = _jpeg_quant_coeffs(img)
    dc_codes = _huff_codes(*_HUFF_DC)
    ac_codes = _huff_codes(*_HUFF_AC)
    bw = _BitWriter()
    pred = 0
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = qc[by, bx]
            zz = [int(blk[r, c]) for r, c in _ZIGZAG]
            diff = zz[0] - pred
            pred = zz[0]
            s = _category(diff)
            code, ln = dc_codes[s]
            bw.write(code, ln)
            if s:
                amp = diff if diff >= 0 else diff + (1 << s) - 1
                bw.write(amp, s)
            run = 0
            last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
            for i in range(1, last_nz + 1):
                v = zz[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]     # ZRL
                    bw.write(code, ln)
                    run -= 16
                s = _category(v)
                code, ln = ac_codes[(run << 4) | s]
                bw.write(code, ln)
                amp = v if v >= 0 else v + (1 << s) - 1
                bw.write(amp, s)
                run = 0
            if last_nz < 63:
                code, ln = ac_codes[0x00]         # EOB
                bw.write(code, ln)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
            + payload

    zz_q = bytes(int(_JPEG_Q[r, c]) for r, c in _ZIGZAG)
    dqt = seg(0xDB, b"\x00" + zz_q)
    sof = seg(0xC0, struct.pack(">BHHB", 8, h, w, 1)
              + bytes([1, 0x11, 0]))
    dht = (seg(0xC4, b"\x00" + bytes(_HUFF_DC[0]) + bytes(_HUFF_DC[1]))
           + seg(0xC4, b"\x10" + bytes(_HUFF_AC[0]) + bytes(_HUFF_AC[1])))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht + sos + bw.finish()
            + b"\xff\xd9")


class _BitReader:
    """MSB-first bit reader over the entropy segment with 0xFF00
    unstuffing; raises on markers/truncation (dead-letter contract)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy segment truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy segment truncated at 0xFF")
            m = self.data[self.pos]
            if m == 0x00:
                self.pos += 1                      # stuffed byte
            elif m == 0xD9:                        # EOI reached mid-read:
                b = 0x00                           # treat as pad bits
                self.pos -= 1                      # leave EOI unconsumed
            else:
                raise ValueError(f"unexpected marker 0xFF{m:02x} in "
                                 "entropy data")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _huff_decode_map(bits: list[int], values: list[int]) -> dict:
    """(length, code) -> symbol decode map from a DHT payload spec."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln < 17:
        code = (code << 1) | br.bit()
        ln += 1
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """Amplitude sign-extension: top bit 0 means negative branch."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_decode(payload: bytes) -> np.ndarray:
    """Real baseline-JPEG decode: marker walk (DQT/SOF0/DHT/SOS), Huffman
    entropy decode with DC prediction + EOB/ZRL handling, dezigzag,
    dequantize against the STREAM's quant table, pinned integer IDCT,
    clamp. Grayscale / no-subsampling / baseline only (what the engine
    synthesizes); raises ``ValueError`` on anything else or any
    corruption. General-purpose decode stays behind the PIL seam."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtab = None
    dc_map = ac_map = None
    w = h = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[pos + 1]
        if marker == 0xD9:
            raise ValueError("JPEG has no scan data (EOI before SOS)")
        (ln,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        data = payload[pos + 4:pos + 2 + ln]
        if len(data) != ln - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:
            if data[0] != 0x00:
                raise ValueError("only 8-bit quant table 0 supported")
            zz = list(data[1:65])
            qtab = np.zeros((8, 8), np.int64)
            for i, (r, c) in enumerate(_ZIGZAG):
                qtab[r, c] = zz[i]
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", data[:6])
            if prec != 8 or ncomp != 1 or data[7] != 0x11:
                raise ValueError("only 8-bit single-component baseline "
                                 "JPEG without subsampling supported")
            if h % 8 or w % 8:
                raise ValueError("image dims must be multiples of 8")
        elif marker == 0xC4:
            cls_id = data[0]
            bits = list(data[1:17])
            values = list(data[17:17 + sum(bits)])
            if cls_id == 0x00:
                dc_map = _huff_decode_map(bits, values)
            elif cls_id == 0x10:
                ac_map = _huff_decode_map(bits, values)
            else:
                raise ValueError(f"unsupported DHT class/id 0x{cls_id:02x}")
        elif marker == 0xDA:
            if qtab is None or dc_map is None or ac_map is None \
                    or w is None:
                raise ValueError("JPEG SOS before DQT/SOF/DHT")
            br = _BitReader(payload, pos + 2 + ln)
            n_bx, n_by = w // 8, h // 8
            q = np.zeros((n_by, n_bx, 8, 8), np.int64)
            pred = 0
            for by in range(n_by):
                for bx in range(n_bx):
                    zz = [0] * 64
                    s = _read_symbol(br, dc_map)
                    diff = _extend(br.bits(s), s) if s else 0
                    pred += diff
                    zz[0] = pred
                    i = 1
                    while i < 64:
                        sym = _read_symbol(br, ac_map)
                        if sym == 0x00:            # EOB
                            break
                        run, s = sym >> 4, sym & 0x0F
                        if s == 0:
                            if run != 15:
                                raise ValueError(
                                    f"invalid AC symbol 0x{sym:02x}")
                            i += 16                # ZRL
                            continue
                        i += run
                        if i > 63:
                            raise ValueError("AC run overflows block")
                        zz[i] = _extend(br.bits(s), s)
                        i += 1
                    for k, (r, c) in enumerate(_ZIGZAG):
                        q[by, bx, r, c] = zz[k]
            # hand the stream's quant table to the shared inverse path
            global_q = _JPEG_Q
            if not np.array_equal(qtab, global_q):
                # still decode correctly with the stream's table
                n_by2, n_bx2 = q.shape[:2]
                out = np.zeros((n_by2 * 8, n_bx2 * 8), np.int64)
                half = 1 << (2 * _DCT_BITS - 1)
                for by in range(n_by2):
                    for bx in range(n_bx2):
                        R = q[by, bx] * qtab
                        P = _DCT_AI.T @ R @ _DCT_AI
                        out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                            np.clip(((P + half) >> (2 * _DCT_BITS)) + 128,
                                    0, 255)
                return out
            return _jpeg_decode_plane(q)
        pos += 2 + ln
    raise ValueError("JPEG has no SOS segment")


def synthesize_jpeg_media(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(media_id, payload): one REAL baseline JPEG per document."""
    def mk(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        payloads = [_jpeg_encode(_jpeg_pixels(int(m))) for m in ids.tolist()]
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary())})

    return docs.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)


class JpegFeatureExtractor:
    """Stateless callable: REAL lossy decode (Huffman + dequant + pinned
    integer IDCT) + exact integer features of the DECODED (not source)
    plane — sum and the positionally-weighted wsum ((x+1)·(y+1)·p) that
    catches row/column permutation bugs."""

    def __call__(self, b: pa.Table) -> pa.Table:
        mid, ws, hs, sums, wsums = [], [], [], [], []
        wx = (np.arange(JPEG_W) + 1)[None, :]
        wy = (np.arange(JPEG_H) + 1)[:, None]
        for i in range(b.num_rows):
            img = _jpeg_decode(bytes(b["payload"][i].as_py()))
            mid.append(b["media_id"][i].as_py())
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            sums.append(int(img.sum()))
            wsums.append(int((img * wx * wy).sum()))
        return pa.table({
            "media_id": pa.array(mid, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "sum_p": pa.array(sums, pa.int64()),
            "wsum_p": pa.array(wsums, pa.int64())})


def jpeg_features(docs: ray.data.Dataset,
                  batch_size: int = 256) -> ray.data.Dataset:
    return synthesize_jpeg_media(docs).map_batches(
        JpegFeatureExtractor(), batch_format="pyarrow",
        batch_size=batch_size, zero_copy_batch=True).sort("media_id")

# --------------------------------------------------------------------------
# FLAC (subset) — a real compressed LOSSLESS audio codec, pure stdlib+numpy
# --------------------------------------------------------------------------
# Round 5 closes the FLAC seam the same way round 4 closed PNG: a real
# byte-level codec implemented from the public spec, no external library.
# The subset is what the synthesizer emits — 16-bit mono, one frame,
# FIXED linear predictors with Rice-coded residuals — but the decoder
# checks every integrity layer the format defines: the frame-header CRC-8,
# the whole-frame CRC-16, and the STREAMINFO MD5 of the decoded samples.
# FLAC is LOSSLESS, so decoded samples equal the deterministic synthesis
# formula exactly and the features are oracle-gated through a true
# entropy-coded decode (unary/binary Rice, bit-level parsing). The stub
# scope in stages/multimodal.py shrinks to MP4/H.264 alone.

FLAC_N_BASE = 800          # n_samples = 800 + (id % 5) * 80 (same as WAV)
FLAC_STEP_BASE = 997
FLAC_SR = 8000
_FLAC_ORDER = 2            # fixed predictor order used by the encoder


def _flac_samples(media_id: int) -> np.ndarray:
    """int16 signal with a nonlinear term so order-2 residuals genuinely
    exercise Rice coding: x_k = ((k*step + id*17 + k²%1000) % 65536)−32768."""
    n = FLAC_N_BASE + (media_id % 5) * 80
    step = FLAC_STEP_BASE + media_id % 31
    k = np.arange(n, dtype=np.int64)
    return ((k * step + media_id * 17 + (k * k) % 1000) % 65536
            - 32768).astype(np.int16)


_CRC8_TAB = np.zeros(256, np.uint8)
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TAB[_i] = _c

_CRC16_TAB = np.zeros(256, np.uint16)
for _i in range(256):
    _c = _i << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 \
            else (_c << 1) & 0xFFFF
    _CRC16_TAB[_i] = _c


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC8_TAB[c ^ b])
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = int(_CRC16_TAB[((c >> 8) ^ b) & 0xFF]) ^ ((c << 8) & 0xFFFF)
    return c


class _FlacBitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (v & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def pad_byte(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


class _FlacBitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bits(self, k: int) -> int:
        while self.n < k:
            if self.pos >= len(self.data):
                raise ValueError("FLAC bitstream truncated")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("runaway FLAC unary code")
        return q

    def align(self) -> None:
        self.n -= self.n % 8  # drop partial-byte remainder
        self.acc &= (1 << self.n) - 1

    def byte_pos(self) -> int:
        return self.pos - self.n // 8


def _rice_param(resid: np.ndarray) -> int:
    m = float(np.abs(resid).mean()) if len(resid) else 0.0
    p = 0
    while (1 << p) < m + 1 and p < 14:
        p += 1
    return p


def _flac_encode(x: np.ndarray) -> bytes:
    """Subset FLAC encoder: STREAMINFO (with real MD5) + ONE frame, mono
    16-bit, fixed order-2 predictor, one Rice partition."""
    import hashlib as _hl
    n = len(x)
    xs = x.astype(np.int64)
    md5 = _hl.md5(x.astype("<i2").tobytes()).digest()

    si = _FlacBitWriter()
    si.write(n, 16)            # min block size
    si.write(n, 16)            # max block size
    si.write(0, 24)            # min frame size (0 = unknown)
    si.write(0, 24)            # max frame size
    si.write(FLAC_SR, 20)      # sample rate
    si.write(0, 3)             # channels - 1 (mono)
    si.write(15, 5)            # bits per sample - 1
    si.write(n, 36)            # total samples
    streaminfo = bytes(si.buf) + md5
    meta = b"\x80\x00\x00\x22" + streaminfo    # last-block flag + type 0

    # frame header: sync + flags + block size/sample rate codes
    hdr = _FlacBitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 1)            # reserved
    hdr.write(0, 1)            # fixed blocksize stream
    hdr.write(0b0111, 4)       # block size: get 16 bit (end of header)
    hdr.write(0b0000, 4)       # sample rate: from STREAMINFO
    hdr.write(0b0000, 4)       # channel assignment: mono
    hdr.write(0b100, 3)        # sample size: 16 bits
    hdr.write(0, 1)            # reserved
    hdr.write(0, 8)            # frame number 0 (UTF-8 single byte)
    hdr.write(n - 1, 16)       # block size - 1
    hdr.pad_byte()
    hdr_bytes = bytes(hdr.buf)
    hdr_bytes += bytes([_crc8(hdr_bytes)])

    body = _FlacBitWriter()
    # subframe header: zero bit + type FIXED order 2 (001010) + no wasted
    body.write(0, 1)
    body.write(0b001000 | _FLAC_ORDER, 6)
    body.write(0, 1)
    for i in range(_FLAC_ORDER):               # warmup samples, signed
        body.write(int(xs[i]) & 0xFFFF, 16)
    resid = xs[2:] - 2 * xs[1:-1] + xs[:-2]
    p = _rice_param(resid)
    body.write(0, 2)           # residual method: RICE (4-bit params)
    body.write(0, 4)           # partition order 0 -> one partition
    body.write(p, 4)           # rice parameter
    for r in resid.tolist():
        u = (r << 1) ^ (r >> 63)               # zigzag fold
        body.unary(u >> p)
        body.write(u & ((1 << p) - 1), p)
    body.pad_byte()
    frame = hdr_bytes + bytes(body.buf)
    frame += struct.pack(">H", _crc16(frame))
    return b"fLaC" + meta + frame


def _flac_decode(payload: bytes) -> np.ndarray:
    """Subset FLAC decoder with ALL THREE integrity layers verified:
    frame-header CRC-8, whole-frame CRC-16, STREAMINFO MD5 of the decoded
    samples. Raises ``ValueError`` on any corruption or any feature
    outside the synthesized subset (the dead-letter contract)."""
    import hashlib as _hl
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (bad magic)")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated FLAC metadata")
        hdr = payload[pos:pos + 4]
        last = hdr[0] & 0x80
        btype = hdr[0] & 0x7F
        ln = int.from_bytes(hdr[1:4], "big")
        if btype == 0:
            streaminfo = payload[pos + 4:pos + 4 + ln]
        pos += 4 + ln
        if last:
            break
    if streaminfo is None or len(streaminfo) != 34:
        raise ValueError("FLAC missing STREAMINFO")
    sr = int.from_bytes(streaminfo[10:13], "big") >> 4
    nch = ((streaminfo[12] >> 1) & 0x07) + 1
    bps = (((streaminfo[12] & 1) << 4) | (streaminfo[13] >> 4)) + 1
    total = int.from_bytes(streaminfo[13:18], "big") & ((1 << 36) - 1)
    md5_expect = streaminfo[18:34]
    if nch != 1 or bps != 16:
        raise ValueError(f"unsupported FLAC layout: channels={nch} "
                         f"bps={bps} (subset is 16-bit mono)")
    del sr

    frame_start = pos
    br = _FlacBitReader(payload, pos)
    if br.bits(14) != 0b11111111111110:
        raise ValueError("bad FLAC frame sync")
    br.bits(1)                     # reserved
    br.bits(1)                     # blocking strategy
    bs_code = br.bits(4)
    br.bits(4)                     # sample rate code
    ch_code = br.bits(4)
    if ch_code != 0:
        raise ValueError("subset decoder handles mono frames only")
    br.bits(3)                     # sample size code
    br.bits(1)                     # reserved
    first = br.bits(8)             # frame number (single-byte UTF-8 only)
    if first & 0x80:
        raise ValueError("multi-byte frame numbers outside subset")
    if bs_code == 0b0111:
        n = br.bits(16) + 1
    elif bs_code == 0b0110:
        n = br.bits(8) + 1
    else:
        raise ValueError("subset expects end-of-header block size")
    hdr_end = br.byte_pos()
    if br.n % 8:
        raise ValueError("frame header not byte-aligned")
    crc8_got = payload[hdr_end]
    if _crc8(payload[frame_start:hdr_end]) != crc8_got:
        raise ValueError("FLAC frame-header CRC-8 mismatch")
    br = _FlacBitReader(payload, hdr_end + 1)

    if br.bits(1) != 0:
        raise ValueError("bad subframe padding bit")
    stype = br.bits(6)
    if not (0b001000 <= stype <= 0b001100):
        raise ValueError(f"subframe type {stype:#08b} outside FIXED subset")
    order = stype & 0x07
    if br.bits(1) != 0:
        raise ValueError("wasted-bits subframes outside subset")
    warm = np.zeros(order, np.int64)
    for i in range(order):
        v = br.bits(16)
        warm[i] = v - 65536 if v & 0x8000 else v
    if br.bits(2) != 0:
        raise ValueError("only 4-bit Rice residual method in subset")
    porder = br.bits(4)
    if porder != 0:
        raise ValueError("subset expects one Rice partition")
    p = br.bits(4)
    if p == 15:
        raise ValueError("escaped Rice partitions outside subset")
    resid = np.zeros(n - order, np.int64)
    for i in range(n - order):
        q = br.unary()
        u = (q << p) | (br.bits(p) if p else 0)
        resid[i] = (u >> 1) ^ -(u & 1)        # zigzag unfold
    br.align()
    frame_end = br.byte_pos()
    if frame_end + 2 > len(payload):
        raise ValueError("truncated FLAC frame trailer (corrupt residual "
                         "stream over-consumed the payload)")
    (crc16_got,) = struct.unpack(">H", payload[frame_end:frame_end + 2])
    if _crc16(payload[frame_start:frame_end]) != crc16_got:
        raise ValueError("FLAC frame CRC-16 mismatch")

    x = np.zeros(n, np.int64)
    x[:order] = warm
    if order == 0:
        x = resid
    elif order == 1:
        x[1:] = resid
        x = np.cumsum(x)
    elif order == 2:
        for i in range(2, n):                  # x[i] = 2x[i-1]-x[i-2]+r
            x[i] = 2 * x[i - 1] - x[i - 2] + resid[i - 2]
    else:
        raise ValueError("subset decoder implements fixed orders 0-2")
    if total and n != total:
        raise ValueError("frame sample count disagrees with STREAMINFO")
    if _hl.md5(x.astype("<i2").tobytes()).digest() != md5_expect:
        raise ValueError("decoded samples fail the STREAMINFO MD5")
    return x


def synthesize_flac_media(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(media_id, payload): one REAL Rice-coded FLAC file per document."""
    def mk(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        payloads = [_flac_encode(_flac_samples(int(m)))
                    for m in ids.tolist()]
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary())})

    return docs.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)


class FlacFeatureExtractor:
    """Stateless callable: REAL entropy-coded lossless decode + the same
    exact integer features as the WAV extractor (FLAC is the compressed
    sibling of that row)."""

    def __call__(self, b: pa.Table) -> pa.Table:
        mid, ns, dur, sab, ssq, zc = [], [], [], [], [], []
        for i in range(b.num_rows):
            x = _flac_decode(bytes(b["payload"][i].as_py()))
            mid.append(b["media_id"][i].as_py())
            ns.append(len(x))
            dur.append(len(x) * 1000 // FLAC_SR)
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


def flac_features(docs: ray.data.Dataset,
                  batch_size: int = 256) -> ray.data.Dataset:
    return synthesize_flac_media(docs).map_batches(
        FlacFeatureExtractor(), batch_format="pyarrow",
        batch_size=batch_size, zero_copy_batch=True).sort("media_id")

# --------------------------------------------------------------------------
# AVI / MJPEG — a real VIDEO container over the real lossy JPEG codec
# --------------------------------------------------------------------------
# With a true baseline-JPEG decoder in hand (above), the classic
# motion-JPEG pipeline needs only a container parse: an AVI file is a RIFF
# tree ('AVI ' form containing 'hdrl' headers and a 'movi' LIST whose
# '00dc' chunks each hold ONE complete JPEG frame). The synthesizer emits
# real AVI bytes (RIFF/LIST structure, avih/strh/strf headers, per-frame
# chunks with word alignment, idx1 index); the decoder walks the chunk
# tree, validates the structure, extracts every '00dc' payload and decodes
# it through `_jpeg_decode` — so the video path exercises container
# parsing AND the pinned-integer lossy codec per frame. Features fold the
# decoded (lossy) planes of all frames with frame-position weights, so a
# frame-order bug fails the hash. The remaining stub scope narrows to
# inter-frame-predicted codecs (H.264-class motion compensation).

AVI_FPS = 5


def _avi_n_frames(media_id: int) -> int:
    return 2 + media_id % 3


def _avi_frame_pixels(media_id: int, frame: int) -> np.ndarray:
    """Each frame is the pinned JPEG test plane at seed id*5 + frame*11
    (the same formula family `_jpeg_pixels` uses, shifted per frame)."""
    y, x = np.meshgrid(np.arange(JPEG_H), np.arange(JPEG_W), indexing="ij")
    return ((x * 3 + y * 7 + media_id * 5 + frame * 11) % 256) \
        .astype(np.uint8)


def _avi_encode(media_id: int) -> bytes:
    """Minimal REAL AVI writer: RIFF('AVI ') -> LIST('hdrl') with avih +
    one video stream (strh 'vids'/'MJPG' + strf BITMAPINFOHEADER) ->
    LIST('movi') with one word-aligned '00dc' JPEG chunk per frame ->
    'idx1' index."""
    n = _avi_n_frames(media_id)
    frames = [_jpeg_encode(_avi_frame_pixels(media_id, f))
              for f in range(n)]

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(fourcc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", fourcc + data)

    maxb = max(len(f) for f in frames)
    avih = struct.pack("<14I", 1_000_000 // AVI_FPS, maxb * AVI_FPS, 0,
                       0x10, n, 0, 1, maxb, JPEG_W, JPEG_H, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0,
                                            1, AVI_FPS, 0, n, maxb,
                                            0xFFFFFFFF, 0, 0))
    strf = struct.pack("<IiiHH4sIiiII", 40, JPEG_W, JPEG_H, 1, 24,
                       b"MJPG", JPEG_W * JPEG_H * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_items = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_items)
    idx, off = b"", 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) % 2)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_decode(payload: bytes) -> list[np.ndarray]:
    """Real AVI walk: RIFF form check, recursive chunk scan for the
    'movi' LIST, per-'00dc' JPEG decode. Raises ``ValueError`` on
    structural corruption (sizes, fourccs, frame-count mismatch with the
    avih header) — each frame's own integrity then rests on the JPEG
    parser underneath."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    (riff_len,) = struct.unpack("<I", payload[4:8])
    if riff_len + 8 != len(payload):
        raise ValueError("RIFF size disagrees with payload length")
    pos, end = 12, 8 + riff_len
    frames: list[np.ndarray] = []
    declared = None
    while pos + 8 <= end:
        fourcc = payload[pos:pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        data_start = pos + 8
        if data_start + ln > end:
            raise ValueError(f"truncated AVI chunk {fourcc!r}")
        if fourcc == b"LIST":
            kind = payload[data_start:data_start + 4]
            if kind in (b"hdrl", b"movi", b"strl"):
                inner, iend = data_start + 4, data_start + ln
                while inner + 8 <= iend:
                    fc2 = payload[inner:inner + 4]
                    (l2,) = struct.unpack("<I",
                                          payload[inner + 4:inner + 8])
                    d2 = inner + 8
                    if d2 + l2 > iend:
                        raise ValueError(
                            f"truncated AVI subchunk {fc2!r}")
                    if fc2 == b"00dc":
                        frames.append(_jpeg_decode(payload[d2:d2 + l2]))
                    elif fc2 == b"avih":
                        declared = struct.unpack(
                            "<I", payload[d2 + 16:d2 + 20])[0]
                    elif fc2 == b"LIST" \
                            and payload[d2:d2 + 4] == b"strl":
                        pass  # stream headers: structure already walked
                    inner = d2 + l2 + (l2 % 2)
        pos = data_start + ln + (ln % 2)
    if not frames:
        raise ValueError("AVI contains no '00dc' video frames")
    if declared is not None and declared != len(frames):
        raise ValueError(f"avih declares {declared} frames, "
                         f"found {len(frames)}")
    return frames


def synthesize_avi_media(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(media_id, payload): one REAL MJPEG AVI per document (2-4 frames)."""
    def mk(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        payloads = [_avi_encode(int(m)) for m in ids.tolist()]
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary())})

    return docs.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True)


class AviFeatureExtractor:
    """Stateless callable: real container walk + per-frame lossy decode.
    Features fold every decoded frame with (frame_idx+1) weights plus the
    positional wsum, so frame order, frame count and per-frame decode all
    gate the hash."""

    def __call__(self, b: pa.Table) -> pa.Table:
        mid, nf, ws, hs, sums, fwsums = [], [], [], [], [], []
        wx = (np.arange(JPEG_W) + 1)[None, :]
        wy = (np.arange(JPEG_H) + 1)[:, None]
        for i in range(b.num_rows):
            frames = _avi_decode(bytes(b["payload"][i].as_py()))
            mid.append(b["media_id"][i].as_py())
            nf.append(len(frames))
            hs.append(frames[0].shape[0])
            ws.append(frames[0].shape[1])
            sums.append(int(sum(f.sum() for f in frames)))
            fwsums.append(int(sum((k + 1) * (f * wx * wy).sum()
                              for k, f in enumerate(frames))))
        return pa.table({
            "media_id": pa.array(mid, pa.int64()),
            "n_frames": pa.array(nf, pa.int64()),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "sum_p": pa.array(sums, pa.int64()),
            "fwsum_p": pa.array(fwsums, pa.int64())})


def avi_features(docs: ray.data.Dataset,
                 batch_size: int = 256) -> ray.data.Dataset:
    return synthesize_avi_media(docs).map_batches(
        AviFeatureExtractor(), batch_format="pyarrow",
        batch_size=batch_size, zero_copy_batch=True).sort("media_id")


class AviMotionFeatures:
    """Stateless callable: temporal motion energy over the decoded MJPEG
    frames — the scene-change / static-clip curation signal a video
    corpus filters on. For consecutive decoded (lossy) planes f-1, f:
    ``motion_f = Σ |p_f − p_{f−1}|``; features are the total and the
    frame-position-weighted total (catches frame-order bugs), plus the
    peak single-step motion (the scene-cut detector)."""

    def __call__(self, b: pa.Table) -> pa.Table:
        mid, nf, tot, wtot, peak = [], [], [], [], []
        for i in range(b.num_rows):
            frames = _avi_decode(bytes(b["payload"][i].as_py()))
            diffs = [int(np.abs(frames[f] - frames[f - 1]).sum())
                     for f in range(1, len(frames))]
            mid.append(b["media_id"][i].as_py())
            nf.append(len(frames))
            tot.append(sum(diffs))
            wtot.append(sum((f + 1) * d for f, d in enumerate(diffs)))
            peak.append(max(diffs, default=0))
        return pa.table({
            "media_id": pa.array(mid, pa.int64()),
            "n_frames": pa.array(nf, pa.int64()),
            "motion_total": pa.array(tot, pa.int64()),
            "motion_wtotal": pa.array(wtot, pa.int64()),
            "motion_peak": pa.array(peak, pa.int64())})


def avi_motion_features(docs: ray.data.Dataset,
                        batch_size: int = 256) -> ray.data.Dataset:
    return synthesize_avi_media(docs).map_batches(
        AviMotionFeatures(), batch_format="pyarrow",
        batch_size=batch_size, zero_copy_batch=True).sort("media_id")
