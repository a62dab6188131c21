"""Pure-numpy media codecs — a REAL decode path with zero codec
libraries, for the formats whose specs are simple enough to implement
directly:

- BMP (Windows bitmap, uncompressed 24-bit BI_RGB): full header parse,
  bottom-up padded row layout, BGR->RGB. Public spec (BITMAPFILEHEADER
  + BITMAPINFOHEADER).
- WAV (RIFF, PCM16 mono/stereo): chunk walk, sample-rate/width parse,
  int16 -> float32 PCM.
- QVID (this engine's raw-frame video container for pipeline tests:
  magic + width/height/n_frames/fps header, then n_frames raw RGB24
  frames back to back). Trivial by construction so frame slicing is
  exact.
- PNG (W3C spec / RFC 2083): a REAL compressed format — DEFLATE via
  the stdlib zlib (no external codec library), full chunk walk, CRC
  verification, and all five scanline filters (None/Sub/Up/Average/
  Paeth) for 8-bit truecolor (RGB) and truecolor+alpha (RGBA),
  non-interlaced.

Formats whose entropy coding has no stdlib implementation (JPEG's
Huffman+DCT, H.264, AAC) still raise a clear NotImplementedError
naming the format. The Spark-side plumbing is identical either way:
bytes in a binary column, decoded via Arrow-batched ``mapInPandas``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# BMP — uncompressed 24-bit
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (h, w, 3) -> 24-bit BI_RGB .bmp bytes."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4-byte boundary
    img_size = row_bytes * h
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return header + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BI_RGB .bmp bytes -> RGB uint8 array (h, w, 3)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP file (missing BM magic)")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, compression={compression})"
        )
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=pixel_off)
    rows = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR -> RGB
    return rgb[::-1] if flip else rgb


def resize_nearest(pixels: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy indexing."""
    h, w = pixels.shape[:2]
    yi = (np.arange(target_h) * (h / target_h)).astype(np.int64)
    xi = (np.arange(target_w) * (w / target_w)).astype(np.int64)
    return pixels[yi][:, xi]


# ---------------------------------------------------------------------------
# WAV — RIFF PCM16
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM16 bytes."""
    assert samples.dtype == np.int16 and samples.ndim == 1
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 bytes -> (float32 samples in [-1, 1] shaped
    (n, channels), sample_rate). Chunk-walks the container, so extra
    chunks (LIST, fact) are skipped like a real parser."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = channels = bits = None
    audio_fmt = block_align = None
    pcm = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate, _, block_align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt == 1 and bits == 16:
                pass
            elif audio_fmt == 0x11 and channels == 1:
                pass  # IMA ADPCM mono — decoded below
            else:
                raise NotImplementedError(
                    f"only PCM16 and mono IMA-ADPCM supported "
                    f"(fmt={audio_fmt}, bits={bits}, channels={channels})"
                )
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks pad to even
    if pcm is None or sample_rate is None:
        raise ValueError("missing fmt/data chunk")
    if audio_fmt == 0x11:
        ints = _decode_adpcm(pcm, block_align)
        return (ints.astype(np.float32) / 32768.0).reshape(-1, 1), int(sample_rate)
    samples = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32768.0
    return samples.reshape(-1, channels), int(sample_rate)


# ---------------------------------------------------------------------------
# QVID — raw-frame video container (magic, w, h, n_frames, fps, frames)
# ---------------------------------------------------------------------------

_QVID_MAGIC = b"QVID"
_QVID_HDR = "<4sHHIH"  # magic, w, h, n_frames, fps


def encode_qvid(frames: np.ndarray, fps: int = 30) -> bytes:
    """uint8 array (n, h, w, 3) -> QVID bytes."""
    n, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    return struct.pack(_QVID_HDR, _QVID_MAGIC, w, h, n, fps) + frames.tobytes()


def qvid_info(data: bytes) -> tuple[int, int, int, int]:
    """-> (width, height, n_frames, fps) without touching frame bytes."""
    magic, w, h, n, fps = struct.unpack_from(_QVID_HDR, data, 0)
    if magic != _QVID_MAGIC:
        raise ValueError("not a QVID container")
    return w, h, n, fps


def decode_qvid_frame(data: bytes, frame_idx: int) -> np.ndarray:
    """Random-access decode of ONE frame (h, w, 3) — no full-video
    materialization, which is the property that matters for
    frame-sampling at scale."""
    w, h, n, _ = qvid_info(data)
    if not 0 <= frame_idx < n:
        raise IndexError(f"frame {frame_idx} out of range [0, {n})")
    frame_bytes = w * h * 3
    off = struct.calcsize(_QVID_HDR) + frame_idx * frame_bytes
    return np.frombuffer(data, dtype=np.uint8, count=frame_bytes, offset=off).reshape(
        h, w, 3
    )


# ---------------------------------------------------------------------------
# PNG — 8-bit truecolor / truecolor+alpha, non-interlaced
# (W3C PNG spec; DEFLATE from the stdlib zlib, so this is a REAL
# compressed-format codec with zero external libraries)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a pixel row (int16 in, uint8
    out): closest of left/up/upper-left to a+b-c, ties a > b > c."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(pixels: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """uint8 array (h, w, 3|4) -> PNG bytes. ``filter_type`` applies
    one filter to every scanline (0..4) — exercising decode of each
    filter family; real encoders choose per-row, which decode handles
    identically."""
    h, w, c = pixels.shape
    assert pixels.dtype == np.uint8 and c in (3, 4)
    if not 0 <= filter_type <= 4:
        raise ValueError(f"filter_type must be 0..4, got {filter_type}")
    color_type = 2 if c == 3 else 6
    raw = pixels.astype(np.int16)
    left = np.zeros_like(raw)
    left[:, 1:] = raw[:, :-1]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    upleft = np.zeros_like(raw)
    upleft[1:, 1:] = raw[:-1, :-1]
    if filter_type == 0:
        filt = raw
    elif filter_type == 1:
        filt = raw - left
    elif filter_type == 2:
        filt = raw - up
    elif filter_type == 3:
        filt = raw - (left + up) // 2
    else:
        filt = raw - _paeth(left, up, upleft)
    scan = np.empty((h, 1 + w * c), dtype=np.uint8)
    scan[:, 0] = filter_type
    scan[:, 1:] = (filt & 0xFF).astype(np.uint8).reshape(h, w * c)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scan.tobytes(), level))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w, 3|4). Walks chunks with CRC
    verification, inflates the concatenated IDAT stream, and reverses
    all five scanline filters. Supports 8-bit color types 2 (RGB) and
    6 (RGBA), non-interlaced — the shapes a training-data pipeline's
    synthetic/screenshot corpora actually use; everything else raises
    naming the unsupported feature."""
    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG file (bad signature)")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    if depth != 8 or color_type not in (2, 6) or comp != 0 or filt_method != 0:
        raise NotImplementedError(
            f"only 8-bit RGB/RGBA non-interlaced PNG supported "
            f"(depth={depth}, color_type={color_type})"
        )
    if interlace != 0:
        raise NotImplementedError("Adam7 interlaced PNG not supported")
    c = 3 if color_type == 2 else 4
    stride = w * c
    scan = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if scan.size != h * (1 + stride):
        raise ValueError("PNG pixel data size mismatch")
    scan = scan.reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ft = int(scan[y, 0])
        row = scan[y, 1:].astype(np.int16)
        prev = out[y - 1].astype(np.int16) if y else zero_row
        if ft == 0:
            cur = row
        elif ft == 1:
            # Sub: out[x] = row[x] + out[x-c] => per-byte-lane cumsum
            cur = np.cumsum(row.reshape(w, c), axis=0, dtype=np.int64).reshape(stride)
        elif ft == 2:
            cur = row + prev
        elif ft == 3:
            cur = row.copy()
            prev_px = prev.reshape(w, c)
            cur_px = cur.reshape(w, c)
            left = np.zeros(c, dtype=np.int16)
            for x in range(w):
                cur_px[x] = (cur_px[x] + (left + prev_px[x]) // 2) & 0xFF
                left = cur_px[x]
        elif ft == 4:
            cur = row.copy()
            prev_px = prev.reshape(w, c)
            cur_px = cur.reshape(w, c)
            left = np.zeros(c, dtype=np.int16)
            upleft = np.zeros(c, dtype=np.int16)
            for x in range(w):
                cur_px[x] = (cur_px[x] + _paeth(left, prev_px[x], upleft)) & 0xFF
                left = cur_px[x]
                upleft = prev_px[x]
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = (cur & 0xFF).astype(np.uint8)
    return out.reshape(h, w, c)


# ---------------------------------------------------------------------------
# IMA ADPCM — compressed audio (WAV format tag 0x11, the IMA/DVI
# standard: 4 bits per sample, ~4:1 vs PCM16). Public spec; pure
# Python/numpy, no codec library. Mono.
# ---------------------------------------------------------------------------

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_decode_nibble(n: int, pred: int, index: int) -> tuple[int, int]:
    step = _IMA_STEPS[index]
    diff = step >> 3
    if n & 1:
        diff += step >> 2
    if n & 2:
        diff += step >> 1
    if n & 4:
        diff += step
    if n & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    index = max(0, min(88, index + _IMA_INDEX_ADJ[n & 7]))
    return pred, index


def encode_adpcm_wav(
    samples: np.ndarray, sample_rate: int = 16000, block_align: int = 256
) -> bytes:
    """int16 mono samples -> RIFF/WAVE IMA-ADPCM (format 0x11) bytes.
    Lossy by design (~4:1); block layout per the IMA spec: a 4-byte
    block header (predictor int16, step index, reserved) then 4-bit
    nibbles, two per byte, low nibble first. The last block is padded
    with repeats of the final sample."""
    assert samples.dtype == np.int16 and samples.ndim == 1
    spb = (block_align - 4) * 2 + 1  # samples per block
    n_blocks = max(1, -(-len(samples) // spb))
    padded = np.full(n_blocks * spb, samples[-1] if len(samples) else 0, dtype=np.int16)
    padded[: len(samples)] = samples
    index = 0
    out = bytearray()
    for b in range(n_blocks):
        block = padded[b * spb : (b + 1) * spb]
        pred = int(block[0])
        out += struct.pack("<hBB", pred, index, 0)
        nibbles = []
        for s in block[1:]:
            step = _IMA_STEPS[index]
            diff = int(s) - pred
            n = 8 if diff < 0 else 0
            diff = abs(diff)
            if diff >= step:
                n |= 4
                diff -= step
            if diff >= step >> 1:
                n |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                n |= 1
            pred, index = _ima_decode_nibble(n, pred, index)
            nibbles.append(n)
        for lo, hi in zip(nibbles[::2], nibbles[1::2]):
            out += bytes([lo | (hi << 4)])
    data = bytes(out)
    byte_rate = sample_rate * block_align // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def _decode_adpcm(pcm: bytes, block_align: int) -> np.ndarray:
    """IMA-ADPCM data chunk -> int16 mono samples."""
    spb = (block_align - 4) * 2 + 1
    n_blocks = len(pcm) // block_align
    out = np.empty(n_blocks * spb, dtype=np.int16)
    pos = 0
    for b in range(n_blocks):
        pred, index, _ = struct.unpack_from("<hBB", pcm, b * block_align)
        out[pos] = pred
        pos += 1
        body = pcm[b * block_align + 4 : (b + 1) * block_align]
        for byte in body:
            for n in (byte & 0xF, byte >> 4):
                pred, index = _ima_decode_nibble(n, pred, index)
                out[pos] = pred
                pos += 1
    return out
