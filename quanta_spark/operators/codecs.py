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
  both non-interlaced and Adam7-interlaced.
- JPEG (ITU-T T.81 baseline sequential DCT): a REAL transform codec
  implemented from the spec in numpy — 8x8 forward/inverse DCT,
  Annex K quantization tables with IJG quality scaling, Annex K
  Huffman tables with canonical code assignment, byte-stuffed
  entropy stream, JFIF markers; grayscale and YCbCr 4:4:4.
- IMA-ADPCM audio (WAV format 0x11, ~4:1), below.

Formats whose decoders are full protocol stacks (H.264, AAC) and
JPEG's progressive/arithmetic variants raise a clear
NotImplementedError naming the feature. The Spark-side plumbing is
identical either way: bytes in a binary column, decoded via
Arrow-batched ``mapInPandas``.
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
            if len(body) < 16:
                raise ValueError("WAV fmt chunk truncated")
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
# PNG — 8-bit grayscale / gray+alpha / palette / truecolor / RGBA
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


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass (PNG
# spec §8.2); pass k covers pixels (x0 + i*xs, y0 + j*ys).
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _filter_scanlines(pixels: np.ndarray, filter_type: int) -> np.ndarray:
    """(h, w, c) uint8 -> (h, 1 + w*c) filtered scanlines (filter byte
    + filtered samples), one filter applied to every row."""
    h, w, c = pixels.shape
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
    return scan


def _unfilter_scanlines(scan: np.ndarray, w: int, c: int) -> np.ndarray:
    """(rows, 1 + w*c) raw scanlines -> (rows, w*c) reconstructed
    samples, reversing all five PNG filters (each pass of an
    interlaced image is unfiltered independently, exactly like a
    stand-alone image of the pass's reduced dimensions)."""
    h, stride = scan.shape[0], w * c
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
    return out


def encode_png(
    pixels: np.ndarray,
    filter_type: int = 0,
    level: int = 6,
    interlace: bool = False,
) -> bytes:
    """uint8 array (h, w) grayscale, (h, w, 2) gray+alpha, (h, w, 3)
    RGB or (h, w, 4) RGBA -> PNG bytes (color types 0/4/2/6).
    ``filter_type`` applies one filter to every scanline (0..4) —
    exercising decode of each filter family; real encoders choose
    per-row, which decode handles identically. ``interlace=True``
    emits Adam7: seven reduced passes, each filtered independently,
    concatenated into one DEFLATE stream."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    assert pixels.dtype == np.uint8 and c in (1, 2, 3, 4)
    if not 0 <= filter_type <= 4:
        raise ValueError(f"filter_type must be 0..4, got {filter_type}")
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if interlace:
        parts = []
        for x0, y0, xs, ys in _ADAM7:
            sub = pixels[y0::ys, x0::xs]
            if sub.shape[0] and sub.shape[1]:  # empty passes emit nothing
                parts.append(_filter_scanlines(sub, filter_type).tobytes())
        body = b"".join(parts)
    else:
        body = _filter_scanlines(pixels, filter_type).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, int(interlace))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(body, level))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_palette(
    indices: np.ndarray,
    palette: np.ndarray,
    trns: np.ndarray | None = None,
    filter_type: int = 0,
    level: int = 6,
    interlace: bool = False,
) -> bytes:
    """Indexed-color PNG (color type 3): ``indices`` (h, w) uint8 into
    ``palette`` (n<=256, 3) uint8 RGB; optional ``trns`` gives per-
    palette-entry alpha (PNG tRNS chunk, may be shorter than the
    palette — omitted tail entries are opaque)."""
    assert indices.dtype == np.uint8 and indices.ndim == 2
    palette = np.asarray(palette, dtype=np.uint8)
    assert palette.ndim == 2 and palette.shape[1] == 3 and len(palette) <= 256
    if indices.max(initial=0) >= len(palette):
        raise ValueError(
            f"palette index {int(indices.max())} out of range for "
            f"{len(palette)}-entry palette"
        )
    if not 0 <= filter_type <= 4:
        raise ValueError(f"filter_type must be 0..4, got {filter_type}")
    h, w = indices.shape
    px = indices[:, :, None]
    if interlace:
        parts = []
        for x0, y0, xs, ys in _ADAM7:
            sub = px[y0::ys, x0::xs]
            if sub.shape[0] and sub.shape[1]:
                parts.append(_filter_scanlines(sub, filter_type).tobytes())
        body = b"".join(parts)
    else:
        body = _filter_scanlines(px, filter_type).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, int(interlace))
    chunks = [_png_chunk(b"IHDR", ihdr), _png_chunk(b"PLTE", palette.tobytes())]
    if trns is not None:
        trns = np.asarray(trns, dtype=np.uint8)
        assert trns.ndim == 1 and len(trns) <= len(palette)
        chunks.append(_png_chunk(b"tRNS", trns.tobytes()))
    chunks.append(_png_chunk(b"IDAT", zlib.compress(body, level)))
    chunks.append(_png_chunk(b"IEND", b""))
    return _PNG_SIG + b"".join(chunks)


# samples per pixel for each supported PNG color type (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array. Walks chunks with CRC verification,
    inflates the concatenated IDAT stream, and reverses all five
    scanline filters. Supports every 8-bit color type — 0 grayscale
    -> (h, w), 4 gray+alpha -> (h, w, 2), 2 RGB -> (h, w, 3),
    6 RGBA -> (h, w, 4), and 3 palette -> (h, w, 3), or (h, w, 4)
    when a tRNS chunk supplies per-entry alpha — both non-interlaced
    and Adam7-interlaced (seven reduced passes, each unfiltered
    independently then scattered onto the full grid); everything else
    raises naming the unsupported feature."""
    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG file (bad signature)")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    plte = None
    trns = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError(f"PNG chunk {ctype!r} truncated (declared {length} bytes)")
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    if depth != 8 or color_type not in _PNG_CHANNELS or comp != 0 or filt_method != 0:
        raise NotImplementedError(
            f"only 8-bit PNG color types 0/2/3/4/6 supported "
            f"(depth={depth}, color_type={color_type})"
        )
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    c = _PNG_CHANNELS[color_type]
    stride = w * c
    try:
        inflated = zlib.decompress(bytes(idat))
    except zlib.error as e:
        # CRC is forgeable, so malformed-but-checksummed DEFLATE must
        # still surface as the structured error dead-lettering keys on
        raise ValueError(f"PNG IDAT DEFLATE stream invalid: {e}") from e
    buf = np.frombuffer(inflated, dtype=np.uint8)
    if interlace == 0:
        if buf.size != h * (1 + stride):
            raise ValueError("PNG pixel data size mismatch")
        img = _unfilter_scanlines(buf.reshape(h, 1 + stride), w, c).reshape(h, w, c)
    else:
        # Adam7: seven independent reduced images, concatenated in the
        # one DEFLATE stream; empty passes (zero width or height)
        # occupy no bytes. Unfilter each, then scatter onto the
        # (y0+j*ys, x0+i*xs) grid.
        img = np.zeros((h, w, c), dtype=np.uint8)
        off = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (w - x0 + xs - 1) // xs
            ph = (h - y0 + ys - 1) // ys
            if pw == 0 or ph == 0:
                continue
            n = ph * (1 + pw * c)
            if off + n > buf.size:
                raise ValueError("PNG pixel data size mismatch (Adam7 pass truncated)")
            pass_px = _unfilter_scanlines(
                buf[off : off + n].reshape(ph, 1 + pw * c), pw, c
            ).reshape(ph, pw, c)
            img[y0::ys, x0::xs] = pass_px
            off += n
        if off != buf.size:
            raise ValueError("PNG pixel data size mismatch (trailing Adam7 bytes)")
    if color_type == 0:
        return img.reshape(h, w)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        if len(plte) == 0 or len(plte) % 3:
            raise ValueError(f"PLTE length {len(plte)} not a positive multiple of 3")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = img.reshape(h, w)
        if idx.max(initial=0) >= len(pal):
            raise ValueError(
                f"palette index {int(idx.max())} out of range for "
                f"{len(pal)}-entry palette"
            )
        rgb = pal[idx]
        if trns is None:
            return rgb
        if len(trns) > len(pal):
            raise ValueError(f"tRNS has {len(trns)} entries > palette {len(pal)}")
        alut = np.full(len(pal), 255, dtype=np.uint8)
        alut[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
        return np.dstack([rgb, alut[idx]])
    return img


# ---------------------------------------------------------------------------
# JPEG — DCT codec (ITU-T T.81), grayscale and YCbCr, with zero
# external libraries: 8x8 forward/inverse DCT in numpy, Annex K
# quantization tables with IJG quality scaling, Annex K Huffman
# tables, byte-stuffed entropy stream. Covers baseline sequential
# (SOF0) and progressive (SOF2), 4:4:4 / 4:2:0 / 4:2:2 chroma
# subsampling in both, restart markers (baseline); arithmetic coding
# and lossless/hierarchical SOFs raise naming the feature.
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_JPEG_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

_JPEG_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K "typical" Huffman tables: (bits[1..16], symbol values)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_canonical(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) under canonical JPEG code assignment."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for bit-serial decode."""
    return {(ln, code): sym for sym, (code, ln) in _huff_canonical(bits, vals).items()}


_DCT_M = np.array([
    [
        (np.sqrt(0.5) if u == 0 else 1.0) * 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
])  # orthonormal: fdct = M @ B @ M.T, idct = M.T @ F @ M


def _jpeg_scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> scaled Annex K table, clamped to
    [1, 255]. quality=75 leaves luma Q[0,0] at exactly 8, which makes
    a solid-gray block reconstruct EXACTLY (DC multiple of 8, AC 0) —
    the property the q44 oracle relies on."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)

    def restart(self, n: int) -> None:
        """Byte-align (1-bit padding) and emit restart marker RSTn."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.buf += bytes([0xFF, 0xD0 + (n % 8)])


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1  # one's complement
    return size, bits


def _encode_ac(coef: np.ndarray, ac_tab: dict, bw: _BitWriter) -> None:
    """Run-length entropy-encode AC coefficients 1..63 of one block
    (zigzag order in), EOB-terminated. In a progressive AC-first scan
    the same coding is spec-legal: 0x00 there means EOB-run of 1."""
    run = 0
    last_nz = int(np.nonzero(coef[1:])[0][-1]) + 1 if np.any(coef[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(coef[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size, bits = _jpeg_magnitude(v)
        code, ln = ac_tab[(run << 4) | size]
        bw.write(code, ln)
        bw.write(bits, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)


def _encode_block(
    coef: np.ndarray, prev_dc: int, dc_tab: dict, ac_tab: dict, bw: _BitWriter
) -> int:
    """Entropy-encode one quantized 8x8 block (zigzag order in)."""
    dc = int(coef[0])
    size, bits = _jpeg_magnitude(dc - prev_dc)
    code, ln = dc_tab[size]
    bw.write(code, ln)
    bw.write(bits, size)
    _encode_ac(coef, ac_tab, bw)
    return dc


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _chroma_downsample(
    planes: list[np.ndarray], h: int, w: int, subsampling: str
) -> list[tuple[int, int]]:
    """Mean-downsample the chroma planes IN PLACE per ``subsampling``
    ("444" / "420" / "422") and return per-component (H_i, V_i)
    sampling factors. Shared by the baseline and progressive encoders
    so both emit identical component geometry."""
    if subsampling not in ("444", "420", "422"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if len(planes) == 1 or subsampling == "444":
        return [(1, 1)] * len(planes)
    fy, fx = (2, 2) if subsampling == "420" else (1, 2)
    for i in (1, 2):
        p = np.pad(planes[i], ((0, h % fy), (0, w % fx)), mode="edge")
        planes[i] = p.reshape(
            p.shape[0] // fy, fy, p.shape[1] // fx, fx
        ).mean(axis=(1, 3))
    return [(fx, fy), (1, 1), (1, 1)]


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 75,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 array (h, w) grayscale or (h, w, 3) RGB -> baseline JFIF
    JPEG bytes (Annex K quant + Huffman tables, IJG quality scaling).
    ``subsampling``: "444" (default), "420" (2x2-mean chroma, luma
    sampling factor 2x2 — the most common real-world variant) or
    "422" (chroma halved horizontally).
    ``restart_interval``: MCUs between RSTn markers (0 = none) — the
    error-resilience feature most camera encoders emit. Lossy by
    design; decode_jpeg reverses it."""
    if restart_interval < 0 or restart_interval > 0xFFFF:
        raise ValueError(f"restart_interval {restart_interval} out of range")
    gray = pixels.ndim == 2
    assert pixels.dtype == np.uint8 and (gray or pixels.shape[2] == 3)
    h, w = pixels.shape[:2]
    if gray:
        planes = [pixels.astype(np.float64)]
    else:
        r, g, b = (pixels[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    qts = [_jpeg_scaled_qt(_JPEG_QT_LUMA, quality)]
    if not gray:
        qts.append(_jpeg_scaled_qt(_JPEG_QT_CHROMA, quality))
    dc_tabs = [_huff_canonical(_DC_LUMA_BITS, _DC_LUMA_VALS)]
    ac_tabs = [_huff_canonical(_AC_LUMA_BITS, _AC_LUMA_VALS)]
    if not gray:
        dc_tabs.append(_huff_canonical(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
        ac_tabs.append(_huff_canonical(_AC_CHROMA_BITS, _AC_CHROMA_VALS))

    # per-component sampling factors; 4:2:0 = luma 2x2 / 4:2:2 =
    # luma 2x1, chroma 1x1 with the chroma planes mean-downsampled
    samp = _chroma_downsample(planes, h, w, subsampling)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    # edge-replicate pad every plane to its full MCU grid
    padded = [
        np.pad(
            p,
            (
                (0, mcuy * samp[i][1] * 8 - p.shape[0]),
                (0, mcux * samp[i][0] * 8 - p.shape[1]),
            ),
            mode="edge",
        )
        for i, p in enumerate(planes)
    ]
    bw = _BitWriter()
    prev_dc = [0] * len(planes)
    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.restart(rst_idx)
                rst_idx += 1
                prev_dc = [0] * len(planes)
            mcu_count += 1
            for ci, plane in enumerate(padded):
                qi = min(ci, 1)
                hi, vi = samp[ci]
                for iby in range(vi):
                    for ibx in range(hi):
                        ry, rx = (my * vi + iby) * 8, (mx * hi + ibx) * 8
                        block = plane[ry : ry + 8, rx : rx + 8] - 128.0
                        coef = _DCT_M @ block @ _DCT_M.T
                        quant = np.rint(
                            coef.reshape(64)[_ZIGZAG] / qts[qi][_ZIGZAG]
                        ).astype(np.int64)
                        prev_dc[ci] = _encode_block(
                            quant, prev_dc[ci], dc_tabs[qi], ac_tabs[qi], bw
                        )
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qts[0][_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, b"\x01" + bytes(qts[1][_ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, samp[ci][0] << 4 | samp[ci][1], min(ci, 1)])
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS))
    out += seg(0xFFC4, dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS))
    if not gray:
        out += seg(0xFFC4, dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS))
        out += seg(0xFFC4, dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = min(ci, 1)
        sos += bytes([ci + 1, t << 4 | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# Progressive AC scans carry their own Huffman table: the Annex K AC
# tables define no EOBn symbols beyond EOB0, but real progressive
# streams batch end-of-band runs across blocks (that's most of their
# win). A flat 9-bit canonical code over every symbol the scan can
# emit keeps the table tiny and deterministic — optimal-table
# generation is an encoder quality knob, not a format requirement.
_AC_PROG_VALS = sorted(
    [r << 4 for r in range(15)]  # EOB0..EOB14 (runs up to 32767)
    + [0xF0]  # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_PROG_BITS = [0] * 16
_AC_PROG_BITS[8] = len(_AC_PROG_VALS)  # every symbol at code length 9


def _flush_eobrun(ac_tab: dict, bw: _BitWriter, eobrun: int) -> int:
    if eobrun:
        r = eobrun.bit_length() - 1  # eobrun in [2^r, 2^(r+1))
        code, ln = ac_tab[r << 4]
        bw.write(code, ln)
        bw.write(eobrun - (1 << r), r)
    return 0


def _encode_ac_prog(
    coef: np.ndarray, ac_tab: dict, bw: _BitWriter, eobrun: int, al: int = 0
) -> int:
    """Progressive AC-first coding of one block's band 1..63 at bit
    position ``al`` (sign-magnitude point transform, T.81 G.1.2.2)
    with cross-block EOB runs. Returns the pending run."""
    vals = [
        (1 if int(coef[k]) >= 0 else -1) * (abs(int(coef[k])) >> al)
        for k in range(64)
    ]
    last_nz = max((k for k in range(1, 64) if vals[k]), default=0)
    if last_nz == 0:
        eobrun += 1
        return _flush_eobrun(ac_tab, bw, eobrun) if eobrun == 0x7FFF else eobrun
    eobrun = _flush_eobrun(ac_tab, bw, eobrun)
    run = 0
    for k in range(1, last_nz + 1):
        v = vals[k]
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_tab[0xF0]
            bw.write(code, ln)
            run -= 16
        size, bits = _jpeg_magnitude(v)
        code, ln = ac_tab[(run << 4) | size]
        bw.write(code, ln)
        bw.write(bits, size)
        run = 0
    if last_nz < 63:
        eobrun = 1  # this block's EOB starts a new run
    return eobrun


def _encode_ac_refine_scan(
    blocks: np.ndarray, ac_tab: dict, bw: _BitWriter, al: int
) -> None:
    """Progressive AC refinement scan (Ah=al+1, Al=al) over all blocks
    of one component (T.81 G.1.2.3): newly-nonzero coefficients appear
    as run-coded +-1 symbols; already-nonzero ones contribute one
    correction bit each, emitted with the SYMBOL WHOSE RUN COVERS
    THEIR POSITION — a ZRL covers exactly the span up to its 16th
    zero-history coefficient, so corrections beyond that span ride the
    NEXT symbol (the decoder's G.7 walk reads them there; flushing
    them all at the first ZRL desyncs the stream — found by
    round-trip fuzzing at odd block counts); EOB runs span blocks and
    carry the run's trailing corrections."""
    eobrun = 0
    buf: list[int] = []  # corrections riding the pending EOB run

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = ac_tab[r << 4]
            bw.write(code, ln)
            bw.write(eobrun - (1 << r), r)
            eobrun = 0
        for b in buf:
            bw.write(b, 1)
        buf.clear()

    nb_y, nb_x = blocks.shape[:2]
    for yy in range(nb_y):
        for xx in range(nb_x):
            coef = blocks[yy, xx]
            absv = [abs(int(coef[k])) >> al for k in range(64)]
            newly = [k for k in range(1, 64) if absv[k] == 1]
            pend: list[int] = []  # corrections since the last covered span
            r = 0
            k = 1
            for kn in newly:
                while k < kn:
                    if absv[k] == 0:
                        r += 1
                        if r == 16:
                            # span complete at this 16th zero: EOB run
                            # first, then ZRL + this span's corrections
                            flush_eob()
                            code, ln = ac_tab[0xF0]
                            bw.write(code, ln)
                            for b in pend:
                                bw.write(b, 1)
                            pend.clear()
                            r = 0
                    else:  # already nonzero at coarser precision
                        pend.append(absv[k] & 1)
                    k += 1
                flush_eob()
                code, ln = ac_tab[(r << 4) | 1]
                bw.write(code, ln)
                bw.write(1 if int(coef[kn]) >= 0 else 0, 1)
                for b in pend:
                    bw.write(b, 1)
                pend.clear()
                r = 0
                k = kn + 1
            if k <= 63:  # trailing band: corrections ride the EOB run
                buf.extend(absv[j] & 1 for j in range(k, 64) if absv[j] > 1)
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
    flush_eob()


def encode_jpeg_progressive(
    pixels: np.ndarray, quality: int = 75, subsampling: str = "444"
) -> bytes:
    """uint8 array (h, w) grayscale or (h, w, 3) RGB -> PROGRESSIVE
    JFIF JPEG bytes (SOF2; 4:4:4 / 4:2:0 / 4:2:2). Scan script:
    interleaved DC first scan at successive-approximation bit 1, DC
    refinement scan, then one spectral-selection AC scan
    (Ss=1..Se=63) per component — it exercises the Al>0 DC path, the
    refinement path and EOB-run coding; decode_jpeg reverses it. Same
    Annex K tables, IJG quality scaling and chroma geometry as the
    baseline encoder, so quality contracts carry over. DC scans are
    MCU-interleaved over the padded H_i x V_i grids; AC scans are
    non-interleaved over each component's OWN block grid
    (ceil(ceil(dim * f_i / f_max) / 8), T.81 A.2.2), so interleaved
    padding blocks carry DC only — exactly what libjpeg emits."""
    gray = pixels.ndim == 2
    assert pixels.dtype == np.uint8 and (gray or pixels.shape[2] == 3)
    h, w = pixels.shape[:2]
    if gray:
        planes = [pixels.astype(np.float64)]
    else:
        r, g, b = (pixels[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    nc = len(planes)
    samp = _chroma_downsample(planes, h, w, subsampling)
    qts = [_jpeg_scaled_qt(_JPEG_QT_LUMA, quality)]
    dc_tabs = [_huff_canonical(_DC_LUMA_BITS, _DC_LUMA_VALS)]
    if not gray:
        qts.append(_jpeg_scaled_qt(_JPEG_QT_CHROMA, quality))
        dc_tabs.append(_huff_canonical(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    # per-component grids: interleaved (MCU-padded, for DC scans) and
    # non-interleaved (the component's own data extent, for AC scans)
    gby = [mcuy * v for _, v in samp]
    gbx = [mcux * hh for hh, _ in samp]
    nby = [_ceil_div(_ceil_div(h * v, vmax), 8) for _, v in samp]
    nbx = [_ceil_div(_ceil_div(w * hh, hmax), 8) for hh, _ in samp]
    padded = [
        np.pad(
            p,
            ((0, gby[i] * 8 - p.shape[0]), (0, gbx[i] * 8 - p.shape[1])),
            mode="edge",
        )
        for i, p in enumerate(planes)
    ]
    # quantized zigzag coefficients per component/block
    coefs = [np.zeros((gby[ci], gbx[ci], 64), dtype=np.int64) for ci in range(nc)]
    for ci, plane in enumerate(padded):
        qi = min(ci, 1)
        for yy in range(gby[ci]):
            for xx in range(gbx[ci]):
                block = plane[yy * 8 : yy * 8 + 8, xx * 8 : xx * 8 + 8] - 128.0
                coef = _DCT_M @ block @ _DCT_M.T
                coefs[ci][yy, xx] = np.rint(
                    coef.reshape(64)[_ZIGZAG] / qts[qi][_ZIGZAG]
                ).astype(np.int64)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)

    def sos(sel: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(sel)])
        for ci in sel:
            # DC tables 0/1 (Annex K); every AC scan uses table 0 (the
            # shared EOBn-capable progressive table)
            body += bytes([ci + 1, min(ci, 1) << 4 | 0])
        body += bytes([ss, se, ah << 4 | al])
        return seg(0xFFDA, body)

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qts[0][_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, b"\x01" + bytes(qts[1][_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, samp[ci][0] << 4 | samp[ci][1], min(ci, 1)])
    out += seg(0xFFC2, sof)  # SOF2: progressive DCT
    out += seg(0xFFC4, dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS))
    out += seg(0xFFC4, dht(1, 0, _AC_PROG_BITS, _AC_PROG_VALS))
    if not gray:
        out += seg(0xFFC4, dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS))
    ac_prog = _huff_canonical(_AC_PROG_BITS, _AC_PROG_VALS)

    def mcu_blocks():
        """Yield (ci, yy, xx) in T.81 interleaved order: MCU raster,
        components in scan order, V_i x H_i blocks row-major per MCU."""
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(nc):
                    hh, v = samp[ci]
                    for iby in range(v):
                        for ibx in range(hh):
                            yield ci, my * v + iby, mx * hh + ibx

    # scan 1: DC first, successive approximation Al=1 (diffs of DC>>1)
    bw = _BitWriter()
    prev = [0] * nc
    for ci, yy, xx in mcu_blocks():
        dc = int(coefs[ci][yy, xx, 0]) >> 1  # arithmetic shift
        size, bits = _jpeg_magnitude(dc - prev[ci])
        code, ln = dc_tabs[min(ci, 1)][size]
        bw.write(code, ln)
        bw.write(bits, size)
        prev[ci] = dc
    out += sos(list(range(nc)), 0, 0, 0, 1) + bw.flush()

    # scan 2: DC refinement (Ah=1, Al=0) — one raw bit per block
    bw = _BitWriter()
    for ci, yy, xx in mcu_blocks():
        bw.write(int(coefs[ci][yy, xx, 0]) & 1, 1)
    out += sos(list(range(nc)), 0, 0, 1, 0) + bw.flush()

    # scans 3..: per component, a full-band AC first scan at bit 1 then
    # an AC refinement scan — successive approximation on AC, the
    # libjpeg default script shape. Cross-block EOB runs round-trip the
    # decoder's EOBRUN>1 path; refinement round-trips correction bits.
    for ci in range(nc):
        bw = _BitWriter()
        eobrun = 0
        for yy in range(nby[ci]):
            for xx in range(nbx[ci]):
                eobrun = _encode_ac_prog(coefs[ci][yy, xx], ac_prog, bw, eobrun, al=1)
        _flush_eobrun(ac_prog, bw, eobrun)
        out += sos([ci], 1, 63, 0, 1) + bw.flush()
    for ci in range(nc):
        bw = _BitWriter()
        _encode_ac_refine_scan(coefs[ci][: nby[ci], : nbx[ci]], ac_prog, bw, al=0)
        out += sos([ci], 1, 63, 1, 0) + bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment, reversing
    0xFF00 byte stuffing; stops at any non-stuffing marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data) or (
            self.data[self.pos] == 0xFF and self.pos + 1 >= len(self.data)
        ):
            raise ValueError("JPEG scan data truncated")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def sync_restart(self, n: int) -> None:
        """Discard padding bits, consume the expected RSTn marker."""
        self.acc = 0
        self.nbits = 0
        if self.pos + 2 > len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("expected JPEG restart marker")
        m = self.data[self.pos + 1]
        if not (0xD0 <= m <= 0xD7) or (m - 0xD0) != n % 8:
            raise ValueError(f"unexpected restart marker 0xFF{m:02X}")
        self.pos += 2

    def read_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _next_marker(data: bytes, pos: int) -> int:
    """Skip entropy-coded data starting at ``pos``; return the offset of
    the next true marker (0xFF + non-stuffing, non-RST, non-fill)."""
    while pos < len(data) - 1:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
            elif nxt == 0xFF:
                pos += 1
            else:
                return pos
        else:
            pos += 1
    raise ValueError("JPEG stream ended without EOI")


def _upsample_triangle(p: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """Upsample a subsampled chroma plane to full resolution with the
    triangle filter (libjpeg's "fancy upsampling": 3:1 taps, centers-
    aligned — nearest-neighbor costs ~7 dB chroma PSNR on smooth
    gradients). Constant planes are exact fixed points ((3c+c)/4 = c),
    preserving the solid-gray oracle invariant."""
    for axis, f in ((0, fy), (1, fx)):
        if f == 1:
            continue
        n = p.shape[axis]
        idx = np.arange(n)
        pm = np.take(p, np.maximum(idx - 1, 0), axis=axis)
        pp = np.take(p, np.minimum(idx + 1, n - 1), axis=axis)
        sh = list(p.shape)
        sh[axis] *= 2
        out = np.empty(sh, dtype=p.dtype)
        sl = [slice(None)] * p.ndim
        sl[axis] = slice(0, None, 2)
        out[tuple(sl)] = (3.0 * p + pm) / 4.0
        sl[axis] = slice(1, None, 2)
        out[tuple(sl)] = (3.0 * p + pp) / 4.0
        p = out
    return p


def _prog_ac_first(br: "_BitReader", c: np.ndarray, ss: int, se: int, al: int,
                   ac_tab: dict, eobrun: int) -> int:
    """Progressive AC first scan (Ah=0) for one block (T.81 G.1.2.2):
    run-length coded values at bit position Al, with EOBn run lengths
    spanning blocks."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = br.read_huff(ac_tab)
        r, s = sym >> 4, sym & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("progressive AC coefficient index out of band")
        c[k] = _extend(br.read(s), s) * (1 << al)
        k += 1
    return 0


def _prog_ac_refine(br: "_BitReader", c: np.ndarray, ss: int, se: int, al: int,
                    ac_tab: dict, eobrun: int) -> int:
    """Progressive AC refinement scan (Ah>0) for one block (T.81
    G.1.2.3): one correction bit per already-nonzero coefficient, new
    coefficients appear at +-2^Al."""
    p1, m1 = 1 << al, -(1 << al)
    k = ss

    def refine_one(k: int) -> None:
        if br.read(1) and not (int(c[k]) & p1):
            c[k] += p1 if c[k] >= 0 else m1

    if eobrun == 0:
        while k <= se:
            sym = br.read_huff(ac_tab)
            r, s = sym >> 4, sym & 0xF
            val = 0
            if s == 0:
                if r != 15:  # EOBn
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read(r)
                    break
                # ZRL: skip 16 zero-history coefficients below
            else:
                if s != 1:
                    raise ValueError("invalid progressive AC refinement magnitude")
                val = p1 if br.read(1) else m1
            while k <= se:
                if c[k] != 0:
                    refine_one(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                c[k] = val
            k += 1
    if eobrun:
        while k <= se:
            if c[k] != 0:
                refine_one(k)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(
    data: bytes,
    scans: list[tuple],
    comps: list[tuple[int, int, int]],
    qtables: dict[int, np.ndarray],
    h: int,
    w: int,
) -> list[np.ndarray]:
    """Progressive (SOF2) coefficient accumulation over all scans, then
    one dequantize+IDCT pass per component. Subsampled components
    (H_i, V_i < max) live on their own block grids: DC scans with
    Ns>1 walk the MCU-interleaved padded grid (T.81 A.2.3), AC scans
    and Ns=1 DC scans walk the component's non-interleaved data
    extent (A.2.2); chroma is triangle-upsampled after IDCT exactly
    like the baseline path."""
    nc = len(comps)
    hs = [s >> 4 for _, s, _q in comps]
    vs = [s & 0xF for _, s, _q in comps]
    hmax, vmax = max(hs), max(vs)
    mcux, mcuy = _ceil_div(w, 8 * hmax), _ceil_div(h, 8 * vmax)
    gby = [mcuy * v for v in vs]  # interleaved (MCU-padded) grid
    gbx = [mcux * hh for hh in hs]
    nby = [_ceil_div(_ceil_div(h * v, vmax), 8) for v in vs]  # own extent
    nbx = [_ceil_div(_ceil_div(w * hh, hmax), 8) for hh in hs]
    coefs = [np.zeros((gby[ci], gbx[ci], 64), dtype=np.int64) for ci in range(nc)]
    for sel, ss, se, ah, al, start, dc_snap, ac_snap in scans:
        br = _BitReader(data, start)
        eobrun = 0
        prev_dc = [0] * nc
        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            if ah == 0:
                for _, td, _ta in sel:
                    if dc_snap.get(td) is None:
                        raise ValueError(
                            f"progressive scan references undefined DC table {td}"
                        )

            def dc_block(ci: int, td: int, yy: int, xx: int) -> None:
                c = coefs[ci][yy, xx]
                if ah == 0:
                    size = br.read_huff(dc_snap[td])
                    if size > 15:
                        raise ValueError(f"invalid JPEG DC category {size}")
                    diff = _extend(br.read(size), size) if size else 0
                    prev_dc[ci] += diff
                    c[0] = prev_dc[ci] * (1 << al)
                elif br.read(1):
                    c[0] |= 1 << al

            if len(sel) == 1:  # Ns=1 => non-interleaved (T.81 A.2.2)
                ci, td, _ta = sel[0]
                for yy in range(nby[ci]):
                    for xx in range(nbx[ci]):
                        dc_block(ci, td, yy, xx)
            else:
                for my in range(mcuy):
                    for mx in range(mcux):
                        for ci, td, _ta in sel:
                            for iby in range(vs[ci]):
                                for ibx in range(hs[ci]):
                                    dc_block(
                                        ci, td,
                                        my * vs[ci] + iby,
                                        mx * hs[ci] + ibx,
                                    )
        else:
            if len(sel) != 1:
                raise ValueError("progressive AC scan must be non-interleaved")
            ci, _td, ta = sel[0]
            if ac_snap.get(ta) is None:
                raise ValueError(
                    f"progressive scan references undefined AC table {ta}"
                )
            fn = _prog_ac_first if ah == 0 else _prog_ac_refine
            for yy in range(nby[ci]):
                for xx in range(nbx[ci]):
                    eobrun = fn(br, coefs[ci][yy, xx], ss, se, al,
                                ac_snap[ta], eobrun)
    planes = []
    for ci in range(nc):
        if comps[ci][2] not in qtables:
            raise ValueError(
                f"JPEG component references undefined quant table {comps[ci][2]}"
            )
        qt = qtables[comps[ci][2]]
        by, bx = gby[ci], gbx[ci]
        deq = np.zeros((by, bx, 64), dtype=np.float64)
        deq[:, :, _ZIGZAG] = coefs[ci] * qt[_ZIGZAG]
        blocks = np.einsum(
            "ij,yxjk,kl->yxil", _DCT_M.T, deq.reshape(by, bx, 8, 8), _DCT_M
        ) + 128.0
        plane = blocks.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        planes.append(
            _upsample_triangle(plane, vmax // vs[ci], hmax // hs[ci])[:h, :w]
        )
    return planes


def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF JPEG bytes -> uint8 array (h, w) for grayscale or
    (h, w, 3) RGB for 3-component YCbCr. Supports baseline sequential
    DCT (SOF0) with sampling factors 1-2 (4:4:4 / 4:2:0 / 4:2:2 /
    4:4:0, triangle chroma upsampling) and restart intervals
    (DRI/RSTn), plus progressive DCT (SOF2: successive approximation
    + spectral selection + EOB runs, same subsampling range);
    arithmetic coding and lossless/hierarchical SOFs raise naming the
    feature."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    progressive = False
    restart_interval = 0
    prog_scans: list[tuple] = []
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qt)
    scan_sel: list[tuple[int, int, int]] = []  # (comp idx, dc table, ac table)
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        # spec-legal: any number of 0xFF fill bytes may pad before a marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(data):
            raise ValueError("JPEG stream truncated in headers")
        marker = struct.unpack_from(">H", data, pos)[0]
        if marker == 0xFFD9:
            break
        if marker == 0xFF01 or 0xFFD0 <= marker <= 0xFFD8:  # TEM/RSTn: no length
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("JPEG stream truncated in headers")
        (length,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq not in (0, 1):
                    raise ValueError(f"JPEG DQT precision field must be 0/1, got {pq}")
                qt = np.zeros(64, dtype=np.int64)
                if pq:  # Pq=1: big-endian 16-bit entries (T.81 B.2.4.1)
                    qt[_ZIGZAG] = np.frombuffer(body, ">u2", 64, off + 1)
                else:
                    qt[_ZIGZAG] = np.frombuffer(body, np.uint8, 64, off + 1)
                qtables[tq] = qt
                off += 65 + 64 * pq
        elif marker == 0xFFC4:
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    raise ValueError("JPEG DHT segment truncated")
                htables[(tc, th)] = _huff_decode_map(bits, vals)
                off += 17 + n
        elif marker in (0xFFC0, 0xFFC2):
            if len(body) < 6:
                raise ValueError("JPEG SOF segment truncated")
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            if len(body) < 6 + 3 * nc:
                raise ValueError("JPEG SOF segment truncated")
            comps = [
                (body[6 + i * 3], body[7 + i * 3], body[8 + i * 3]) for i in range(nc)
            ]
            progressive = marker == 0xFFC2
            if any(
                (s >> 4) not in (1, 2) or (s & 0xF) not in (1, 2)
                for _, s, _q in comps
            ):
                raise NotImplementedError(
                    "only sampling factors 1 and 2 supported "
                    "(4:4:4 / 4:2:0 / 4:2:2 / 4:4:0)"
                )
            sof = (h, w, nc)
        elif marker in (0xFFC1, 0xFFC3, 0xFFC9, 0xFFCA, 0xFFCB):
            raise NotImplementedError(
                f"only baseline (SOF0) and progressive (SOF2) DCT supported, "
                f"got SOF marker 0x{marker:04X}"
            )
        elif marker == 0xFFDD:
            if len(body) < 2:
                raise ValueError("JPEG DRI segment truncated")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xFFDA:
            if not body:
                raise ValueError("JPEG SOS segment truncated")
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("JPEG SOS segment truncated")
            sel: list[tuple[int, int, int]] = []
            for i in range(ns):
                cid, tsel = body[1 + i * 2], body[2 + i * 2]
                ci = next(
                    (j for j, (c, _, _) in enumerate(comps) if c == cid), None
                )
                if ci is None:
                    raise ValueError(
                        f"JPEG SOS references unknown component id {cid}"
                    )
                sel.append((ci, tsel >> 4, tsel & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah_al = body[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0xF
            pos += 2 + length
            if progressive:
                if ss > 63 or se > 63 or ss > se:
                    raise ValueError(
                        f"invalid progressive spectral band Ss={ss} Se={se}"
                    )
                # snapshot tables NOW: DHT may be redefined between scans
                dc_snap = {td: htables.get((0, td)) for _, td, _ta in sel}
                ac_snap = {ta: htables.get((1, ta)) for _, _td, ta in sel}
                prog_scans.append((sel, ss, se, ah, al, pos, dc_snap, ac_snap))
                pos = _next_marker(data, pos)
                continue
            scan_sel = sel
            break
        pos += 2 + length
    if sof is None or not (scan_sel or prog_scans):
        raise ValueError("JPEG missing SOF/SOS")
    if progressive:
        if restart_interval:
            raise NotImplementedError(
                "restart intervals in progressive JPEG not supported"
            )
        h, w, nc = sof
        planes = _decode_progressive(data, prog_scans, comps, qtables, h, w)
        if nc == 1:
            return np.clip(np.floor(planes[0] + 0.5), 0, 255).astype(np.uint8)
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
        return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    # loop-invariant table validation, hoisted so a corrupt file fails
    # BEFORE any entropy decoding instead of inside the per-MCU loop
    for ci, td, ta in scan_sel:
        if (0, td) not in htables or (1, ta) not in htables:
            raise ValueError(
                f"JPEG scan references undefined Huffman table (dc={td}, ac={ta})"
            )
        if comps[ci][2] not in qtables:
            raise ValueError(
                f"JPEG component references undefined quant table {comps[ci][2]}"
            )
    h, w, nc = sof
    # interleaved MCU geometry (T.81 A.2.3): an MCU covers
    # 8*hmax x 8*vmax pixels and carries H_i x V_i blocks per component;
    # 4:4:4 is the hmax=vmax=1 special case of the same loop
    hs = [s >> 4 for _, s, _q in comps]
    vs = [s & 0xF for _, s, _q in comps]
    hmax, vmax = max(hs), max(vs)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    br = _BitReader(data, pos)
    planes = [
        np.zeros((mcuy * vs[i] * 8, mcux * hs[i] * 8), dtype=np.float64)
        for i in range(nc)
    ]
    prev_dc = [0] * nc

    def decode_block(dc_tab, ac_tab, qt, ci: int) -> np.ndarray:
        coef = np.zeros(64, dtype=np.int64)
        size = br.read_huff(dc_tab)
        if size > 15:
            # only possible via a corrupted DHT symbol: baseline
            # DC categories are 0..11 (T.81 F.1.2.1)
            raise ValueError(f"invalid JPEG DC category {size}")
        diff = _extend(br.read(size), size) if size else 0
        prev_dc[ci] += diff
        coef[0] = prev_dc[ci]
        k = 1
        while k < 64:
            sym = br.read_huff(ac_tab)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            run, size = sym >> 4, sym & 0xF
            k += run
            if k > 63:
                raise ValueError("AC coefficient index out of range")
            coef[k] = _extend(br.read(size), size)
            k += 1
        deq = np.zeros(64, dtype=np.float64)
        deq[_ZIGZAG] = coef * qt[_ZIGZAG]
        return _DCT_M.T @ deq.reshape(8, 8) @ _DCT_M + 128.0

    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart(rst_idx)
                rst_idx += 1
                prev_dc[:] = [0] * nc
            mcu_count += 1
            for ci, td, ta in scan_sel:
                dc_tab, ac_tab = htables[(0, td)], htables[(1, ta)]
                qt = qtables[comps[ci][2]]
                for iby in range(vs[ci]):
                    for ibx in range(hs[ci]):
                        ry = (my * vs[ci] + iby) * 8
                        rx = (mx * hs[ci] + ibx) * 8
                        planes[ci][ry : ry + 8, rx : rx + 8] = decode_block(
                            dc_tab, ac_tab, qt, ci
                        )
    planes = [
        _upsample_triangle(p, vmax // vs[i], hmax // hs[i])[:h, :w]
        for i, p in enumerate(planes)
    ]
    if nc == 1:
        return np.clip(np.floor(planes[0] + 0.5), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Motion-JPEG — compressed VIDEO as a stream of concatenated JFIF
# frames (the de-facto MJPEG wire format: multipart HTTP cameras,
# AVI 'MJPG' payloads). Random access via a STRUCTURAL index walk:
# each frame's end is found by parsing marker segments and the
# byte-stuffed entropy stream — NOT by naive 0xFFD9 byte search,
# which false-triggers on FF D9 sequences inside table payloads.
# ---------------------------------------------------------------------------


def encode_mjpeg(frames: np.ndarray, quality: int = 90) -> bytes:
    """uint8 array (n, h, w, 3) -> concatenated-JFIF MJPEG bytes."""
    n, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    return b"".join(encode_jpeg(frames[i], quality=quality) for i in range(n))


def _jpeg_end(data: bytes, start: int) -> int:
    """Offset one past the EOI of the JPEG starting at ``start``, by
    structural walk (segment lengths, then entropy scan honoring byte
    stuffing)."""
    if data[start : start + 2] != b"\xff\xd8":
        raise ValueError("frame does not start with SOI")
    pos = start + 2
    in_scan = False
    while pos < len(data):
        if not in_scan:
            if data[pos] != 0xFF:
                raise ValueError(f"bad marker alignment at {pos}")
            while pos + 1 < len(data) and data[pos + 1] == 0xFF:  # fill bytes
                pos += 1
            if pos + 1 >= len(data):
                raise ValueError("JPEG stream truncated in headers")
            marker = data[pos + 1]
            if marker == 0xD9:  # EOI (headers-only frame)
                return pos + 2
            pos += 2
            if 0xD0 <= marker <= 0xD8 or marker == 0x01:  # parameterless
                continue
            if pos + 2 > len(data):
                raise ValueError("JPEG stream truncated in headers")
            (length,) = struct.unpack_from(">H", data, pos)
            pos += length
            if marker == 0xDA:  # SOS -> entropy data follows
                in_scan = True
        else:
            if data[pos] == 0xFF:
                if pos + 1 >= len(data):
                    break  # truncated mid-marker -> the ended-without-EOI error
                nxt = data[pos + 1]
                if nxt == 0x00:  # stuffed data byte
                    pos += 2
                elif nxt == 0xD9:  # EOI
                    return pos + 2
                elif 0xD0 <= nxt <= 0xD7:  # restart marker
                    pos += 2
                elif nxt == 0xFF:  # fill byte before a marker
                    pos += 1
                else:
                    # any other marker ends this entropy segment — in a
                    # progressive stream more DHT/SOS scans follow
                    in_scan = False
            else:
                pos += 1
    raise ValueError("JPEG stream ended without EOI")


def mjpeg_index(data: bytes) -> list[tuple[int, int]]:
    """[(start, end)] of every JFIF frame in the stream."""
    spans = []
    pos = 0
    while pos < len(data):
        end = _jpeg_end(data, pos)
        spans.append((pos, end))
        pos = end
    return spans


def mjpeg_info(data: bytes) -> tuple[int, int, int]:
    """-> (width, height, n_frames) from the index + first SOF0."""
    spans = mjpeg_index(data)
    first = decode_jpeg(data[spans[0][0] : spans[0][1]])
    return first.shape[1], first.shape[0], len(spans)


def decode_mjpeg_frame(data: bytes, frame_idx: int) -> np.ndarray:
    """Random-access decode of ONE frame — only the indexed byte span
    is entropy-decoded, never the whole video."""
    spans = mjpeg_index(data)
    if not 0 <= frame_idx < len(spans):
        raise IndexError(f"frame {frame_idx} out of range [0, {len(spans)})")
    s, e = spans[frame_idx]
    return decode_jpeg(data[s:e])


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
    if not block_align or block_align < 4:
        raise ValueError(f"invalid ADPCM block_align {block_align}")
    spb = (block_align - 4) * 2 + 1
    if len(pcm) % block_align:
        raise ValueError(
            f"truncated ADPCM data chunk: {len(pcm)} bytes is not a "
            f"multiple of block_align {block_align}"
        )
    n_blocks = len(pcm) // block_align
    out = np.empty(n_blocks * spb, dtype=np.int16)
    pos = 0
    for b in range(n_blocks):
        pred, index, _ = struct.unpack_from("<hBB", pcm, b * block_align)
        if index > 88:
            raise ValueError(
                f"corrupt ADPCM block header: step index {index} > 88"
            )
        out[pos] = pred
        pos += 1
        body = pcm[b * block_align + 4 : (b + 1) * block_align]
        for byte in body:
            for n in (byte & 0xF, byte >> 4):
                pred, index = _ima_decode_nibble(n, pred, index)
                out[pos] = pred
                pos += 1
    return out
