"""Property tests (hypothesis) for the pure-numpy codecs: encode ->
decode is bit-exact for ANY dimensions/content, including the padding
edge cases (BMP rows pad to 4 bytes; RIFF chunks pad to even sizes)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from quanta_spark.operators.codecs import (
    decode_bmp,
    decode_qvid_frame,
    decode_wav,
    encode_bmp,
    encode_qvid,
    encode_wav,
    qvid_info,
    resize_nearest,
)


def _pixels(h: int, w: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 64),
    w=st.integers(1, 64),  # covers every row-padding residue w*3 % 4
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip(h, w, seed):
    px = _pixels(h, w, seed)
    assert (decode_bmp(encode_bmp(px)) == px).all()


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 5000),  # odd byte counts exercise RIFF even-padding
    sr=st.sampled_from([8000, 16000, 22050, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip(n, sr, seed):
    samples = (
        np.random.default_rng(seed).integers(-32768, 32768, size=n).astype(np.int16)
    )
    out, got_sr = decode_wav(encode_wav(samples, sr))
    assert got_sr == sr
    assert out.shape == (n, 1)
    assert np.array_equal((out[:, 0] * 32768.0).astype(np.int16), samples)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 16),
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    fps=st.integers(1, 120),
    seed=st.integers(0, 2**31 - 1),
)
def test_qvid_roundtrip_every_frame(n, h, w, fps, seed):
    frames = (
        np.random.default_rng(seed).integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    )
    blob = encode_qvid(frames, fps=fps)
    assert qvid_info(blob) == (w, h, n, fps)
    for k in range(n):
        assert (decode_qvid_frame(blob, k) == frames[k]).all()


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 48),
    w=st.integers(1, 48),
    th=st.integers(1, 48),
    tw=st.integers(1, 48),
    seed=st.integers(0, 2**31 - 1),
)
def test_resize_dims_and_value_domain(h, w, th, tw, seed):
    px = _pixels(h, w, seed)
    out = resize_nearest(px, tw, th)
    assert out.shape == (th, tw, 3)
    # nearest-neighbor only ever copies source pixels
    src_vals = {tuple(v) for v in px.reshape(-1, 3)}
    assert all(tuple(v) in src_vals for v in out.reshape(-1, 3)[:32])


def test_png_roundtrip_all_filters_rgb_rgba():
    """Every scanline filter (None/Sub/Up/Average/Paeth) must be
    bit-exact through encode->decode for both RGB and RGBA."""
    import numpy as np

    from quanta_spark.operators.codecs import decode_png, encode_png

    rng = np.random.default_rng(11)
    for c in (3, 4):
        px = rng.integers(0, 256, size=(37, 23, c), dtype=np.uint8)
        for ft in range(5):
            assert (decode_png(encode_png(px, filter_type=ft)) == px).all(), (c, ft)


def test_png_compresses_and_verifies_crc():
    """PNG is a real compressed container: a constant image deflates
    far below raw size, and a corrupted chunk fails CRC verification."""
    import numpy as np
    import pytest

    from quanta_spark.operators.codecs import decode_png, encode_png

    px = np.full((64, 64, 3), 200, dtype=np.uint8)
    data = encode_png(px, filter_type=1)
    assert len(data) < 64 * 64 * 3 / 10  # deflate actually compressed
    assert (decode_png(data) == px).all()
    corrupted = bytearray(data)
    corrupted[50] ^= 0xFF  # inside IDAT body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupted))


def test_png_rejects_unsupported_shapes():
    import numpy as np
    import pytest

    from quanta_spark.operators.codecs import decode_png, encode_png

    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # hand-build a grayscale IHDR: decode must name the unsupported type
    import struct
    import zlib

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr_body = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)  # color type 0
    ihdr = (
        struct.pack(">I", len(ihdr_body)) + b"IHDR" + ihdr_body
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_body) & 0xFFFFFFFF)
    )
    with pytest.raises(NotImplementedError, match="color_type"):
        decode_png(sig + ihdr)
