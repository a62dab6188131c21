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
