"""Multimodal (image/audio/video) column handling.

Media are opaque ``binary`` columns + a typed metadata struct; all
per-blob compute flows through Arrow-batched ``mapInPandas`` so bytes
never round-trip through Python row objects.

Decode is REAL for every format implementable without codec
libraries: pure-numpy BMP (24-bit), PNG (8-bit RGB/RGBA — DEFLATE via
stdlib zlib + all five scanline filters), baseline JPEG (full
DCT + Annex K quantization/Huffman pipeline in numpy, 4:4:4 and
subsampled 4:2:0/4:2:2 with triangle chroma upsampling),
RIFF WAV (PCM16 + IMA-ADPCM), and the QVID raw-frame video container
(operators/codecs.py) — decode_media, resize_images and
sample_video_frames operate on actual pixels/PCM. Formats whose
decoders would be full protocol stacks (H.264, AAC; progressive
JPEG) raise NotImplementedError naming the feature: that
gate is per-FORMAT, not per-operator, and plugging a codec lib into
the same mapInPandas bodies is the only change a cluster deployment
needs.

Scale notes: blobs dominate partition bytes, so media tables must be
split by bytes not rows (spark.sql.files.maxPartitionBytes); the
``repartition_by_size`` helper rebalances by cumulative blob size so
one 4K-video partition doesn't straggle a stage.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            False,
        ),
    ]
)


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded bytes with a
    12-byte header (kind, width, height) we can 'decode'."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h = int(rng.integers(16, 512)), int(rng.integers(16, 512))
        body = rng.integers(0, 256, size=int(rng.integers(256, 4096)), dtype=np.uint8)
        payload = struct.pack(">4sII", kind[:4].encode().ljust(4), w, h) + body.tobytes()
        rows.append(
            (i, kind, bytearray(payload), (w, h, 16000 if kind == "audio" else None,
                                           int(rng.integers(1, 300)) if kind == "video" else None,
                                           "fake"))
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from ``documents``: each doc
    becomes one blob whose payload is the engine's 12-byte header
    (kind prefix, width, height — all pure functions of doc_id) plus
    the utf-8 text as body. Every ``decode_header`` output column is
    therefore predictable from (doc_id, text) alone, which is what
    makes the binary round-trip oracle-checkable in plain SQL."""
    kinds = ["image", "audio", "video"]

    def build(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            payloads = []
            knames = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                kind = kinds[int(doc_id) % 3]
                w = 16 + int(doc_id) % 496
                h = 16 + (int(doc_id) * 7) % 496
                payloads.append(
                    struct.pack(">4sII", kind[:4].encode().ljust(4), w, h)
                    + str(text).encode("utf-8")
                )
                knames.append(kind)
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "kind": knames, "payload": payloads}
            )

    return docs.select("doc_id", "text").mapInPandas(
        build, schema="media_id long, kind string, payload binary"
    )


def decode_header(df: DataFrame) -> DataFrame:
    """'Decode' = parse the 12-byte header + content digest. Real
    decode (PIL/libav) is NOT available here; the digest stands in for
    pixel/PCM output so downstream plumbing is testable end-to-end."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            kinds, ws, hs, digests, sizes = [], [], [], [], []
            prefix_to_kind = {"imag": "image", "audi": "audio", "vide": "video"}
            for p in pdf["payload"]:
                b = bytes(p)
                k, w, h = struct.unpack(">4sII", b[:12])
                prefix = k.rstrip(b"\x00 ").decode()
                kinds.append(prefix_to_kind.get(prefix, prefix))
                ws.append(w)
                hs.append(h)
                digests.append(hashlib.md5(b[12:]).hexdigest())
                sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "decoded_kind": kinds,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "content_md5": digests,
                    "n_bytes": pd.array(sizes, dtype="int64"),
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        fn,
        schema="media_id long, decoded_kind string, width int, height int, "
        "content_md5 string, n_bytes long",
    )


# ---------------------------------------------------------------------------
# REAL decode path — pure-numpy codecs (operators/codecs.py):
# BMP + PNG + baseline JPEG (4:4:4 + 4:2:0) for images, RIFF
# PCM16/IMA-ADPCM for audio, QVID raw frames + Motion-JPEG for video.
# Only H.264/AAC (full protocol stacks) and progressive JPEG still
# raise, each naming the unsupported feature — per-FORMAT, not
# per-operator.
# ---------------------------------------------------------------------------


def synthesize_real_media(spark: SparkSession, n: int = 48, seed: int = 42) -> DataFrame:
    """Deterministic media table whose payloads are REAL encoded files:
    24-bit BMPs, PCM16 WAVs (seeded sine + noise), and QVID raw video —
    every blob round-trips through the actual decoders."""
    from quanta_spark.operators.codecs import (
        encode_adpcm_wav,
        encode_bmp,
        encode_jpeg,
        encode_mjpeg,
        encode_png,
        encode_qvid,
        encode_wav,
    )

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w, h = int(rng.integers(16, 96)), int(rng.integers(16, 96))
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            if i % 6 == 0:
                # every other image is a REAL compressed PNG (all-filter
                # encode rotation exercises each unfilter path)
                payload, meta = encode_png(px, filter_type=(i // 6) % 5), (
                    w, h, None, None, "png",
                )
            elif i % 12 == 3:
                # ... and a REAL baseline JPEG (DCT + Huffman) slot
                # (i%12: image indices are multiples of 3, so i%6==3
                # would leave no BMPs at all)
                payload, meta = encode_jpeg(px, quality=90), (
                    w, h, None, None, "jpeg",
                )
            else:
                payload, meta = encode_bmp(px), (w, h, None, None, "bmp")
        elif kind == "audio":
            sr, n_samp = 16000, int(rng.integers(800, 4000))
            t = np.arange(n_samp) / sr
            freq = float(rng.integers(100, 2000))
            wave = 0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.standard_normal(n_samp)
            ints = (np.clip(wave, -1, 1) * 32767).astype(np.int16)
            if i % 9 == 1:
                # every third audio blob is REAL compressed IMA-ADPCM
                payload, meta = encode_adpcm_wav(ints, sr), (None, None, sr, None, "adpcm")
            else:
                payload, meta = encode_wav(ints, sr), (None, None, sr, None, "pcm16")
        else:
            w, h = int(rng.integers(8, 32)), int(rng.integers(8, 32))
            nf = int(rng.integers(2, 90))
            frames = rng.integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
            if i % 9 == 2:
                # every third video is REAL compressed Motion-JPEG
                payload, meta = encode_mjpeg(frames, quality=90), (
                    w, h, None, nf, "mjpeg",
                )
            else:
                payload, meta = encode_qvid(frames, fps=30), (w, h, None, nf, "qvid")
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def solid_media_from_documents(docs: DataFrame) -> DataFrame:
    """REAL encoded media (24-bit BMPs and QVID raw videos — actual
    container bytes built by the codecs) whose decode output is
    exactly predictable from doc_id alone: solid GRAY content, so the
    decoder's mean-pixel statistic equals the gray level with no
    float-summation ambiguity. This is what makes the real decode
    path oracle-checkable end to end in plain SQL (q44)."""
    from quanta_spark.operators.codecs import (
        encode_bmp,
        encode_jpeg,
        encode_jpeg_progressive,
        encode_png,
        encode_qvid,
    )

    def build(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            ids, kinds, payloads = [], [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                g = d % 256
                w, h = 16 + d % 48, 16 + (d * 3) % 48
                if d % 2 == 0:
                    kind = "image"
                    px = np.full((h, w, 3), g, dtype=np.uint8)
                    # alternate containers: d%8==0 -> REAL compressed PNG
                    # (deflate + filter), d%8==4 -> REAL baseline JPEG
                    # at quality 75 (luma Q[0,0]=8, so a solid block's
                    # DC quantizes exactly and AC is zero: decode
                    # returns the EXACT gray — lossy format, lossless
                    # on this content by construction), else BMP. The
                    # q44 oracle's doc_id arithmetic predicts all three
                    # identically — the gate proves JPEG decode too.
                    if d % 8 == 0:
                        payload = encode_png(px, filter_type=(d // 4) % 5)
                    elif d % 8 == 4:
                        # rotate 4:4:4 / 4:2:0 / progressive-4:2:0 —
                        # solid gray decodes EXACTLY under all three
                        # (constant chroma is a fixed point of 2x2 mean
                        # + triangle upsample; SA scans reassemble the
                        # exact DC), so the same oracle covers every
                        # variant, including the interleaved-DC MCU
                        # geometry of subsampled progressive
                        if d % 16 == 12:
                            payload = encode_jpeg(px, quality=75, subsampling="420")
                        elif d % 32 == 20:
                            payload = encode_jpeg_progressive(
                                px, quality=75, subsampling="420"
                            )
                        else:
                            payload = encode_jpeg(px, quality=75)
                    else:
                        payload = encode_bmp(px)
                else:
                    kind = "video"
                    nf = 2 + d % 7
                    payload = encode_qvid(np.full((nf, h, w, 3), g, dtype=np.uint8))
                ids.append(d)
                kinds.append(kind)
                payloads.append(payload)
            yield pd.DataFrame({"media_id": ids, "kind": kinds, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        build, schema="media_id long, kind string, payload binary"
    )


def _decode_one_blob(b: bytes):
    """Decode a single media blob, dispatching on container magic.
    Returns (kind, width, height, n_frames, sample_rate, n_samples,
    feature float). Raises on unknown magic or corrupt body."""
    from quanta_spark.operators import codecs

    if b[:2] == b"BM":
        px = codecs.decode_bmp(b)
        return ("image", px.shape[1], px.shape[0], None, None, None,
                float(px.mean()) / 255.0)
    if b[:8] == codecs._PNG_SIG:
        # REAL compressed decode: DEFLATE + filter reversal
        px = codecs.decode_png(b)
        return ("image", px.shape[1], px.shape[0], None, None, None,
                float(px.mean()) / 255.0)
    if b[:2] == b"\xff\xd8":
        # REAL transform-codec decode: baseline JPEG.
        # A multi-frame JFIF stream is Motion-JPEG video
        # (a 1-frame MJPEG IS a JPEG) — ONE structural
        # index walk + ONE frame-0 decode serve both
        # branches (no probe decode, no re-walk).
        spans = codecs.mjpeg_index(b)
        px = codecs.decode_jpeg(b[spans[0][0] : spans[0][1]])
        if len(spans) > 1:
            return ("video", px.shape[1], px.shape[0], len(spans),
                    None, None, float(px.mean()) / 255.0)
        return ("image", px.shape[1], px.shape[0], None, None, None,
                float(px.mean()) / 255.0)
    if b[:4] == b"RIFF":
        samples, sr = codecs.decode_wav(b)
        return ("audio", None, None, None, sr, samples.shape[0],
                float(np.sqrt((samples ** 2).mean())))
    if b[:4] == b"QVID":
        w, h, nf, _ = codecs.qvid_info(b)
        first = codecs.decode_qvid_frame(b, 0)
        return ("video", w, h, nf, None, None, float(first.mean()) / 255.0)
    raise NotImplementedError(
        f"no pure-python decoder for container magic {b[:4]!r} "
        "(H.264/AAC need full protocol stacks; "
        "JPEG/PNG/BMP/WAV/QVID decode here)"
    )


def decode_media(df: DataFrame, strict: bool = True) -> DataFrame:
    """Real decode over Arrow batches: dispatch on container magic,
    emit per-blob typed features (dims / sample geometry plus a
    content statistic proving pixel/PCM-level access).

    ``strict=True`` (default, fixture stance): unknown or corrupt
    containers raise and fail the batch — right for tests where a bad
    blob means a broken fixture.

    ``strict=False`` (100 TB stance, VERDICT r05 ask #3): each blob
    decodes under a per-ROW try/except; failures emit ``_status`` =
    ERROR with the exception in ``_error`` and NULL feature columns,
    successes emit ``_status`` = OK — the same row-granular
    drop-to-DLQ semantics as the stage runner (stages.py:155-238 ≙
    reference runner.go:147-156), so ``split_ok_dlq`` and the
    IdempotentSink DLQ split work unchanged. At corpus scale a
    corrupt blob is a certainty and must cost one DLQ row, never a
    batch (and in streaming, never a poisoned replay loop)."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            out = {
                "media_id": [], "decoded_kind": [], "width": [], "height": [],
                "n_frames": [], "sample_rate": [], "n_samples": [], "feature_milli": [],
            }
            if not strict:
                out["_status"] = []
                out["_error"] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                if strict:
                    vals = _decode_one_blob(b)
                    status = err = None
                else:
                    try:
                        vals = _decode_one_blob(b)
                        status, err = "OK", None
                    except Exception as e:  # one corrupt blob = one DLQ row
                        vals = (None,) * 7
                        status = "ERROR"
                        err = f"decode_media: {type(e).__name__}: {e}"
                kind, w_, h_, nf_, sr_, ns_, feat = vals
                out["media_id"].append(mid)
                out["decoded_kind"].append(kind)
                out["width"].append(w_)
                out["height"].append(h_)
                out["n_frames"].append(nf_)
                out["sample_rate"].append(sr_)
                out["n_samples"].append(ns_)
                # explicit half-up rounding: reproducible as
                # floor(x*1000 + 0.5) in any SQL engine (Python round()
                # is banker's and would diverge on exact halves)
                out["feature_milli"].append(
                    None if feat is None else int(np.floor(feat * 1000 + 0.5))
                )
                if not strict:
                    out["_status"].append(status)
                    out["_error"].append(err)
            yield pd.DataFrame(out)

    schema = (
        "media_id long, decoded_kind string, width int, height int, "
        "n_frames int, sample_rate int, n_samples long, feature_milli long"
    )
    if not strict:
        schema += ", _status string, _error string"
    return df.select("media_id", "payload").mapInPandas(fn, schema=schema)


def resize_images(df: DataFrame, target: int = 224, strict: bool = True) -> DataFrame:
    """REAL image resize (nearest-neighbor, pure numpy) for BMP and
    PNG payloads: decode -> resize -> re-encode in the SAME container,
    all inside one Arrow batch pass. Other image formats raise
    NotImplementedError naming the format.

    ``strict=False``: per-row try/except — corrupt blobs emit
    ``_status`` = ERROR / NULL payload instead of failing the batch
    (same contract as ``decode_media(strict=False)``)."""
    from quanta_spark.operators.codecs import (
        _PNG_SIG,
        decode_bmp,
        decode_jpeg,
        decode_png,
        encode_bmp,
        encode_jpeg,
        encode_png,
        resize_nearest,
    )

    def one(b: bytes) -> bytes:
        if b[:8] == _PNG_SIG:
            px = decode_png(b)
            enc = lambda a: encode_png(np.ascontiguousarray(a))
        elif b[:2] == b"\xff\xd8":
            px = decode_jpeg(b)
            enc = lambda a: encode_jpeg(np.ascontiguousarray(a))
        else:
            px = decode_bmp(b)
            enc = lambda a: encode_bmp(np.ascontiguousarray(a))
        return enc(resize_nearest(px, target, target))

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            ids, payloads, ws, hs, sts, errs = [], [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                if strict:
                    payload = one(b)
                    st = err = None
                else:
                    try:
                        payload, st, err = one(b), "OK", None
                    except Exception as e:
                        payload, st = None, "ERROR"
                        err = f"resize_images: {type(e).__name__}: {e}"
                ids.append(mid)
                payloads.append(payload)
                ws.append(None if payload is None else target)
                hs.append(None if payload is None else target)
                sts.append(st)
                errs.append(err)
            cols = {
                "media_id": ids,
                "payload": payloads,
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
            }
            if not strict:
                cols["_status"] = sts
                cols["_error"] = errs
            yield pd.DataFrame(cols)

    schema = "media_id long, payload binary, width int, height int"
    if not strict:
        schema += ", _status string, _error string"
    return df.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        fn, schema=schema
    )


def sample_video_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """REAL frame sampling: every_n-th frame of each video (raw QVID
    or COMPRESSED Motion-JPEG) is random-access decoded — only the
    sampled frame's byte span is entropy-decoded, never the whole
    video — and emitted as a standalone BMP blob: the fan-out shape
    of a frame-extraction training pipeline (one row per frame)."""
    from quanta_spark.operators.codecs import (
        decode_jpeg,
        decode_qvid_frame,
        encode_bmp,
        mjpeg_index,
        qvid_info,
    )

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                if b[:2] == b"\xff\xd8":
                    # index ONCE per blob, then decode only the sampled
                    # frames' byte spans
                    spans = mjpeg_index(b)
                    nf = len(spans)
                    dec = lambda blob, k: decode_jpeg(blob[spans[k][0] : spans[k][1]])
                else:
                    _, _, nf, _ = qvid_info(b)
                    dec = decode_qvid_frame
                for k in range(0, nf, every_n):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(encode_bmp(np.ascontiguousarray(dec(b, k))))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_bmp": frames,
                }
            )

    return df.filter(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        fn, schema="media_id long, frame_idx int, frame_bmp binary"
    )


def extract_media_features(
    df: DataFrame, n_bands: int = 8, strict: bool = True
) -> DataFrame:
    """REAL signal-level feature extraction per blob — the
    'feature-extract' verb of a multimodal training pipeline, on
    actual decoded samples/pixels (one Arrow pass, one decode per
    blob):

    - audio: ``n_bands`` spectral energy bands from an rFFT of the
      decoded PCM (numpy DSP, no audio lib) + dominant-band index —
      the input a quality/language-id audio filter consumes;
    - video: mean absolute inter-frame difference (motion energy,
      first up-to-8 frames) — static-content detector;
    - image: luma mean/std — exposure/contrast screens.

    Output: (media_id, kind, feature_bands array<double>,
    dominant_band int, motion_milli long, luma_mean_milli long,
    luma_std_milli long) with NULLs for non-applicable kinds.
    Features are reported in floor(x*1000+0.5) fixed point where
    downstream comparisons need cross-run stability.

    ``strict=False``: per-row try/except — corrupt blobs emit
    ``_status`` = ERROR / NULL features instead of failing the batch
    (same contract as ``decode_media(strict=False)``)."""
    from quanta_spark.operators import codecs

    def one(b: bytes):
        bands = dom = motion = lmean = lstd = None
        if b[:4] == b"RIFF":
            kind = "audio"
            samples, _sr = codecs.decode_wav(b)
            mono = samples[:, 0].astype(np.float64)
            spec = np.abs(np.fft.rfft(mono)) ** 2
            # drop DC, split the spectrum into equal bands
            spec = spec[1:] if len(spec) > 1 else spec
            edges = np.linspace(0, len(spec), n_bands + 1, dtype=np.int64)
            e = np.array([
                spec[edges[i]: edges[i + 1]].sum() for i in range(n_bands)
            ])
            total = max(e.sum(), 1e-12)
            bands = list((e / total).round(6))
            dom = int(np.argmax(e))
        else:
            # ONE structural walk for JPEG-family payloads; its
            # spans serve both the video/image dispatch and the
            # frame decodes (same no-re-walk rule as decode_media)
            spans = (
                codecs.mjpeg_index(b) if b[:2] == b"\xff\xd8" else None
            )
            frames = None
            if b[:4] == b"QVID":
                _, _, nf, _ = codecs.qvid_info(b)
                frames = [
                    codecs.decode_qvid_frame(b, k).astype(np.float64)
                    for k in range(min(nf, 8))
                ]
            elif spans is not None and len(spans) > 1:
                frames = [
                    codecs.decode_jpeg(b[s:e2]).astype(np.float64)
                    for s, e2 in spans[:8]
                ]
            if frames is not None:
                kind = "video"
                if len(frames) > 1:
                    diffs = [
                        np.abs(frames[i + 1] - frames[i]).mean()
                        for i in range(len(frames) - 1)
                    ]
                    motion = int(
                        np.floor(float(np.mean(diffs)) / 255.0 * 1000 + 0.5)
                    )
                else:
                    motion = 0
            else:
                kind = "image"
                if b[:2] == b"BM":
                    px = codecs.decode_bmp(b)
                elif b[:8] == codecs._PNG_SIG:
                    px = codecs.decode_png(b)
                elif spans is not None:
                    px = codecs.decode_jpeg(b[spans[0][0] : spans[0][1]])
                else:
                    raise NotImplementedError(
                        f"no pure-python decoder for container magic {b[:4]!r} "
                        "(H.264/AAC need full protocol stacks; "
                        "JPEG/PNG/BMP/WAV/QVID decode here)"
                    )
                px = px.astype(np.float64)
                luma = (
                    0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
                    if px.ndim == 3 and px.shape[-1] >= 3
                    # gray+alpha (h, w, 2): luma is channel 0,
                    # never the alpha plane
                    else px[..., 0] if px.ndim == 3 else px
                )
                lmean = int(np.floor(luma.mean() / 255.0 * 1000 + 0.5))
                lstd = int(np.floor(luma.std() / 255.0 * 1000 + 0.5))
        return kind, bands, dom, motion, lmean, lstd

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            out = {
                "media_id": [], "kind": [], "feature_bands": [],
                "dominant_band": [], "motion_milli": [],
                "luma_mean_milli": [], "luma_std_milli": [],
            }
            if not strict:
                out["_status"] = []
                out["_error"] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                if strict:
                    vals = one(b)
                    st = err = None
                else:
                    try:
                        vals, st, err = one(b), "OK", None
                    except Exception as e:
                        vals, st = (None,) * 6, "ERROR"
                        err = f"extract_media_features: {type(e).__name__}: {e}"
                kind, bands, dom, motion, lmean, lstd = vals
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["feature_bands"].append(bands)
                out["dominant_band"].append(dom)
                out["motion_milli"].append(motion)
                out["luma_mean_milli"].append(lmean)
                out["luma_std_milli"].append(lstd)
                if not strict:
                    out["_status"].append(st)
                    out["_error"].append(err)
            yield pd.DataFrame(out)

    schema = (
        "media_id long, kind string, feature_bands array<double>, "
        "dominant_band int, motion_milli long, luma_mean_milli long, "
        "luma_std_milli long"
    )
    if not strict:
        schema += ", _status string, _error string"
    return df.select("media_id", "payload").mapInPandas(fn, schema=schema)


def repartition_by_size(
    df: DataFrame, target_bytes: int = 128 << 20, order_col: str = "media_id"
) -> DataFrame:
    """Rebalance a media table by CUMULATIVE blob size: bucket =
    floor(running_sum_of_bytes / target_bytes) in ``order_col`` order,
    then range-partition on the bucket — each task holds ~target_bytes
    of payload regardless of row count (blob-size skew is the media
    analog of the mega-conversation). Guarantee: a partition's payload
    never exceeds target_bytes + one blob (greedy by start offset).

    The running sum is a DISTRIBUTED prefix sum, not a global-window
    sort: rows get a coarse range id (pure function of order_col), a
    tiny narrow-projection aggregate computes per-range byte totals
    (O(n_ranges) rows to the driver), and the exact cumsum is the
    broadcast range offset plus a per-range window cumsum — so the
    payload bytes cross exactly two shuffles (range window + final
    repartition) and nothing global-sorts.

    Non-numeric ``order_col`` (e.g. a string media id) gets a
    deterministic numeric surrogate key (xxhash64) — any total order
    satisfies the size guarantee; a silent double-cast would have
    produced NULL range ids and broken the bucketing."""
    from pyspark.sql.types import NumericType
    from pyspark.sql.window import Window

    if isinstance(df.schema[order_col].dataType, NumericType):
        key = F.col(order_col).cast("double")
    else:
        key = F.xxhash64(F.col(order_col)).cast("double")
    sized = df.withColumn("_sz", F.length("payload").cast("long")).withColumn(
        "_key", key
    )
    bounds = sized.agg(
        F.min("_key").alias("lo"), F.max("_key").alias("hi")
    ).first()
    if bounds["lo"] is None:
        return df
    lo, hi = float(bounds["lo"]), float(bounds["hi"])
    n_ranges = max(df.sparkSession.sparkContext.defaultParallelism * 4, 4)
    rid = F.width_bucket(
        F.col("_key"), F.lit(lo), F.lit(hi + 1.0), F.lit(n_ranges)
    )
    per_range = (
        sized.select(rid.alias("_rid"), "_sz")
        .groupBy("_rid")
        .agg(F.sum("_sz").alias("s"))
        .collect()
    )
    sums = {int(r["_rid"]): int(r["s"]) for r in per_range}
    offsets: dict[int, int] = {}
    running = 0
    for r in sorted(sums):
        offsets[r] = running
        running += sums[r]
    off_map = F.create_map(
        *[x for r, o in sorted(offsets.items()) for x in (F.lit(r), F.lit(o))]
    )
    w = (
        Window.partitionBy("_rid")
        .orderBy("_key", order_col)  # order_col breaks surrogate-hash ties
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    n_buckets = max(1, -(-running // target_bytes))
    bucketed = (
        sized.withColumn("_rid", rid)
        .withColumn(
            "_start",
            F.element_at(off_map, F.col("_rid")) + F.sum("_sz").over(w) - F.col("_sz"),
        )
        .withColumn("_bucket", (F.col("_start") / F.lit(target_bytes)).cast("long"))
    )
    return bucketed.repartitionByRange(n_buckets, "_bucket").drop(
        "_sz", "_key", "_rid", "_start", "_bucket"
    )


# ---------------------------------------------------------------------------
# perceptual image hashing (pHash) — multimodal member of the dedup
# family (VERDICT r05 ask #6)
# ---------------------------------------------------------------------------


def _dct_mat(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (the JPEG/pHash transform)."""
    k = np.arange(n)
    M = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    M[0] *= 1 / np.sqrt(2)
    return M * np.sqrt(2.0 / n)


def _phash_one(g: np.ndarray, dct32: np.ndarray) -> int:
    """Classic 64-bit DCT perceptual hash of a grayscale image:
    area-average to 32x32, 2D DCT, keep the low-frequency 8x8 block,
    threshold each coefficient against the median of the 63 AC
    coefficients. Container- and quality-robust: PNG/BMP re-encodes
    hash identically, JPEG-q75 re-encodes land within a few bits
    (measured 0 on the gate's pattern family, tests pin <=3)."""
    h, w = g.shape
    if (h, w) != (32, 32):
        ye = np.linspace(0, h, 33).astype(np.int64)
        xe = np.linspace(0, w, 33).astype(np.int64)
        out = np.empty((32, 32))
        for i in range(32):
            y0, y1 = ye[i], max(ye[i + 1], ye[i] + 1)
            for j in range(32):
                x0, x1 = xe[j], max(xe[j + 1], xe[j] + 1)
                out[i, j] = g[y0:y1, x0:x1].mean()
        g = out
    coef = dct32 @ g.astype(np.float64) @ dct32.T
    block = coef[:8, :8].ravel()
    med = np.median(block[1:])
    bits = (block > med).astype(np.uint8)
    return int(np.packbits(bits).view(">u8")[0])


def phash_images(
    df: DataFrame,
    strict: bool = True,
    keep: tuple[tuple[str, str], ...] = (),
) -> DataFrame:
    """64-bit DCT pHash per image blob (BMP/PNG/JPEG containers), one
    Arrow decode pass. Output carries the signature as 4 x 16-bit
    chunk columns (c0..c3) — the SAME layout as text SimHash
    (dedup.simhash), so dedup's pigeonhole chunk-blocking join is
    reused verbatim for image near-dup pairing: any two hashes within
    Hamming distance <=3 share at least one intact 16-bit chunk.

    ``strict=False``: corrupt blobs emit _status=ERROR rows instead
    of failing the batch (same contract as decode_media).

    ``keep``: (name, ddl_type) pairs carried through the pass
    untouched (e.g. an event-time column on a stream — mapInPandas
    emits fresh attributes, so the watermark is applied AFTER this
    pass, same shape as similarity._ivf_cells)."""
    from quanta_spark.operators import codecs

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dct32 = _dct_mat(32)

        def one(b: bytes) -> int:
            if b[:8] == codecs._PNG_SIG:
                px = codecs.decode_png(b)
            elif b[:2] == b"\xff\xd8":
                px = codecs.decode_jpeg(b)
            elif b[:2] == b"BM":
                px = codecs.decode_bmp(b)
            else:
                raise NotImplementedError(
                    f"phash_images: unsupported container magic {b[:4]!r} "
                    "(BMP/PNG/JPEG decode here)"
                )
            px = px.astype(np.float64)
            g = (
                0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
                if px.ndim == 3 and px.shape[-1] >= 3
                else px[..., 0] if px.ndim == 3 else px
            )
            return _phash_one(g, dct32)

        for pdf in it:
            if not len(pdf):
                continue
            out = {"media_id": [], "c0": [], "c1": [], "c2": [], "c3": []}
            if not strict:
                out["_status"] = []
                out["_error"] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                if strict:
                    hv = one(b)
                    st = err = None
                else:
                    try:
                        hv, st, err = one(b), "OK", None
                    except Exception as e:
                        hv, st = None, "ERROR"
                        err = f"phash_images: {type(e).__name__}: {e}"
                out["media_id"].append(mid)
                for c in range(4):
                    out[f"c{c}"].append(
                        None if hv is None else (hv >> (c * 16)) & 0xFFFF
                    )
                if not strict:
                    out["_status"].append(st)
                    out["_error"].append(err)
            res = pd.DataFrame(out)
            for name, _t in keep:
                res[name] = pdf[name].reset_index(drop=True)
            yield res

    schema = "media_id long, c0 int, c1 int, c2 int, c3 int"
    if not strict:
        schema += ", _status string, _error string"
    for name, t in keep:
        schema += f", {name} {t}"
    return df.select("media_id", "payload", *[n for n, _t in keep]).mapInPandas(
        fn, schema=schema
    )


def textured_pattern(d: int) -> np.ndarray:
    """Deterministic 32x32 RGB pattern for seed ``d``, built in DCT
    space: 31 low-frequency coefficients at +A, 31 at -A, one near
    zero. Bimodal coefficients keep every pHash bit far from the
    median threshold — measured margins: same pixels re-encoded
    through JPEG-q75 move 0 bits; distinct seeds differ by >=14."""
    dct32 = _dct_mat(32)
    rng = np.random.default_rng(d * 9973 + 17)
    vals = np.array([0.0] + [6.0] * 31 + [-6.0] * 31)
    rng.shuffle(vals)
    C = np.zeros((32, 32))
    C[:8, :8].flat[1:] = vals
    img = dct32.T @ C @ dct32  # inverse orthonormal DCT
    g = np.clip(128 + img * 12.0, 0, 255).astype(np.uint8)
    return np.stack([g] * 3, axis=-1)


def textured_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic TEXTURED image table for the pHash gate (q103):
    per doc_id, a 32x32 gray pattern built in DCT space — 31 low-
    frequency coefficients at +A, 31 at -A, one near zero (random
    placement seeded by doc_id). The bimodal coefficient layout keeps
    every pHash bit far from the median threshold, so re-encoding the
    SAME pixels through a lossy container moves the hash by ~0 bits
    (measured 0 over 500 docs at JPEG q75) while DISTINCT doc patterns
    differ by >=14 bits — the deterministic margin that makes a pairs
    oracle possible for a perceptual hash.

    Containers: PNG original per doc; JPEG-q75 clone at media_id
    +500000 for every 5th doc; BMP clone at +600000 for every 10th
    (3-container clone groups)."""
    from quanta_spark.operators import codecs

    def build(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pattern = textured_pattern

        for pdf in it:
            if not len(pdf):
                continue
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                px = pattern(d)
                ids.append(d)
                payloads.append(codecs.encode_png(px))
                if d % 5 == 0:
                    ids.append(d + 500000)
                    payloads.append(codecs.encode_jpeg(px, quality=75))
                if d % 10 == 0:
                    ids.append(d + 600000)
                    payloads.append(codecs.encode_bmp(px))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        build, schema="media_id long, payload binary"
    )


_AFP_N = 4096  # analysis window: first 0.256 s at 16 kHz


def _afp_one(x: np.ndarray) -> int:
    """64-bit spectral band-energy fingerprint of a mono float signal:
    rFFT of the first _AFP_N samples (zero-padded if shorter), energy
    in 64 equal 32-bin bands (DC excluded), each band thresholded
    against the median band energy — the audio analog of pHash's
    median-thresholded DCT block (Haitsma & Kalker 2002's band-energy
    features, one window). Codec-robust: IMA-ADPCM's ~20 dB
    quantization noise spreads across all 2048 bins while a band
    concentrates 32, so hot/cold band contrast survives re-encoding
    (measured: PCM16<->ADPCM clone Hamming 0 over 60 fixture seeds;
    distinct seeds >=18)."""
    x = x.astype(np.float64)
    if len(x) < _AFP_N:
        x = np.pad(x, (0, _AFP_N - len(x)))
    spec = np.abs(np.fft.rfft(x[:_AFP_N])) ** 2
    bands = spec[1 : 64 * 32 + 1].reshape(64, 32).sum(axis=1)
    med = np.median(bands)
    bits = (bands > med).astype(np.uint8)
    return int(np.packbits(bits).view(">u8")[0])


def audio_fingerprint(
    df: DataFrame,
    strict: bool = True,
    keep: tuple[tuple[str, str], ...] = (),
) -> DataFrame:
    """64-bit spectral fingerprint per audio blob (RIFF/WAVE PCM16 or
    mono IMA-ADPCM), one Arrow decode pass — the audio member of the
    multimodal dedup family. Output carries the signature as
    4 x 16-bit chunk columns (c0..c3), the SAME layout as text SimHash
    and image pHash, so dedup's pigeonhole chunk-blocking join
    (chunked_hamming_pairs) is shared verbatim.

    ``strict=False``: corrupt blobs emit _status=ERROR rows instead of
    failing the batch (same contract as decode_media/phash_images).

    ``keep``: (name, ddl_type) pairs carried through untouched (e.g.
    an event-time column on a stream; the watermark is applied AFTER
    this stateless pass)."""
    from quanta_spark.operators import codecs

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def one(b: bytes) -> int:
            samples, _sr = codecs.decode_wav(b)
            return _afp_one(samples.mean(axis=1) * 32768.0)

        for pdf in it:
            if not len(pdf):
                continue
            out = {"media_id": [], "c0": [], "c1": [], "c2": [], "c3": []}
            if not strict:
                out["_status"] = []
                out["_error"] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                if strict:
                    hv = one(b)
                    st = err = None
                else:
                    try:
                        hv, st, err = one(b), "OK", None
                    except Exception as e:
                        hv, st = None, "ERROR"
                        err = f"audio_fingerprint: {type(e).__name__}: {e}"
                out["media_id"].append(mid)
                for c in range(4):
                    out[f"c{c}"].append(
                        None if hv is None else (hv >> (c * 16)) & 0xFFFF
                    )
                if not strict:
                    out["_status"].append(st)
                    out["_error"].append(err)
            res = pd.DataFrame(out)
            for name, _t in keep:
                res[name] = pdf[name].reset_index(drop=True)
            yield res

    schema = "media_id long, c0 int, c1 int, c2 int, c3 int"
    if not strict:
        schema += ", _status string, _error string"
    for name, t in keep:
        schema += f", {name} {t}"
    return df.select("media_id", "payload", *[n for n, _t in keep]).mapInPandas(
        fn, schema=schema
    )


def tonal_pattern(d: int) -> np.ndarray:
    """Deterministic int16 mono clip for seed ``d``: one sinusoid at
    the center bin of each of 32 randomly chosen (of 64) spectral
    bands, random phases, peak-normalized to 20000. Bimodal band
    energies keep every fingerprint bit far from the median threshold
    — measured margins: the SAME clip re-encoded through IMA-ADPCM
    moves 0 bits; distinct seeds differ by >=18."""
    rng = np.random.default_rng(d * 7919 + 29)
    hot = rng.permutation(64)[:32]
    t = np.arange(_AFP_N)
    x = np.zeros(_AFP_N)
    for b in hot:
        k = 1 + 32 * int(b) + 16  # band-center rFFT bin
        x += np.sin(2 * np.pi * k * t / _AFP_N + rng.uniform(0, 2 * np.pi))
    x = x / np.abs(x).max() * 20000.0
    return x.astype(np.int16)


def tonal_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic audio table for the fingerprint gate (q109): per
    doc_id a WAV-PCM16 original (tonal_pattern); a lossy IMA-ADPCM
    re-encode of the SAME samples at media_id +500000 for every 5th
    doc; a PCM16 copy with 1024 samples of trailing silence appended
    at +600000 for every 10th (the padding near-dup case — the
    fingerprint window covers the first _AFP_N samples, so trailing
    pad collides exactly). Same clone-group arithmetic as the image
    gate's textured_media_from_documents."""
    from quanta_spark.operators import codecs

    def build(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                x = tonal_pattern(d)
                ids.append(d)
                payloads.append(codecs.encode_wav(x))
                if d % 5 == 0:
                    ids.append(d + 500000)
                    payloads.append(codecs.encode_adpcm_wav(x))
                if d % 10 == 0:
                    padded = np.concatenate(
                        [x, np.zeros(1024, dtype=np.int16)]
                    )
                    ids.append(d + 600000)
                    payloads.append(codecs.encode_wav(padded))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        build, schema="media_id long, payload binary"
    )


_VFP_FRAMES = 8  # frames sampled per video, evenly spaced


def _vfp_sample_idx(n_frames: int, k: int = _VFP_FRAMES) -> list[int]:
    """Evenly spaced frame indices over [0, n_frames): the sampling
    grid is RELATIVE, so a temporally resampled clone (each frame
    duplicated, fps doubled) lands on the same content frames."""
    if n_frames <= 1 or k <= 1:
        return [0]
    return sorted({int(round(i * (n_frames - 1) / (k - 1))) for i in range(k)})


def video_fingerprint(
    df: DataFrame,
    strict: bool = True,
    keep: tuple[tuple[str, str], ...] = (),
) -> DataFrame:
    """64-bit perceptual VIDEO fingerprint per blob (QVID raw frames
    or concatenated-JFIF MJPEG), one Arrow pass — the video member of
    the multimodal dedup family. Samples _VFP_FRAMES evenly spaced
    frames by RANDOM ACCESS (decode_qvid_frame / decode_mjpeg_frame
    entropy-decode only the sampled spans, never the whole video — the
    property that matters when a blob is minutes long), pHashes each
    sampled frame (the image family's median-thresholded DCT block),
    and majority-votes each of the 64 bits across frames: per-frame
    noise and codec drift (measured: up to 4 bits/frame on the gate
    fixture) cancel in the vote, while the relative sampling grid
    makes the hash invariant to temporal resampling. Output carries
    the signature as 4 x 16-bit chunk columns (c0..c3) — the SAME
    layout as text SimHash / image pHash / audio fingerprint, so
    dedup's pigeonhole chunk-blocking join (chunked_hamming_pairs) and
    the streaming ingestion gate (stream_phash_gate) are shared
    verbatim across all four modalities.

    ``strict=False``: corrupt blobs emit _status=ERROR rows instead of
    failing the batch (same contract as decode_media/phash_images).

    ``keep``: (name, ddl_type) pairs carried through untouched (e.g.
    an event-time column on a stream; the watermark is applied AFTER
    this stateless pass)."""
    from quanta_spark.operators import codecs

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dct32 = _dct_mat(32)

        def one(b: bytes) -> int:
            if b[:4] == b"QVID":
                _w, _h, n, _fps = codecs.qvid_info(b)
                get = lambda i: codecs.decode_qvid_frame(b, i)
            elif b[:2] == b"\xff\xd8":
                _w, _h, n = codecs.mjpeg_info(b)
                get = lambda i: codecs.decode_mjpeg_frame(b, i)
            else:
                raise NotImplementedError(
                    f"video_fingerprint: unsupported container magic "
                    f"{b[:4]!r} (QVID/MJPEG decode here)"
                )
            idxs = _vfp_sample_idx(n)
            votes = np.zeros(64, dtype=np.int64)
            for i in idxs:
                px = get(i).astype(np.float64)
                g = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
                hv = _phash_one(g, dct32)
                votes += np.unpackbits(
                    np.array([hv], dtype=">u8").view(np.uint8)
                )
            bits = (votes * 2 > len(idxs)).astype(np.uint8)
            return int(np.packbits(bits).view(">u8")[0])

        for pdf in it:
            if not len(pdf):
                continue
            out = {"media_id": [], "c0": [], "c1": [], "c2": [], "c3": []}
            if not strict:
                out["_status"] = []
                out["_error"] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                if strict:
                    hv = one(b)
                    st = err = None
                else:
                    try:
                        hv, st, err = one(b), "OK", None
                    except Exception as e:
                        hv, st = None, "ERROR"
                        err = f"video_fingerprint: {type(e).__name__}: {e}"
                out["media_id"].append(mid)
                for c in range(4):
                    out[f"c{c}"].append(
                        None if hv is None else (hv >> (c * 16)) & 0xFFFF
                    )
                if not strict:
                    out["_status"].append(st)
                    out["_error"].append(err)
            res = pd.DataFrame(out)
            for name, _t in keep:
                res[name] = pdf[name].reset_index(drop=True)
            yield res

    schema = "media_id long, c0 int, c1 int, c2 int, c3 int"
    if not strict:
        schema += ", _status string, _error string"
    for name, t in keep:
        schema += f", {name} {t}"
    return df.select("media_id", "payload", *[n for n, _t in keep]).mapInPandas(
        fn, schema=schema
    )


def moving_pattern(d: int, n_frames: int = 12) -> np.ndarray:
    """Deterministic (n_frames, 32, 32, 3) uint8 video for seed ``d``:
    every frame shares the textured_pattern bimodal-DCT base, plus
    per-frame Gaussian pixel noise (sigma tuned so individual frame
    pHashes DRIFT by up to 4 bits — the majority vote must genuinely
    cancel temporal noise, not ride identical frames). Measured over
    600 seeds: MJPEG-q75 re-encode of the same frames moves the voted
    hash by <=1 bit, a frame-doubled temporal resample by <=1 bit;
    distinct seeds differ by >=14 bits."""
    rng = np.random.default_rng(d * 9973 + 17)
    vals = np.array([0.0] + [6.0] * 31 + [-6.0] * 31)
    rng.shuffle(vals)
    C = np.zeros((32, 32))
    C[:8, :8].flat[1:] = vals
    dct32 = _dct_mat(32)
    base = dct32.T @ C @ dct32
    frames = []
    for f in range(n_frames):
        nrng = np.random.default_rng(d * 104729 + f * 31 + 7)
        noise = nrng.normal(0, 2.0, (32, 32))
        g = np.clip(128 + (base + noise) * 12.0, 0, 255).astype(np.uint8)
        frames.append(np.stack([g] * 3, axis=-1))
    return np.stack(frames)


def moving_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic VIDEO table for the fingerprint gate (q111): per
    doc_id a 12-frame QVID original (moving_pattern); the SAME frames
    re-encoded through lossy MJPEG-q75 at media_id +500000 for every
    5th doc; a frame-doubled QVID temporal resample (24 frames, fps
    doubled — every content frame twice) at +600000 for every 10th.
    Same clone-group arithmetic as the image/audio gate generators."""
    from quanta_spark.operators import codecs

    def build(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                fr = moving_pattern(d)
                ids.append(d)
                payloads.append(codecs.encode_qvid(fr, fps=30))
                if d % 5 == 0:
                    ids.append(d + 500000)
                    payloads.append(codecs.encode_mjpeg(fr, quality=75))
                if d % 10 == 0:
                    ids.append(d + 600000)
                    payloads.append(
                        codecs.encode_qvid(np.repeat(fr, 2, axis=0), fps=60)
                    )
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(
        build, schema="media_id long, payload binary"
    )
