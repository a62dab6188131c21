"""Multimodal (image/audio/video) column handling.

Media are opaque ``binary`` columns + a typed metadata struct; all
per-blob compute flows through Arrow-batched ``mapInPandas`` so bytes
never round-trip through Python row objects. Decode itself is STUBBED
(no codec libraries in this environment — each stub either raises
NotImplementedError or produces a deterministic fake, clearly marked);
the Spark-side plumbing — schema, batch shape, partition sizing,
UDF signatures — is real and tested.

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


def resize_images(df: DataFrame, target: int = 224) -> DataFrame:
    """STUB: real resize needs an image codec (not in this image).
    The plumbing (filter to images, batch UDF, output schema) is real."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize requires PIL/opencv, not present in this "
            "environment; plug a decoder into this mapInPandas body"
        )

    return df.filter(F.col("kind") == "image").mapInPandas(
        fn, schema="media_id long, payload binary, width int, height int"
    )


def sample_video_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame sampling metadata plan: which frame indices to extract per
    video (pure column math — real); the extraction itself would plug
    into a decode UDF like resize_images."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n)
                )
            ).alias("frame_idx"),
        )
    )


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
    repartition) and nothing global-sorts."""
    from pyspark.sql.window import Window

    sized = df.withColumn("_sz", F.length("payload").cast("long"))
    bounds = sized.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).first()
    if bounds["lo"] is None:
        return df
    lo, hi = float(bounds["lo"]), float(bounds["hi"])
    n_ranges = max(df.sparkSession.sparkContext.defaultParallelism * 4, 4)
    rid = F.width_bucket(
        F.col(order_col).cast("double"), F.lit(lo), F.lit(hi + 1.0), F.lit(n_ranges)
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
        .orderBy(order_col)
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
        "_sz", "_rid", "_start", "_bucket"
    )
