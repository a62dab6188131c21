"""Multimodal plumbing tests: binary payload columns flow through
Arrow-batched UDFs with typed metadata; decode itself is stubbed (no
codec libs in this environment) but the header parse, batch shape,
frame-sampling plan, and size-aware repartition are real."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quanta_spark.operators.multimodal import (
    decode_header,
    repartition_by_size,
    resize_images,
    sample_video_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, n=64, seed=42).cache()


def test_decode_header_parses_every_blob(spark, media):
    out = decode_header(media).toPandas()
    assert len(out) == 64
    src = media.select("media_id", "kind", F.col("meta.width").alias("w")).toPandas()
    merged = out.merge(src, on="media_id")
    assert (merged["decoded_kind"] == merged["kind"]).all()
    assert (merged["width"] == merged["w"]).all()
    assert merged["content_md5"].str.len().eq(32).all()
    assert (merged["n_bytes"] > 12).all()


def test_decode_is_deterministic(spark, media):
    a = decode_header(media).toPandas().sort_values("media_id").reset_index(drop=True)
    b = decode_header(media).toPandas().sort_values("media_id").reset_index(drop=True)
    assert (a["content_md5"] == b["content_md5"]).all()


def test_resize_is_explicit_stub(spark, media):
    """The unimplemented decode must fail loudly, not fake pixels."""
    with pytest.raises(Exception, match="NotImplementedError|resize"):
        resize_images(media).collect()


def test_frame_sampling_plan(spark, media):
    frames = sample_video_frames(media, every_n=30).toPandas()
    vids = media.filter(F.col("kind") == "video").select(
        "media_id", F.col("meta.n_frames").alias("nf")
    ).toPandas()
    assert set(frames["media_id"]) == set(vids["media_id"])
    for _, row in vids.iterrows():
        got = sorted(frames[frames.media_id == row.media_id]["frame_idx"])
        assert got == list(range(0, max(row.nf - 1, 0) + 1, 30))


def _partition_bytes(out):
    return (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.sum(F.length("payload")).alias("bytes"))
        .toPandas()["bytes"]
    )


def test_repartition_by_size_balances(spark, media):
    target = 16 << 10
    out = repartition_by_size(media, target_bytes=target)
    max_blob = media.agg(F.max(F.length("payload"))).first()[0]
    sizes = _partition_bytes(out)
    assert len(sizes) > 1
    assert out.count() == 64
    # the contract: cumulative-size bucketing bounds every partition by
    # target + one blob (greedy by start offset)
    assert sizes.max() <= target + max_blob


def test_repartition_by_size_one_giant_blob(spark):
    """One 5 MB blob among 1,000 tiny ones: the giant must not drag
    neighbors into its partition beyond the bound, and tiny blobs must
    pack to ~target instead of one-partition-per-row."""
    import numpy as np

    rows = [(i, bytearray(b"x" * 1024)) for i in range(1000)]
    rows.append((1000, bytearray(b"y" * (5 << 20))))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    target = 1 << 20  # 1 MB
    out = repartition_by_size(df, target_bytes=target)
    sizes = _partition_bytes(out)
    total = 1000 * 1024 + (5 << 20)
    assert out.count() == 1001
    assert sizes.max() <= target + (5 << 20)
    # tiny blobs pack: the 1 MB worth of tiny rows occupies ~1 bucket,
    # so partition count stays near ceil(total/target), not 1001
    assert len(sizes) <= int(np.ceil(total / target)) + 1
