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


def test_repartition_by_size_balances(spark, media):
    out = repartition_by_size(media, target_bytes=16 << 10)
    sizes = (
        out.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.sum(F.length("payload")).alias("bytes"))
        .toPandas()
    )
    assert len(sizes) > 1
    assert out.count() == 64
