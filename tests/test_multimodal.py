"""Multimodal plumbing tests: binary payloads through mapInPandas —
schema, batch shape, 1→N fan-out, stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_finance_pipeline_spark.operators.multimodal import (
    decode_image_stats,
    image_byte_histogram,
    resize_images,
    sample_video_frames,
    with_media_metadata,
)


def _media(spark):
    rows = [
        (1, bytes(range(256))),
        (2, bytes([10] * 100)),
        (3, None),
    ]
    return spark.createDataFrame(rows, ["media_id", "content"])


def test_with_media_metadata_schema(spark):
    df = with_media_metadata(_media(spark), media_type="image", fmt="raw", width=16, height=16)
    f = {x.name: x for x in df.schema["media_meta"].dataType.fields}
    assert set(f) == {"media_type", "format", "width", "height", "n_frames", "sample_rate"}
    row = df.filter(F.col("media_id") == 1).collect()[0]["media_meta"]
    assert row["media_type"] == "image" and row["width"] == 16


def test_decode_image_stats_fake(spark):
    out = decode_image_stats(_media(spark))
    assert out.schema["stats"].dataType.fieldNames() == [
        "n_bytes", "mean_intensity", "min_byte", "max_byte",
    ]
    got = {r["media_id"]: r["stats"] for r in out.collect()}
    assert got[1]["n_bytes"] == 256
    assert got[1]["mean_intensity"] == pytest.approx(127.5)
    assert got[1]["min_byte"] == 0 and got[1]["max_byte"] == 255
    assert got[2]["mean_intensity"] == pytest.approx(10.0)
    assert got[3]["n_bytes"] == 0 and got[3]["mean_intensity"] is None


def test_decode_real_raises(spark):
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image_stats(_media(spark), decode="real")


def test_image_byte_histogram_features(spark):
    out = image_byte_histogram(_media(spark), n_bins=16)
    got = {r["media_id"]: r["features"] for r in out.collect()}
    assert len(got[1]) == 16
    # uniform byte distribution -> each 16-wide bin holds 16/256
    assert got[1] == pytest.approx([1 / 16] * 16)
    assert sum(got[2]) == pytest.approx(1.0)
    assert got[2][0] == pytest.approx(1.0)  # all bytes = 10 -> first bin
    assert got[3] == [0.0] * 16


def test_resize_images_fake(spark):
    df = with_media_metadata(_media(spark).filter(F.col("content").isNotNull()))
    out = resize_images(df, target_width=8, target_height=8)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows[1]["content"]) == 64  # truncated to 8x8
    assert len(rows[2]["content"]) == 64  # padded from 100?? no - truncated
    assert rows[1]["media_meta"]["width"] == 8
    # payload shorter than target gets zero-padded
    small = spark.createDataFrame([(9, bytes([1, 2, 3]))], ["media_id", "content"])
    padded = resize_images(small, target_width=2, target_height=3).collect()[0]
    assert padded["content"] == bytes([1, 2, 3, 0, 0, 0])


def test_sample_video_frames_fan_out(spark):
    # payload = 50 frames of 64 bytes; every 10th -> frames 0,10,20,30,40
    payload = bytes([7] * (64 * 50))
    df = spark.createDataFrame([(1, payload)], ["media_id", "content"])
    out = sample_video_frames(df, every_n=10, frame_bytes=64).orderBy("frame_index")
    rows = out.collect()
    assert [r["frame_index"] for r in rows] == [0, 10, 20, 30, 40]
    assert all(len(r["frame"]) == 64 for r in rows)


def test_mapinpandas_preserves_partitioning(spark):
    df = _media(spark).repartition(3)
    out = decode_image_stats(df)
    # narrow transformation: partition count preserved, no shuffle
    assert out.rdd.getNumPartitions() == 3


def test_decode_audio_stats_fake(spark):
    from etl_finance_pipeline_spark.operators.multimodal import decode_audio_stats

    # 16000 samples of alternating +100/-100 -> rms 100, peak 100, 1s
    payload = bytes([100, 156] * 8000)
    df = spark.createDataFrame([(1, payload), (2, None)], ["media_id", "content"])
    got = {r["media_id"]: r["stats"] for r in decode_audio_stats(df).collect()}
    assert got[1]["n_samples"] == 16000
    assert got[1]["duration_s"] == pytest.approx(1.0)
    assert got[1]["rms"] == pytest.approx(100.0)
    assert got[1]["peak"] == 100
    assert got[2]["n_samples"] == 0 and got[2]["rms"] is None


def test_decode_audio_real_raises(spark):
    from etl_finance_pipeline_spark.operators.multimodal import decode_audio_stats

    df = spark.createDataFrame([(1, bytes([0]))], ["media_id", "content"])
    with pytest.raises(NotImplementedError, match="soundfile"):
        decode_audio_stats(df, decode="real")
