"""Multimodal plumbing tests: the Spark side (schemas, batching, error rows,
frame explosion) is real; codecs are stubbed per the environment."""

import pytest
from pyspark.sql import functions as F

from database_migration_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    attach_media_metadata,
    extract_features,
    resize_stub,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x89PNG\r\n" + b"x" * 100, "image", 64, 64, None, "png"),
        (2, b"RIFF" + b"y" * 200, "audio", None, None, 3000, "wav"),
        (3, b"\x00\x00\x00 ftyp" + b"z" * 300, "video", 320, 240, 10000, "mp4"),
        (4, None, "image", None, None, None, None),  # broken row
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_metadata_jvm_side(spark, media):
    out = attach_media_metadata(media)
    m = {r.media_id: r for r in out.collect()}
    assert m[1].n_bytes == 106
    assert m[1].container_magic == "89504E47"  # PNG magic
    assert m[2].container_magic == "52494646"  # RIFF


def test_extract_features_deterministic_and_isolated(spark, media):
    out = extract_features(media).collect()
    by_id = {r.media_id: r for r in out}
    assert len(out) == 4
    assert by_id[1].error is None and len(by_id[1].feature) == 8
    # deterministic: same payload -> same feature
    again = {r.media_id: r for r in extract_features(media).collect()}
    assert again[1].feature == by_id[1].feature
    assert by_id[1].sha256 != by_id[2].sha256
    # null payload handled as empty, not a crash
    assert by_id[4].error is None


def test_extract_features_error_rows(spark, media):
    def bad_decoder(payload, mtype):
        if mtype == "audio":
            raise ValueError("unsupported codec")
        return [0.0]

    out = {r.media_id: r for r in extract_features(media, decoder=bad_decoder).collect()}
    assert out[2].error and "unsupported codec" in out[2].error
    assert out[1].error is None


def test_resize_stub_is_loud(spark, media):
    out = resize_stub(media.where(F.col("payload").isNotNull()), 32, 32).collect()
    assert all(r.error and "NotImplementedError" in r.error for r in out)


def test_sample_frames_explosion(spark, media):
    frames = sample_frames(media.where(F.col("duration_ms").isNotNull()), every_ms=1000)
    per = {
        r.media_id: r.n for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    assert per[2] == 3  # 3000ms / 1000
    assert per[3] == 10
    first = frames.where((F.col("media_id") == 3) & (F.col("frame_idx") == 4)).collect()[0]
    assert first.ts_ms == 4000
