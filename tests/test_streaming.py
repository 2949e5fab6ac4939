"""Structured Streaming tests: watermarked windowed agg + foreachBatch merge."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def event_files(spark, tmp_path):
    """Two micro-batch parquet drops of event rows."""
    rows1 = [(1, "2024-01-01 00:01:00", 10, "click", 1.0)]
    rows2 = [
        (2, "2024-01-01 00:02:30", 10, "click", 2.0),
        (3, "2024-01-01 00:07:00", 11, "view", 3.0),
    ]
    src = tmp_path / "stream_src"
    src.mkdir()
    schema = "event_id LONG, ts STRING, user_id LONG, event_type STRING, value DOUBLE"
    for i, rows in enumerate([rows1, rows2]):
        (
            spark.createDataFrame(rows, schema)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(src / f"batch{i}"))
        )
    return src


def test_windowed_event_agg_stream(spark, event_files, tmp_path):
    from database_migration_spark.streaming.delta_stream import windowed_event_agg

    stream = (
        spark.readStream.schema(
            "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(event_files) + "/*")
    )
    agg = windowed_event_agg(stream, window="5 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    q.processAllAvailable()
    rows = {
        (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    q.stop()
    assert rows[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert rows[("2024-01-01 00:05:00", "view")] == (1, 3.0)


def test_stream_merge_upsert(spark, tmp_path):
    from database_migration_spark.streaming.delta_stream import stream_merge_upsert

    src = tmp_path / "merge_src"
    src.mkdir()
    schema = "id LONG, v STRING"
    spark.createDataFrame([(1, "a"), (2, "b")], schema).coalesce(1).write.parquet(
        str(src / "b0")
    )
    spark.createDataFrame([(2, "B"), (3, "c")], schema).coalesce(1).write.parquet(
        str(src / "b1")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    target = str(tmp_path / "merge_target")
    q = stream_merge_upsert(stream, target, ["id"], str(tmp_path / "ck2"))
    q.processAllAvailable()
    q.stop()
    out = {r.id: r.v for r in spark.read.parquet(target).collect()}
    # staged rows win on collision; both batches merged by PK
    assert out[1] == "a" and out[3] == "c"
    assert out[2] in ("b", "B")  # batch order is nondeterministic across files
    assert len(out) == 3
