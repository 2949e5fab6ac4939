"""Custom stateful streaming sessionizer test: closed sessions from the
stream match the batch sessionizer's on the same data."""

from pyspark.sql import functions as F


def test_stream_sessionize_matches_batch(spark, tmp_path):
    from database_migration_spark.streaming.stateful import stream_sessionize

    # 2 users; user 10 has two sessions separated by > 30 min; a third
    # session stays open (never emitted without timeout — expected)
    rows = [
        (10, "2024-01-01 00:00:00"),
        (10, "2024-01-01 00:10:00"),
        (10, "2024-01-01 01:00:00"),  # gap 50min -> new session
        (10, "2024-01-01 01:05:00"),
        (10, "2024-01-01 03:00:00"),  # gap -> third (stays open)
        (20, "2024-01-01 00:00:00"),
        (20, "2024-01-01 02:00:00"),  # second session (stays open)
    ]
    src = tmp_path / "sess_src"
    src.mkdir()
    (
        spark.createDataFrame(rows, "user_id LONG, ts STRING")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1)
        .write.parquet(str(src / "b0"))
    )
    stream = (
        spark.readStream.schema("user_id LONG, ts TIMESTAMP")
        .parquet(str(src) + "/*")
    )
    q = (
        stream_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    got = {
        (r.user_id, str(r.session_start), r.n_events)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    q.stop()
    # closed sessions only: user 10's first two sessions, user 20's first
    assert (10, "2024-01-01 00:00:00", 2) in got
    assert (10, "2024-01-01 01:00:00", 2) in got
    assert (20, "2024-01-01 00:00:00", 1) in got
    assert len(got) == 3
