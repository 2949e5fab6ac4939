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


def test_stream_sessionize_equals_batch_on_real_events(spark, tmp_path):
    """Full equivalence on the real sf0.001 events table (1000 events, 15
    users): stream the events through stream_sessionize in three
    time-ordered micro-batches; every session the stream closes must match
    the batch sessionizer (queries.sessionize_events) exactly, and the only
    sessions it does NOT emit are each user's final (still-open) one."""
    import time as _t

    from database_migration_spark import queries as Q
    from database_migration_spark.streaming.stateful import stream_sessionize

    sf = "/root/testdata/sf0.001"
    ev = Q.table(spark, sf, "events").select("user_id", "ts")

    # three chronological chunks written in order (file source processes in
    # mtime order with maxFilesPerTrigger) so sessions span micro-batches
    import os

    bounds = ev.selectExpr(
        "percentile_approx(unix_micros(to_utc_timestamp(cast(ts as timestamp), 'UTC')), array(0.33, 0.66)) AS b"
    ).collect()[0].b
    src = tmp_path / "ev_src"
    src.mkdir()
    from pyspark.sql import functions as F2
    from database_migration_spark.functions.time import epoch_us_for

    ev_us = ev.withColumn("tsu", epoch_us_for(ev, "ts"))
    chunks = [
        ev_us.where(F2.col("tsu") < bounds[0]),
        ev_us.where((F2.col("tsu") >= bounds[0]) & (F2.col("tsu") < bounds[1])),
        ev_us.where(F2.col("tsu") >= bounds[1]),
    ]
    for i, c in enumerate(chunks):
        p = str(src / f"chunk{i}")
        c.select("user_id", "ts").coalesce(1).write.parquet(p)
        _t.sleep(1.1)  # distinct mtimes → deterministic batch order
        for root, _d, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), None)

    ts_type = dict(ev.dtypes)["ts"]  # timestamp_ntz on current testdata
    stream = (
        spark.readStream.schema(f"user_id LONG, ts {ts_type}")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        stream_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions_eq")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_eq"))
        .start()
    )
    q.processAllAvailable()
    got = {
        (r.user_id, r.s, r.e, r.n_events)
        for r in spark.sql(
            "SELECT user_id, unix_micros(session_start) AS s, "
            "unix_micros(session_end) AS e, n_events FROM sessions_eq"
        ).collect()
    }
    q.stop()

    batch = Q.sessionize_events(spark, sf)
    from pyspark.sql import Window as W

    last_seq = F2.max("session_seq").over(W.partitionBy("user_id"))
    closed = (
        batch.withColumn("_last", last_seq)
        .where(F2.col("session_seq") < F2.col("_last"))
        .select("user_id", "session_start_us", "session_end_us", "n_events")
    )
    want = {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in closed.collect()
    }
    assert got == want
    assert len(want) > 50  # the corpus really exercises multi-session users
