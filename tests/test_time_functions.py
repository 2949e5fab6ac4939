"""epoch_us_wall / epoch_us_for: session-timezone independence for BOTH
timestamp flavors (the round-4 advisory: the zoned branch was only correct
under the UTC session pin)."""

from pyspark.sql import functions as F

from database_migration_spark.functions.time import epoch_us_for, epoch_us_wall

# 2021-06-01 12:00:00 UTC
_EPOCH_US = 1622548800000000


def _with_tz(spark, tz, fn):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        return fn()
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_ntz_path_tz_independent(spark):
    df = spark.sql(
        "SELECT TIMESTAMP_NTZ '2021-06-01 12:00:00' AS ts"
    ).select(epoch_us_wall("ts").alias("us"))
    for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
        assert _with_tz(spark, tz, lambda: df.collect()[0].us) == _EPOCH_US


def test_zoned_path_tz_independent(spark):
    # build the instant under UTC so the literal parse is unambiguous, then
    # evaluate the epoch extraction under three different session zones
    def run(tz):
        def go():
            df = spark.sql(
                "SELECT timestamp_micros(1622548800000000) AS ts"
            ).select(epoch_us_wall("ts", zoned=True).alias("us"))
            return df.collect()[0].us

        return _with_tz(spark, tz, go)

    for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
        assert run(tz) == _EPOCH_US


def test_epoch_us_for_dispatches_on_schema(spark):
    zoned = spark.sql("SELECT timestamp_micros(1622548800000000) AS ts")
    ntz = spark.sql("SELECT TIMESTAMP_NTZ '2021-06-01 12:00:00' AS ts")
    date = spark.sql("SELECT DATE '2021-06-01' AS ts")
    for df, want in (
        (zoned, _EPOCH_US),
        (ntz, _EPOCH_US),
        (date, 1622505600000000),  # midnight wall clock
    ):
        def go(df=df):
            return df.select(epoch_us_for(df, "ts").alias("us")).collect()[0].us

        for tz in ("UTC", "Asia/Tokyo"):
            assert _with_tz(spark, tz, go) == want, (df.schema, tz)


def test_date_trunc_composition_still_ntz(spark):
    # the events_hourly_agg pattern: date_trunc over NTZ stays NTZ, so the
    # default path applies and stays exact
    df = spark.sql("SELECT TIMESTAMP_NTZ '2021-06-01 12:34:56.789' AS ts")
    out = df.select(
        epoch_us_wall(F.date_trunc("hour", F.col("ts"))).alias("us")
    ).collect()[0].us
    assert out == _EPOCH_US


def test_epoch_us_wall_matches_duckdb_property(spark):
    """Property test: epoch_us_wall(NTZ) is bit-identical to DuckDB's
    epoch_us on arbitrary post-1970 microsecond timestamps — the arithmetic
    every events-table oracle comparison rests on."""
    import duckdb
    from hypothesis import given, settings, strategies as st

    @given(
        st.lists(
            # 1970-01-01 .. 2262-04-11 (pd/ns-safe upper bound), exact µs
            st.integers(min_value=0, max_value=9_200_000_000_000_000),
            min_size=1,
            max_size=20,
            unique=True,
        )
    )
    @settings(max_examples=10, deadline=None)
    def check(micros):
        spark_vals = dict(
            spark.sql(
                "SELECT us, timestampdiff(MICROSECOND, "
                "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ), "
                "CAST(timestamp_micros(us) AS TIMESTAMP_NTZ)) AS w "
                "FROM VALUES "
                + ", ".join(f"({u}L)" for u in micros)
                + " AS t(us)"
            ).collect()
        )
        duck_vals = dict(
            duckdb.sql(
                "SELECT us, epoch_us(make_timestamp(us)) FROM (VALUES "
                + ", ".join(f"({u}::BIGINT)" for u in micros)
                + ") t(us)"
            ).fetchall()
        )
        assert spark_vals == duck_vals == {u: u for u in micros}

    # session tz pinned UTC by get_spark: timestamp_micros→NTZ is the wall
    # clock epoch_us_wall sees for the testdata's NTZ column
    check()
