"""publish_parquet protocol tests (functions/io.py): the rename-swap
publish — round-7 ADVICE: the legacy re-read + overwrite deleted the
previous generation file-by-file, so a crash mid-overwrite shredded
read-modify-write state (stream_cdc_apply's _seq fences / tombstones)."""

import os

import pytest


def _publish(spark, tmp_path, rows, name="t"):
    from database_migration_spark.functions.io import publish_parquet

    path = str(tmp_path / name)
    df = spark.createDataFrame(rows, "k INT, v STRING")
    publish_parquet(df, path, path + ".stage")
    return path


def test_publish_swaps_and_cleans_up(spark, tmp_path):
    path = _publish(spark, tmp_path, [(1, "a"), (2, "b")])
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "b")}
    assert not os.path.exists(path + ".stage")
    assert not os.path.exists(path + ".old")


def test_publish_self_referential_rewrite(spark, tmp_path):
    """The reason the helper exists: lineage reads `path`, result is
    written back to `path` — must not self-overwrite-race."""
    from pyspark.sql import functions as F

    from database_migration_spark.functions.io import publish_parquet

    path = _publish(spark, tmp_path, [(1, "a"), (2, "b")])
    df = spark.read.parquet(path).withColumn("v", F.concat("v", F.lit("!")))
    publish_parquet(df, path, path + ".stage")
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a!"), (2, "b!")}


def test_publish_crash_between_renames_preserves_a_generation(
    spark, tmp_path, monkeypatch
):
    """The crash-window contract: if the process dies after the old
    generation is moved aside but before the new one lands, BOTH
    generations exist on disk (path+'.old' and the staged copy) — the
    accumulated state is never shredded mid-write, unlike an overwrite."""
    from database_migration_spark.functions.io import publish_parquet

    path = _publish(spark, tmp_path, [(1, "gen1")])
    df = spark.createDataFrame([(1, "gen2")], "k INT, v STRING")

    real_rename = os.rename
    calls = []

    def failing_rename(src, dst):
        calls.append((src, dst))
        if len(calls) == 2:  # the staging -> path commit rename
            raise OSError("simulated crash")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing_rename)
    with pytest.raises(OSError, match="simulated crash"):
        publish_parquet(df, path, path + ".stage")
    monkeypatch.undo()
    # previous generation recoverable, new generation staged — nothing lost
    old = {(r.k, r.v) for r in spark.read.parquet(path + ".old").collect()}
    assert old == {(1, "gen1")}
    staged = {(r.k, r.v) for r in spark.read.parquet(path + ".stage").collect()}
    assert staged == {(1, "gen2")}
