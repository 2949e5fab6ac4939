"""Manifest state-machine tests (s3_to_exasol.sql semantics)."""

import os
import time

import pytest

from database_migration_spark.streaming.manifest import (
    ST_DONE,
    ST_WAIT_INSERT,
    ST_WAIT_UPDATE,
    ManifestLoader,
)


@pytest.fixture()
def workdir(tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    for i in range(3):
        (src / f"f{i}.csv").write_text("a,b\n1,2\n3,4\n")
    return tmp_path


def _loader(spark, workdir) -> ManifestLoader:
    return ManifestLoader(
        spark,
        str(workdir / "manifest.parquet"),
        file_format="csv",
        read_options={"header": "true"},
    )


def test_new_files_waiting_then_done(spark, workdir):
    ld = _loader(spark, workdir)
    plan = ld.load(str(workdir / "incoming"), execute=False)
    assert len(plan) == 3 and all("LOAD CSV" in p for p in plan)
    # dry run does not change pending state
    rep = ld.load(str(workdir / "incoming"))
    assert sorted(os.path.basename(f) for f in rep.loaded_files) == ["f0.csv", "f1.csv", "f2.csv"]
    assert rep.rows_loaded == 6
    statuses = {r.file_name: r.status for r in ld.read_manifest().collect()}
    assert set(statuses.values()) == {ST_DONE}


def test_idempotent_rerun_loads_nothing(spark, workdir):
    ld = _loader(spark, workdir)
    ld.load(str(workdir / "incoming"))
    rep2 = ld.load(str(workdir / "incoming"))
    assert rep2.loaded_files == [] and rep2.rows_loaded == 0


def test_modified_file_reloaded(spark, workdir):
    ld = _loader(spark, workdir)
    ld.load(str(workdir / "incoming"))
    f = workdir / "incoming" / "f1.csv"
    time.sleep(0.02)
    f.write_text("a,b\n5,6\n")
    os.utime(f, (time.time() + 5, time.time() + 5))  # advance mtime
    pend_after = ld.reconcile(
        __import__(
            "database_migration_spark.streaming.manifest", fromlist=["list_local_files"]
        ).list_local_files(str(workdir / "incoming"))
    )
    st = {r.file_name: r.status for r in pend_after.collect()}
    assert st[str(f)] == ST_WAIT_UPDATE
    rep = ld.load(str(workdir / "incoming"))
    assert [os.path.basename(p) for p in rep.loaded_files] == ["f1.csv"]


def test_error_isolation(spark, workdir):
    bad = workdir / "incoming" / "f1.csv"
    ld = _loader(spark, workdir)

    def reader(paths):
        if str(bad) in paths:
            raise ValueError("corrupt file")
        return spark.read.options(header="true").csv(paths)

    rep = ld.load(str(workdir / "incoming"), reader=reader)
    assert len(rep.error_files) == 1 and "corrupt" in rep.error_files[0][1]
    assert len(rep.loaded_files) == 2
    st = {r.file_name: r.status for r in ld.read_manifest().collect()}
    assert st[str(bad)].startswith("Error: ")
    # errored file stays out of pending until its mtime advances or force_reload
    assert ld.pending() == []
    rep2 = ld.load(str(workdir / "incoming"), force_reload=True)
    assert str(bad) in rep2.loaded_files  # reader default works now


def test_force_reload(spark, workdir):
    ld = _loader(spark, workdir)
    ld.load(str(workdir / "incoming"))
    rep = ld.load(str(workdir / "incoming"), force_reload=True)
    assert len(rep.loaded_files) == 3


def test_column_range_cap(spark, workdir):
    ld = ManifestLoader(
        spark,
        str(workdir / "m2.parquet"),
        file_format="csv",
        read_options={"header": "true"},
        column_range=1,
    )
    rep = ld.load(str(workdir / "incoming"))
    assert rep.rows_loaded == 6  # loads fine with only first column


def test_stream_ingest_smoke(spark, workdir, tmp_path):
    """Structured Streaming file source over the same folder (SURVEY §2.10)."""
    from database_migration_spark.streaming.manifest import stream_ingest

    sdf = stream_ingest(
        spark,
        str(workdir / "incoming"),
        schema="a STRING, b STRING",
        file_format="csv",
        options={"header": "true"},
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("ingest_smoke")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    n = spark.sql("SELECT count(*) c FROM ingest_smoke").collect()[0].c
    q.stop()
    assert n == 6
