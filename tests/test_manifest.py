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


# --- distributed (join-path) reconciliation ---------------------------------


def _snapshot(ld):
    return sorted(
        (r.file_name, r.last_modified, r.size, r.status)
        for r in ld.read_manifest().collect()
    )


def test_join_path_equivalent_to_dict_path(spark, workdir, tmp_path):
    """The full-outer-join MERGE and the reference's dict state machine must
    produce identical manifests through a full lifecycle: new → done →
    modified → error → force_reload."""
    incoming = str(workdir / "incoming")
    dict_ld = ManifestLoader(
        spark, str(tmp_path / "m_dict.parquet"), file_format="csv",
        read_options={"header": "true"},
    )
    join_ld = ManifestLoader(
        spark, str(tmp_path / "m_join.parquet"), file_format="csv",
        read_options={"header": "true"}, distributed_threshold=0,
    )

    def reader_err(paths):
        if any(p.endswith("f2.csv") for p in paths):
            raise ValueError("corrupt file")
        return spark.read.options(header="true").csv(paths)

    for step in range(4):
        for ld in (dict_ld, join_ld):
            if step == 0:
                ld.load(incoming)
            elif step == 1:
                ld.load(incoming)  # idempotent rerun
            elif step == 2:
                ld.load(incoming, reader=reader_err, force_reload=True)
            else:
                ld.load(incoming)
        if step == 2:
            # mutate one file between steps (mtime advance → waiting for update)
            f = workdir / "incoming" / "f0.csv"
            f.write_text("a,b\n9,9\n")
            os.utime(f, (time.time() + 60, time.time() + 60))
    assert _snapshot(dict_ld) == _snapshot(join_ld)
    st = {r.file_name.rsplit("/", 1)[-1]: r.status for r in join_ld.read_manifest().collect()}
    assert st["f0.csv"] == ST_DONE  # reloaded after mtime advance
    assert st["f2.csv"].startswith("Error: ")


def test_join_path_never_collects_manifest(spark, workdir, tmp_path, monkeypatch):
    """Above the threshold, reconcile and status updates must not collect the
    manifest to the driver — the whole point of the join path."""
    from pyspark.sql import DataFrame

    ld = ManifestLoader(
        spark, str(tmp_path / "m_nc.parquet"), file_format="csv",
        read_options={"header": "true"}, distributed_threshold=0,
    )
    listing = __import__(
        "database_migration_spark.streaming.manifest", fromlist=["list_local_files"]
    ).list_local_files(str(workdir / "incoming"))

    def boom(self):
        raise AssertionError("manifest collected on the driver")

    monkeypatch.setattr(DataFrame, "collect", boom)
    ld.reconcile(listing)
    ld._update_status([listing[0]["file_name"]], [])
    monkeypatch.undo()
    st = {r.file_name.rsplit("/", 1)[-1]: r.status for r in ld.read_manifest().collect()}
    assert st[os.path.basename(listing[0]["file_name"])] == ST_DONE
    assert st["f1.csv"] == ST_WAIT_INSERT


def test_load_batch_single_job(spark, workdir, tmp_path):
    """load_batch: all pending files in ONE distributed scan, per-file
    status from _metadata.file_path — done for contributing files, error
    for empty/corrupt ones."""
    (workdir / "incoming" / "empty.csv").write_text("a,b\n")  # header only
    ld = ManifestLoader(
        spark, str(tmp_path / "mb.parquet"), file_format="csv",
        read_options={"header": "true"},
    )
    df, rep = ld.load_batch(str(workdir / "incoming"))
    assert rep.rows_loaded == 6
    assert sorted(os.path.basename(f) for f in rep.loaded_files) == [
        "f0.csv", "f1.csv", "f2.csv",
    ]
    assert [os.path.basename(f) for f, _ in rep.error_files] == ["empty.csv"]
    st = {os.path.basename(r.file_name): r.status for r in ld.read_manifest().collect()}
    assert st["f0.csv"] == ST_DONE and st["empty.csv"].startswith("Error: ")
    # idempotent: nothing pending on rerun
    df2, rep2 = ld.load_batch(str(workdir / "incoming"))
    assert rep2.loaded_files == [] and rep2.rows_loaded == 0


def test_load_batch_summary_only_at_scale(spark, workdir, tmp_path):
    """Above the threshold the report is summary-only (no driver-side file
    lists) but the manifest statuses are still exact."""
    ld = ManifestLoader(
        spark, str(tmp_path / "mb2.parquet"), file_format="csv",
        read_options={"header": "true"}, distributed_threshold=0,
    )
    df, rep = ld.load_batch(str(workdir / "incoming"))
    assert rep.loaded_files == [] and rep.error_files == []
    assert rep.rows_loaded == 6
    st = {os.path.basename(r.file_name): r.status for r in ld.read_manifest().collect()}
    assert set(st.values()) == {ST_DONE}


def test_load_batch_deleted_pending_file_recovers(spark, workdir, tmp_path):
    """A pending file deleted before the load must NOT wedge load_batch
    with PATH_NOT_FOUND forever: it stays out of the read (fresh listing
    filter), the status merge marks it Error, and subsequent runs proceed
    normally."""
    ld = ManifestLoader(
        spark, str(tmp_path / "md.parquet"), file_format="csv",
        read_options={"header": "true"},
    )
    # reconcile only: f0..f2 become 'waiting for insertion'
    ld.reconcile(ld.lister(str(workdir / "incoming"), "*"))
    (workdir / "incoming" / "f1.csv").unlink()
    df, rep = ld.load_batch(str(workdir / "incoming"))
    assert rep.rows_loaded == 4  # f0 + f2
    assert [os.path.basename(f) for f, _ in rep.error_files] == ["f1.csv"]
    st = {os.path.basename(r.file_name): r.status for r in ld.read_manifest().collect()}
    assert st["f0.csv"] == ST_DONE and st["f2.csv"] == ST_DONE
    assert st["f1.csv"].startswith("Error: ")
    # and the loader is NOT wedged: the next run is a clean no-op
    df2, rep2 = ld.load_batch(str(workdir / "incoming"))
    assert rep2.error_files == [] and rep2.rows_loaded == 0


def test_load_batch_max_files_bounds_the_batch(spark, workdir, tmp_path):
    """max_files caps the per-run driver-side path list; leftover files
    stay waiting and load on the next run (incremental batching)."""
    ld = ManifestLoader(
        spark, str(tmp_path / "mm.parquet"), file_format="csv",
        read_options={"header": "true"},
    )
    df, rep = ld.load_batch(str(workdir / "incoming"), max_files=2)
    assert len(rep.loaded_files) == 2 and rep.rows_loaded == 4
    df2, rep2 = ld.load_batch(str(workdir / "incoming"))
    assert len(rep2.loaded_files) == 1 and rep2.rows_loaded == 2
    st = {os.path.basename(r.file_name): r.status for r in ld.read_manifest().collect()}
    assert set(st.values()) == {ST_DONE}


# --- cloud listers (injected fake SDK clients) ------------------------------


class FakeS3Client:
    """boto3-shaped: 2 pages via ContinuationToken, a directory marker key."""

    def __init__(self):
        self.pages = [
            {
                "Contents": [
                    {"Key": "in/", "LastModified": 1000.0, "Size": 0},
                    {"Key": "in/a.csv", "LastModified": 1000.0, "Size": 10},
                    {"Key": "in/b.csv", "LastModified": 1001.0, "Size": 11},
                ],
                "NextContinuationToken": "t1",
            },
            {
                "Contents": [
                    {"Key": "in/c.parquet", "LastModified": 1002.0, "Size": 12},
                    {"Key": "other/d.csv", "LastModified": 1003.0, "Size": 13},
                ]
            },
        ]
        self.calls = []

    def list_objects_v2(self, **kwargs):
        self.calls.append(kwargs)
        return self.pages[1] if kwargs.get("ContinuationToken") == "t1" else self.pages[0]


class FakeBlob:
    def __init__(self, name, last_modified, size):
        self.name, self.last_modified, self.size = name, last_modified, size


class FakeAzureContainerClient:
    def __init__(self, blobs):
        self.blobs = blobs
        self.prefixes = []

    def list_blobs(self, name_starts_with=""):
        self.prefixes.append(name_starts_with)
        return [b for b in self.blobs if b.name.startswith(name_starts_with)]


def test_s3_lister_pagination_filter_markers():
    from database_migration_spark.sources.cloud_listing import S3Lister

    client = FakeS3Client()
    lister = S3Lister(client, "bkt")
    rows = lister("in/", "*.csv")
    # both pages walked (s3_to_exasol.sql:44-50 ContinuationToken loop)
    assert len(client.calls) == 2 and client.calls[1]["ContinuationToken"] == "t1"
    # literal folder pushed down as server-side Prefix
    assert client.calls[0]["Prefix"] == "in/"
    # marker key skipped, folder+filter fnmatch applied, s3a URIs emitted
    assert [r["file_name"] for r in rows] == [
        "s3a://bkt/in/a.csv",
        "s3a://bkt/in/b.csv",
    ]
    assert rows[0]["last_modified"] == 1000.0 and rows[1]["size"] == 11


def test_azure_lister_prefix_and_filter():
    from database_migration_spark.sources.cloud_listing import AzureBlobLister

    client = FakeAzureContainerClient(
        [
            FakeBlob("2024/x1.csv", 2000.0, 5),
            FakeBlob("2024/x2.csv", 2001.0, 6),
            FakeBlob("2024/y.json", 2002.0, 7),
            FakeBlob("2023/z.csv", 2003.0, 8),
        ]
    )
    lister = AzureBlobLister(client, "cont", account="acct")
    rows = lister("2024/", "*2.csv")  # the reference's own example filter
    assert client.prefixes == ["2024/"]
    assert [r["file_name"] for r in rows] == ["wasbs://cont@acct/2024/x2.csv"]


def test_cloud_listing_drives_manifest_state_machine(spark, tmp_path):
    """FILE_LAST_MODIFIED re-import semantics (s3:238-244) over a fake S3:
    new files wait for insertion; a re-uploaded (advanced LastModified) file
    flips to waiting for update; unchanged done files stay done."""
    from database_migration_spark.sources.cloud_listing import S3Lister

    client = FakeS3Client()
    lister = S3Lister(client, "bkt")
    ld = ManifestLoader(
        spark, str(tmp_path / "m.parquet"), lister=lister
    )
    ld.reconcile(lister("in/", "*.csv"))
    assert ld.pending() == ["s3a://bkt/in/a.csv", "s3a://bkt/in/b.csv"]
    ld._update_status(ld.pending(), [])
    assert ld.pending() == []
    # re-upload a.csv (LastModified advances) → waiting for update
    client.pages[0]["Contents"][1]["LastModified"] = 5000.0
    ld.reconcile(lister("in/", "*.csv"))
    statuses = {r.file_name: r.status for r in ld.read_manifest().collect()}
    assert statuses["s3a://bkt/in/a.csv"] == ST_WAIT_UPDATE
    assert statuses["s3a://bkt/in/b.csv"] == ST_DONE


def test_s3_empty_filter_lists_everything_without_prefix():
    """Reference semantics (s3:53-55): empty filter_string = no filtering at
    all, folder ignored — the Prefix pushdown must not change that."""
    from database_migration_spark.sources.cloud_listing import S3Lister

    client = FakeS3Client()
    rows = S3Lister(client, "bkt")("in/", "")
    assert "Prefix" not in client.calls[0]
    assert len(rows) == 4  # every non-marker key, folder ignored


def test_load_batch_failed_sink_leaves_files_waiting(spark, workdir, tmp_path):
    """The destination write (sink) runs BEFORE the manifest flips files
    to done: a failed write must leave them waiting/retryable, never
    recorded as loaded (the per-file path's durability guarantee)."""
    import pytest

    ld = ManifestLoader(
        spark, str(tmp_path / "ms.parquet"), file_format="csv",
        read_options={"header": "true"},
    )

    def bad_sink(df):
        raise RuntimeError("destination full")

    with pytest.raises(RuntimeError, match="destination full"):
        ld.load_batch(str(workdir / "incoming"), sink=bad_sink)
    st = {os.path.basename(r.file_name): r.status
          for r in ld.read_manifest().collect()}
    assert all(s.startswith("waiting") for s in st.values()), st

    # a working sink then loads them and marks done
    out = []
    df, rep = ld.load_batch(str(workdir / "incoming"),
                            sink=lambda d: out.append(d.count()))
    assert rep.rows_loaded == 6 and out
    st = {os.path.basename(r.file_name): r.status
          for r in ld.read_manifest().collect()}
    assert st["f0.csv"] == ST_DONE
