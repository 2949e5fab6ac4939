"""Native-connector seam (sources/base.py TRANSFER_MODES): the reference
always prefers the source's native parallel interface over generic JDBC when
one is available ("Prefer EXA: IMPORT FROM EXA is always parallelized",
exasol_to_exasol.sql:36-39, README.md:294-298). These tests prove the
dispatch seam with a stand-in "native" mode — a direct parquet read playing
the role of a DataSource-V2 vendor connector — so that when a real connector
package is installed, overriding TRANSFER_MODES + _probe_/_read_ is the
entire integration surface.
"""

import pytest
from pyspark.sql import functions as F

from database_migration_spark.catalog import ColumnMeta, TableMeta
from database_migration_spark.sources.dialects import DialectSpec
from database_migration_spark.sources.jdbc import JdbcSourceAdapter

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
DERBY = DialectSpec(name="derby", catalog_sql="-- unused")


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db = str(tmp_path_factory.mktemp("derby_native") / "db")
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(f"jdbc:derby:{db};create=true")
    st = conn.createStatement()
    st.execute("CREATE TABLE APP.T (ID BIGINT NOT NULL, V VARCHAR(10))")
    st.execute("INSERT INTO APP.T VALUES " + ", ".join(f"({i}, 'j{i}')" for i in range(20)))
    st.close()
    conn.close()
    return f"jdbc:derby:{db}"


@pytest.fixture(scope="module")
def t_meta() -> TableMeta:
    return TableMeta(
        schema="APP",
        table="T",
        columns=(
            ColumnMeta("APP", "T", "ID", 1, "bigint", nullable=False),
            ColumnMeta("APP", "T", "V", 2, "varchar(10)"),
        ),
    )


@pytest.fixture(scope="module")
def native_snapshot(spark, tmp_path_factory):
    """The 'native connector' side: same table shape, distinguishable values
    (v prefixed n, not j) so the test can tell which path served the read."""
    p = str(tmp_path_factory.mktemp("native") / "t.parquet")
    spark.range(20).select(
        F.col("id").alias("ID"), F.concat(F.lit("n"), F.col("id")).alias("V")
    ).write.parquet(p)
    return p


class NativeCapableAdapter(JdbcSourceAdapter):
    """Derby adapter with a stand-in native parallel connector."""

    TRANSFER_MODES = ("native", "jdbc")

    def __init__(self, *a, native_path=None, native_up=True, probe_raises=False, **kw):
        super().__init__(*a, **kw)
        self._native_path = native_path
        self._native_up = native_up
        self._probe_raises = probe_raises

    def _probe_native(self):
        if self._probe_raises:
            raise RuntimeError("connector import exploded")
        return self._native_up and self._native_path is not None

    def _read_native(self, table, plan=None):
        return self.spark.read.parquet(self._native_path)


def _adapter(spark, derby_url, **kw) -> NativeCapableAdapter:
    return NativeCapableAdapter(
        spark, DERBY, url=derby_url, properties={"driver": DERBY_DRIVER}, **kw
    )


def test_prefers_native_when_available(spark, derby_url, t_meta, native_snapshot):
    ad = _adapter(spark, derby_url, native_path=native_snapshot)
    assert ad.transfer_mode() == "native"
    df = ad.read_table(t_meta)
    vals = {r.V for r in df.collect()}
    assert all(v.startswith("n") for v in vals) and len(vals) == 20


def test_falls_back_to_jdbc_when_probe_false(spark, derby_url, t_meta, native_snapshot):
    ad = _adapter(spark, derby_url, native_path=native_snapshot, native_up=False)
    assert ad.transfer_mode() == "jdbc"
    df = ad.read_table(t_meta)
    vals = {r.V for r in df.collect()}
    assert all(v.startswith("j") for v in vals) and len(vals) == 20


def test_broken_probe_degrades_not_fails(spark, derby_url, t_meta, native_snapshot):
    ad = _adapter(spark, derby_url, native_path=native_snapshot, probe_raises=True)
    assert ad.transfer_mode() == "jdbc"
    assert ad.read_table(t_meta).count() == 20


def test_declared_but_unimplemented_mode_skipped(spark, derby_url, t_meta):
    class DeclaredOnly(JdbcSourceAdapter):
        TRANSFER_MODES = ("native", "jdbc")  # no _probe_/_read_ pair

    ad = DeclaredOnly(spark, DERBY, url=derby_url, properties={"driver": DERBY_DRIVER})
    assert ad.transfer_mode() == "jdbc"
    assert ad.read_table(t_meta).count() == 20


def test_base_adapters_unchanged(spark, derby_url):
    ad = JdbcSourceAdapter(spark, DERBY, url=derby_url, properties={"driver": DERBY_DRIVER})
    assert ad.TRANSFER_MODES == ("jdbc",)
    assert ad.transfer_mode() == "jdbc"


def test_builtin_file_mode_requires_reader(spark, derby_url, t_meta):
    """A declared built-in 'file' mode without _read_file must not win the
    dispatch (read_table would AttributeError); jdbc serves the read."""

    class FileDeclared(JdbcSourceAdapter):
        TRANSFER_MODES = ("file", "jdbc")  # no _read_file defined

    ad = FileDeclared(spark, DERBY, url=derby_url, properties={"driver": DERBY_DRIVER})
    assert ad.transfer_mode() == "jdbc"
    assert ad.read_table(t_meta).count() == 20


def test_no_available_mode_fails_loudly(spark, derby_url):
    """An adapter declaring ONLY a broken native mode (no jdbc fallback)
    must raise a clear error from transfer_mode, not AttributeError later."""

    class NativeOnly(JdbcSourceAdapter):
        TRANSFER_MODES = ("native",)

        def _probe_native(self):
            raise RuntimeError("boom")

        def _read_native(self, table, plan=None):  # pragma: no cover
            raise AssertionError("must not be reached")

    ad = NativeOnly(spark, DERBY, url=derby_url, properties={"driver": DERBY_DRIVER})
    with pytest.raises(RuntimeError, match="no transfer mode available"):
        ad.transfer_mode()
