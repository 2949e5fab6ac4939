import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM light
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")


@pytest.fixture(scope="session")
def spark():
    from database_migration_spark import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_t2():
    return SF_T2


DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def make_derby_db(spark, db_path: str, statements: list[str]) -> str:
    """Create + populate an embedded Derby DB driver-side (py4j JDBC) and
    return its jdbc: URL. Shared by every live-JDBC test so the driver
    class / connection-string conventions live in one place."""
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(
        f"jdbc:derby:{db_path};create=true"
    )
    st = conn.createStatement()
    for sql in statements:
        st.execute(sql)
    st.close()
    conn.close()
    return f"jdbc:derby:{db_path}"
