"""resample: grids, zero/forward fills, span caps — vs a Python reference."""

import pytest
from pyspark.sql import functions as F

from database_migration_spark.operators.resample import resample


def _py_reference(rows, step):
    """One key's expected grid from plain Python."""
    from collections import defaultdict

    bins = defaultdict(list)
    for t, v in rows:
        bins[t // step].append(v)
    lo, hi = min(bins), max(bins)
    out = {}
    last_sum = None
    for b in range(lo, hi + 1):
        vs = bins.get(b)
        if vs:
            last_sum = sum(vs)
        out[b * step] = (len(vs) if vs else 0, last_sum)
    return out


def test_matches_python_reference_per_key(spark):
    rows_a = [(3, 10), (5, 11), (27, 12), (29, 13)]   # gap bins inside
    rows_b = [(100, 7)]                                # single observation
    df = spark.createDataFrame(
        [("a", t, v) for t, v in rows_a] + [("b", t, v) for t, v in rows_b],
        "k STRING, t LONG, v LONG",
    )
    got = resample(
        df, ["k"], "t", step=10,
        aggs={"n": F.count(F.lit(1)), "sum_v": F.sum("v")},
        zero_fill=["n"], ffill=["sum_v"],
    )
    by_key = {}
    for r in got.collect():
        by_key.setdefault(r["k"], {})[r["bin_start"]] = (r["n"], r["sum_v"])
        assert r["bin_end"] == r["bin_start"] + 9
    assert by_key["a"] == _py_reference(rows_a, 10)
    assert by_key["b"] == _py_reference(rows_b, 10)
    # the gap, concretely: bin 1 (t 10..19) exists for a, zero events,
    # sum carried forward from bin 0
    assert by_key["a"][10] == (0, 21)


def test_unfilled_columns_stay_null_and_negative_ts_floor(spark):
    df = spark.createDataFrame(
        [("x", -15, 5), ("x", 4, 6)], "k STRING, t LONG, v LONG"
    )
    got = {
        r["bin_start"]: (r["n"], r["mx"])
        for r in resample(
            df, ["k"], "t", step=10,
            aggs={"n": F.count(F.lit(1)), "mx": F.max("v")},
            zero_fill=["n"],
        ).collect()
    }
    # floor semantics: -15 -> bin -2 ([-20, -11]), grid spans -2..0
    assert set(got) == {-20, -10, 0}
    assert got[-20] == (1, 5) and got[0] == (1, 6)
    assert got[-10] == (0, None)  # un-ffilled agg stays NULL on gap bins


def test_max_bins_per_key_drops_eon_spanning_keys(spark):
    df = spark.createDataFrame(
        [("ok", 0, 1), ("ok", 50, 1), ("eon", 0, 1), ("eon", 10_000, 1)],
        "k STRING, t LONG, v LONG",
    )
    got = resample(
        df, ["k"], "t", step=10, aggs={"n": F.count(F.lit(1))},
        max_bins_per_key=100,
    )
    assert {r["k"] for r in got.collect()} == {"ok"}


def test_rejects_bad_args(spark):
    df = spark.createDataFrame([("a", 1, 1)], "k STRING, t LONG, v LONG")
    with pytest.raises(ValueError):
        resample(df, ["k"], "t", 0, {"n": F.count(F.lit(1))})
    with pytest.raises(ValueError):
        resample(df, ["k"], "t", 10, {"bin_start": F.count(F.lit(1))})
    with pytest.raises(ValueError):
        resample(df, ["k"], "t", 10, {"n": F.count(F.lit(1))}, ffill=["nope"])


def test_reserved_key_name_raises(spark):
    df = spark.createDataFrame([(1, 2, 3)], "bin LONG, t LONG, v LONG")
    with pytest.raises(ValueError):
        resample(df, ["bin"], "t", 10, {"n": F.count(F.lit(1))})


def test_flag_anomalies_integer_exact_thresholds(spark):
    from database_migration_spark.operators.resample import flag_anomalies

    # key x: flat 2s then a 7 spike; key y: rising ramp never 3x its trail
    rows = [("x", i, 2) for i in range(8)] + [("x", 8, 7), ("x", 9, 2)]
    rows += [("y", i, i + 1) for i in range(10)]
    df = spark.createDataFrame(rows, "k STRING, bin LONG, n LONG")
    got = {(r["k"], r["bin"]): r.asDict()
           for r in flag_anomalies(df, ["k"], "bin", "n").collect()}

    assert got[("x", 8)]["is_anomaly"] is True          # 7 > 3 x mean(2)
    assert got[("x", 8)]["baseline_sum"] == 16
    assert got[("x", 9)]["is_anomaly"] is False         # back to normal
    # first bins: no full window -> never flagged, even a big first value
    assert all(not got[("x", b)]["is_anomaly"] for b in range(8))
    assert all(not v["is_anomaly"] for (k, _), v in got.items() if k == "y")

    # exact boundary: value*1000*n == factor*sum must NOT flag (strict >)
    edge = spark.createDataFrame(
        [("e", i, 1) for i in range(8)] + [("e", 8, 3)], "k STRING, bin LONG, n LONG"
    )
    e = {r["bin"]: r["is_anomaly"]
         for r in flag_anomalies(edge, ["k"], "bin", "n").collect()}
    assert e[8] is False  # 3 == 3x mean(1) exactly -> not a spike

    import pytest
    with pytest.raises(ValueError):
        flag_anomalies(df, ["k"], "bin", "n", trailing=0)
