"""ops/timeseries.resample_events, ops/sketches.flag_outliers, and the
chain unpivot/fillna/dropna conveniences."""

import datetime

import pytest
from pyspark.sql import functions as F

import datachain_spark as dcs
from datachain_spark.ops.sketches import flag_outliers
from datachain_spark.ops.timeseries import resample_events


def _ts(s):
    return datetime.datetime(2024, 1, 1, 0, 0, s, tzinfo=datetime.timezone.utc)


def test_resample_gap_fill(spark):
    df = spark.createDataFrame(
        [("u", _ts(0), 1.0), ("u", _ts(5), 2.0), ("u", _ts(35), 4.0)],
        "e string, ts timestamp, v double",
    )
    out = {r["bucket"]: r for r in
           resample_events(df, "e", "ts", "v", 10).collect()}
    # events at 0,5 -> bucket 1704067200; 35 -> +30; buckets 10,20 empty
    base = int(_ts(0).timestamp())
    assert sorted(out) == [base, base + 10, base + 20, base + 30]
    assert out[base]["bucket_count"] == 2 and out[base]["bucket_sum"] == 3.0
    assert out[base + 10]["bucket_count"] == 0
    assert out[base + 10]["bucket_sum"] is None
    assert out[base + 30]["bucket_max"] == 4.0


def test_resample_no_fill_and_guards(spark):
    df = spark.createDataFrame(
        [("u", _ts(0), 1.0), ("u", _ts(35), 4.0)], "e string, ts timestamp, v double"
    )
    out = resample_events(df, "e", "ts", "v", 10, fill_gaps=False).collect()
    assert len(out) == 2
    with pytest.raises(ValueError, match="positive"):
        resample_events(df, "e", "ts", "v", 0)
    with pytest.raises(ValueError, match="unsupported"):
        resample_events(df, "e", "ts", "v", 10, metrics=["median"])


def test_flag_outliers_iqr(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in [1, 2, 3, 4, 100]] + [("b", 5.0), ("a", None)],
        "g string, v double",
    )
    out = {(r["g"], r["v"]): r for r in flag_outliers(df, "v", "g").collect()}
    assert out[("a", 100.0)]["is_outlier"] is True
    assert out[("a", 2.0)]["is_outlier"] is False
    assert out[("a", None)]["is_outlier"] is None
    assert out[("b", 5.0)]["is_outlier"] is False  # degenerate fence lo==hi
    # fences exposed for clamping
    assert out[("a", 100.0)]["fence_hi"] < 100.0


def test_flag_outliers_zscore_and_global(spark):
    df = spark.createDataFrame([(float(v),) for v in [1, 1, 1, 1, 50]], "v double")
    out = flag_outliers(df, "v", method="zscore", k=1.5)
    flags = {r["v"]: r["is_outlier"] for r in out.collect()}
    assert flags[50.0] is True and flags[1.0] is False
    with pytest.raises(ValueError, match="method"):
        flag_outliers(df, "v", method="mad")


def test_unpivot_fillna_dropna(session):
    ch = dcs.read_values(
        k=[1, 2], a=[1.0, None], b=[3.0, 4.0], session=session
    )
    long = ch.unpivot("k", ["a", "b"]).order_by("k", "variable")
    rows = [(r["k"], r["variable"], r["value"]) for r in long.to_records()]
    assert rows == [(1, "a", 1.0), (1, "b", 3.0), (2, "a", None), (2, "b", 4.0)]
    assert ch.melt is not None  # alias exists
    filled = ch.fillna(0.0).to_records()
    assert all(r["a"] is not None for r in filled)
    dropped = ch.dropna(subset=["a"]).to_records()
    assert len(dropped) == 1 and dropped[0]["k"] == 1


def test_new_registry_oracles(session):
    import __spark_entry__ as e
    from tests.oracle_harness import compare

    q, o = e.queries(), e.oracle_sql()
    for name in ["resample_events_grid", "flag_outliers_docs"]:
        ok, detail = compare(
            q[name](session.spark, "/root/testdata/sf0.001"),
            o[name],
            "/root/testdata/sf0.001",
        )
        assert ok, (name, detail)
