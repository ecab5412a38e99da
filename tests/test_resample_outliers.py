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
        flag_outliers(df, "v", method="tukey")


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


# ---- review-fix regressions ----------------------------------------------


def test_flag_outliers_null_group_gets_own_fence(spark):
    df = spark.createDataFrame(
        [(None, float(v)) for v in [1, 2, 3, 4, 100]] + [("a", 5.0)],
        "g string, v double",
    )
    out = {(r["g"], r["v"]): r["is_outlier"]
           for r in flag_outliers(df, "v", "g").collect()}
    assert out[(None, 100.0)] is True  # NULL group flagged against itself
    assert out[(None, 2.0)] is False


def test_resample_null_ts_excluded_both_modes(spark):
    df = spark.createDataFrame(
        [("u", _ts(0), 1.0), ("u", None, 99.0)], "e string, ts timestamp, v double"
    )
    filled = resample_events(df, "e", "ts", "v", 10).collect()
    bare = resample_events(df, "e", "ts", "v", 10, fill_gaps=False).collect()
    assert len(filled) == len(bare) == 1
    assert filled[0]["bucket_sum"] == bare[0]["bucket_sum"] == 1.0


def test_group_quantiles_counts_cast_population(spark):
    # n_values counts the CAST population (under ANSI an un-castable value
    # fails loudly rather than desyncing count from quantiles; numeric
    # strings + NULLs exercise the shared cast path)
    df = spark.createDataFrame(
        [("a", "1"), ("a", "3"), ("a", None)], "g string, v string"
    )
    from datachain_spark.ops.sketches import group_quantiles

    r = group_quantiles(df, "g", "v", [0.5]).collect()[0]
    assert r["n_values"] == 2 and r["value"] == 2.0


def test_to_text_dir_rejects_null_and_newline(session, tmp_path):
    import datachain_spark as dcs

    ch = dcs.read_values(t=["ok", None], session=session)
    with pytest.raises(Exception, match="NULL or embedded newline"):
        ch.to_text_dir(str(tmp_path / "a"), column="t")
    ch2 = dcs.read_values(t=["one\ntwo"], session=session)
    with pytest.raises(Exception, match="NULL or embedded newline"):
        ch2.to_text_dir(str(tmp_path / "b"), column="t")


def test_salted_join_nested_map_and_salt_collision(spark):
    from datachain_spark.ops.asof import salted_join

    fact = spark.createDataFrame(
        [(1, [{"a": "b"}]), (2, [{"c": "d"}])], "k int, attrs array<map<string,string>>"
    )
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k int, name string")
    got = salted_join(fact, dim, "k", salt=4).select("k", "name").collect()
    assert sorted((r["k"], r["name"]) for r in got) == [(1, "x"), (2, "y")]
    bad = fact.withColumnRenamed("attrs", "__salt")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(bad, dim, "k")


def test_sniff_unknown_riff_gets_default(spark):
    from datachain_spark.ops.multimodal import sniff_mime

    df = spark.createDataFrame(
        [(b"RIFF\x24\x00\x00\x00CDDAfmt",)], "content binary"
    )
    assert sniff_mime(df).collect()[0]["mime"] == "application/octet-stream"


def test_script_profile_empty_list_raises(spark):
    from datachain_spark.ops.text import script_profile

    df = spark.createDataFrame([(1, "x")], "id int, text string")
    with pytest.raises(ValueError, match="non-empty"):
        script_profile(df, "id", scripts=[])


def test_extract_links_unquoted_href(spark):
    from datachain_spark.ops.html import extract_links

    df = spark.createDataFrame(
        [(1, '<a href=http://x.com/1>t</a> <a href="http://y.com/2">u</a>')],
        "id int, html string",
    )
    urls = [r["url"] for r in extract_links(df, "id").collect()]
    assert urls == ["http://x.com/1", "http://y.com/2"]


def test_flag_outliers_mad(spark):
    # MAD fences ignore the outlier itself (median-based), unlike zscore
    from pyspark.sql import functions as F

    from datachain_spark.ops.sketches import flag_outliers

    vals = [10.0, 11.0, 12.0, 11.5, 10.5, 1000.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    out = {r["x"]: r["is_outlier"] for r in flag_outliers(
        df, "x", k=3, method="mad").collect()}
    assert out[1000.0] is True
    assert all(not out[v] for v in vals[:-1])

    import pytest
    with pytest.raises(ValueError, match="method"):
        flag_outliers(df, "x", method="median")
