"""ops/ids.assign_row_ids (distributed global numbering) and
ops/sketches.skew_report/skew_summary (join-key skew diagnosis)."""

import pytest
from pyspark.sql import functions as F

from datachain_spark.ops.ids import assign_row_ids
from datachain_spark.ops.sketches import skew_report, skew_summary


def test_row_ids_match_total_order(spark):
    df = spark.createDataFrame(
        [(k, v) for k, v in zip(range(100), [x * 37 % 100 for x in range(100)])],
        "k int, v int",
    )
    out = assign_row_ids(df, ["v", "k"], num_ranges=7).collect()
    expected = sorted(((r["v"], r["k"]) for r in out))
    got = {(r["v"], r["k"]): r["row_id"] for r in out}
    assert [got[p] for p in expected] == list(range(1, 101))


def test_row_ids_start_and_single_range(spark):
    df = spark.createDataFrame([(3,), (1,), (2,)], "k int")
    out = {r["k"]: r["row_id"] for r in assign_row_ids(df, "k", start=100, num_ranges=1).collect()}
    assert out == {1: 100, 2: 101, 3: 102}


def test_row_ids_more_ranges_than_rows(spark):
    df = spark.createDataFrame([(2,), (1,)], "k int")
    out = {r["k"]: r["row_id"] for r in assign_row_ids(df, "k", num_ranges=16).collect()}
    assert out == {1: 1, 2: 2}


def test_row_ids_empty_and_bad_args(spark):
    empty = spark.createDataFrame([], "k int")
    assert assign_row_ids(empty, "k").count() == 0
    with pytest.raises(ValueError, match="order_by"):
        assign_row_ids(empty, [])


def test_row_ids_no_single_partition_window(spark):
    df = spark.range(1000).withColumn("v", F.col("id") % 13)
    out = assign_row_ids(df, ["v", "id"], num_ranges=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, "global numbering collapsed to one partition"
    assert "rangepartitioning" in plan


def test_skew_report_values(spark):
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    rep = {r["k"]: r for r in skew_report(df, "k").collect()}
    assert rep["a"]["key_rows"] == 6 and rep["a"]["share"] == 0.6
    # mean key size = 10/3; a's ratio = 6 / (10/3) = 1.8
    assert rep["a"]["skew_ratio"] == pytest.approx(1.8)
    top1 = skew_report(df, "k", top_n=1).collect()
    assert len(top1) == 1 and top1[0]["k"] == "a"


def test_skew_summary_one_row(spark):
    rows = [("a", 1)] * 8 + [("b", 1)] * 2
    df = spark.createDataFrame(rows, "k string, v int")
    s = skew_summary(df, "k").collect()[0]
    assert s["n_rows"] == 10 and s["n_keys"] == 2
    assert s["max_key_rows"] == 8 and s["avg_key_rows"] == 5.0
    assert s["max_skew_ratio"] == pytest.approx(1.6)


def test_skew_report_multi_key_and_validation(spark):
    df = spark.createDataFrame([("a", 1), ("a", 1), ("a", 2)], "k string, g int")
    rep = skew_report(df, ["k", "g"]).collect()
    assert rep[0]["k"] == "a" and rep[0]["g"] == 1 and rep[0]["key_rows"] == 2
    with pytest.raises(ValueError, match="top_n"):
        skew_report(df, "k", top_n=0)


def test_lsh_tune_calibration():
    from datachain_spark.ops.dedup import lsh_detection_probability, lsh_tune

    t = lsh_tune(0.7, 128)
    assert t["bands"] * t["rows_per_band"] == 128
    assert abs(t["midpoint"] - 0.7) < 0.05
    # S-curve: well above the midpoint detection is near-certain, well
    # below it is unlikely
    hi = lsh_detection_probability(0.9, 128, t["bands"])
    lo = lsh_detection_probability(0.3, 128, t["bands"])
    assert hi > 0.99 and lo < 0.05
    import pytest as _pytest
    with _pytest.raises(ValueError):
        lsh_tune(1.5)
    with _pytest.raises(ValueError):
        lsh_detection_probability(0.5, 10, 3)
    # domain guards: ValueError (never ZeroDivisionError) on bad inputs
    with _pytest.raises(ValueError):
        lsh_detection_probability(0.5, 128, 0)
    with _pytest.raises(ValueError):
        lsh_detection_probability(1.5, 128, 16)
    with _pytest.raises(ValueError):
        lsh_detection_probability(0.5, 128, -4)


def test_row_ids_cache_handle_and_uncached_path(spark):
    # ADVICE r05: the persisted ranked frame used to stay pinned for the
    # session; the handle lets callers release it, cache=False skips it.
    df = spark.createDataFrame([(i,) for i in range(100)], "k int")
    out = assign_row_ids(df, "k")
    assert out.count() == 100
    assert hasattr(out, "row_ids_cache")
    assert out.row_ids_cache.is_cached
    out.row_ids_cache.unpersist()
    assert not out.row_ids_cache.is_cached

    out2 = assign_row_ids(df, "k", cache=False)
    rows = {r["k"]: r["row_id"] for r in out2.collect()}
    assert rows == {i: i + 1 for i in range(100)}
    assert not hasattr(out2, "row_ids_cache")
