"""ops/expectations.impute and corr_matrix."""

import pytest

from datachain_spark.ops.expectations import corr_matrix, impute


def test_impute_group_mean(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", None), ("b", 10.0), ("b", None),
         (None, 7.0), (None, None)],
        "g string, v double",
    )
    vals = sorted((r["g"], r["v"]) for r in
                  impute(df, ["v"], group_cols="g").collect()
                  if r["g"] == "a")
    assert vals == [("a", 1.0), ("a", 2.0), ("a", 3.0)]
    # NULL group imputes from its own group's stat
    nullg = [r["v"] for r in impute(df, ["v"], group_cols="g").collect()
             if r["g"] is None]
    assert sorted(nullg) == [7.0, 7.0]
    flags = impute(df, ["v"], group_cols="g", flag_col="f")
    assert flags.filter("f").count() == 3


def test_impute_median_and_all_null_group(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 10.0), ("a", None),
         ("z", None), ("z", None)],
        "g string, v double",
    )
    med = [r["v"] for r in
           impute(df, ["v"], strategy="median", group_cols="g").collect()
           if r["g"] == "a"]
    assert sorted(med) == [1.0, 2.0, 2.0, 10.0]
    z = [r["v"] for r in
         impute(df, ["v"], strategy="median", group_cols="g").collect()
         if r["g"] == "z"]
    assert z == [None, None]  # all-NULL group stays NULL
    with pytest.raises(ValueError, match="strategy"):
        impute(df, ["v"], strategy="mode")
    with pytest.raises(ValueError, match="non-empty"):
        impute(df, [])


def test_impute_preserves_dtype_and_global(spark):
    df = spark.createDataFrame([(1,), (None,), (5,)], "v int")
    out = impute(df, ["v"])
    assert dict(out.dtypes)["v"] == "int"
    assert sorted(r["v"] for r in out.collect()) == [1, 3, 5]


def test_impute_never_touches_nonnull_values(spark):
    # a double round-trip would corrupt bigints above 2^53: 2^53 + 1 must
    # come back EXACTLY, even with a NULL sibling being imputed
    big = 9007199254740993  # 2^53 + 1
    df = spark.createDataFrame([(big,), (None,), (10,)], "v long")
    got = sorted(r["v"] for r in impute(df, ["v"]).collect()
                 if r["v"] != 10 and r["v"] is not None)
    assert big in got, got


def test_corr_matrix(spark):
    import random

    random.seed(7)
    rows = []
    for i in range(200):
        x = float(i)
        rows.append((x, 2 * x + 1, -x, random.random()))
    df = spark.createDataFrame(rows, "a double, b double, c double, d double")
    out = {(r["col_a"], r["col_b"]): r["corr"]
           for r in corr_matrix(df, ["a", "b", "c", "d"]).collect()}
    assert len(out) == 6
    assert out[("a", "b")] == pytest.approx(1.0)
    assert out[("a", "c")] == pytest.approx(-1.0)
    assert abs(out[("a", "d")]) < 0.2
    with pytest.raises(ValueError, match="at least 2"):
        corr_matrix(df, ["a"])


def test_corr_single_pass_plan(spark):
    df = spark.createDataFrame([(1.0, 2.0, 3.0)], "a double, b double, c double")
    plan = (corr_matrix(df, ["a", "b", "c"])
            ._jdf.queryExecution().executedPlan().toString())
    # all pairs in one aggregate: exactly one shuffle (partial->final agg)
    assert plan.count("Exchange") <= 1


def test_describe(spark):
    from datachain_spark.ops.profile import describe

    df = spark.createDataFrame(
        [(1.0, "x", 10), (2.0, "y", 20), (3.0, "z", None), (4.0, "w", 40)],
        "v double, s string, k int",
    )
    out = {r["column"]: r for r in describe(df).collect()}
    assert set(out) == {"v", "k"}  # string skipped by default
    assert out["v"]["count"] == 4 and out["v"]["mean"] == 2.5
    assert out["v"]["q50"] == 2.5 and out["v"]["min"] == 1.0
    assert out["k"]["count"] == 3 and out["k"]["max"] == 40.0
    with pytest.raises(ValueError, match="non-numeric"):
        describe(df, ["s"])
    with pytest.raises(ValueError, match="unknown"):
        describe(df, ["nope"])


def test_describe_oracle(session):
    import __spark_entry__ as e
    from tests.oracle_harness import compare

    q, o = e.queries(), e.oracle_sql()
    ok, detail = compare(
        q["describe_orders"](session.spark, "/root/testdata/sf0.001"),
        o["describe_orders"], "/root/testdata/sf0.001",
    )
    assert ok, detail
