"""plans.lint_plan — static detection of the plan shapes that melt at
100 TB (cartesian joins, single-partition windows, row Python UDFs)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from datachain_spark.plans import lint_plan


def _rules(findings):
    return {f["rule"] for f in findings}


def test_cartesian_product_flagged(spark):
    a = spark.range(10).select(F.col("id").alias("x"))
    b = spark.range(10).select(F.col("id").alias("y"))
    # force a shuffled cartesian (broadcast would report nested-loop)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = a.crossJoin(b)
        rules = _rules(lint_plan(out))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "cartesian-product" in rules or "broadcast-nested-loop" in rules
    sev = {f["rule"]: f["severity"] for f in lint_plan(out)}
    assert "error" in sev.values() or "warning" in sev.values()


def test_single_partition_window_flagged(spark):
    df = spark.range(100)
    bad = df.withColumn("rn", F.row_number().over(Window.orderBy("id")))
    findings = lint_plan(bad)
    assert "single-partition-window" in _rules(findings)
    good = df.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy(F.col("id") % 4).orderBy("id")),
    )
    assert "single-partition-window" not in _rules(lint_plan(good))


def test_row_python_udf_flagged_arrow_not(spark):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf, udf

    df = spark.range(10)
    slow = df.withColumn("y", udf(lambda x: x + 1, "long")(F.col("id")))
    assert "row-python-udf" in _rules(lint_plan(slow))

    from datachain_spark.ops._arrow import make_query_cosine_dist_udf  # noqa: F401

    @pandas_udf("long")
    def fast(s: pd.Series) -> pd.Series:
        return s + 1

    ok = df.withColumn("y", fast(F.col("id")))
    assert "row-python-udf" not in _rules(lint_plan(ok))


def test_clean_plan_has_no_errors(spark, sf_dir):
    import __spark_entry__ as e

    df = e.queries()["q1_pricing_summary"](spark, sf_dir)
    errors = [f for f in lint_plan(df) if f["severity"] == "error"]
    assert errors == [], errors


def test_fluent_lint(session):
    import datachain_spark as dc

    ch = dc.read_parquet("/root/testdata/sf0.001/region.parquet")
    findings = ch.lint()
    assert isinstance(findings, list)
    assert all({"rule", "severity", "message"} <= set(f) for f in findings)


def test_partitioned_unordered_window_not_flagged(spark):
    # min().over(partitionBy(k)) with no ORDER prints two bracket groups
    # too — must NOT be mistaken for an unpartitioned window (the
    # cohort_retention shape; was a false positive in the first linter)
    df = spark.range(100).withColumn("k", F.col("id") % 4)
    ok = df.withColumn("m", F.min("id").over(Window.partitionBy("k")))
    assert "single-partition-window" not in _rules(lint_plan(ok))


def test_df_named_column_does_not_break_lint(spark):
    # a DataFrame carrying a COLUMN named "df" (tf-idf outputs one) used
    # to shadow the duck-typed .df access and crash every plan helper
    df = spark.range(5).select(F.col("id"), F.lit(2).alias("df"))
    assert isinstance(lint_plan(df), list)
    from datachain_spark.plans import shuffle_count
    assert shuffle_count(df) == 0


def test_driver_window_queries_lint_clean(spark, sf_dir):
    # every query in the 50-slot driver window must build a plan with
    # ZERO lint errors (the full-registry audit re-runs per round via
    # scripts/plan_lint_audit.py -> LINT.json — r10: 237/237 clean; this
    # guards the window per-commit without the full cost)
    import __spark_entry__ as e

    q = e.queries()
    bad = {}
    for name in list(q)[:50]:
        errs = [f for f in lint_plan(q[name](spark, sf_dir))
                if f["severity"] == "error"]
        if errs:
            bad[name] = errs
    assert bad == {}, bad
