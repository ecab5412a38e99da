"""ops/evaluation: confusion matrix, classification report, PR thresholds,
regression metrics."""

import pytest

from datachain_spark.ops.evaluation import (
    classification_report,
    confusion_matrix,
    pr_at_thresholds,
    regression_metrics,
)


def _preds(spark):
    # labels: 4 a, 3 b, 1 None; predictions with known confusion
    rows = [("a", "a"), ("a", "a"), ("a", "b"), ("a", "a"),
            ("b", "b"), ("b", "a"), ("b", "b"),
            (None, "a")]
    return spark.createDataFrame(rows, "y string, p string")


def test_confusion_and_report(spark):
    cm = {(r["label"], r["pred"]): r["n"]
          for r in confusion_matrix(_preds(spark), "y", "p").collect()}
    assert cm[("a", "a")] == 3 and cm[("a", "b")] == 1
    assert cm[(None, "a")] == 1
    rep = {r["class"]: r for r in
           classification_report(_preds(spark), "y", "p").collect()}
    a = rep["a"]
    assert (a["n_true"], a["n_pred"], a["tp"]) == (4, 5, 3)
    assert a["precision"] == pytest.approx(3 / 5)
    assert a["recall"] == pytest.approx(3 / 4)
    assert a["f1"] == pytest.approx(2 * (3 / 5) * (3 / 4) / (3 / 5 + 3 / 4))
    # NULL label class appears honestly: predicted-as but never true
    assert rep[None]["n_true"] == 1 and rep[None]["n_pred"] == 0
    assert rep[None]["recall"] == 0.0 and rep[None]["precision"] is None


def test_pr_at_thresholds(spark):
    rows = [(True, 0.9), (True, 0.7), (False, 0.8), (True, 0.3),
            (False, 0.1), (True, None)]
    df = spark.createDataFrame(rows, "y boolean, s double")
    out = {r["threshold"]: r for r in
           pr_at_thresholds(df, "y", "s", [0.0, 0.5, 0.95]).collect()}
    # t=0.5 keeps 0.9,0.7,0.8 -> tp 2, precision 2/3, recall 2/4
    assert out[0.5]["n_kept"] == 3 and out[0.5]["tp"] == 2
    assert out[0.5]["precision"] == pytest.approx(2 / 3)
    assert out[0.5]["recall"] == pytest.approx(0.5)  # 4 positives total
    # t=0 keeps all non-NULL scores
    assert out[0.0]["n_kept"] == 5
    # t=0.95 keeps none -> NULL precision, recall 0
    assert out[0.95]["n_kept"] == 0 and out[0.95]["precision"] is None
    assert out[0.95]["recall"] == 0.0
    with pytest.raises(ValueError, match="non-empty"):
        pr_at_thresholds(df, "y", "s", [])


def test_pr_single_aggregation_plan(spark):
    df = spark.createDataFrame([(True, 0.5)], "y boolean, s double")
    plan = (pr_at_thresholds(df, "y", "s", [0.1, 0.5, 0.9])
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") <= 1 and "Sort" not in plan


def test_regression_metrics(spark):
    rows = [(1.0, 1.5), (2.0, 2.0), (3.0, 2.5), (None, 9.0), (4.0, None)]
    df = spark.createDataFrame(rows, "y double, p double")
    r = regression_metrics(df, "y", "p").collect()[0]
    assert r["n"] == 3
    assert r["mae"] == pytest.approx(1.0 / 3)
    assert r["rmse"] == pytest.approx((0.5 / 3) ** 0.5)
    # sst = (1-2)^2+(2-2)^2+(3-2)^2 = 2 ; sse = 0.5 -> r2 = 0.75
    assert r["r2"] == pytest.approx(0.75)
    const = spark.createDataFrame([(1.0, 1.0), (1.0, 2.0)], "y double, p double")
    assert regression_metrics(const, "y", "p").collect()[0]["r2"] is None


def test_evaluation_registry_oracles(session):
    import __spark_entry__ as e
    from tests.oracle_harness import compare

    q, o = e.queries(), e.oracle_sql()
    for name in ["classification_report_docs", "pr_thresholds_docs",
                 "regression_metrics_orders"]:
        ok, detail = compare(
            q[name](session.spark, "/root/testdata/sf0.001"),
            o[name],
            "/root/testdata/sf0.001",
        )
        assert ok, (name, detail)


def test_chain_top_k(session):
    import datachain_spark as dcs

    ch = dcs.read_values(
        g=["a", "a", "a", "b", "b"], v=[3, 1, 2, 9, 8], session=session
    )
    top = ch.top_k("g", "v", 2, rank_col="rk").order_by("g", "rk").to_records()
    assert [(r["g"], r["v"], r["rk"]) for r in top] == [
        ("a", 3, 1), ("a", 2, 2), ("b", 9, 1), ("b", 8, 2)]
    bottom = ch.top_k("g", "v", 1, descending=False).to_records()
    assert sorted((r["g"], r["v"]) for r in bottom) == [("a", 1), ("b", 8)]
    with pytest.raises(ValueError, match="k must be"):
        ch.top_k("g", "v", 0)


# ---- review-fix regressions ----------------------------------------------


def test_report_null_class_merges(spark):
    df = spark.createDataFrame(
        [("a", "a"), (None, None), (None, "a")], "y string, p string"
    )
    rows = classification_report(df, "y", "p").collect()
    nulls = [r for r in rows if r["class"] is None]
    assert len(nulls) == 1  # ONE merged NULL-class row, not two
    r = nulls[0]
    assert (r["n_true"], r["n_pred"], r["tp"]) == (2, 1, 1)


def test_regression_overflow_fails_loudly(spark):
    df = spark.createDataFrame([(1e20, 0.0)], "y double, p double")
    with pytest.raises(Exception, match="Decimal|NUMERIC"):
        regression_metrics(df, "y", "p").collect()
    # large-but-in-range magnitudes still work (epoch millis as labels)
    ok = spark.createDataFrame([(1.7e12, 1.7e12)], "y double, p double")
    assert regression_metrics(ok, "y", "p").collect()[0]["mae"] == 0.0


def test_pr_empty_input_reports_zero(spark):
    df = spark.createDataFrame([], "y boolean, s double")
    r = pr_at_thresholds(df, "y", "s", [0.5]).collect()[0]
    assert r["n_kept"] == 0 and r["tp"] == 0
    assert r["precision"] is None and r["recall"] is None


def test_top_k_nulls_last_and_guards(session):
    import datachain_spark as dcs

    ch = dcs.read_values(g=["a", "a", "a"], v=[3, None, 1], session=session)
    bottom = ch.top_k("g", "v", 1, descending=False).to_records()
    assert [(r["g"], r["v"]) for r in bottom] == [("a", 1)]  # not the NULL
    with pytest.raises(ValueError, match="already exists"):
        ch.top_k("g", "v", 1, rank_col="v")
    with pytest.raises(ValueError, match="__rk"):
        ch.mutate(__rk=dcs.C("v")).top_k("g", "v", 1)


def test_flatten_structs_collision_raises(session):
    import datachain_spark as dcs

    df = session.spark.createDataFrame(
        [(1, (2,))], "a_b int, a struct<b: int>"
    )
    with pytest.raises(ValueError, match="collisions"):
        dcs.DataChain(df, session).flatten_structs()
