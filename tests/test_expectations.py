"""Declarative data-quality expectations (ops/expectations): rule
semantics (NULL fails closed), single-scan aggregation shape, quarantine
tagging, fluent surface."""

import pytest
from pyspark.sql import functions as F

from datachain_spark.ops import expectations as ex


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame(
        [
            (1, "A", 10.0),
            (2, "B", -5.0),
            (2, "C", 3.0),
            (4, None, 2.0),
            (5, "A", 100.0),
        ],
        "id long, status string, amount double",
    )


def _summary(df, rules):
    return {r["rule"]: r for r in ex.check(df, rules).collect()}


def test_rule_kinds_and_null_fail_closed(tbl):
    s = _summary(
        tbl,
        [
            ex.not_null("status"),
            ex.accepted_values("status", ["A", "B"]),
            ex.in_range("amount", 0.0, 50.0),
            ex.matches_regex("status", "^[A-Z]$"),
            ex.expression("amt_pos_or_b", "amount > 0 OR status = 'B'"),
        ],
    )
    assert s["not_null:status"]["n_violations"] == 1
    # NULL status fails accepted_values and regex (fail closed)
    assert s["accepted_values:status"]["n_violations"] == 2
    assert s["matches_regex:status"]["n_violations"] == 1
    assert s["in_range:amount"]["n_violations"] == 2
    assert s["amt_pos_or_b"]["n_violations"] == 0
    assert s["amt_pos_or_b"]["passed"] is True
    assert all(r["n_rows"] == 5 for r in s.values())


def test_unique_rule_counts_all_members(tbl):
    s = _summary(tbl, [ex.unique("id"), ex.unique("id", "status")])
    assert s["unique:id"]["n_violations"] == 2  # both rows of id=2
    assert s["unique:id"]["passed"] is False
    assert s["unique:id,status"]["n_violations"] == 0


def test_output_preserves_rule_order(tbl):
    rules = [ex.unique("id"), ex.not_null("status"), ex.in_range("amount", 0, 1e9)]
    out = [r["rule"] for r in ex.check(tbl, rules).collect()]
    assert out == ["unique:id", "not_null:status", "in_range:amount"]


def test_duplicate_rule_names_rejected(tbl):
    with pytest.raises(ValueError, match="duplicate"):
        ex.check(tbl, [ex.not_null("status"), ex.not_null("status")])


def test_violations_tags_and_keep_cols(tbl):
    rules = [ex.not_null("status"), ex.in_range("amount", 0.0, 50.0)]
    rows = {
        (r["id"], r["amount"]): r["failed_rules"]
        for r in ex.violations(tbl, rules).collect()
    }
    assert rows[(2, -5.0)] == ["in_range:amount"]
    assert rows[(4, 2.0)] == ["not_null:status"]
    assert rows[(5, 100.0)] == ["in_range:amount"]
    slim = ex.violations(tbl, rules, keep_cols=["id"]).columns
    assert slim == ["id", "failed_rules"]


def test_violations_excludes_unique_needs_row_rule(tbl):
    with pytest.raises(ValueError):
        ex.violations(tbl, [ex.unique("id")])


def test_duplicates_table(tbl):
    d = ex.duplicates(tbl, "id").collect()
    assert [(r["id"], r["n_dup"]) for r in d] == [(2, 2)]


def test_empty_table_passes(spark):
    df = spark.createDataFrame([], "id long, v string")
    s = _summary(df, [ex.not_null("v"), ex.unique("id")])
    assert all(r["n_violations"] == 0 and r["passed"] for r in s.values())
    assert all(r["n_rows"] == 0 for r in s.values())


def test_single_scan_plan_for_row_rules(tbl):
    """Scale guard: N row-level rules = ONE aggregation over one scan —
    no Exchange beyond the single-partial agg pair, no join."""
    rules = [
        ex.not_null("status"),
        ex.in_range("amount", 0.0, 50.0),
        ex.matches_regex("status", "^[A-Z]$"),
    ]
    plan = ex.check(tbl, rules)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Scan") <= 1, plan


def test_fluent_surface(spark, tbl):
    import datachain_spark as dc

    ch = dc.DataChain(tbl)
    summary = ch.check_expectations([ex.not_null("status")]).to_records()
    assert summary[0]["n_violations"] == 1
    bad = ch.expect_violations([ex.not_null("status")], keep_cols=["id"]).to_records()
    assert [b["id"] for b in bad] == [4]
