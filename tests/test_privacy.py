"""k-anonymity / l-diversity audits and enforcement (ops/privacy)."""

import pytest
from pyspark.sql import functions as F

from datachain_spark.ops import privacy as P


@pytest.fixture(scope="module")
def tbl(spark):
    rows = [
        # (zip, age_band, diagnosis)
        ("111", "20-30", "flu"),
        ("111", "20-30", "cold"),
        ("111", "20-30", "flu"),
        ("222", "30-40", "flu"),
        ("222", "30-40", "flu"),   # 2-member group, homogeneous sensitive
        ("333", "40-50", "cold"),  # singleton
        (None, "20-30", "flu"),    # NULL quasi value -> its own group
    ]
    return spark.createDataFrame(rows, "zip string, age string, dx string")


def test_violations_lists_small_groups(tbl):
    v = {
        (r["zip"], r["age"]): r["group_size"]
        for r in P.k_anonymity_violations(tbl, ["zip", "age"], k=3).collect()
    }
    assert v == {("222", "30-40"): 2, ("333", "40-50"): 1, (None, "20-30"): 1}


def test_report_summary(tbl):
    r = P.k_anonymity_report(tbl, ["zip", "age"], k=3).collect()[0]
    assert r["n_rows"] == 7 and r["n_groups"] == 4
    assert r["min_group_size"] == 1
    assert r["n_violating_groups"] == 3 and r["n_risk_rows"] == 4
    assert r["anonymous"] is False


def test_report_k2_age_only_not_anonymous(tbl):
    r = P.k_anonymity_report(tbl, ["age"], k=2).collect()[0]
    # 40-50 is a singleton -> NOT anonymous
    assert r["n_violating_groups"] == 1 and r["anonymous"] is False


def test_l_diversity(tbl):
    v = {
        (r["zip"], r["age"]): r["sensitive_distinct"]
        for r in P.l_diversity_violations(tbl, ["zip", "age"], "dx", l=2).collect()
    }
    # 111/20-30 has {flu, cold} -> diverse; others are homogeneous
    assert ("111", "20-30") not in v
    assert v[("222", "30-40")] == 1
    assert v[("333", "40-50")] == 1


def test_anonymize_drop(tbl):
    out = P.anonymize_small_groups(tbl, ["zip", "age"], k=3, method="drop")
    assert out.count() == 3  # only the 111/20-30 trio survives
    assert out.filter(F.col("zip") != "111").count() == 0


def test_anonymize_null_keeps_rows(tbl):
    out = P.anonymize_small_groups(tbl, ["zip", "age"], k=3, method="null")
    assert out.count() == 7  # suppression, not deletion
    nulled = out.filter(F.col("zip").isNull() & F.col("age").isNull())
    assert nulled.count() == 4  # members of the 3 violating groups
    kept = out.filter(F.col("zip") == "111")
    assert kept.count() == 3  # the anonymous group is untouched
    # sensitive column survives suppression
    assert out.filter(F.col("dx").isNull()).count() == 0


def test_null_quasi_group_handled(tbl):
    # the NULL-zip singleton must be caught and suppressed like any group
    out = P.anonymize_small_groups(tbl, ["zip", "age"], k=2, method="drop")
    assert out.filter(F.col("zip").isNull()).count() == 0


def test_validation(tbl):
    with pytest.raises(ValueError):
        P.k_anonymity_report(tbl, ["zip"], k=1)
    with pytest.raises(ValueError):
        P.l_diversity_violations(tbl, [], "dx", l=2)
    with pytest.raises(ValueError):
        P.anonymize_small_groups(tbl, ["zip"], 3, method="hash")


def test_single_aggregation_plan(tbl):
    """Scale guard: the audit is ONE groupBy over the corpus; the summary
    aggregates the #groups-row frame — no join, no second corpus scan."""
    plan = (
        P.k_anonymity_report(tbl, ["zip", "age"], k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
