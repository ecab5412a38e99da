"""ops/timeseries.funnel and cohort_retention."""

import datetime

import pytest

from datachain_spark.ops.timeseries import cohort_retention, funnel


def _t(h):
    return datetime.datetime(2024, 1, 1, h, tzinfo=datetime.timezone.utc)


def _events(spark):
    rows = [
        # u1 full conversion in order
        ("u1", _t(1), "view"), ("u1", _t(2), "cart"), ("u1", _t(3), "buy"),
        # u2: buy BEFORE view/cart -> chain stops after cart
        ("u2", _t(0), "buy"), ("u2", _t(1), "view"), ("u2", _t(2), "cart"),
        # u3: only view
        ("u3", _t(5), "view"),
        # u4: cart first (never views) -> 0 steps
        ("u4", _t(1), "cart"), ("u4", _t(2), "buy"),
        # u5: view and buy at the SAME hour as cart -> ties qualify
        ("u5", _t(1), "view"), ("u5", _t(1), "cart"), ("u5", _t(1), "buy"),
    ]
    return spark.createDataFrame(rows, "u string, ts timestamp, ev string")


def test_funnel_order_and_ties(spark):
    out = {r["u"]: r for r in
           funnel(_events(spark), "u", "ts", "ev",
                  ["view", "cart", "buy"]).collect()}
    assert out["u1"]["steps_reached"] == 3
    assert out["u1"]["step3_ts"] == int(_t(3).timestamp())
    # u2's early buy must NOT count: buy needs to be at/after cart
    assert out["u2"]["steps_reached"] == 2
    assert out["u2"]["step3_ts"] is None
    assert out["u3"]["steps_reached"] == 1
    assert out["u4"]["steps_reached"] == 0
    assert out["u4"]["step1_ts"] is None
    # equal timestamps qualify, but one event row feeds at most one step
    assert out["u5"]["steps_reached"] == 3
    with pytest.raises(ValueError, match="distinct"):
        funnel(_events(spark), "u", "ts", "ev", ["view", "view"])
    with pytest.raises(ValueError, match="at least 2"):
        funnel(_events(spark), "u", "ts", "ev", ["view"])


def test_funnel_single_shuffle(spark):
    plan = (
        funnel(_events(spark), "u", "ts", "ev", ["view", "buy"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_cohort_retention_triangle(spark):
    day = 86400
    rows = []
    # cohort day0: u1 active d0,d1,d2 ; u2 active d0,d2
    for u, days in [("u1", [0, 1, 2]), ("u2", [0, 2]), ("u3", [1])]:
        for d in days:
            rows.append((u, datetime.datetime.fromtimestamp(
                d * day + 10, tz=datetime.timezone.utc)))
    df = spark.createDataFrame(rows, "u string, ts timestamp")
    out = {(r["cohort"], r["period_offset"]): r["n_entities"]
           for r in cohort_retention(df, "u", "ts", day).collect()}
    assert out[(0, 0)] == 2 and out[(0, 1)] == 1 and out[(0, 2)] == 2
    assert out[(1, 0)] == 1
    capped = cohort_retention(df, "u", "ts", day, max_offset=1).collect()
    assert all(r["period_offset"] <= 1 for r in capped)
    with pytest.raises(ValueError, match="positive"):
        cohort_retention(df, "u", "ts", 0)


def test_funnel_cohort_registry_oracles(session):
    import __spark_entry__ as e
    from tests.oracle_harness import compare

    q, o = e.queries(), e.oracle_sql()
    for name in ["funnel_events", "cohort_retention_events"]:
        ok, detail = compare(
            q[name](session.spark, "/root/testdata/sf0.001"),
            o[name],
            "/root/testdata/sf0.001",
        )
        assert ok, (name, detail)
