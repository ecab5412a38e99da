"""Snapshot drift detection (ops/drift): shared-axis binning, PSI/JS
math vs a numpy reference, clamping, NULL-rate reporting, categorical
top-K + __other__ semantics."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from datachain_spark.ops import drift

EPS = 1e-6


def _df(spark, vals, col="v"):
    return spark.createDataFrame([(float(x),) if x is not None else (None,) for x in vals], f"{col} double")


def test_identical_distributions_zero_drift(spark):
    vals = list(range(100))
    rep = drift.drift_report(_df(spark, vals), _df(spark, vals), ["v"]).collect()[0]
    assert rep["psi"] == pytest.approx(0.0, abs=1e-9)
    assert rep["js"] == pytest.approx(0.0, abs=1e-9)
    assert rep["drifted"] is False
    assert rep["n_ref"] == 100 and rep["n_cur"] == 100


def test_shifted_distribution_flags(spark):
    ref = _df(spark, np.linspace(0, 1, 200))
    cur = _df(spark, np.linspace(0.8, 1.8, 200))  # strong shift
    rep = drift.drift_report(ref, cur, ["v"]).collect()[0]
    assert rep["psi"] > 0.2 and rep["drifted"] is True
    assert rep["js"] > 0.05


def test_psi_matches_numpy(spark):
    rng = np.random.RandomState(0)
    a = rng.uniform(0, 10, 500)
    b = rng.uniform(2, 12, 400)
    bins = 8
    got = drift.drift_report(_df(spark, a), _df(spark, b), ["v"], bins=bins).collect()[0]
    lo, hi = a.min(), a.max()
    edges = np.linspace(lo, hi, bins + 1)
    ra = np.histogram(a, bins=edges)[0] / len(a)
    idx = np.clip(np.floor((b - lo) / ((hi - lo) / bins)).astype(int), 0, bins - 1)
    rb = np.bincount(idx, minlength=bins) / len(b)
    p, q = ra + EPS, rb + EPS
    psi = float(((q - p) * (np.log(q) - np.log(p))).sum())
    m = (p + q) / 2
    js = float(0.5 * (p * (np.log(p) - np.log(m)) + q * (np.log(q) - np.log(m))).sum())
    assert got["psi"] == pytest.approx(psi, rel=1e-9)
    assert got["js"] == pytest.approx(js, rel=1e-9)


def test_cur_outliers_clamp_to_edge_bins(spark):
    hist = drift.drift_histograms(
        _df(spark, [0.0, 10.0]), _df(spark, [-100.0, 500.0]), ["v"], bins=4
    ).orderBy("bin").collect()
    assert hist[0]["cur_count"] == 1  # -100 clamps into bin 0
    assert hist[-1]["cur_count"] == 1  # 500 clamps into the last bin
    assert sum(h["cur_count"] for h in hist) == 2


def test_every_bin_present_with_zero_counts(spark):
    hist = drift.drift_histograms(
        _df(spark, [0.0, 1.0]), _df(spark, [0.0]), ["v"], bins=5
    ).collect()
    assert len(hist) == 5
    assert sum(h["ref_count"] for h in hist) == 2


def test_null_rate_reported_separately(spark):
    ref = _df(spark, [1.0, 2.0, 3.0, None])
    cur = _df(spark, [1.0, None, None, None])
    rep = drift.drift_report(ref, cur, ["v"]).collect()[0]
    assert rep["null_frac_ref"] == pytest.approx(0.25)
    assert rep["null_frac_cur"] == pytest.approx(0.75)
    assert rep["n_ref"] == 4


def test_multi_column_stack(spark):
    ref = spark.createDataFrame([(1.0, 10.0), (2.0, 20.0)], "a double, b double")
    cur = spark.createDataFrame([(1.0, 500.0), (2.0, 600.0)], "a double, b double")
    rows = {r["col"]: r for r in drift.drift_report(ref, cur, ["a", "b"]).collect()}
    assert rows["a"]["psi"] == pytest.approx(0.0, abs=1e-9)
    assert rows["b"]["psi"] > 0.2


def test_constant_column_degenerate(spark):
    rep = drift.drift_report(
        _df(spark, [5.0] * 10), _df(spark, [5.0] * 10), ["v"]
    ).collect()[0]
    assert rep["psi"] == pytest.approx(0.0, abs=1e-9)


def test_categorical_topk_and_other(spark):
    ref = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1 + [(None,)], "s string"
    )
    cur = spark.createDataFrame(
        [("a",)] * 2 + [("z",)] * 8, "s string"  # z is NEW -> __other__
    )
    rows = {
        r["category"]: r
        for r in drift.categorical_drift(ref, cur, "s", top_k=2).collect()
    }
    assert set(rows) == {"a", "b", "__other__", "__null__"} - {"__null__"} | (
        {"__null__"} if "__null__" in rows else set()
    )
    # top-2 by ref count = a, b; c and null fold into __other__ on ref side
    assert rows["a"]["ref_count"] == 5 and rows["a"]["cur_count"] == 2
    assert rows["__other__"]["ref_count"] == 2  # c + null
    assert rows["__other__"]["cur_count"] == 8  # z
    total_psi = sum(r["psi_term"] for r in rows.values())
    assert total_psi > 0.2


def test_two_scans_per_side_plan(spark):
    """Scale guard: the report reads each snapshot a bounded number of
    times (bounds + counts + null-stats = 3 scan legs max per side), and
    the axis/bounds joins are broadcasts, not shuffled joins."""
    ref = _df(spark, range(50))
    cur = _df(spark, range(50))
    plan = (
        drift.drift_report(ref, cur, ["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


# ------------------------------------------------- review-round regressions


def test_extreme_outlier_clamps_not_overflows(spark):
    """A corrupt 1e12 (or 1e300) current value must clamp into the edge
    bin — not overflow the bin-index cast (ANSI abort) or wrap negative."""
    ref = _df(spark, [0.0, 10.0])
    cur = _df(spark, [1e12, 1e300, -1e300, 5.0])
    hist = drift.drift_histograms(ref, cur, ["v"], bins=4).orderBy("bin").collect()
    assert hist[-1]["cur_count"] == 2  # both huge positives -> last bin
    assert hist[0]["cur_count"] == 1   # huge negative -> bin 0
    assert sum(h["cur_count"] for h in hist) == 4


def test_all_null_reference_column_still_reported(spark):
    """A column that is all-NULL on the reference side has no histogram
    axis but must still appear in the report with its null-rate signal."""
    ref = _df(spark, [None, None, None])
    cur = _df(spark, [1.0, 2.0, None])
    rep = drift.drift_report(ref, cur, ["v"]).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r["null_frac_ref"] == pytest.approx(1.0)
    assert r["null_frac_cur"] == pytest.approx(1 / 3)
    assert r["psi"] is None and r["drifted"] is None


def test_awkward_column_names_read_as_columns(spark):
    """'a-b' must read COLUMN `a-b`, never compute a minus b; spaces and
    reserved words must not break the stack parse."""
    ref = spark.createDataFrame(
        [(1.0, 100.0, 7.0, 1.0)], "a double, b double, `a-b` double, `my col` double"
    )
    cur = spark.createDataFrame(
        [(1.0, 100.0, 7.0, 1.0)], "a double, b double, `a-b` double, `my col` double"
    )
    rows = {r["col"]: r for r in drift.drift_report(ref, cur, ["a-b", "my col"]).collect()}
    assert set(rows) == {"a-b", "my col"}
    # identical sides -> zero drift; if 'a-b' had parsed as a minus b the
    # binning would still be zero-drift, so assert the histogram VALUE too
    hist = drift.drift_histograms(ref, cur, ["a-b"], bins=2).collect()
    assert all(h["lo_edge"] == 7.0 for h in hist if h["bin"] == 0)


def test_categorical_ref_aggregation_shared(spark, tmp_path):
    """top-K and the folded ref counts must derive from the SAME
    per-category aggregate of the reference — at runtime the duplicated
    subtrees collapse into ReusedExchange nodes instead of re-scanning
    the snapshot (the raw-rescan shape this replaced showed zero reuse
    because its two ref subtrees genuinely differed)."""
    p_ref, p_cur = str(tmp_path / "r"), str(tmp_path / "c")
    spark.createDataFrame([("a",), ("b",), ("b",)], "s string").write.parquet(p_ref)
    spark.createDataFrame([("a",), ("z",)], "s string").write.parquet(p_cur)
    ref, cur = spark.read.parquet(p_ref), spark.read.parquet(p_cur)
    out = drift.categorical_drift(ref, cur, "s", top_k=1)
    rows = {r["category"]: r for r in out.collect()}
    # top-1 = b (ref counts b=2 > a=1); cur's a AND z both fold to __other__
    assert rows["b"]["ref_count"] == 2 and rows["__other__"]["cur_count"] == 2
    final = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final, final


def test_empty_snapshot_still_reports_every_column(spark):
    # ADVICE r05: an EMPTY side used to inner-join the report away — a
    # monitoring gate reading the empty report as "no drift" would miss
    # the most drastic drift of all. One row per requested column is
    # unconditional; the empty side reads n=0 / null_frac=0, psi/js NULL.
    ref = _df(spark, [1.0, 2.0, 3.0])
    cur = _df(spark, []).sparkSession.createDataFrame([], "v double")
    rows = drift.drift_report(ref, cur, ["v"]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["col"] == "v" and r["n_ref"] == 3 and r["n_cur"] == 0
    # all reference mass vanished: PSI is huge and the gate FIRES
    assert r["null_frac_cur"] == 0.0 and r["psi"] > 1.0 and r["drifted"]

    # empty REFERENCE side too
    rows = drift.drift_report(cur, ref, ["v"]).collect()
    assert len(rows) == 1 and rows[0]["n_ref"] == 0 and rows[0]["n_cur"] == 3

    # both sides empty: still one row per column
    rows = drift.drift_report(cur, cur, ["v"]).collect()
    assert len(rows) == 1 and rows[0]["n_ref"] == 0 and rows[0]["n_cur"] == 0


def test_quoted_column_name_in_stack(spark):
    # a column named a'b must not break the generated stack() expression
    ref = spark.createDataFrame([(1.0,), (2.0,)], ["a'b"])
    cur = spark.createDataFrame([(1.5,), (2.5,)], ["a'b"])
    rows = drift.drift_report(ref, cur, ["a'b"]).collect()
    assert len(rows) == 1 and rows[0]["col"] == "a'b"
    assert rows[0]["n_ref"] == 2 and rows[0]["n_cur"] == 2


def test_schema_drift_statuses(spark):
    from datachain_spark.ops.drift import schema_drift

    ref = spark.createDataFrame([(1, "a", 2.0)], "id long, name string, v double")
    cur = spark.createDataFrame([(1, 3, "x")], "id long, v int, extra string")
    rows = {r["column"]: r for r in schema_drift(ref, cur).collect()}
    assert rows["name"]["status"] == "removed" and rows["name"]["cur_type"] is None
    assert rows["extra"]["status"] == "added" and rows["extra"]["ref_type"] is None
    assert rows["v"]["status"] == "type_changed"
    assert rows["v"]["ref_type"] == "double" and rows["v"]["cur_type"] == "int"
    assert rows["id"]["status"] == "unchanged"
    # identical schemas: all unchanged
    same = schema_drift(ref, ref).collect()
    assert all(r["status"] == "unchanged" for r in same)
