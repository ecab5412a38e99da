"""Incremental aggregate maintenance (ops/incremental): merge(build(a),
build(b)) must equal a full recompute over a UNION ALL b, including NULL
aggregate semantics; refresh must not rescan the base data (plan guard)."""

import pytest
from pyspark.sql import functions as F

from datachain_spark.ops import incremental as inc

AGGS = {
    "n": ("count", None),
    "n_v": ("count_col", "v"),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
    "mean": ("avg", "v"),
}


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v double")


@pytest.fixture(scope="module")
def parts(spark):
    a = _df(spark, [("x", 1.0), ("x", 3.0), ("y", None), ("y", 10.0)])
    b = _df(spark, [("x", 5.0), ("z", 7.0), ("y", None), ("w", None)])
    return a, b


def _rollup(df):
    return {
        r["g"]: r
        for r in df.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("v").alias("n_v"),
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.avg("v").alias("mean"),
        )
        .collect()
    }


def test_merge_equals_full_recompute(parts):
    a, b = parts
    state = inc.incremental_agg(inc.build_agg_state(a, ["g"], AGGS), b, ["g"], AGGS)
    got = {r["g"]: r for r in inc.finalize_agg(state, ["g"], AGGS).collect()}
    want = _rollup(a.unionByName(b))
    assert set(got) == set(want)
    for g in want:
        for m in AGGS:
            assert got[g][m] == want[g][m], (g, m, got[g][m], want[g][m])


def test_all_null_group_stays_null(parts):
    a, b = parts
    state = inc.incremental_agg(inc.build_agg_state(a, ["g"], AGGS), b, ["g"], AGGS)
    w = {r["g"]: r for r in inc.finalize_agg(state, ["g"], AGGS).collect()}["w"]
    assert w["n"] == 1 and w["n_v"] == 0
    assert w["total"] is None and w["lo"] is None and w["mean"] is None


def test_bootstrap_none_state(parts):
    a, _ = parts
    s0 = inc.incremental_agg(None, a, ["g"], AGGS)
    got = {r["g"]: r for r in inc.finalize_agg(s0, ["g"], AGGS).collect()}
    want = _rollup(a)
    for g in want:
        assert got[g]["total"] == want[g]["total"]
        assert got[g]["mean"] == want[g]["mean"]


def test_three_way_shard_merge_associative(spark, parts):
    a, b = parts
    c = _df(spark, [("x", -2.0), ("q", 0.0)])
    merged = inc.merge_agg_states(
        [inc.build_agg_state(d, ["g"], AGGS) for d in (a, b, c)], ["g"], AGGS
    )
    got = {r["g"]: r for r in inc.finalize_agg(merged, ["g"], AGGS).collect()}
    want = _rollup(a.unionByName(b).unionByName(c))
    for g in want:
        for m in AGGS:
            assert got[g][m] == want[g][m]


def test_refresh_does_not_rescan_history(spark, parts, tmp_path):
    """The 100-TB contract: a refresh reads the persisted STATE (rows =
    #groups), not the historical corpus. Only the delta and the state
    appear as scan relations in the refresh plan."""
    a, b = parts
    state_path = str(tmp_path / "state")
    inc.build_agg_state(a, ["g"], AGGS).write.mode("overwrite").parquet(state_path)
    prev = spark.read.parquet(state_path)
    refreshed = inc.incremental_agg(prev, b, ["g"], AGGS)
    plan = refreshed._jdf.queryExecution().executedPlan().toString()
    # exactly two scan-side leaves: ONE parquet scan (the persisted state)
    # and the in-memory delta — a second parquet scan would mean history
    # was rescanned. (Don't grep for the state PATH: Spark truncates the
    # InMemoryFileIndex location display at ~100 chars, so the assertion
    # flaked once pytest's tmp_path numbering grew long enough.)
    assert plan.count("Scan parquet") == 1
    assert "Scan ExistingRDD" in plan


def test_missing_state_columns_rejected(spark, parts):
    a, _ = parts
    bad = inc.build_agg_state(a, ["g"], {"n": ("count", None)})
    with pytest.raises(ValueError, match="missing"):
        inc.merge_agg_states([bad], ["g"], AGGS)


def test_bad_kind_rejected(parts):
    a, _ = parts
    with pytest.raises(ValueError, match="unknown agg kind"):
        inc.build_agg_state(a, ["g"], {"x": ("median", "v")})
    with pytest.raises(ValueError, match="needs a column"):
        inc.build_agg_state(a, ["g"], {"x": ("sum", None)})


def test_exact_dedup_incremental(spark):
    # index holds the history; the new snapshot drops rows whose
    # normalized text the index has seen, keeps min-id winners within
    # the snapshot, and never touches historical text
    from pyspark.sql import functions as F

    from datachain_spark.ops.dedup import (
        exact_dedup_incremental,
        fingerprint_index,
    )

    hist = spark.createDataFrame(
        [(1, "Seen  Before"), (2, "also seen")], "id long, text string")
    idx = fingerprint_index(hist, "text")
    assert idx.columns == ["fingerprint"] and idx.count() == 2

    snap = spark.createDataFrame(
        [
            (10, "seen before"),     # normalizes into the index -> drop
            (11, "brand new"),
            (12, "brand  NEW"),      # within-snapshot dup of 11 -> drop
            (13, "also new"),
        ],
        "id long, text string",
    )
    out = exact_dedup_incremental(snap, idx, "text", "id")
    assert sorted(r["id"] for r in out.collect()) == [11, 13]
    assert set(out.columns) == {"id", "text"}

    # advancing the index: union + distinct covers the new snapshot
    idx2 = idx.unionByName(fingerprint_index(snap, "text")).distinct()
    none_left = exact_dedup_incremental(snap, idx2, "text", "id")
    assert none_left.count() == 0
