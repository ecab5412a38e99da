"""HLL distinct-profile sketches (ops/sketches) — accuracy, mergeability
(the whole point: shard sketches combine without rescanning), and the
chain repartition/coalesce/hint knobs added alongside."""

import pytest
from pyspark.sql import functions as F

import datachain_spark as dc
from datachain_spark.ops import sketches
from datachain_spark.plans import shuffle_count


def test_hll_profile_accuracy(session):
    df = session.spark.range(10_000).select(
        F.col("id").alias("uid"),
        (F.col("id") % 137).alias("bucket"),
        F.concat(F.lit("u"), (F.col("id") % 1000).cast("string")).alias("name"),
    )
    prof = {r["column"]: r for r in sketches.hll_profile(df).collect()}
    assert set(prof) == {"uid", "bucket", "name"}
    assert all(r["n_rows"] == 10_000 for r in prof.values())
    # ~1.6% HLL error at lg_config_k=12 — generous 5% gates
    assert abs(prof["uid"]["approx_distinct"] - 10_000) < 500
    assert abs(prof["bucket"]["approx_distinct"] - 137) < 7
    assert abs(prof["name"]["approx_distinct"] - 1000) < 50
    with pytest.raises(ValueError):
        sketches.hll_profile(df, [])


def test_hll_merge_equals_whole(session):
    """Sketch two disjoint halves separately, merge — the estimate must
    track the full corpus's distinct count (mergeability is the scale
    story: per-shard profiles, no rescan)."""
    whole = session.spark.range(8_000).select(
        F.col("id").alias("uid"), (F.col("id") % 50).alias("grp")
    )
    lo = whole.filter(F.col("uid") < 4_000)
    hi = whole.filter(F.col("uid") >= 4_000)
    merged = {
        r["column"]: r
        for r in sketches.hll_merge(
            [sketches.hll_profile(lo), sketches.hll_profile(hi)]
        ).collect()
    }
    direct = {
        r["column"]: r for r in sketches.hll_profile(whole).collect()
    }
    assert merged["uid"]["n_rows"] == 8_000
    # overlapping grp values must NOT double count
    assert abs(merged["grp"]["approx_distinct"] - 50) < 4
    for c in ("uid", "grp"):
        assert (
            abs(merged[c]["approx_distinct"] - direct[c]["approx_distinct"])
            < 0.05 * max(1.0, direct[c]["approx_distinct"])
        )
    with pytest.raises(ValueError):
        sketches.hll_merge([])


def test_hll_profile_single_pass(session):
    """All columns sketch in ONE aggregation — exactly one shuffle no
    matter how many columns are profiled."""
    df = session.spark.range(1000).select(
        F.col("id").alias("a"), (F.col("id") % 7).alias("b"),
        (F.col("id") % 13).alias("c"),
    )
    prof = sketches.hll_profile(df, ["a", "b", "c"])
    assert shuffle_count(prof) <= 1


def test_chain_partitioning_knobs(session):
    ch = dc.read_values(session=session, k=list(range(100)))
    assert ch.repartition(7).df.rdd.getNumPartitions() == 7
    assert ch.repartition(7).coalesce(2).df.rdd.getNumPartitions() == 2
    # hint survives into the plan (broadcast hint resolves on join)
    left = ch.rename(a="k")  # rename(new='old')
    right = dc.read_values(session=session, a=list(range(50)), v=[i * 2 for i in range(50)])
    hinted = left.merge(right.hint("broadcast"), on="a", inner=True)
    from datachain_spark.plans import join_strategies

    assert "BroadcastHashJoin" in join_strategies(hinted.df)


def test_hll_profile_nonnative_types_cast(session):
    """double/float/decimal/timestamp columns are outside hll_sketch_agg's
    input set — they must profile through the string cast, not crash."""
    df = session.spark.range(500).select(
        F.col("id").alias("i"),
        (F.col("id") / 7.0).alias("d"),
        F.col("id").cast("float").alias("f"),
        F.col("id").cast("decimal(10,2)").alias("dec"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
    )
    prof = {r["column"]: r for r in sketches.hll_profile(df).collect()}
    assert set(prof) == {"i", "d", "f", "dec", "ts"}
    for c, r in prof.items():
        assert abs(r["approx_distinct"] - 500) < 30, (c, r)


def test_topk_profile_exact_on_small_cardinality(session):
    df = session.spark.range(1_000).select(
        (F.col("id") % 4).alias("grp"),
        F.when(F.col("id") % 10 < 7, "common").otherwise("rare").alias("tag"),
    )
    prof = sketches.topk_profile(df)
    assert {r["column"] for r in prof.collect()} == {"grp", "tag"}
    est = sketches.topk_estimate(prof, k=2)
    rows = {(r["column"], r["rank"]): r for r in est.collect()}
    # within the tracked budget the sketch is exact
    assert rows[("tag", 0)]["item"] == "common"
    assert rows[("tag", 0)]["est_count"] == 700
    assert rows[("tag", 1)]["est_count"] == 300
    assert rows[("grp", 0)]["est_count"] == 250
    # items come back as strings (uniform state type across columns)
    assert rows[("grp", 0)]["item"] in {"0", "1", "2", "3"}


def test_topk_merge_equals_whole(session):
    whole = session.spark.range(4_000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") % 3).alias("j")
    )
    lo = whole.filter(F.col("id") % 2 == 0)
    hi = whole.filter(F.col("id") % 2 == 1)
    merged = sketches.topk_merge(
        [sketches.topk_profile(lo), sketches.topk_profile(hi)]
    )
    whole_prof = sketches.topk_profile(whole)
    got = {(r["column"], r["item"]): r["est_count"]
           for r in sketches.topk_estimate(merged, k=10).collect()}
    want = {(r["column"], r["item"]): r["est_count"]
            for r in sketches.topk_estimate(whole_prof, k=10).collect()}
    assert got == want
    n = {r["column"]: r["n_rows"] for r in merged.collect()}
    assert n == {"k": 4_000, "j": 4_000}


def test_topk_profile_single_pass_and_validation(session):
    df = session.spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") % 5).alias("b")
    )
    prof = sketches.topk_profile(df)
    # ONE aggregation: exactly one shuffle in the profile plan
    assert shuffle_count(prof) == 1
    with pytest.raises(ValueError):
        sketches.topk_profile(df, [])
    with pytest.raises(ValueError):
        sketches.topk_profile(df, max_items_tracked=0)
    with pytest.raises(ValueError):
        sketches.topk_merge([])
    with pytest.raises(ValueError):
        sketches.topk_estimate(prof, k=0)


def test_profiles_accept_dotted_column_names(session):
    df = session.spark.range(100).select(
        F.col("id").alias("a.b"), (F.col("id") % 3).alias("plain")
    )
    hp = {r["column"]: r for r in sketches.hll_profile(df).collect()}
    assert abs(hp["a.b"]["approx_distinct"] - 100) < 10
    tp = sketches.topk_profile(df)
    est = sketches.topk_estimate(tp, k=1).collect()
    assert {r["column"] for r in est} == {"a.b", "plain"}


def test_histogram_known_counts_and_full_axis(session):
    df = session.spark.createDataFrame(
        [(float(v),) for v in [0, 1, 2, 3, 4, 5, 5, 9, 10]] + [(None,)],
        "x double",
    )
    rows = sketches.histogram(df, "x", bins=5).collect()
    assert [r["bin"] for r in rows] == [0, 1, 2, 3, 4]
    # lo=0, hi=10, w=2: [0,2):0,1 [2,4):2,3 [4,6):4,5,5 [6,8): [8,10]:9,10
    assert [r["count"] for r in rows] == [2, 2, 3, 0, 2]
    assert rows[0]["lo_edge"] == 0.0 and rows[4]["hi_edge"] == 10.0


def test_histogram_pinned_bounds_clamp_and_degenerate(session):
    df = session.spark.createDataFrame(
        [(v,) for v in [-5.0, 0.5, 1.5, 99.0]], "x double"
    )
    rows = sketches.histogram(df, "x", bins=2, lo=0.0, hi=2.0).collect()
    # out-of-range values clamp into the edge bins
    assert [r["count"] for r in rows] == [2, 2]
    # degenerate lo == hi: everything in bin 0
    one = sketches.histogram(df, "x", bins=3, lo=1.0, hi=1.0).collect()
    assert [r["count"] for r in one] == [4, 0, 0]


def test_histogram_empty_input_and_validation(session):
    df = session.spark.createDataFrame([], "x double")
    rows = sketches.histogram(df, "x", bins=3).collect()
    assert [r["count"] for r in rows] == [0, 0, 0]
    with pytest.raises(ValueError):
        sketches.histogram(df, "x", bins=0)


def test_hll_by_group_merge_equals_recompute(spark):
    # fold per-shard group sketches -> identical estimates to sketching
    # the union directly (merge≡recompute, the incremental contract)
    from pyspark.sql import functions as F
    from datachain_spark.ops.sketches import hll_by_group, hll_merge_groups

    df = spark.range(2000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 700).alias("v")
    )
    s1 = hll_by_group(df.filter(F.col("id") < 1000), "g", "v")
    s2 = hll_by_group(df.filter(F.col("id") >= 1000), "g", "v")
    merged = {r["g"]: r for r in hll_merge_groups([s1, s2], "g").collect()}
    direct = {r["g"]: r for r in hll_by_group(df, "g", "v").collect()}
    assert set(merged) == set(direct) == {0, 1, 2}
    # row counts merge exactly; estimates may differ by a HAIR from the
    # direct sketch (the DataSketches union drops the HIP estimator) but
    # BOTH must land within the lg_k=12 error bound of exact truth
    exact = {r["g"]: r["d"] for r in df.groupBy("g").agg(
        F.count_distinct("v").alias("d")).collect()}
    for g, d in exact.items():
        assert merged[g]["n_rows"] == direct[g]["n_rows"]
        assert abs(direct[g]["approx_distinct"] - d) <= 0.05 * d
        assert abs(merged[g]["approx_distinct"] - d) <= 0.05 * d

    import pytest as _pt
    with _pt.raises(ValueError, match="non-empty"):
        hll_merge_groups([], "g")


def test_sketch_quantiles_gk_guarantee(session):
    # r07: approx_percentile wrapper + in-plan rank verification — every
    # estimate's true rank interval must satisfy the GK bound, and on
    # small groups (n << accuracy) the sketch is exact: its estimate's
    # rank interval contains the target rank exactly.
    from datachain_spark.ops.sketches import (
        quantile_rank_check,
        sketch_quantiles,
    )

    df = session.spark.range(50_000).select(
        (F.col("id") % 3).alias("g"), F.col("id").cast("double").alias("x")
    )
    est = sketch_quantiles(df, "g", "x", (0.25, 0.5, 0.75), accuracy=100)
    assert est.count() == 9
    chk = quantile_rank_check(df, est, "g", "x", accuracy=100)
    bad = chk.filter(~F.col("rank_ok")).collect()
    assert bad == []

    with pytest.raises(ValueError, match="quantiles"):
        sketch_quantiles(df, "g", "x", (1.5,))
    with pytest.raises(ValueError, match="accuracy"):
        sketch_quantiles(df, "g", "x", (0.5,), accuracy=0)


def test_standardize_methods(spark):
    from datachain_spark.ops.sketches import standardize

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0), ("b", 10.0), ("b", None)],
        "g string, x double",
    )
    mm = {(r["g"], r["x"]): r["x_scaled"] for r in standardize(
        df, ["x"], "g", method="minmax").collect()}
    assert mm[("a", 1.0)] == 0.0 and mm[("a", 3.0)] == 1.0
    # degenerate range and NULL input both give NULL, not inf
    assert mm[("b", 10.0)] is None and mm[("b", None)] is None

    z = standardize(df, ["x"], method="zscore")
    vals = [r["x_scaled"] for r in z.collect() if r["x_scaled"] is not None]
    assert abs(sum(vals)) < 1e-9

    rb = {r["x"]: r["x_scaled"] for r in standardize(
        df.filter(F.col("g") == "a"), ["x"], method="robust").collect()}
    assert rb[1.0] == -1.0 and rb[3.0] == 1.0  # (x - 2) / 1-IQR... IQR=1

    with pytest.raises(ValueError, match="method"):
        standardize(df, ["x"], method="l2")
    with pytest.raises(ValueError, match="non-empty"):
        standardize(df, [], method="zscore")


# --------------------- r08: persistable snapshot profiles -----------------


def _orders_halves(spark):
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    return (
        orders.filter(F.col("o_orderkey") % 2 == 0),
        orders.filter(F.col("o_orderkey") % 2 == 1),
        orders,
    )


def test_profile_sketch_merge_equals_recompute(spark):
    # bin counts + moments of merged snapshots must EQUAL profiling the
    # union directly; the HLL union estimate stays within the 5% bound
    from datachain_spark.ops.sketches import (
        merge_profile_sketches,
        profile_sketch,
    )

    a, b, full = _orders_halves(spark)
    kw = dict(
        value_col="o_totalprice", distinct_col="o_custkey",
        lo=0.0, hi=600000.0, bins=32,
    )
    merged = merge_profile_sketches(
        [profile_sketch(a, "o_orderstatus", **kw),
         profile_sketch(b, "o_orderstatus", **kw)],
        "o_orderstatus",
    )
    direct = profile_sketch(full, "o_orderstatus", **kw)
    m = {r["o_orderstatus"]: r for r in merged.collect()}
    d = {r["o_orderstatus"]: r for r in direct.collect()}
    assert set(m) == set(d)
    for k in d:
        assert m[k]["n_rows"] == d[k]["n_rows"]
        assert m[k]["n_value"] == d[k]["n_value"]
        assert m[k]["hist"] == d[k]["hist"]          # EXACT vector add
        assert m[k]["min_x"] == d[k]["min_x"]
        assert m[k]["max_x"] == d[k]["max_x"]
        assert abs(m[k]["sum_x"] - d[k]["sum_x"]) < 1e-6 * abs(d[k]["sum_x"])
        # merged HLL vs the direct estimate of the union
        assert abs(m[k]["approx_distinct"] - d[k]["approx_distinct"]) \
            <= 0.05 * max(1, d[k]["approx_distinct"])


def test_profile_sketch_survives_dataset_version_roundtrip(session, tmp_path):
    # the POINT of the op: sketch state (binary HLL + array hist) stored
    # as ordinary columns of saved dataset versions, merged AFTER reload
    from datachain_spark.catalog.metastore import Metastore
    from datachain_spark.ops.sketches import (
        merge_profile_sketches,
        profile_sketch,
    )

    spark = session.spark
    a, b, full = _orders_halves(spark)
    kw = dict(
        value_col="o_totalprice", distinct_col="o_custkey",
        lo=0.0, hi=600000.0, bins=16,
    )
    ms = Metastore(str(tmp_path / "ms_ps"))
    ms.save_dataset(profile_sketch(a, "o_orderstatus", **kw), "prof")
    ms.save_dataset(profile_sketch(b, "o_orderstatus", **kw), "prof")
    rec = ms.get_record("prof")
    snaps = [
        ms.load_dataset(spark, "prof", dv.version)[0]
        for dv in rec.versions
    ]
    merged = merge_profile_sketches(snaps, "o_orderstatus")
    direct = profile_sketch(full, "o_orderstatus", **kw)
    m = {r["o_orderstatus"]: r for r in merged.collect()}
    d = {r["o_orderstatus"]: r for r in direct.collect()}
    for k in d:
        assert m[k]["hist"] == d[k]["hist"]
        assert m[k]["n_rows"] == d[k]["n_rows"]
        assert abs(m[k]["approx_distinct"] - d[k]["approx_distinct"]) \
            <= 0.05 * max(1, d[k]["approx_distinct"])


def test_histogram_quantiles_bound_and_validation(spark):
    import pytest as _pt

    from datachain_spark.ops.sketches import (
        histogram_quantiles,
        profile_sketch,
    )

    _, _, full = _orders_halves(spark)
    lo, hi, bins = 0.0, 600000.0, 64
    prof = profile_sketch(
        full, "o_orderstatus", value_col="o_totalprice",
        lo=lo, hi=hi, bins=bins,
    )
    est = {
        (r["o_orderstatus"], r["q"]): r["estimate"]
        for r in histogram_quantiles(
            prof, "o_orderstatus", [0.25, 0.5, 0.9], lo, hi
        ).collect()
    }
    exact = {
        (r["o_orderstatus"], q): r[f"p{int(q*100)}"]
        for r in full.groupBy("o_orderstatus").agg(
            *[
                F.percentile(F.col("o_totalprice").cast("double"), F.lit(q))
                .alias(f"p{int(q*100)}")
                for q in (0.25, 0.5, 0.9)
            ]
        ).collect()
        for q in (0.25, 0.5, 0.9)
    }
    width = (hi - lo) / bins
    assert set(est) == set(exact)
    for k in exact:
        assert abs(est[k] - exact[k]) <= width + 1e-9

    with _pt.raises(ValueError, match="lo < hi"):
        profile_sketch(full, "o_orderstatus", value_col="o_totalprice")
    with _pt.raises(ValueError, match="need value_col"):
        profile_sketch(full, "o_orderstatus")
    with _pt.raises(ValueError, match="q must be"):
        histogram_quantiles(prof, "o_orderstatus", [0.0], lo, hi)
