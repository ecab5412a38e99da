"""ops/packing.mix_to_target, ops/selection.weighted_sample_per_group,
ops/sketches.group_quantiles, ops/profile.dataset_digest."""

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

import datachain_spark as dcs
from datachain_spark.ops.packing import mix_to_target
from datachain_spark.ops.profile import dataset_digest
from datachain_spark.ops.selection import weighted_sample_per_group
from datachain_spark.ops.sketches import group_quantiles


def _corpus(spark, n=3000):
    # en:fr:de mass ~ 6:3:1
    rows = []
    for i in range(n):
        lang = "en" if i % 10 < 6 else ("fr" if i % 10 < 9 else "de")
        rows.append((i, lang, 10 + i % 5))
    return spark.createDataFrame(rows, "id int, lang string, toks int")


def test_mix_to_target_waterfilling(spark):
    df = _corpus(spark)
    # target 1:1:1 -> de (smallest) binds: keeps ~everything, en/fr downsample
    out = mix_to_target(df, "lang", {"en": 1, "fr": 1, "de": 1}, "id",
                        token_col="toks", hash_fn="md5")
    toks = {r["lang"]: r["t"] for r in
            out.groupBy("lang").agg(F.sum("toks").alias("t")).collect()}
    de_mass = toks["de"]
    # binding group keeps 100%; others land near de's mass (hash-uniform)
    full_de = df.filter("lang = 'de'").agg(F.sum("toks")).collect()[0][0]
    assert toks["de"] == full_de
    for lang in ("en", "fr"):
        assert abs(toks[lang] - de_mass) / de_mass < 0.15, toks


def test_mix_to_target_matches_python_reference(spark):
    df = _corpus(spark, 500)
    props = {"en": 0.5, "fr": 0.5}
    out = mix_to_target(df, "lang", props, "id", token_col="toks",
                        seed=3, hash_fn="md5")
    got = sorted(r["id"] for r in out.collect())
    rows = [(r["id"], r["lang"], r["toks"]) for r in df.collect()]
    masses = {}
    for _, lang, t in rows:
        if lang in props:
            masses[lang] = masses.get(lang, 0.0) + float(t)
    t_star = min(masses[g] / (props[g] / sum(props.values())) for g in props)
    rates = {g: (t_star * (props[g] / sum(props.values()))) / masses[g]
             for g in props}
    expect = []
    for i, lang, _ in rows:
        if lang not in rates:
            continue  # de dropped: zero target share
        h = int(hashlib.md5(f"{i}:3".encode()).hexdigest()[:15], 16)
        if (h % 2**31) / 2**31 < rates[lang]:
            expect.append(i)
    assert got == sorted(expect)
    assert not any(r["lang"] == "de" for r in out.collect())


def test_mix_to_target_guards(spark):
    df = _corpus(spark, 100)
    with pytest.raises(ValueError, match="non-empty"):
        mix_to_target(df, "lang", {}, "id")
    with pytest.raises(ValueError, match="> 0"):
        mix_to_target(df, "lang", {"en": 0.0}, "id")
    with pytest.raises(ValueError, match="absent from the data"):
        mix_to_target(df, "lang", {"en": 1, "zz": 1}, "id")


def test_weighted_sample_per_group(spark):
    df = _corpus(spark, 300)
    out = weighted_sample_per_group(df, "lang", "toks", 5, "id", hash_fn="md5")
    counts = Counter(r["lang"] for r in out.collect())
    assert counts == {"en": 5, "fr": 5, "de": 5}
    # superset property: n=10 contains the n=5 draw per group
    big = weighted_sample_per_group(df, "lang", "toks", 10, "id", hash_fn="md5")
    small_ids = {r["id"] for r in out.collect()}
    big_ids = {r["id"] for r in big.collect()}
    assert small_ids <= big_ids


def test_group_quantiles_values(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("b", 10.0),
         ("c", None)],
        "g string, v double",
    )
    out = {(r["g"], r["q"]): r["value"]
           for r in group_quantiles(df, "g", "v", [0.0, 0.5, 1.0]).collect()}
    assert out[("a", 0.5)] == pytest.approx(2.5)  # interpolated
    assert out[("a", 0.0)] == 1.0 and out[("a", 1.0)] == 4.0
    assert out[("b", 0.5)] == 10.0
    assert out[("c", 0.5)] is None  # all-NULL group
    with pytest.raises(ValueError, match="quantiles"):
        group_quantiles(df, "g", "v", [1.5])


def test_dataset_digest_order_invariant(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, None, 1.5), (3, "c", 2.5)], "k int, s string, v double"
    )
    d1 = dataset_digest(df).collect()[0]
    d2 = dataset_digest(df.orderBy(F.desc("k")).repartition(7)).collect()[0]
    assert d1["digest"] == d2["digest"] and d1["n_rows"] == 3
    # any value change moves the digest
    d3 = dataset_digest(
        df.withColumn("v", F.when(F.col("k") == 3, 9.9).otherwise(F.col("v")))
    ).collect()[0]
    assert d3["digest"] != d1["digest"]
    # NULL vs empty-string rows differ
    a = spark.createDataFrame([("", "x")], "p string, q string")
    b = spark.createDataFrame([(None, "x")], "p string, q string")
    assert (dataset_digest(a).collect()[0]["digest"]
            != dataset_digest(b).collect()[0]["digest"])


def test_dataset_digest_column_order_and_guards(spark):
    df = spark.createDataFrame([(1, "a")], "k int, s string")
    flipped = df.select("s", "k")
    assert (dataset_digest(df).collect()[0]["digest"]
            == dataset_digest(flipped).collect()[0]["digest"])
    empty = spark.createDataFrame([], "k int")
    r = dataset_digest(empty).collect()[0]
    assert r["n_rows"] == 0 and r["digest"] == "0"
    arr = spark.createDataFrame([(1, [1])], "k int, a array<int>")
    with pytest.raises(ValueError, match="complex-typed"):
        dataset_digest(arr)
    with pytest.raises(ValueError, match="unknown columns"):
        dataset_digest(df, ["nope"])
