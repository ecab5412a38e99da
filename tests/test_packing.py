"""pack_sequences (concat-and-chunk token packing) and interleave_datasets
(deterministic weighted mixture) — training-batch assembly invariants."""

import pytest
from pyspark.sql import functions as F

from datachain_spark.ops import packing


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")


def test_pack_sequences_offsets_are_contiguous_per_shard(docs):
    out = packing.pack_sequences(docs, max_tokens=128, num_shards=4).cache()
    # every document appears exactly once
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    # width of the interval == token count; intervals tile the shard stream
    bad = out.filter(F.col("offset_end") - F.col("offset_start") != F.col("n_tokens"))
    assert bad.count() == 0
    rows = out.select("shard", "offset_start", "offset_end").collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append((r.offset_start, r.offset_end))
    for shard, ivals in by_shard.items():
        ivals.sort()
        assert ivals[0][0] == 0
        for (s0, e0), (s1, _) in zip(ivals, ivals[1:]):
            assert s1 == e0, f"gap in shard {shard}"
    out.unpersist()


def test_pack_sequences_pack_bounds(docs):
    out = packing.pack_sequences(docs, max_tokens=100, num_shards=2)
    rows = out.select("n_tokens", "offset_start", "offset_end", "pack_first", "pack_last").collect()
    for r in rows:
        assert r.pack_first == r.offset_start // 100
        if r.n_tokens > 0:
            assert r.pack_last == (r.offset_end - 1) // 100
            assert r.pack_first <= r.pack_last
        else:
            assert r.pack_last == r.pack_first


def test_pack_sequences_deterministic_under_repartition(docs):
    a = packing.pack_sequences(docs, max_tokens=64, num_shards=4)
    b = packing.pack_sequences(docs.repartition(13), max_tokens=64, num_shards=4)
    cols = ["doc_id", "shard", "offset_start", "offset_end", "pack_first", "pack_last"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_pack_sequences_token_col_passthrough(spark):
    df = spark.createDataFrame(
        [(i, (i * 7) % 13 + 1) for i in range(50)], "doc_id int, ntok int"
    )
    out = packing.pack_sequences(
        df, token_col="ntok", max_tokens=16, num_shards=1
    )
    total = df.agg(F.sum("ntok")).collect()[0][0]
    assert out.agg(F.max("offset_end")).collect()[0][0] == total
    # shard stream cut into 16-token examples: last pack index is total//16
    assert out.agg(F.max("pack_last")).collect()[0][0] == (total - 1) // 16


def test_pack_sequences_validation(docs):
    with pytest.raises(ValueError):
        packing.pack_sequences(docs, max_tokens=0)
    with pytest.raises(ValueError):
        packing.pack_sequences(docs, num_shards=0)


def test_interleave_weight_one_is_identity(docs):
    out = packing.interleave_datasets({"d": docs}, {"d": 1.0}, key=["doc_id"])
    assert out.count() == docs.count()
    assert [r.epoch for r in out.select("epoch").distinct().collect()] == [0]


def test_interleave_integer_weight_duplicates_epochs(docs):
    out = packing.interleave_datasets({"d": docs}, {"d": 2.0}, key=["doc_id"])
    assert out.count() == 2 * docs.count()
    per_epoch = {r["epoch"]: r["count"] for r in out.groupBy("epoch").count().collect()}
    assert per_epoch == {0: docs.count(), 1: docs.count()}


def test_interleave_fractional_weight_subsamples(docs):
    n = docs.count()
    out = packing.interleave_datasets({"d": docs}, {"d": 1.4}, key=["doc_id"])
    extra = out.filter(F.col("epoch") == 1).count()
    assert out.filter(F.col("epoch") == 0).count() == n
    assert 0.25 * n < extra < 0.55 * n  # ~0.4 with hash noise at sf0.001


def test_interleave_mixture_and_determinism(docs):
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    m1 = packing.interleave_datasets(
        {"even": a, "odd": b}, {"even": 0.5, "odd": 2.0}, key=["doc_id"]
    )
    m2 = packing.interleave_datasets(
        {"even": a.repartition(7), "odd": b.coalesce(1)},
        {"even": 0.5, "odd": 2.0},
        key=["doc_id"],
    )
    k = ["source", "epoch", "doc_id"]
    assert sorted(map(tuple, m1.select(k).collect())) == sorted(
        map(tuple, m2.select(k).collect())
    )
    assert m1.filter(F.col("source") == "odd").count() == 2 * b.count()


def test_interleave_validation(docs):
    with pytest.raises(ValueError):
        packing.interleave_datasets({}, {})
    with pytest.raises(ValueError):
        packing.interleave_datasets({"d": docs}, {})
    with pytest.raises(ValueError):
        packing.interleave_datasets({"d": docs}, {"d": 0.0})
    with pytest.raises(ValueError):
        packing.interleave_datasets(
            {"d": docs, "e": docs.select("doc_id")}, {"d": 1.0, "e": 1.0}
        )


def test_pack_greedy_capacity_and_coverage(docs):
    out = packing.pack_greedy(docs, max_tokens=120, num_shards=4).cache()
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    sums = (
        out.filter(~F.col("oversize"))
        .groupBy("shard", "pack_id")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    )
    assert sums and all(r.t <= 120 for r in sums)
    # oversize docs sit alone in their pack
    over = out.filter(F.col("oversize")).select("shard", "pack_id").collect()
    if over:
        counts = {
            (r.shard, r.pack_id): r["count"]
            for r in out.groupBy("shard", "pack_id").count().collect()
        }
        assert all(counts[(r.shard, r.pack_id)] == 1 for r in over)
    out.unpersist()


def test_pack_greedy_deterministic(docs):
    a = packing.pack_greedy(docs, max_tokens=100, num_shards=3)
    b = packing.pack_greedy(docs.repartition(11), max_tokens=100, num_shards=3)
    cols = ["doc_id", "shard", "pack_id", "oversize"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_pack_greedy_beats_capacity_waste(spark):
    # FFD on uniform halves: 2 docs of 60 tokens fit exactly in a 120 pack
    df = spark.createDataFrame([(i, 60) for i in range(40)], "doc_id int, ntok int")
    out = packing.pack_greedy(df, token_col="ntok", max_tokens=120, num_shards=1)
    per_pack = out.groupBy("pack_id").count().collect()
    assert all(r["count"] == 2 for r in per_pack)
    assert len(per_pack) == 20


# -- temperature mixing ------------------------------------------------------
def test_temperature_weights_math():
    import math

    # T=1: natural proportions -> every source weight exactly 1.0
    w = packing.temperature_weights({"a": 900, "b": 100})
    assert w == {"a": 1.0, "b": 1.0}
    # T>1 flattens: low-resource upweighted, high-resource subsampled, and
    # the expected output size stays the pooled total
    w = packing.temperature_weights({"a": 900, "b": 100}, temperature=3.0)
    assert w["b"] > 1.0 > w["a"]
    assert abs(900 * w["a"] + 100 * w["b"] - 1000) < 1e-9
    # hand-check against the closed form q_i ∝ p_i^(1/T)
    qa, qb = 0.9 ** (1 / 3), 0.1 ** (1 / 3)
    z = qa + qb
    assert abs(w["a"] - 1000 * (qa / z) / 900) < 1e-12
    # huge T -> uniform shares: each source emits ~total/2 rows
    w = packing.temperature_weights({"a": 900, "b": 100}, temperature=1e9)
    assert abs(900 * w["a"] - 500) < 1.0 and abs(100 * w["b"] - 500) < 1.0
    # total_rows rescales linearly
    w2 = packing.temperature_weights({"a": 900, "b": 100}, 3.0, total_rows=500)
    w3 = packing.temperature_weights({"a": 900, "b": 100}, 3.0)
    assert abs(w2["a"] - w3["a"] / 2) < 1e-12
    for bad in ({}, ):
        with pytest.raises(ValueError):
            packing.temperature_weights(bad)
    with pytest.raises(ValueError):
        packing.temperature_weights({"a": 10}, temperature=0.0)
    with pytest.raises(ValueError):
        packing.temperature_weights({"a": 0})


def test_interleave_by_temperature_end_to_end(docs):
    a = docs.filter(F.col("doc_id") % 10 > 0)   # ~90%
    b = docs.filter(F.col("doc_id") % 10 == 0)  # ~10%
    na, nb = a.count(), b.count()
    out = packing.interleave_by_temperature(
        {"big": a, "small": b}, temperature=3.0, key=["doc_id"]
    )
    per = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    w = packing.temperature_weights({"big": na, "small": nb}, 3.0)
    # integer epochs are exact; the fractional tail is a hash subsample
    assert per["small"] >= int(w["small"]) * nb
    assert abs(per["big"] - w["big"] * na) < 0.25 * na
    assert abs(per["small"] - w["small"] * nb) < 0.35 * nb
    # precomputed sizes skip the count jobs and give identical weights
    out2 = packing.interleave_by_temperature(
        {"big": a, "small": b}, temperature=3.0,
        sizes={"big": na, "small": nb}, key=["doc_id"],
    )
    assert out2.count() == out.count()


def test_interleave_by_temperature_rejects_stale_sizes(docs):
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    with pytest.raises(ValueError):
        packing.interleave_by_temperature(
            {"a": a, "b": b}, temperature=2.0,
            sizes={"a": 10, "b": 10, "stale": 999}, key=["doc_id"],
        )


# ---------------------------------------------------------------- curriculum


def test_curriculum_equal_stages_and_null_last(spark):
    from datachain_spark.ops.packing import curriculum_stages

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(12)] + [(99, None)], "id long, s double"
    )
    out = curriculum_stages(df, "s", "id", 3)
    stages = {r["id"]: r["stage"] for r in out.collect()}
    assert stages[0] == 1 and stages[3] == 1
    assert stages[5] == 2
    assert stages[11] == 3
    assert stages[99] == 3  # NULL difficulty -> last stage
    # roughly equal populations (quantile split)
    from collections import Counter

    c = Counter(stages.values())
    assert c[1] == 4 and c[2] == 4 and c[3] == 5


def test_curriculum_descending_flips(spark):
    from datachain_spark.ops.packing import curriculum_stages

    df = spark.createDataFrame([(i, float(i)) for i in range(9)], "id long, s double")
    out = {r["id"]: r["stage"] for r in
           curriculum_stages(df, "s", "id", 3, ascending=False).collect()}
    assert out[8] == 1 and out[0] == 3  # hardest-first


def test_curriculum_shuffle_key_deterministic_and_spread(spark):
    from datachain_spark.ops.packing import curriculum_stages

    df = spark.createDataFrame([(i, float(i % 3)) for i in range(50)], "id long, s double")
    a = curriculum_stages(df.repartition(2), "s", "id", 2, seed=7).collect()
    b = curriculum_stages(df.repartition(9), "s", "id", 2, seed=7).collect()
    ka = {r["id"]: r["shuffle_key"] for r in a}
    kb = {r["id"]: r["shuffle_key"] for r in b}
    assert ka == kb  # partitioning-independent
    # a different seed reshuffles
    c = curriculum_stages(df, "s", "id", 2, seed=8).collect()
    kc = {r["id"]: r["shuffle_key"] for r in c}
    assert ka != kc
    # within-stage order is not score order (keys spread)
    assert len(set(ka.values())) == 50


def test_curriculum_n_stages_validation(spark):
    from datachain_spark.ops.packing import curriculum_stages

    df = spark.createDataFrame([(1, 1.0)], "id long, s double")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        curriculum_stages(df, "s", "id", 1)


def test_curriculum_no_corpus_shuffle_plan(spark):
    from datachain_spark.ops.packing import curriculum_stages

    df = spark.createDataFrame([(i, float(i)) for i in range(20)], "id long, s double")
    plan = (
        curriculum_stages(df, "s", "id", 4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the only exchange feeds the 1-row threshold aggregate, which then
    # broadcasts back — the corpus side must not hash-shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
