"""ops/dedup.bloom_semi_join — exact Bloom-prefiltered semi/anti joins."""

import pytest
from pyspark.sql import functions as F

from datachain_spark.ops.dedup import bloom_semi_join


def _frames(spark):
    big = spark.createDataFrame(
        [(i, f"p{i}") for i in range(1000)] + [(None, "pn")],
        "k int, payload string",
    )
    small = spark.createDataFrame(
        [(i * 37,) for i in range(20)] + [(None,)], "k int"
    )
    return big, small


def test_bloom_semi_equals_plain(spark):
    big, small = _frames(spark)
    got = bloom_semi_join(big, small, "k").collect()
    want = big.join(small.dropDuplicates(), "k", "left_semi").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # NULL keys never semi-match (plain-join semantics preserved)
    assert all(r["k"] is not None for r in got)


def test_bloom_anti_equals_plain(spark):
    big, small = _frames(spark)
    got = bloom_semi_join(big, small, "k", how="left_anti").collect()
    want = big.join(small.dropDuplicates(), "k", "left_anti").collect()
    assert sorted(map(tuple, got), key=str) == sorted(map(tuple, want), key=str)
    # NULL-key big rows are kept, like the plain anti join
    assert any(r["k"] is None for r in got)


def test_bloom_join_multi_key_and_guards(spark):
    big = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "a", 30)], "k int, s string, v int"
    )
    small = spark.createDataFrame([(1, "a"), (2, "a")], "k int, s string")
    got = bloom_semi_join(big, small, ["k", "s"]).collect()
    want = big.join(small, ["k", "s"], "left_semi").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    with pytest.raises(ValueError, match="left_semi or left_anti"):
        bloom_semi_join(big, small, "k", how="inner")


def test_bloom_join_prunes_before_exchange(spark):
    big, small = _frames(spark)
    out = bloom_semi_join(big, small, "k", expected=21)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the literal-bitmap bit test is a PLAIN Filter on the big side — no
    # cross join Catalyst could reorder below the exact join; the big rows
    # that reach any exchange are already pruned
    assert "BroadcastNestedLoopJoin" not in plan
    assert "shiftleft" in plan.split("Join")[-1] or "shiftleft" in plan
    seg = plan.split("Exchange hashpartitioning")[-1]
    assert "shiftleft" in seg, "bloom filter did not reach the scan side"


def test_bloom_broadcast_path_equals_plain(spark):
    # expected=10_000 at fpp=1e-6 sizes the bitmap past
    # _BLOOM_LITERAL_MAX_WORDS, selecting the sc.broadcast + vectorized
    # pandas_udf bit test. Row-identity to the plain join must hold there
    # too, for both semi and anti.
    big, small = _frames(spark)
    got = bloom_semi_join(big, small, "k", expected=10_000).collect()
    want = big.join(small.dropDuplicates(), "k", "left_semi").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    got_a = bloom_semi_join(big, small, "k", how="left_anti", expected=10_000)
    want_a = big.join(small.dropDuplicates(), "k", "left_anti").collect()
    assert sorted(map(tuple, got_a.collect()), key=str) == sorted(
        map(tuple, want_a), key=str
    )


def test_bloom_broadcast_path_no_literal_array(spark):
    # VERDICT r05 regression guard: at n=1e7 expected keys the old literal
    # form was ~5.4M Literal nodes in one CreateArray — Catalyst analysis
    # itself was the bomb. The broadcast path must (a) analyze instantly
    # with an O(k)-sized plan, (b) show the Arrow-eval bit test, (c) still
    # be row-identical to the plain join.
    big, small = _frames(spark)
    out = bloom_semi_join(big, small, "k", expected=10_000_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(plan) < 100_000, "plan blew up — literal bitmap leaked back in"
    assert "ArrowEvalPython" in plan or "BatchEvalPython" in plan
    want = big.join(small.dropDuplicates(), "k", "left_semi").collect()
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, want))


def test_bloom_join_word_cap_raises(spark):
    big, small = _frames(spark)
    with pytest.raises(ValueError, match="_BLOOM_MAX_WORDS"):
        bloom_semi_join(big, small, "k", expected=10**9)


def test_bloom_join_registry_oracle(session):
    import __spark_entry__ as e
    from tests.oracle_harness import compare

    q, o = e.queries(), e.oracle_sql()
    ok, detail = compare(
        q["bloom_semi_join_orders"](session.spark, "/root/testdata/sf0.001"),
        o["bloom_semi_join_orders"],
        "/root/testdata/sf0.001",
    )
    assert ok, detail
