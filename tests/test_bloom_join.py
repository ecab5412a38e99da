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
