"""ops/html.extract_links, ops/asof.salted_join, ops/text.script_profile."""

import pytest
from pyspark.sql import functions as F

from datachain_spark.ops.asof import salted_join
from datachain_spark.ops.html import extract_links
from datachain_spark.ops.text import script_profile


# ------------------------------------------------------------- links ----

HTML = (
    '<p>x</p><a href="http://a.com/1">one</a> mid '
    "<A HREF='relative/path'>two</A>"
    '<a class="z" href="https://b.org/2?q=1">three</a>'
)


def test_extract_links_order_and_quotes(spark):
    df = spark.createDataFrame([(1, HTML), (2, "<p>no links</p>"), (3, None)],
                               "id int, html string")
    out = extract_links(df, "id").collect()
    got = [(r["id"], r["pos"], r["url"]) for r in out]
    assert got == [
        (1, 0, "http://a.com/1"),
        (1, 1, "relative/path"),
        (1, 2, "https://b.org/2?q=1"),
    ]


def test_extract_links_absolute_only(spark):
    df = spark.createDataFrame([(1, HTML)], "id int, html string")
    urls = [r["url"] for r in extract_links(df, "id", absolute_only=True).collect()]
    assert urls == ["http://a.com/1", "https://b.org/2?q=1"]


def test_links_feed_degrees(spark):
    # composition: html -> edges -> degrees (the web-graph on-ramp);
    # extract_links emits (page_id, pos, url) — page is src, href is dst
    from datachain_spark.ops.graph import degrees

    df = spark.createDataFrame(
        [("u1", '<a href="u2">.</a><a href="u3">.</a>'),
         ("u2", '<a href="u3">.</a>')],
        "url string, html string",
    )
    edges = extract_links(df, "url", url_col="dst").withColumnRenamed(
        "url", "src"
    )
    deg = {r["node"]: (r["out_degree"], r["in_degree"])
           for r in degrees(edges).collect()}
    assert deg == {"u1": (2, 0), "u2": (1, 1), "u3": (0, 2)}


# ------------------------------------------------------- salted join ----


def _fact_dim(spark):
    # key 7 is hot: 500 of 600 fact rows
    fact = spark.createDataFrame(
        [(i, 7 if i < 500 else i % 20) for i in range(600)], "row_id int, k int"
    )
    dim = spark.createDataFrame(
        [(k, f"name_{k}") for k in range(20)], "k int, name string"
    )
    return fact, dim


def test_salted_join_equals_plain_inner(spark):
    fact, dim = _fact_dim(spark)
    got = salted_join(fact, dim, "k", salt=8).collect()
    want = fact.join(dim, "k").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_salted_join_left_and_multimatch(spark):
    fact, dim = _fact_dim(spark)
    dim2 = dim.unionAll(dim.limit(3))  # duplicate keys on the dim side
    got = salted_join(fact, dim2, "k", how="left", salt=4).collect()
    want = fact.join(dim2, "k", "left").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    with pytest.raises(ValueError, match="not supported"):
        salted_join(fact, dim, "k", how="full")
    with pytest.raises(ValueError, match="salt must be"):
        salted_join(fact, dim, "k", salt=1)


def test_salted_join_spreads_hot_key(spark):
    fact, dim = _fact_dim(spark)
    out = salted_join(fact, dim, "k", salt=8)
    # the join key includes __salt: the hot key occupies 8 distinct
    # (k, salt) buckets instead of one
    buckets = (
        fact.withColumn(
            "__salt",
            F.pmod(F.xxhash64("row_id", "k", F.spark_partition_id()), F.lit(8)),
        )
        .filter(F.col("k") == 7)
        .select("__salt").distinct().count()
    )
    assert buckets == 8
    assert out.count() == 600


# ----------------------------------------------------------- scripts ----


def test_script_profile_counts_and_dominance(spark):
    df = spark.createDataFrame(
        [(1, "hello Привет"), (2, "世界 世界 hi"), (3, "...!!!"), (4, None)],
        "id int, text string",
    )
    out = {r["id"]: r for r in script_profile(df, "id").collect()}
    assert out[1]["n_latin"] == 5 and out[1]["n_cyrillic"] == 6
    assert out[1]["script"] == "cyrillic"
    assert out[2]["n_han"] == 4 and out[2]["script"] == "han"
    assert out[3]["script"] == "und" and out[4]["script"] == "und"
    assert out[4]["n_chars"] == 0


def test_script_profile_tie_breaks_alphabetically(spark):
    df = spark.createDataFrame([(1, "ab Пр")], "id int, text string")
    r = script_profile(df, "id").collect()[0]
    assert r["n_latin"] == r["n_cyrillic"] == 2
    assert r["script"] == "cyrillic"  # alphabetically first on ties


def test_script_profile_keep_cols(spark):
    df = spark.createDataFrame([(1, "abc", "m1")], "id int, text string, mime string")
    r = script_profile(df, "id", keep_cols=["mime"]).collect()[0]
    assert r["mime"] == "m1" and r["n_latin"] == 3
    assert "text" not in script_profile(df, "id", keep_cols=["mime"]).columns


def test_script_profile_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "x")], "id int, text string")
    plan = script_profile(df, "id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
