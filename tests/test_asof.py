"""As-of join + salted aggregation semantics."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from datachain_spark.ops.asof import asof_join, salted_group_by


def ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture()
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [("A", ts(10, 0), 100.0), ("A", ts(10, 30), 101.0), ("B", ts(9, 0), 50.0)],
        "sym string, t timestamp, px double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", ts(9, 50), 99.5),
            ("A", ts(10, 20), 100.5),
            ("A", ts(11, 0), 102.0),
            ("B", ts(9, 30), 51.0),  # after B's only trade
        ],
        "sym string, qt timestamp, bid double",
    )
    return trades, quotes


def test_asof_backward(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="sym", left_ts="t", right_ts="qt")
    rows = {(r["sym"], r["t"].hour, r["t"].minute): r["bid"] for r in out.collect()}
    assert rows[("A", 10, 0)] == 99.5    # most recent quote at-or-before 10:00
    assert rows[("A", 10, 30)] == 100.5
    assert rows[("B", 9, 0)] is None     # no quote before 09:00


def test_asof_exact_timestamp_inclusive(spark):
    left = spark.createDataFrame([("k", ts(10), 1)], "k string, t timestamp, v int")
    right = spark.createDataFrame([("k", ts(10), 7)], "k string, rt timestamp, w int")
    out = asof_join(left, right, on="k", left_ts="t", right_ts="rt").collect()
    assert out[0]["w"] == 7  # at-or-before includes equal timestamps


def test_asof_forward(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", left_ts="t", right_ts="qt", direction="forward"
    )
    rows = {(r["sym"], r["t"].hour, r["t"].minute): r["bid"] for r in out.collect()}
    assert rows[("A", 10, 0)] == 100.5   # earliest at-or-after
    assert rows[("B", 9, 0)] == 51.0


def test_asof_tolerance(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", left_ts="t", right_ts="qt",
        tolerance_seconds=5 * 60,
    )
    rows = {(r["sym"], r["t"].hour, r["t"].minute): r["bid"] for r in out.collect()}
    assert rows[("A", 10, 30)] is None   # 10:20 quote older than 5min window
    # unmatched-by-tolerance keeps the left row (left-join semantics)
    assert len(rows) == 3


def test_asof_collision_suffix(spark):
    left = spark.createDataFrame([("k", ts(10), 1)], "k string, t timestamp, v int")
    right = spark.createDataFrame([("k", ts(9), 2)], "k string, rt timestamp, v int")
    out = asof_join(left, right, on="k", left_ts="t", right_ts="rt")
    assert "v" in out.columns and "v_r" in out.columns
    r = out.collect()[0]
    assert r["v"] == 1 and r["v_r"] == 2


def test_salted_matches_plain_group_by(spark):
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(100)] + [("b", 5.0)] * 30,
        "k string, v double",
    )
    salted = salted_group_by(
        df, "k",
        {"n": ("count", None), "s": ("sum", "v"), "mn": ("min", "v"),
         "mx": ("max", "v"), "mean": ("avg", "v")},
        salt=4,
    )
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
        F.min("v").alias("mn"), F.max("v").alias("mx"), F.avg("v").alias("mean"),
    )
    a = {r["k"]: (r["n"], r["s"], r["mn"], r["mx"], round(r["mean"], 9)) for r in salted.collect()}
    b = {r["k"]: (r["n"], r["s"], r["mn"], r["mx"], round(r["mean"], 9)) for r in plain.collect()}
    assert a == b


def test_salted_group_by_salt_is_deterministic(spark):
    """The salt column must be stable under re-evaluation (task retry): a
    rand()-derived salt feeding a shuffle loses/duplicates rows when a task
    recomputes. Re-evaluating the same plan twice must bucket identically."""
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(50)], "k string, v double"
    )
    from pyspark.sql import functions as SF

    salted = df.withColumn(
        "__salt", SF.pmod(SF.xxhash64(*[SF.col(c) for c in df.columns]), SF.lit(8))
    )
    one = sorted((r["k"], r["v"], r["__salt"]) for r in salted.collect())
    two = sorted((r["k"], r["v"], r["__salt"]) for r in salted.collect())
    assert one == two
    # and results still match plain groupBy when evaluated repeatedly
    for _ in range(2):
        out = salted_group_by(df, "k", {"n": ("count", None), "s": ("sum", "v")})
        r = out.collect()[0]
        assert (r["n"], r["s"]) == (50, sum(float(i) for i in range(50)))


def test_salted_group_by_map_column_and_duplicate_rows(spark):
    """r04 advisor fixes: (a) a MapType column must not break the salt hash
    (xxhash64 can't take maps); (b) EXACT-duplicate rows — the worst-case
    hot key — must spread over >1 salt bucket, via partition-id mixing or
    an explicit unique_col."""
    from pyspark.sql import functions as SF

    dup = spark.createDataFrame(
        [("hot", 1.0, {"m": "x"})] * 400, "k string, v double, meta map<string,string>"
    ).repartition(8)
    # (a) no error despite the map column; result correct
    out = salted_group_by(dup, "k", {"n": ("count", None), "s": ("sum", "v")})
    r = out.collect()[0]
    assert (r["n"], r["s"]) == (400, 400.0)
    # (b) identical rows occupy multiple buckets (partition-id mixed in)
    hashable = [f.name for f in dup.schema.fields if f.name != "meta"]
    salted = dup.withColumn(
        "__salt",
        SF.pmod(SF.xxhash64(*[SF.col(c) for c in hashable], SF.spark_partition_id()),
                SF.lit(16)),
    )
    n_buckets = salted.select("__salt").distinct().count()
    assert n_buckets > 1
    # explicit unique id: full spreading regardless of partitioning
    with_id = dup.withColumn("rid", SF.monotonically_increasing_id())
    out2 = salted_group_by(
        with_id, "k", {"n": ("count", None)}, unique_col="rid"
    )
    assert out2.collect()[0]["n"] == 400


def test_interval_join_binned_vs_keyed(spark):
    from pyspark.sql import functions as F

    from datachain_spark.ops.interval import interval_join

    pts = spark.createDataFrame(
        [(i, float(i)) for i in range(0, 100, 7)], "pid long, v double"
    )
    ranges = spark.createDataFrame(
        [(0.0, 25.0, "low"), (25.0, 75.0, "mid"), (75.0, 120.0, "high")],
        "lo double, hi double, label string",
    )
    binned = sorted(
        (r["pid"], r["label"])
        for r in interval_join(pts, ranges, "v", "lo", "hi", bin_size=25.0).collect()
    )
    keyed = sorted(
        (r["pid"], r["label"])
        for r in interval_join(
            pts.withColumn("k", F.lit(1)),
            ranges.withColumn("k", F.lit(1)),
            "v", "lo", "hi", on="k",
        ).collect()
    )
    assert binned == keyed and len(binned) == pts.count()
    # boundary semantics: start inclusive, end exclusive
    assert (21, "low") in binned and (28, "mid") in binned


def test_winnow_fingerprints_invariants(spark):
    from datachain_spark.ops.text import winnow_fingerprints

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "The  quick brown fox jumps over the lazy dog"),  # normalizes same
            (3, "entirely different words in this document text"),
        ],
        "id long, text string",
    )
    fp = winnow_fingerprints(docs, "id", "text", k=5, window=4)
    sets = {}
    for r in fp.collect():
        sets.setdefault(r["id"], set()).add(r["fingerprint"])
    assert sets[1] == sets[2]          # normalization-invariant
    assert not (sets[1] & sets[3])     # disjoint for unrelated text
    # deterministic
    fp2 = winnow_fingerprints(docs, "id", "text", k=5, window=4)
    sets2 = {}
    for r in fp2.collect():
        sets2.setdefault(r["id"], set()).add(r["fingerprint"])
    assert sets == sets2


def test_asof_nearest_semantics(spark):
    # nearest picks the closer of backward/forward; equidistant ties
    # prefer the BACKWARD match (pandas merge_asof parity); unmatched
    # keys stay NULL; tolerance voids far matches in both directions.
    from pyspark.sql import functions as F
    from datachain_spark.ops.asof import asof_join

    left = spark.createDataFrame(
        [("a", 100, 1), ("a", 205, 2), ("b", 50, 3), ("c", 10, 4)],
        "k string, sec long, lid int",
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "lid")
    right = spark.createDataFrame(
        [("a", 90, 10), ("a", 210, 11), ("b", 40, 20), ("b", 60, 21)],
        "k string, sec long, rid int",
    ).select("k", F.timestamp_seconds("sec").alias("rts"), "rid")

    out = {r["lid"]: r["rid"] for r in asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        direction="nearest",
    ).collect()}
    assert out[1] == 10     # 90 (d=10) beats 210 (d=110)
    assert out[2] == 11     # 210 (d=5) beats 90 (d=115)
    assert out[3] == 20     # equidistant 40/60 -> backward wins
    assert out[4] is None   # key 'c' has no right rows

    tol = {r["lid"]: r["rid"] for r in asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        direction="nearest", tolerance_seconds=6,
    ).collect()}
    assert tol[2] == 11 and tol[1] is None  # d=10 > tol=6 voided

    with pytest.raises(ValueError, match="backward"):
        asof_join(left, right, on="k", left_ts="ts", direction="sideways")


def test_asof_nearest_string_and_long_ts(spark):
    # r07 advisor: nearest must pick correctly when the ts columns are
    # ISO strings or epoch longs, not TimestampType — the distance casts
    # go through the same timestamp chain as the ordering.
    from datachain_spark.ops.asof import asof_join

    left_s = spark.createDataFrame(
        [("a", "2024-01-01 00:01:40", 1), ("a", "2024-01-01 00:03:25", 2)],
        "k string, ts string, lid int",
    )
    right_s = spark.createDataFrame(
        [("a", "2024-01-01 00:01:30", 10), ("a", "2024-01-01 00:03:30", 11)],
        "k string, rts string, rid int",
    )
    out = {r["lid"]: r["rid"] for r in asof_join(
        left_s, right_s, on="k", left_ts="ts", right_ts="rts",
        direction="nearest",
    ).collect()}
    # 100s row: backward 90 (d=10) beats forward 210 (d=110);
    # 205s row: forward 210 (d=5) beats backward 90 (d=115)
    assert out == {1: 10, 2: 11}

    left_l = spark.createDataFrame(
        [("a", 100, 1), ("a", 205, 2)], "k string, ts long, lid int")
    right_l = spark.createDataFrame(
        [("a", 90, 10), ("a", 210, 11)], "k string, rts long, rid int")
    out_l = {r["lid"]: r["rid"] for r in asof_join(
        left_l, right_l, on="k", left_ts="ts", right_ts="rts",
        direction="nearest",
    ).collect()}
    assert out_l == {1: 10, 2: 11}
