"""ops/timeseries (rolling RANGE-frame aggregates, event gaps) and
ops/cdc (apply_changes fold semantics, changes_between inverse)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from datachain_spark.ops import cdc, timeseries


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, u, dt.datetime(2024, 1, 1, 0, 0, s), float(v)) for i, u, s, v in rows],
        "event_id int, user_id int, ts timestamp, value double",
    )


def test_rolling_window_includes_only_trailing_range(spark):
    rows = [(1, 1, 0, 10), (2, 1, 5, 20), (3, 1, 30, 40), (4, 1, 36, 80)]
    out = timeseries.rolling_stats(_ev(spark, rows), "user_id", "ts", "value", 10)
    got = {r["event_id"]: r for r in out.collect()}
    assert got[1]["rolling10s_count"] == 1 and got[1]["rolling10s_sum"] == 10
    assert got[2]["rolling10s_count"] == 2 and got[2]["rolling10s_sum"] == 30
    assert got[3]["rolling10s_count"] == 1  # 5s event is 25s back, outside
    assert got[4]["rolling10s_count"] == 2 and got[4]["rolling10s_max"] == 80


def test_rolling_ties_all_included(spark):
    # equal timestamps: RANGE frame includes every tied row for each of them
    rows = [(1, 1, 10, 1), (2, 1, 10, 2), (3, 1, 10, 4)]
    out = timeseries.rolling_stats(_ev(spark, rows), "user_id", "ts", "value", 5)
    assert all(r["rolling5s_sum"] == 7.0 for r in out.collect())


def test_rolling_partitions_are_independent(spark):
    rows = [(1, 1, 0, 10), (2, 2, 1, 99)]
    out = timeseries.rolling_stats(_ev(spark, rows), "user_id", "ts", "value", 60)
    got = {r["event_id"]: r["rolling60s_sum"] for r in out.collect()}
    assert got[1] == 10 and got[2] == 99


def test_rolling_rejects_bad_args(spark):
    df = _ev(spark, [(1, 1, 0, 1)])
    with pytest.raises(ValueError, match="positive"):
        timeseries.rolling_stats(df, "user_id", "ts", "value", 0)
    with pytest.raises(ValueError, match="unsupported"):
        timeseries.rolling_stats(df, "user_id", "ts", "value", 5, metrics=("median",))


def test_event_gaps_with_tiebreak(spark):
    rows = [(1, 1, 0, 0), (2, 1, 10, 0), (3, 1, 10, 0), (4, 1, 25, 0)]
    out = timeseries.event_gaps(_ev(spark, rows), "user_id", "ts", tiebreak="event_id")
    got = {r["event_id"]: r["gap_seconds"] for r in out.collect()}
    assert got[1] is None and got[2] == 10 and got[3] == 0 and got[4] == 15


# ------------------------------------------------------------------ cdc ----

def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, s string, v double"
    )


def _chg(spark, rows):
    return spark.createDataFrame(rows, "k int, s string, v double, op string, seq int")


def test_apply_changes_upsert_delete(spark):
    changes = _chg(spark, [
        (2, "b2", 25.0, "U", 1),   # update
        (3, None, 0.0, "D", 1),    # delete
        (4, "d", 40.0, "I", 1),    # insert
    ])
    out = {r["k"]: r for r in cdc.apply_changes(_base(spark), changes, "k", seq_col="seq").collect()}
    assert set(out) == {1, 2, 4}
    assert out[2]["s"] == "b2" and out[2]["v"] == 25.0
    assert out[4]["s"] == "d"


def test_apply_changes_last_seq_wins_and_delete_precedence(spark):
    changes = _chg(spark, [
        (1, "x1", 1.0, "U", 1),
        (1, "x2", 2.0, "U", 5),    # later seq wins
        (2, "y", 9.0, "U", 3),
        (2, None, 0.0, "D", 3),    # same seq: delete outranks update
    ])
    out = {r["k"]: r for r in cdc.apply_changes(_base(spark), changes, "k", seq_col="seq").collect()}
    assert out[1]["s"] == "x2" and 2 not in out and 3 in out


def test_apply_changes_insert_on_existing_key_replaces(spark):
    changes = _chg(spark, [(1, "re", 99.0, "I", 1)])
    out = {r["k"]: r for r in cdc.apply_changes(_base(spark), changes, "k", seq_col="seq").collect()}
    assert len(out) == 3 and out[1]["s"] == "re"


def test_apply_changes_validation_errors(spark):
    base = _base(spark)
    with pytest.raises(ValueError, match="missing columns"):
        cdc.apply_changes(base, base.select("k", "s"), "k")
    bad_op = _chg(spark, [(1, "a", 1.0, "Z", 1)]).drop("seq")
    with pytest.raises(ValueError, match="outside"):
        cdc.apply_changes(base, bad_op, "k")
    dup = _chg(spark, [(1, "a", 1.0, "U", 1), (1, "b", 2.0, "U", 2)]).drop("seq")
    with pytest.raises(ValueError, match="duplicate keys"):
        cdc.apply_changes(base, dup, "k")
    extra = _chg(spark, [(1, "a", 1.0, "U", 1)]).withColumn("junk", F.lit(1)).drop("seq")
    with pytest.raises(ValueError, match="unexpected change columns"):
        cdc.apply_changes(base, extra, "k")


def test_changes_between_is_inverse_of_apply(spark):
    old = _base(spark)
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B!", 21.0), (4, "d", 40.0)], "k int, s string, v double"
    )  # 2 updated, 3 deleted, 4 inserted, 1 unchanged
    feed = cdc.changes_between(old, new, "k")
    ops = {r["k"]: r["op"] for r in feed.collect()}
    assert ops == {2: "U", 3: "D", 4: "I"}
    rebuilt = cdc.apply_changes(old, feed, "k")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))


def test_changes_between_null_safe_comparison(spark):
    old = spark.createDataFrame([(1, None)], "k int, s string")
    new = spark.createDataFrame([(1, None)], "k int, s string")
    assert cdc.changes_between(old, new, "k").count() == 0  # null == null: unchanged


def test_funnel_event_cap_bounds_adversarial_entity(spark):
    # VERDICT r05 #7: one bot entity with 1M step events must not build a
    # 1M-struct agg buffer — under the cap the window prunes to N rows
    # per entity (spill-safe sort), the funnel still completes from the
    # kept prefix, and the entity is FLAGGED truncated.
    from pyspark.sql import functions as F
    from datachain_spark.ops.timeseries import funnel

    bot = spark.range(1_000_000).select(
        F.lit("bot").alias("user"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        F.when(F.col("id") == 0, "view")
        .when(F.col("id") == 1, "cart")
        .when(F.col("id") == 2, "buy")
        .otherwise("view").alias("ev"),
    )
    human = spark.createDataFrame(
        [("h", 1_700_000_000, "view"), ("h", 1_700_000_010, "cart")],
        "user string, sec long, ev string",
    ).select("user", F.timestamp_seconds("sec").alias("ts"), "ev")

    out = funnel(
        bot.unionByName(human), "user", "ts", "ev",
        ["view", "cart", "buy"], max_events_per_entity=1000,
    )
    rows = {r["user"]: r for r in out.collect()}
    assert rows["bot"]["steps_reached"] == 3 and rows["bot"]["truncated"]
    assert rows["h"]["steps_reached"] == 2 and not rows["h"]["truncated"]

    # uncapped output keeps its original schema (no truncated column)
    out2 = funnel(human, "user", "ts", "ev", ["view", "cart", "buy"])
    assert "truncated" not in out2.columns

    with pytest.raises(ValueError, match="max_events_per_entity"):
        funnel(human, "user", "ts", "ev", ["view", "cart"],
               max_events_per_entity=0)


def test_funnel_window_reanchors(spark):
    # sliding-window semantics: the first view@0 can't complete within
    # W=100, but the re-anchor at view@150 can — max_level must be 3
    # (the simple first-anchor funnel would bind the chain to t=0).
    from pyspark.sql import functions as F
    from datachain_spark.ops.timeseries import funnel_window

    rows = [
        ("u", 0, "view"), ("u", 150, "view"), ("u", 200, "click"),
        ("u", 240, "purchase"),
        ("v", 0, "view"), ("v", 500, "click"),        # outside window
        ("w", 10, "click"), ("w", 20, "purchase"),    # no anchor at all
        ("x", 5, "view"), ("x", 5, "click"), ("x", 5, "purchase"),  # ties
    ]
    df = spark.createDataFrame(rows, "user string, sec long, ev string").select(
        "user", F.timestamp_seconds("sec").alias("ts"), "ev"
    )
    out = {r["user"]: r["max_level"] for r in funnel_window(
        df, "user", "ts", "ev", ["view", "click", "purchase"], 100
    ).collect()}
    assert out == {"u": 3, "v": 1, "w": 0, "x": 3}

    with pytest.raises(ValueError, match="window_seconds"):
        funnel_window(df, "user", "ts", "ev", ["view", "click"], 0)

    capped = funnel_window(
        df, "user", "ts", "ev", ["view", "click", "purchase"], 100,
        max_events_per_entity=2,
    )
    rows2 = {r["user"]: r for r in capped.collect()}
    assert "truncated" in capped.columns
    assert rows2["u"]["truncated"]  # u had 4 qualifying events


def test_event_paths_order_truncation_nulls(spark):
    from pyspark.sql import functions as F
    from datachain_spark.ops.timeseries import event_paths

    rows = [
        ("u", 3, "purchase"), ("u", 1, "view"), ("u", 2, "click"),
        ("v", 1, "view"), ("v", 1, "click"),   # equal ts -> name order
        ("w", None, "view"),                   # NULL ts excluded entirely
    ]
    df = spark.createDataFrame(rows, "user string, sec long, ev string").select(
        "user",
        F.when(F.col("sec").isNotNull(),
               F.timestamp_seconds("sec")).alias("ts"),
        "ev",
    )
    got = {r["path"]: r["n_entities"] for r in event_paths(
        df, "user", "ts", "ev").collect()}
    assert got == {"view>click>purchase": 1, "click>view": 1}

    trunc = {r["path"] for r in event_paths(
        df, "user", "ts", "ev", max_steps=2).collect()}
    assert "view>click" in trunc
    with pytest.raises(ValueError, match="max_steps"):
        event_paths(df, "user", "ts", "ev", max_steps=0)


def test_event_paths_bounds_adversarial_entity(spark):
    # VERDICT r06 #2 (the funnel cap's twin): a 1M-event bot must never
    # reach the collect_list buffer — the row_number prefix filter keeps
    # only max_steps events per entity BEFORE the agg (semantics-
    # preserving: the path depends only on that prefix).
    from pyspark.sql import functions as F
    from datachain_spark.ops.timeseries import event_paths

    bot = spark.range(1_000_000).select(
        F.lit("bot").alias("user"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        F.when(F.col("id") == 0, "view")
        .when(F.col("id") == 1, "click")
        .otherwise("spam").alias("ev"),
    )
    human = spark.createDataFrame(
        [("h", 1_700_000_000, "view"), ("h", 1_700_000_010, "click")],
        "user string, sec long, ev string",
    ).select("user", F.timestamp_seconds("sec").alias("ts"), "ev")

    got = {r["path"]: r["n_entities"] for r in event_paths(
        bot.unionByName(human), "user", "ts", "ev", max_steps=4
    ).collect()}
    assert got == {"view>click>spam>spam": 1, "view>click": 1}

    # plan shape: the prefix filter sits BELOW the collect aggregate
    plan = event_paths(
        bot, "user", "ts", "ev", max_steps=4
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" in plan


def test_event_transitions_counts(spark):
    from pyspark.sql import functions as F
    from datachain_spark.ops.timeseries import event_transitions

    rows = [
        ("u", 1, "view"), ("u", 2, "click"), ("u", 3, "view"),
        ("v", 1, "view"), ("v", 2, "click"),
        ("w", 1, "buy"),                    # single event: no edge
        ("x", None, "view"), ("x", 5, "click"),  # NULL ts excluded
    ]
    df = spark.createDataFrame(rows, "user string, sec long, ev string").select(
        "user",
        F.when(F.col("sec").isNotNull(),
               F.timestamp_seconds("sec")).alias("ts"),
        "ev",
    )
    got = {(r["from_event"], r["to_event"]): r["n"]
           for r in event_transitions(df, "user", "ts", "ev").collect()}
    assert got == {("view", "click"): 2, ("click", "view"): 1}


def test_scd2_close_append_semantics(spark):
    from pyspark.sql import functions as F
    from datachain_spark.ops.cdc import apply_changes_scd2

    hist = spark.createDataFrame(
        [
            (1, "a-old", 0, 50, False),   # already-closed old version
            (1, "a",     50, None, True),
            (2, "b",     0, None, True),
            (3, "c",     0, None, True),
        ],
        "k long, v string, valid_from long, valid_to long, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, "a2", "U", 100), (2, None, "D", 100), (9, "new", "I", 100)],
        "k long, v string, op string, ts long",
    )
    out = apply_changes_scd2(hist, changes, "k", "ts")
    rows = sorted(
        [(r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
         for r in out.collect()]
    )
    assert rows == [
        (1, "a", 50, 100, False),       # current closed at change ts
        (1, "a-old", 0, 50, False),     # history untouched
        (1, "a2", 100, None, True),     # new version appended
        (2, "b", 0, 100, False),        # delete closes, no new row
        (3, "c", 0, None, True),        # untouched key passes through
        (9, "new", 100, None, True),    # brand-new key
    ]
    # point-in-time query works: at t=75, key 1 was "a"
    at75 = out.filter(
        (F.col("k") == 1) & (F.col("valid_from") <= 75)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > 75))
    ).collect()
    assert len(at75) == 1 and at75[0]["v"] == "a"


def test_scd2_broadcast_size_contract(spark, monkeypatch):
    # VERDICT r06 #4 / advisor: the change-key broadcast is no longer
    # unconditional — an over-threshold feed plans a plain join (no OOM
    # hint), broadcast=True skips the preflight and keeps the hint,
    # broadcast=False never hints. Results identical on every path.
    from pyspark.sql import functions as F
    from datachain_spark.ops import cdc
    from datachain_spark.ops.cdc import apply_changes_scd2

    hist = spark.createDataFrame(
        [(1, "a", 0, None, True), (2, "b", 0, None, True)],
        "k long, v string, valid_from long, valid_to long, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, "a2", "U", 100), (2, None, "D", 100), (9, "new", "I", 100)],
        "k long, v string, op string, ts long",
    )

    def plan(df):
        return df._jdf.queryExecution().optimizedPlan().toString()

    expected = {(1, "a", 0, 100, False), (2, "b", 0, 100, False),
                (1, "a2", 100, None, True), (9, "new", 100, None, True)}

    # auto path, tiny feed: broadcast hint present
    auto = apply_changes_scd2(hist, changes, "k", "ts")
    assert "broadcast" in plan(auto).lower()

    # auto path with the threshold forced below the feed size: falls
    # back to a plain join — same rows, no driver-side broadcast
    monkeypatch.setattr(cdc, "_SCD2_BROADCAST_MAX_KEYS", 2)
    fallback = apply_changes_scd2(hist, changes, "k", "ts")
    assert "broadcast" not in plan(fallback).lower()
    got = {tuple(r) for r in fallback.select(
        "k", "v", "valid_from", "valid_to", "is_current").collect()}
    assert got == expected

    # explicit override beats the threshold in both directions
    forced = apply_changes_scd2(hist, changes, "k", "ts", broadcast=True)
    assert "broadcast" in plan(forced).lower()
    plain = apply_changes_scd2(hist, changes, "k", "ts", broadcast=False)
    assert "broadcast" not in plan(plain).lower()


def test_scd2_validation(spark):
    from datachain_spark.ops.cdc import apply_changes_scd2

    hist = spark.createDataFrame(
        [(1, "a", 500, None, True)],
        "k long, v string, valid_from long, valid_to long, is_current boolean",
    )
    # out-of-order batch: change ts before the current row's valid_from
    stale = spark.createDataFrame(
        [(1, "a2", "U", 100)], "k long, v string, op string, ts long"
    )
    out = apply_changes_scd2(hist, stale, "k", "ts")
    with pytest.raises(Exception, match="out-of-order"):
        out.collect()

    dup = spark.createDataFrame(
        [(1, "x", "U", 600), (1, "y", "U", 700)],
        "k long, v string, op string, ts long",
    )
    with pytest.raises(ValueError, match="seq_col"):
        apply_changes_scd2(hist, dup, "k", "ts")
    # with seq_col, the highest sequence wins
    seq = spark.createDataFrame(
        [(1, "x", "U", 600, 1), (1, "y", "U", 700, 2)],
        "k long, v string, op string, ts long, seq long",
    )
    got = apply_changes_scd2(hist, seq, "k", "ts", seq_col="seq")
    cur = [r for r in got.collect() if r["is_current"]]
    assert len(cur) == 1 and cur[0]["v"] == "y"


def test_history_as_of_snapshot(spark):
    from datachain_spark.ops.cdc import apply_changes_scd2, history_as_of

    hist = spark.createDataFrame(
        [(1, "a", 0, None, True), (2, "b", 0, None, True)],
        "k long, v string, valid_from long, valid_to long, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, "a2", "U", 100)], "k long, v string, op string, ts long"
    )
    h2 = apply_changes_scd2(hist, changes, "k", "ts")
    before = {r["k"]: r["v"] for r in history_as_of(h2, 50).collect()}
    after = {r["k"]: r["v"] for r in history_as_of(h2, 150).collect()}
    assert before == {1: "a", 2: "b"}
    assert after == {1: "a2", 2: "b"}
    assert "valid_from" not in history_as_of(h2, 50).columns
    assert "valid_from" in history_as_of(h2, 50, keep_validity=True).columns
    # boundary: at exactly the change ts the NEW version is live
    at100 = {r["k"]: r["v"] for r in history_as_of(h2, 100).collect()}
    assert at100[1] == "a2"


def test_rolling_actives_wau_semantics(spark):
    from pyspark.sql import functions as F
    from datachain_spark.ops.timeseries import rolling_actives

    # day 0: u; day 1: u,v; day 9: w  (daily buckets, 7-day window)
    rows = [("u", 0), ("u", 10), ("v", 86400), ("u", 86400), ("w", 86400 * 9)]
    df = spark.createDataFrame(rows, "user string, sec long").select(
        "user", F.timestamp_seconds("sec").alias("ts")
    )
    got = {r["bucket"]: r["n_active"] for r in rolling_actives(
        df, "user", "ts", window_buckets=7).collect()}
    # r07 advisor fix: INTERIOR gap days (2-8, no direct activity) carry
    # their true trailing-window counts — days 2-7 still see u/v from
    # days 0-1; day 8 sees nobody (gap spans the whole window -> absent,
    # absence == 0); day 9's window [3..9] sees only w. Nothing past the
    # last observed day is reported.
    assert got == {0: 1, 1: 2, 2: 2, 3: 2, 4: 2, 5: 2, 6: 2, 7: 2, 9: 1}

    dau = {r["bucket"]: r["n_active"] for r in rolling_actives(
        df, "user", "ts", window_buckets=1).collect()}
    assert dau == {0: 1, 1: 2, 9: 1}

    with pytest.raises(ValueError, match="window_buckets"):
        rolling_actives(df, "user", "ts", window_buckets=0)


def test_cohort_retention_rates(spark):
    from pyspark.sql import functions as F
    from datachain_spark.ops.timeseries import cohort_retention

    # cohort day0: u,v,w (3 entities); day1 active: u,v; day2: u
    rows = [("u", 0), ("v", 0), ("w", 0),
            ("u", 86400), ("v", 86400), ("u", 86400 * 2)]
    df = spark.createDataFrame(rows, "user string, sec long").select(
        "user", F.timestamp_seconds("sec").alias("ts")
    )
    out = {r["period_offset"]: r for r in cohort_retention(
        df, "user", "ts", 86400, as_rate=True).collect()}
    assert out[0]["cohort_size"] == 3 and out[0]["retention_rate"] == 1.0
    assert out[1]["retention_rate"] == pytest.approx(2 / 3)
    assert out[2]["retention_rate"] == pytest.approx(1 / 3)
    # default keeps the original schema
    plain = cohort_retention(df, "user", "ts", 86400)
    assert "retention_rate" not in plain.columns
