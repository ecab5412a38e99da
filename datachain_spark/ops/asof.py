"""As-of (time-travel) join and salted aggregation — custom operators the
reference lacks entirely (SURVEY.md §2.4 "Not present: as-of joins,
interval/range joins"), built as compositions of native DataFrame ops (the
build spec's preferred strategy for missing operators).

asof_join: for every left row, the single right row with the greatest
``right_ts <= left_ts`` within the same key — the standard point-in-time
lookup (trades joins in feature stores / market data).

Implementation: union both sides with a side marker, one window sort per key
carries the last-seen right row forward (``last(..., ignorenulls=True)``),
then keep left rows. Cost: ONE shuffle on the key (the window), versus the
naive range-join which explodes to |L|×|R| per key. This is the canonical
Spark formulation at 100 TB — the state per key is one row, and skewed keys
split fine under AQE because the window is per-key ordered, not grouped into
single rows.

salted_group_by: two-stage aggregation for skewed keys — stage 1 aggregates
on (key, salt), stage 2 merges partials on key. Decomposable aggregates only
(sum/count/min/max — avg derived as sum/count).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_ts: str,
    right_ts: Optional[str] = None,
    direction: str = "backward",
    tolerance_seconds: Optional[float] = None,
    rsuffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the most recent right row at-or-before its
    timestamp (direction='backward'; 'forward' = earliest at-or-after;
    'nearest' = whichever of the two is closer in absolute time, ties
    preferring the backward match — pandas merge_asof parity).

    Right columns (except keys) appear with ``rsuffix`` when they collide.
    Unmatched left rows keep NULL right columns; ``tolerance_seconds`` voids
    matches older than the window.

    'nearest' costs the same ONE key shuffle as the single-direction
    forms: both candidates come from two window passes over the same
    partitioning (one exchange, two within-partition sorts — ascending
    ties put right rows before left for the backward carry and after
    left for the forward look-ahead, so at-or-equal matches count in
    both directions).
    """
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward' or 'nearest'")

    rcols = [c for c in right.columns if c not in keys and c != rts]
    out_names = {c: (c + rsuffix if c in set(left.columns) else c) for c in rcols}

    # union with side marker; right rows sort before left at equal ts so
    # "at-or-before" includes exact matches
    lmark = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`: {right.schema[c].dataType.simpleString()}" for c in rcols) + ">"
        ).alias("__rrow") if rcols else F.lit(None).alias("__rrow"),
        F.lit(None).cast("timestamp").alias("__rts"),
    )
    rmark = right.select(
        *[F.col(k) for k in keys],
        F.col(rts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lmark.schema["__lrow"].dataType.simpleString()).alias("__lrow"),
        F.struct(*[F.col(c) for c in rcols]).alias("__rrow") if rcols else F.lit(None).alias("__rrow"),
        F.col(rts).cast("timestamp").alias("__rts"),
    )
    unioned = lmark.unionByName(rmark)

    if direction == "nearest":
        wb = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wf = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").asc(), F.col("__side").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        staged = (
            unioned.withColumn("__bm", F.last("__rrow", ignorenulls=True).over(wb))
            .withColumn("__bts", F.last("__rts", ignorenulls=True).over(wb))
            .withColumn("__fm", F.first("__rrow", ignorenulls=True).over(wf))
            .withColumn("__fts", F.first("__rts", ignorenulls=True).over(wf))
        )
        # timestamp -> double keeps sub-second precision (unix_timestamp
        # truncates to whole seconds, which would mis-pick near-ties);
        # __bts/__fts go through the SAME cast chain as __ts so every
        # input type the ordering accepts (string/date/long ts columns)
        # yields comparable distances on both sides (r07 advisor)
        ts_e = F.col("__ts").cast("timestamp").cast("double")
        bd = ts_e - F.col("__bts").cast("timestamp").cast("double")
        fd = F.col("__fts").cast("timestamp").cast("double") - ts_e
        pick_b = F.col("__bts").isNotNull() & (F.col("__fts").isNull() | (bd <= fd))
        matched = staged.withColumn(
            "__m", F.when(pick_b, F.col("__bm")).otherwise(F.col("__fm"))
        ).withColumn(
            "__mts", F.when(pick_b, F.col("__bts")).otherwise(F.col("__fts"))
        )
    else:
        if direction == "backward":
            w = (
                Window.partitionBy(*keys)
                .orderBy(F.col("__ts").asc(), F.col("__side").asc())
                .rowsBetween(Window.unboundedPreceding, 0)
            )
        else:
            w = (
                Window.partitionBy(*keys)
                .orderBy(F.col("__ts").desc(), F.col("__side").asc())
                .rowsBetween(Window.unboundedPreceding, 0)
            )
        carried = F.last("__rrow", ignorenulls=True).over(w)
        carried_ts = F.last("__rts", ignorenulls=True).over(w)
        matched = unioned.withColumn("__m", carried).withColumn("__mts", carried_ts)
    out = matched.filter(F.col("__side") == 1)

    if tolerance_seconds is not None:
        delta = F.abs(
            F.unix_timestamp(F.col("__ts").cast("timestamp"))
            - F.unix_timestamp(F.col("__mts"))
        )
        out = out.withColumn(
            "__m", F.when(delta <= tolerance_seconds, F.col("__m"))
        )

    sel = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    sel += [F.col(f"__m.{c}").alias(out_names[c]) for c in rcols]
    return out.select(*sel)


_MERGERS = {
    "sum": F.sum,
    "count": F.sum,  # partial counts merge by summation
    "min": F.min,
    "max": F.max,
}


def salted_group_by(
    df: DataFrame,
    keys: Union[str, Sequence[str]],
    aggs: dict[str, tuple[str, Optional[str]]],
    salt: int = 16,
    unique_col: Optional[str] = None,
) -> DataFrame:
    """Skew-resistant groupBy: aggregate on (keys, salt-bucket) first, then
    merge partials on keys. ``aggs`` maps output name -> (fn, column) with fn
    in {sum,count,min,max,avg}; avg decomposes into sum+count.

    Use when one key holds a disproportionate share of rows (the classic
    null-key / celebrity-item skew): the hot key spreads over ``salt``
    reducers in stage 1 instead of melting one.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    # Salt must be DETERMINISTIC per row: a rand()-derived salt feeding a
    # shuffle re-salts rows differently on task retry (the classic
    # repartition-by-rand row-loss/duplication hazard). Hash row content
    # instead — same row always lands in the same salt bucket. Two refinements
    # (r04): (a) only xxhash64-hashable columns participate (MapType isn't);
    # (b) EXACT-duplicate rows would all collide into one bucket — defeating
    # the salt exactly when a hot key is made of repeated identical rows — so
    # mix in a discriminator: the caller's unique id column when available,
    # else spark_partition_id() (stable on deterministic inputs; duplicates
    # then spread across at least min(salt, input partitions) buckets).
    if unique_col is not None:
        salt_cols = [F.col(c) for c in (*keys, unique_col)]
    else:
        hashable = [
            f.name for f in df.schema.fields
            if not isinstance(f.dataType, T.MapType)
        ]
        salt_cols = [F.col(c) for c in hashable] + [F.spark_partition_id()]
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_cols), F.lit(salt))
    )

    partials = []
    finals = []
    for name, (fn, col) in aggs.items():
        if fn == "avg":
            partials.append(F.sum(col).alias(f"__{name}_s"))
            partials.append(F.count(col).alias(f"__{name}_c"))
            finals.append(
                (F.sum(f"__{name}_s") / F.sum(f"__{name}_c")).alias(name)
            )
        elif fn == "count":
            partials.append(
                (F.count(col) if col else F.count(F.lit(1))).alias(f"__{name}")
            )
            finals.append(F.sum(f"__{name}").alias(name))
        elif fn in _MERGERS:
            partials.append(getattr(F, fn)(col).alias(f"__{name}"))
            finals.append(_MERGERS[fn](f"__{name}").alias(name))
        else:
            raise ValueError(f"salted_group_by: unsupported aggregate {fn!r}")

    stage1 = salted.groupBy(*keys, "__salt").agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: the fix when ONE join key holds a
    disproportionate share of the fact side and a single reducer melts
    (AQE's skew-join split handles sort-merge skew after the fact; this
    prevents it by construction, and also covers the aggregation-after-
    join case AQE can't rebalance).

    Recipe: every LEFT row gets a deterministic salt in [0, salt); the
    RIGHT side is replicated ``salt`` times (one explode — size it for the
    smaller side); the join runs on (keys, salt) so the hot key spreads
    over ``salt`` reducers. Each left row still matches each right row
    exactly once (only the replica carrying its salt), so the result is
    row-identical to the plain join for ``inner`` and ``left`` — other
    join types would emit right-unmatched rows once per replica and are
    rejected. The salt hashes row content (never rand(): a retry would
    re-salt rows into different buckets mid-shuffle).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join: how={how!r} not supported (right-unmatched rows "
            "would duplicate per salt replica); use inner or left"
        )
    if salt < 2:
        raise ValueError("salted_join: salt must be >= 2")
    if "__salt" in left.columns or "__salt" in right.columns:
        raise ValueError("salted_join: a '__salt' column already exists")
    keys = [on] if isinstance(on, str) else list(on)
    # xxhash64 rejects MapType ANYWHERE in a column's type tree (e.g.
    # array<map<...>>), not just at the top level
    hashable = [
        f.name for f in left.schema.fields
        if "map<" not in f.dataType.simpleString()
    ]
    l_salted = left.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in hashable], F.spark_partition_id()),
            F.lit(salt),
        ),
    )
    r_replicated = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return l_salted.join(r_replicated, [*keys, "__salt"], how).drop("__salt")
