"""Time-series feature operators over event streams: per-entity rolling
time-window aggregates and event-rate/gap profiling.

Spark-first shape: one shuffle on the partition key, then native window
functions with RANGE frames over epoch seconds — whole-stage codegen, no
Python. At 100 TB the cost is the single hash partition on the entity key
(the same partitioning every per-entity feature shares, so Catalyst reuses
the exchange across features computed together).

DuckDB's RANGE frames over an integer ORDER BY key share Spark's
semantics exactly (all rows whose key falls in [cur - w, cur], ties
included regardless of physical order), which makes every rolling feature
value-hash oracle-able (``rolling_events`` in ``__spark_entry__``).

No reference counterpart (spec addition for feature pipelines).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_METRICS = ("count", "sum", "avg", "min", "max")


def rolling_stats(
    df: DataFrame,
    partition_by: Union[str, Sequence[str]],
    time_col: str,
    value_col: str,
    window_seconds: int,
    metrics: Sequence[str] = _METRICS,
    prefix: Optional[str] = None,
) -> DataFrame:
    """Per-row trailing-window aggregates: for every event, the
    count/sum/avg/min/max of ``value_col`` over this entity's events in
    the preceding ``window_seconds`` (inclusive of the current row).

    Output adds one ``{prefix}_{metric}`` column per metric (prefix
    defaults to ``rolling{window_seconds}s``). NULL values count toward
    ``count`` (row presence) but are ignored by sum/avg/min/max — the
    standard SQL aggregate contract in both engines.
    """
    if window_seconds <= 0:
        raise ValueError("rolling_stats: window_seconds must be positive")
    bad = [m for m in metrics if m not in _METRICS]
    if bad:
        raise ValueError(f"rolling_stats: unsupported metrics {bad}")
    parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    pfx = prefix or f"rolling{window_seconds}s"
    epoch = F.unix_timestamp(F.col(time_col)).cast("long")
    w = (
        Window.partitionBy(*parts)
        .orderBy(epoch)
        .rangeBetween(-window_seconds, 0)
    )
    v = F.col(value_col)
    exprs: dict[str, Column] = {
        "count": F.count(F.lit(1)).over(w).cast("long"),
        "sum": F.sum(v).over(w),
        "avg": F.avg(v).over(w),
        "min": F.min(v).over(w),
        "max": F.max(v).over(w),
    }
    out = df
    for m in metrics:
        out = out.withColumn(f"{pfx}_{m}", exprs[m])
    return out


def event_gaps(
    df: DataFrame,
    partition_by: Union[str, Sequence[str]],
    time_col: str,
    gap_col: str = "gap_seconds",
    tiebreak: Union[str, Sequence[str], None] = None,
) -> DataFrame:
    """Seconds since this entity's previous event (NULL for the first).
    The inter-arrival signal burst/bot detection and sessionization
    thresholds are chosen from. ``tiebreak`` columns make the ordering
    among equal-timestamp events deterministic (lag, unlike a RANGE
    frame, depends on it)."""
    parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    ties = (
        [] if tiebreak is None
        else [tiebreak] if isinstance(tiebreak, str)
        else list(tiebreak)
    )
    epoch = F.unix_timestamp(F.col(time_col)).cast("long")
    w = Window.partitionBy(*parts).orderBy(epoch, *[F.col(t) for t in ties])
    return df.withColumn(gap_col, epoch - F.lag(epoch).over(w))


def resample_events(
    df: DataFrame,
    partition_by: Union[str, Sequence[str]],
    time_col: str,
    value_col: str,
    every_seconds: int,
    metrics: Sequence[str] = _METRICS,
    fill_gaps: bool = True,
) -> DataFrame:
    """Downsample events onto a regular per-entity time grid: one row per
    (entity, bucket) with the count/sum/avg/min/max of ``value_col`` in
    that bucket. ``fill_gaps=True`` emits EMPTY buckets too (count 0,
    other metrics NULL) between each entity's first and last event — the
    gap-filled grid downstream models expect (no silent missing steps).

    Shape: one (entity, bucket) aggregation; gap filling adds one
    #buckets-per-entity sequence explode from a per-entity min/max
    aggregate and a left join back on (entity, bucket) — grid size is the
    TIME RANGE over the step, independent of event volume, so the explode
    side stays tiny next to the data. No driver contact. NULL-timestamp
    events are excluded (they have no grid position) in both modes.
    """
    if every_seconds <= 0:
        raise ValueError("resample_events: every_seconds must be positive")
    bad = [m for m in metrics if m not in _METRICS]
    if bad:
        raise ValueError(f"resample_events: unsupported metrics {bad}")
    parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    # NULL timestamps have no bucket on the grid: exclude them explicitly
    # in BOTH modes (otherwise fill_gaps=False would emit a bucket=NULL row
    # while fill_gaps=True silently lost those events in the grid join)
    df = df.filter(F.col(time_col).isNotNull())
    epoch = F.unix_timestamp(F.col(time_col)).cast("long")
    bucket = (F.floor(epoch / every_seconds) * every_seconds).cast("long")
    v = F.col(value_col)
    aggs = []
    for m in metrics:
        if m == "count":
            aggs.append(F.count(v).alias("bucket_count"))
        else:
            aggs.append(getattr(F, m)(v).alias(f"bucket_{m}"))
    agg = df.withColumn("__bucket", bucket).groupBy(*parts, "__bucket").agg(*aggs)
    if not fill_gaps:
        return agg.withColumnRenamed("__bucket", "bucket")
    grid = (
        df.groupBy(*parts)
        .agg(
            (F.floor(F.min(epoch) / every_seconds) * every_seconds)
            .cast("long").alias("__lo"),
            (F.floor(F.max(epoch) / every_seconds) * every_seconds)
            .cast("long").alias("__hi"),
        )
        .select(
            *parts,
            F.explode(
                F.sequence("__lo", "__hi", F.lit(int(every_seconds)))
            ).alias("__bucket"),
        )
    )
    out = grid.join(agg, [*parts, "__bucket"], "left")
    if "count" in metrics:
        out = out.withColumn(
            "bucket_count", F.coalesce(F.col("bucket_count"), F.lit(0))
        )
    return out.withColumnRenamed("__bucket", "bucket")


def funnel(
    df: DataFrame,
    partition_by: Union[str, Sequence[str]],
    time_col: str,
    event_col: str,
    steps: Sequence[str],
    max_events_per_entity: Optional[int] = None,
) -> DataFrame:
    """Ordered funnel per entity: for each entity, the FIRST time each
    step fired at-or-after the previous step's first qualifying time
    (the view->cart->purchase conversion shape). Output: one row per
    entity with ``step{i}_ts`` epoch columns (NULL once the chain
    breaks) and ``steps_reached``.

    Shape: ONE groupBy on the entity collecting (ts, event) pairs, then a
    codegen higher-order fold over the time-sorted array — no self-joins,
    no k-pass scans (the classic SQL formulation needs one correlated
    subquery per step). Ties: an event at exactly the previous step's
    timestamp qualifies; a single event row can satisfy at most one step.
    ``steps`` must be distinct.

    The per-entity collected array is otherwise UNBOUNDED — one
    adversarial key (a bot firing millions of step events) concentrates
    its whole history in a single agg buffer. ``max_events_per_entity``
    bounds it: each entity keeps only its FIRST N qualifying events in
    (time, step-index) order (a spill-safe row_number window on the same
    entity key — the exchange is reused by the groupBy), the output
    gains a ``truncated`` flag marking entities that lost events, and a
    truncated entity's funnel is computed over the kept prefix (sound
    for funnels: steps fire on FIRST qualifying times, so a chain that
    completed within the prefix is unaffected; one that needed later
    events reports fewer steps — flagged, not silent).
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel: need at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel: steps must be distinct")
    parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    k = len(steps)
    epoch = F.unix_timestamp(F.col(time_col)).cast("long")
    step_arr = F.array(*[F.lit(s) for s in steps])
    # sort ties by STEP index (not event name): at equal timestamps the
    # fold must see earlier funnel steps first, so an equal-time
    # view->cart->buy chain completes — this makes the single-pass fold
    # equivalent to the k-pass min-with->= formulation the oracle runs,
    # independent of event arrival order
    si = F.array_position(step_arr, F.col(event_col))
    qualifying = df.filter(F.col(event_col).isin(steps))
    agg_cols = [
        F.sort_array(
            F.collect_list(F.struct(epoch.alias("ep"), si.alias("si"),
                                    F.col(event_col).alias("ev")))
        ).alias("__evs")
    ]
    if max_events_per_entity is not None:
        if max_events_per_entity < 1:
            raise ValueError("funnel: max_events_per_entity must be >= 1")
        wo = Window.partitionBy(*parts).orderBy(
            epoch.asc_nulls_last(), si.asc()
        )
        wc = Window.partitionBy(*parts)
        qualifying = (
            qualifying.withColumn("__rn", F.row_number().over(wo))
            .withColumn("__tot", F.count(F.lit(1)).over(wc))
            .filter(F.col("__rn") <= max_events_per_entity)
        )
        agg_cols.append(
            (F.max("__tot") > max_events_per_entity).alias("__trunc")
        )
    pairs = qualifying.groupBy(*parts).agg(*agg_cols)
    init = F.array(*[F.lit(None).cast("long") for _ in steps])

    def update(state, e):
        return F.transform(
            F.sequence(F.lit(1), F.lit(k)),
            lambda i: F.coalesce(
                F.element_at(state, i),
                F.when(
                    (e["ev"] == F.element_at(step_arr, i))
                    & ((i == 1) | F.element_at(state, i - 1).isNotNull()),
                    e["ep"],
                ),
            ),
        )

    fold_cols = [*parts, F.aggregate("__evs", init, update).alias("__st")]
    if max_events_per_entity is not None:
        fold_cols.append(F.col("__trunc"))
    folded = pairs.select(*fold_cols)
    sel = [*parts]
    for i, s in enumerate(steps):
        sel.append(F.element_at("__st", i + 1).alias(f"step{i + 1}_ts"))
    sel.append(
        F.size(F.filter("__st", lambda x: x.isNotNull())).alias("steps_reached")
    )
    if max_events_per_entity is not None:
        sel.append(F.col("__trunc").alias("truncated"))
    return folded.select(*sel)


def funnel_window(
    df: DataFrame,
    partition_by: Union[str, Sequence[str]],
    time_col: str,
    event_col: str,
    steps: Sequence[str],
    window_seconds: float,
    max_events_per_entity: Optional[int] = None,
) -> DataFrame:
    """SLIDING-window funnel (the ClickHouse windowFunnel semantics): per
    entity, the deepest step level reachable by ANY ordered chain
    step1 <= step2 <= ... whose last event falls within
    ``window_seconds`` of its OWN step-1 anchor — unlike :func:`funnel`,
    which anchors at the first step-1 occurrence, this re-anchors at
    every step-1 event, so a user who stalls once and converts later
    still counts. Output: one row per entity, ``(..., max_level)``.

    Shape: the same ONE entity groupBy + time-sorted codegen fold as
    :func:`funnel`; the fold state is k chain-START times (the classic
    windowFunnel DP — keep the LATEST anchor per level; a later anchor
    always leaves at least as much slack for the remaining steps, so the
    greedy fold is exact). Equal-timestamp ties process earlier steps
    first (an equal-time view->click->buy chain completes).
    ``max_events_per_entity`` bounds adversarial keys exactly as in
    :func:`funnel` (prefix truncation + ``truncated`` flag).
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel_window: need at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel_window: steps must be distinct")
    if window_seconds <= 0:
        raise ValueError("funnel_window: window_seconds must be positive")
    parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    k = len(steps)
    epoch = F.unix_timestamp(F.col(time_col)).cast("long")
    step_arr = F.array(*[F.lit(s) for s in steps])
    si = F.array_position(step_arr, F.col(event_col))
    qualifying = df.filter(F.col(event_col).isin(steps))
    agg_cols = [
        F.sort_array(
            F.collect_list(F.struct(epoch.alias("ep"), si.alias("si"),
                                    F.col(event_col).alias("ev")))
        ).alias("__evs")
    ]
    if max_events_per_entity is not None:
        if max_events_per_entity < 1:
            raise ValueError("funnel_window: max_events_per_entity must be >= 1")
        wo = Window.partitionBy(*parts).orderBy(epoch.asc_nulls_last(), si.asc())
        wc = Window.partitionBy(*parts)
        qualifying = (
            qualifying.withColumn("__rn", F.row_number().over(wo))
            .withColumn("__tot", F.count(F.lit(1)).over(wc))
            .filter(F.col("__rn") <= max_events_per_entity)
        )
        agg_cols.append(
            (F.max("__tot") > max_events_per_entity).alias("__trunc")
        )
    pairs = qualifying.groupBy(*parts).agg(*agg_cols)
    init = F.array(*[F.lit(None).cast("long") for _ in steps])
    wlit = F.lit(float(window_seconds))

    def update(state, e):
        # state[i] = LATEST chain-start time of any chain reaching level i
        return F.transform(
            F.sequence(F.lit(1), F.lit(k)),
            lambda i: F.when(
                (e["ev"] == F.element_at(step_arr, i)) & (i == 1),
                F.greatest(F.coalesce(F.element_at(state, i), e["ep"]), e["ep"]),
            ).when(
                (e["ev"] == F.element_at(step_arr, i))
                & (i > 1)
                & F.element_at(state, i - 1).isNotNull()
                & ((e["ep"] - F.element_at(state, i - 1)) <= wlit),
                F.greatest(
                    F.coalesce(
                        F.element_at(state, i), F.element_at(state, i - 1)
                    ),
                    F.element_at(state, i - 1),
                ),
            ).otherwise(F.element_at(state, i)),
        )

    fold_cols = [*parts, F.aggregate("__evs", init, update).alias("__st")]
    if max_events_per_entity is not None:
        fold_cols.append(F.col("__trunc"))
    folded = pairs.select(*fold_cols)
    sel = [*parts, F.size(
        F.filter("__st", lambda x: x.isNotNull())
    ).cast("int").alias("max_level")]
    if max_events_per_entity is not None:
        sel.append(F.col("__trunc").alias("truncated"))
    return folded.select(*sel)


def event_paths(
    df: DataFrame,
    partition_by: Union[str, Sequence[str]],
    time_col: str,
    event_col: str,
    max_steps: int = 10,
    sep: str = ">",
) -> DataFrame:
    """Corpus-wide event-path analysis: each entity's time-ordered
    sequence of event types (truncated to its FIRST ``max_steps``),
    counted across entities — "what journeys do users actually take",
    the input to drop-off and flow diagrams. Output:
    ``(path, n_entities)``, e.g. ``("view>click>purchase", 1234)``.

    Shape: the output depends ONLY on each entity's first ``max_steps``
    events, so a row_number window (same entity key — Spark reuses the
    hash partitioning for the following groupBy: one shuffle total)
    truncates every entity to that prefix BEFORE the collect; the agg
    buffer holds at most ``max_steps`` structs per entity no matter how
    adversarial the key (a 10^8-event bot costs one sorted window
    partition, never an unbounded collect buffer — r06 verdict #2).
    Ties at equal timestamps order by event name, so both engines build
    identical paths (NULL timestamps are excluded — no position).
    """
    if max_steps < 1:
        raise ValueError("event_paths: max_steps must be >= 1")
    parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    epoch = F.unix_timestamp(F.col(time_col)).cast("long")
    wo = Window.partitionBy(*parts).orderBy(
        epoch.asc(), F.col(event_col).asc()
    )
    bounded = (
        df.filter(F.col(time_col).isNotNull() & F.col(event_col).isNotNull())
        .withColumn("__rn", F.row_number().over(wo))
        .filter(F.col("__rn") <= max_steps)
    )
    per_entity = (
        bounded.groupBy(*parts)
        .agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                epoch.alias("ep"),
                                F.col(event_col).alias("ev"),
                            )
                        )
                    ),
                    lambda s: s["ev"],
                ),
            ).alias("path")
        )
    )
    return per_entity.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_entities")
    )


def event_transitions(
    df: DataFrame,
    partition_by: Union[str, Sequence[str]],
    time_col: str,
    event_col: str,
) -> DataFrame:
    """First-order transition counts of the event stream: for every
    consecutive (within-entity, time-ordered) event pair, one
    ``(from_event, to_event, n)`` row — the Markov/Sankey edge list that
    :func:`event_paths` aggregates into whole journeys. Entities with a
    single event contribute nothing; NULL timestamps are excluded.

    Shape: one lead() window on the entity key (ties order by event
    name, like event_paths) + one (from, to) count agg — two shuffles,
    the second over at most |event-types|² rows after map-side combine.
    """
    parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    epoch = F.unix_timestamp(F.col(time_col)).cast("long")
    w = Window.partitionBy(*parts).orderBy(
        F.col("__ep").asc(), F.col("__ev").asc()
    )
    pairs = (
        df.filter(F.col(time_col).isNotNull() & F.col(event_col).isNotNull())
        .select(*parts, epoch.alias("__ep"), F.col(event_col).alias("__ev"))
        .withColumn("__next", F.lead("__ev").over(w))
        .filter(F.col("__next").isNotNull())
    )
    return pairs.groupBy(
        F.col("__ev").alias("from_event"), F.col("__next").alias("to_event")
    ).agg(F.count(F.lit(1)).alias("n"))


def rolling_actives(
    df: DataFrame,
    entity_col: str,
    time_col: str,
    window_buckets: int = 7,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """EXACT trailing-window distinct actives — the DAU/WAU/MAU family:
    one row per time bucket with the number of distinct entities active
    in the ``window_buckets`` buckets ending there (window_buckets=1 =
    DAU, 7 = WAU, 30 = MAU at daily buckets).

    Distinct-over-a-sliding-window can't ride a plain window frame, and
    the naive per-window self-join re-scans the corpus once per bucket.
    The standard exact formulation instead: reduce to DISTINCT
    (entity, bucket) activity pairs (one shuffle — at most
    entities x active-days rows regardless of raw volume), explode each
    pair into the ``window_buckets`` windows it contributes to, and
    count distinct (entity, window) once. Cost scales with
    window_buckets x |activity pairs|, never with raw event volume —
    at 100 TB the pairs frame is millions, not trillions.

    Every bucket in ``[min_observed, max_observed]`` whose trailing
    window contains at least one active entity is reported — including
    interior gap buckets with no DIRECT activity (a day with zero events
    still has a non-zero trailing WAU if entities were active in the
    prior six: semi-joining the directly-active bucket set here would
    silently drop those rows — r07 advisor finding). A bucket absent
    from the output therefore truly has ``n_active = 0`` (possible only
    when a gap spans the whole window). NULL timestamps are excluded.
    """
    if window_buckets < 1:
        raise ValueError("rolling_actives: window_buckets must be >= 1")
    if bucket_seconds <= 0:
        raise ValueError("rolling_actives: bucket_seconds must be positive")
    epoch = F.unix_timestamp(F.col(time_col)).cast("long")
    bucket = F.floor(epoch / bucket_seconds).cast("long")
    pairs = (
        df.filter(F.col(time_col).isNotNull())
        .select(F.col(entity_col).alias("__e"), bucket.alias("__b"))
        .distinct()
    )
    contrib = pairs.select(
        "__e",
        F.explode(
            F.sequence(
                F.col("__b"), F.col("__b") + F.lit(window_buckets - 1)
            )
        ).alias("bucket"),
    ).distinct()
    # cap at the LAST observed bucket: the explode also reaches trailing
    # windows ending after the last event, which aren't real report rows
    # (1-row in-plan scalar, the q22 / histogram bounds pattern)
    glob = pairs.agg(F.max("__b").alias("__mx"))
    return (
        contrib.crossJoin(F.broadcast(glob))
        .filter(F.col("bucket") <= F.col("__mx"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def cohort_retention(
    df: DataFrame,
    partition_by: Union[str, Sequence[str]],
    time_col: str,
    period_seconds: int,
    max_offset: Optional[int] = None,
    as_rate: bool = False,
) -> DataFrame:
    """Cohort retention triangle: entities cohorted by their FIRST-event
    period; one row per (cohort, period_offset) with the number of
    entities active that many periods later (offset 0 = cohort size).
    ``as_rate=True`` adds ``cohort_size`` and ``retention_rate``
    (n_entities / cohort size — the normalized triangle product teams
    chart; one cohort-keyed window, offset-0 rows always exist because
    the cohort is defined by its first event).

    Shape: one (entity, period) distinct aggregation, one per-entity min
    (window over the same partitioning — the exchange is reused), one
    (cohort, offset) count — entity-keyed shuffles only, no joins. Epochs
    floor to ``period_seconds`` buckets (weeks = 604800, days = 86400).
    """
    if period_seconds <= 0:
        raise ValueError("cohort_retention: period_seconds must be positive")
    parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    epoch = F.unix_timestamp(F.col(time_col)).cast("long")
    period = F.floor(epoch / period_seconds).cast("long")
    active = (
        df.filter(F.col(time_col).isNotNull())
        .select(*parts, period.alias("__p"))
        .distinct()
    )
    w = Window.partitionBy(*parts)
    cohorted = active.withColumn("__cohort", F.min("__p").over(w))
    out = (
        cohorted.withColumn("__offset", (F.col("__p") - F.col("__cohort")).cast("int"))
        .groupBy(F.col("__cohort").alias("cohort"),
                 F.col("__offset").alias("period_offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_entities"))
    )
    if max_offset is not None:
        out = out.filter(F.col("period_offset") <= max_offset)
    if as_rate:
        w0 = Window.partitionBy("cohort")
        size = F.max(
            F.when(F.col("period_offset") == 0, F.col("n_entities"))
        ).over(w0)
        out = out.withColumn("cohort_size", size).withColumn(
            "retention_rate",
            F.col("n_entities") / F.col("cohort_size"),
        )
    return out
