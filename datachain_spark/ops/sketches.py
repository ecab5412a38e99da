"""Mergeable cardinality + heavy-hitters sketches for corpus monitoring
at 100 TB.

Wraps Spark's native Apache DataSketches HLL functions (public —
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``, JVM-side,
no UDFs) into a per-column distinct-value profile whose sketches MERGE:
compute a profile per shard / day / dataset version, store the binary
sketches (a few KB per column), and combine them later without ever
rescanning the data — the standard pattern for tracking corpus growth,
join-key cardinality, and dedup effectiveness across incremental loads.
No reference counterpart (its SQLite engine has no sketch surface).

Scale shape: ``hll_profile`` is ONE aggregation over the input (all
columns sketched in the same pass, map-side partial merge — the shuffle
carries one sketch per column per partition); ``hll_merge`` unions tiny
profile frames and re-aggregates per column. Estimates carry the usual
HLL error (~1.04/sqrt(2^lg_config_k): ~1.6% at the default lg_config_k=12).
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_profile(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    lg_config_k: int = 12,
) -> DataFrame:
    """One row per column: (column, approx_distinct, n_rows, sketch).
    ``sketch`` is the binary HLL state — store it next to the dataset
    version and merge later with :func:`hll_merge`. Columns default to
    every top-level column; types outside hll_sketch_agg's input set
    (int/bigint/string/binary) are sketched through their string cast
    (distinctness is preserved — the cast is injective for
    float/double/date/timestamp/decimal)."""
    if cols is None:
        cols = df.columns
    if not cols:
        raise ValueError("hll_profile: no columns to sketch")
    # hll_sketch_agg accepts ONLY these input types (Spark 4.1 rejects
    # float/double/smallint/tinyint with DATATYPE_MISMATCH) — everything
    # else goes through the string cast
    sketchable = {"string", "int", "bigint", "binary"}
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    # refs are backtick-quoted and aliases index-based so legal column
    # names containing dots don't parse as struct-field access
    for i, c in enumerate(cols):
        ref = F.col(f"`{c}`")
        src = ref if dtypes.get(c) in sketchable else ref.cast("string")
        aggs.append(F.hll_sketch_agg(src, F.lit(lg_config_k)).alias(f"__sk_{i}"))
    row = df.agg(*aggs)
    # melt the single agg row via explode — ONE aggregation branch in the
    # plan (a per-column union would plan the agg once per column)
    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.hll_sketch_estimate(F.col(f"__sk_{i}")).alias("approx_distinct"),
            F.col("__n").alias("n_rows"),
            F.col(f"__sk_{i}").alias("sketch"),
        )
        for i, c in enumerate(cols)
    ]
    return row.select(F.explode(F.array(*entries)).alias("p")).select("p.*")


def topk_profile(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    max_items_tracked: int = 10000,
) -> DataFrame:
    """Mergeable heavy-hitters profile: one row per column with the
    Spark-native ``approx_top_k`` sketch state (DataSketches frequent-items
    family) — the value-frequency companion to :func:`hll_profile` for
    corpus monitoring (dominant languages/domains/sources per shard,
    skewed join keys, label drift across versions).

    ONE aggregation over the input (every column sketched in the same
    pass, map-side partial merge); the shuffle carries one
    ``max_items_tracked``-bounded state per column per partition. Every
    column is sketched through its STRING cast so all states share one
    struct type — profiles of heterogeneous tables union and merge
    (items come back as strings; a profiling op reports, it doesn't
    join). Store the tiny frame per shard/day/version and combine later
    with :func:`topk_merge` — no rescan. Estimated counts are exact for
    any item that stays within the tracked set on every merged shard."""
    if cols is None:
        cols = df.columns
    if not cols:
        raise ValueError("topk_profile: no columns to sketch")
    if max_items_tracked < 1:
        raise ValueError("topk_profile: max_items_tracked must be >= 1")
    m = int(max_items_tracked)
    aggs = [F.count(F.lit(1)).alias("__n")]
    # index-based aliases: dotted column names must not round-trip through
    # F.col (which would parse them as struct-field access)
    for i, c in enumerate(cols):
        aggs.append(
            F.expr(
                f"approx_top_k_accumulate(cast(`{c}` as string), {m})"
            ).alias(f"__st_{i}")
        )
    row = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            F.col(f"__st_{i}").alias("state"),
        )
        for i, c in enumerate(cols)
    ]
    return row.select(F.explode(F.array(*entries)).alias("p")).select("p.*")


def topk_merge(
    profiles: Sequence[DataFrame], max_items_tracked: int = 10000
) -> DataFrame:
    """Combine :func:`topk_profile` frames (shards, days, dataset
    versions) per column without rescanning any source data."""
    if not profiles:
        raise ValueError("topk_merge: profiles must be non-empty")
    m = int(max_items_tracked)
    allp = reduce(lambda a, b: a.unionAll(b), list(profiles))
    return allp.groupBy("column").agg(
        F.expr(f"approx_top_k_combine(state, {m})").alias("state"),
        F.sum("n_rows").alias("n_rows"),
    ).select("column", "n_rows", "state")


def topk_estimate(profile: DataFrame, k: int = 20) -> DataFrame:
    """Materialize a profile's top-``k`` items per column:
    ``(column, rank, item, est_count)`` — rank 0 is the most frequent."""
    if k < 1:
        raise ValueError("topk_estimate: k must be >= 1")
    return (
        profile.select(
            "column",
            F.posexplode(F.expr(f"approx_top_k_estimate(state, {int(k)})")).alias(
                "rank", "__e"
            ),
        )
        .select("column", "rank", F.col("__e.item").alias("item"),
                F.col("__e.count").alias("est_count"))
    )


def hll_by_group(
    df: DataFrame,
    group_cols: Union[str, Sequence[str]],
    value_col: str,
    lg_config_k: int = 12,
) -> DataFrame:
    """Per-GROUP mergeable distinct sketches: one row per group with
    ``(group_cols..., approx_distinct, n_rows, sketch)`` — the
    incremental form of "distinct users per day / distinct n-grams per
    source" where exact count_distinct would need re-reading history on
    every refresh. Store the sketch column next to the rollup and fold
    new shards in with :func:`hll_merge_groups`; estimates never rescan
    old data. One groupBy, map-side combined; the per-group state is one
    2^lg_k-register sketch.

    Types outside hll_sketch_agg's input set (int/bigint/string/binary)
    sketch through their string cast (injective — same convention as
    :func:`hll_profile`)."""
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    dtypes = dict(df.dtypes)
    ref = F.col(f"`{value_col}`")
    src = (
        ref
        if dtypes.get(value_col) in {"string", "int", "bigint", "binary"}
        else ref.cast("string")
    )
    return (
        df.groupBy(*[F.col(f"`{k}`") for k in keys])
        .agg(
            F.hll_sketch_agg(src, F.lit(lg_config_k)).alias("sketch"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            *keys,
            F.hll_sketch_estimate(F.col("sketch")).alias("approx_distinct"),
            "n_rows",
            "sketch",
        )
    )


def hll_merge_groups(
    profiles: Sequence[DataFrame],
    group_cols: Union[str, Sequence[str]],
) -> DataFrame:
    """Union per-group sketch tables from :func:`hll_by_group` (shards,
    days, dataset versions) into one profile per group — registers merge
    losslessly and counts sum; the ESTIMATE can differ by a hair from a
    direct sketch of the union (the DataSketches union path drops the
    HIP estimator) while staying inside the configured error bound.
    History is never rescanned.
    ``allowDifferentLgConfigK`` permits mixed precisions (result
    downgrades to the coarsest)."""
    if not profiles:
        raise ValueError("hll_merge_groups: profiles must be non-empty")
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    allp = reduce(lambda a, b: a.unionByName(b), list(profiles))
    return (
        allp.groupBy(*keys)
        .agg(
            F.hll_union_agg(F.col("sketch"), F.lit(True)).alias("sketch"),
            F.sum("n_rows").alias("n_rows"),
        )
        .select(
            *keys,
            F.hll_sketch_estimate(F.col("sketch")).alias("approx_distinct"),
            "n_rows",
            "sketch",
        )
    )


def hll_merge(profiles: Sequence[DataFrame]) -> DataFrame:
    """Combine profiles from :func:`hll_profile` (different shards, days,
    dataset versions) into one: per column, the union sketch and its
    estimate — no source data rescanned. ``allowDifferentLgConfigK`` is on
    so profiles sketched at different precisions still merge (the result
    downgrades to the coarsest)."""
    if not profiles:
        raise ValueError("hll_merge: profiles must be non-empty")
    allp = reduce(lambda a, b: a.unionAll(b), list(profiles))
    return (
        allp.groupBy("column")
        .agg(
            F.hll_union_agg(F.col("sketch"), F.lit(True)).alias("sketch"),
            F.sum("n_rows").alias("n_rows"),
        )
        .select(
            "column",
            F.hll_sketch_estimate(F.col("sketch")).alias("approx_distinct"),
            "n_rows",
            "sketch",
        )
    )


def histogram(
    df: DataFrame,
    col: str,
    bins: int = 20,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
) -> DataFrame:
    """Exact equi-width histogram of a numeric column:
    ``(bin, lo_edge, hi_edge, count)`` — every bin present (empty ones
    with count 0), values == hi land in the last bin, NULLs ignored.

    The distribution-profiling companion to the sketches: token-count /
    score / length distributions per corpus version. Bounds default to
    the column's min/max computed IN-PLAN (a 1-row broadcast cross join,
    the q22 scalar pattern — no driver round-trip); pass ``lo``/``hi``
    to pin the axes across versions so histograms stay comparable.
    ONE aggregation over the data + a broadcast join against the
    ``bins``-row axis frame. Degenerate case lo == hi: everything in
    bin 0.
    """
    if bins < 1:
        raise ValueError("histogram: bins must be >= 1")
    x = F.col(col).cast("double")
    # non-finite values poison the bounds (max(NaN) = NaN -> every bin
    # width NaN -> everything collapses into bin 0 with NaN edges) and
    # would silently count into bin 0 under pinned bounds — dropped like
    # NULLs
    src = df.select(x.alias("__x")).filter(
        F.col("__x").isNotNull()
        & ~F.isnan("__x")
        & (F.abs("__x") != F.lit(float("inf")))
    )
    if lo is None or hi is None:
        # 1-row in-plan bounds (NULL edges on empty input — counts stay 0)
        glob = src.agg(F.min("__x").alias("__l"), F.max("__x").alias("__h"))
        binned = src.crossJoin(F.broadcast(glob))
    else:
        glob = df.sparkSession.range(1).select(
            F.lit(float(lo)).alias("__l"), F.lit(float(hi)).alias("__h")
        )
        binned = src.crossJoin(F.broadcast(glob))
    w = (F.col("__h") - F.col("__l")) / F.lit(float(bins))
    # clamp: with pinned lo/hi, out-of-range values count into the edge
    # bins rather than silently vanishing
    b = F.when(w > 0, F.greatest(F.least(
        F.floor((F.col("__x") - F.col("__l")) / w).cast("int"), F.lit(bins - 1)
    ), F.lit(0))).otherwise(F.lit(0))
    counts = binned.select(b.alias("bin")).groupBy("bin").agg(
        F.count(F.lit(1)).alias("count")
    )
    axis = df.sparkSession.range(bins).select(F.col("id").cast("int").alias("bin"))
    return (
        axis.crossJoin(F.broadcast(glob))
        .join(F.broadcast(counts), "bin", "left")
        .select(
            "bin",
            (F.col("__l") + (F.col("__h") - F.col("__l")) / F.lit(float(bins))
             * F.col("bin")).alias("lo_edge"),
            (F.col("__l") + (F.col("__h") - F.col("__l")) / F.lit(float(bins))
             * (F.col("bin") + 1)).alias("hi_edge"),
            F.coalesce(F.col("count"), F.lit(0)).alias("count"),
        )
        .orderBy("bin")
    )


def skew_report(
    df: DataFrame,
    key_cols: Union[str, Sequence[str]],
    top_n: int = 20,
) -> DataFrame:
    """Heavy-hitter diagnosis for a prospective join/groupBy key: the
    ``top_n`` heaviest key values with their row counts, share of the
    table, and ratio vs the mean key size — the pre-flight check that
    decides whether a key needs salting (``salted_group_by``) or an AQE
    skew-join before a 100-TB shuffle is launched.

    ONE groupBy on the key (exact counts — the same shuffle the real join
    would pay, at diagnosis time instead of failure time) + a 1-row
    broadcast of the totals; TakeOrderedAndProject caps the output at
    ``top_n`` rows. Output: (key cols..., key_rows, share, skew_ratio)
    ordered heaviest-first. ``skew_ratio`` ~ 1 means uniform; a key whose
    ratio is k needs ~k-way salting to level its partition.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if top_n < 1:
        raise ValueError("skew_report: top_n must be >= 1")
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("key_rows"))
    totals = counts.agg(
        F.sum("key_rows").alias("__total"),
        F.avg("key_rows").alias("__mean"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *keys,
            F.col("key_rows"),
            (F.col("key_rows") / F.col("__total")).alias("share"),
            (F.col("key_rows") / F.col("__mean")).alias("skew_ratio"),
        )
        .orderBy(F.desc("key_rows"), *keys)
        .limit(top_n)
    )


def skew_summary(
    df: DataFrame,
    key_cols: Union[str, Sequence[str]],
) -> DataFrame:
    """One-row key-distribution summary: n_rows, n_keys, max/avg key size
    and the max/avg skew ratio. The scalar companion to
    :func:`skew_report` for dashboards and promotion gates."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("key_rows"))
    return counts.agg(
        F.sum("key_rows").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("key_rows").cast("long").alias("max_key_rows"),
        F.avg("key_rows").alias("avg_key_rows"),
        (F.max("key_rows") / F.avg("key_rows")).alias("max_skew_ratio"),
    )


def group_quantiles(
    df: DataFrame,
    group_cols,
    value_col: str,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
    out_col: str = "value",
) -> DataFrame:
    """Exact interpolated per-group percentiles of one column: one row per
    (group, q). ONE aggregation keyed on the groups (Spark's percentile()
    sorts within the aggregation buffer — no global sort, no window), then
    an in-plan unpivot of the quantile array.

    Uses the linear-interpolation definition Spark's percentile() and
    DuckDB's quantile_cont share, so results hash-match cross-engine
    (the perplexity_buckets precedent). NULL values are ignored by the
    aggregate; an all-NULL group emits NULL quantile values.
    """
    qs = list(quantiles)
    if not qs or any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError("group_quantiles: quantiles must be in [0, 1]")
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    v = F.col(value_col).cast("double")
    agg = df.groupBy(*groups).agg(
        F.percentile(v, F.array(*[F.lit(float(q)) for q in qs])).alias("__qv"),
        # count the CAST expression so n_values matches the population the
        # quantiles actually describe (raw values that cast to NULL drop
        # from both)
        F.count(v).alias("n_values"),
    )
    pairs = []
    for i, q in enumerate(qs):
        pairs += [F.lit(float(q)), F.col("__qv").getItem(i)]
    return agg.select(
        *groups, "n_values",
        F.stack(F.lit(len(qs)), *pairs).alias("q", out_col),
    )


def sketch_quantiles(
    df: DataFrame,
    group_cols,
    value_col: str,
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
    accuracy: int = 10_000,
    out_col: str = "value",
) -> DataFrame:
    """APPROXIMATE per-group percentiles — the 100-TB companion to
    :func:`group_quantiles`: one row per (group, q) with the sketch
    estimate. Wraps Spark's native ``approx_percentile`` (the
    Greenwald-Khanna quantile summary, JVM-side, map-side mergeable — no
    UDF, no sort, no window): rank error is bounded by ``n / accuracy``,
    memory by ``O(accuracy · log n)`` per group regardless of group size,
    which is what makes percentile profiles of a trillion-row column
    feasible where the exact aggregate's percentile() buffer is not.

    The estimate is an actual element of the group (GK returns data
    points, not interpolations), so exact estimates are NOT hash-
    comparable to quantile_cont oracles — verify with
    :func:`quantile_rank_check` (the HLL within-3-sigma precedent:
    exact ranks bound the estimate in-plan).
    """
    qs = list(quantiles)
    if not qs or any(not 0.0 <= q <= 1.0 for q in qs):
        raise ValueError("sketch_quantiles: quantiles must be in [0, 1]")
    if accuracy < 1:
        raise ValueError("sketch_quantiles: accuracy must be >= 1")
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    v = F.col(value_col).cast("double")
    agg = df.groupBy(*groups).agg(
        F.approx_percentile(
            v, F.array(*[F.lit(float(q)) for q in qs]), F.lit(int(accuracy))
        ).alias("__qv"),
        F.count(v).alias("n_values"),
    )
    pairs = []
    for i, q in enumerate(qs):
        pairs += [F.lit(float(q)), F.col("__qv").getItem(i)]
    return agg.select(
        *groups, "n_values",
        F.stack(F.lit(len(qs)), *pairs).alias("q", out_col),
    )


def quantile_rank_check(
    df: DataFrame,
    estimates: DataFrame,
    group_cols,
    value_col: str,
    accuracy: int = 10_000,
    est_col: str = "value",
) -> DataFrame:
    """Verify :func:`sketch_quantiles` output against its GK guarantee
    using EXACT ranks computed in-plan: for every (group, q, estimate),
    the true rank interval of the estimate — [count(v < est),
    count(v <= est)], an interval because duplicates make rank ambiguous
    — must intersect ``q·n ± (n/accuracy + 1)``. Adds ``lo_rank`` /
    ``hi_rank`` / ``rank_ok``.

    Shape: the estimate frame is #groups × #quantiles rows — broadcast
    against the data, conditional-count aggregation back to that size.
    The corpus is scanned once more but never shuffled on anything wider
    than the group key.
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    v = F.col(value_col).cast("double")
    probe = estimates.select(
        *groups, "q", "n_values", F.col(est_col).alias("__est")
    )
    joined = df.select(*groups, v.alias("__v")).filter(
        F.col("__v").isNotNull()
    ).join(F.broadcast(probe), groups)
    ranked = joined.groupBy(*groups, "q", "n_values", "__est").agg(
        F.sum(F.when(F.col("__v") < F.col("__est"), 1).otherwise(0))
        .alias("lo_rank"),
        F.sum(F.when(F.col("__v") <= F.col("__est"), 1).otherwise(0))
        .alias("hi_rank"),
    )
    tol = F.col("n_values") / F.lit(float(accuracy)) + F.lit(1.0)
    target = F.col("q") * F.col("n_values")
    return ranked.select(
        *groups, "q", "n_values",
        F.col("__est").alias(est_col),
        "lo_rank", "hi_rank",
        ((target <= F.col("hi_rank") + tol)
         & (target >= F.col("lo_rank") - tol)).alias("rank_ok"),
    )


def flag_outliers(
    df: DataFrame,
    value_col: str,
    group_cols=None,
    k: float = 1.5,
    method: str = "iqr",
    out_col: str = "is_outlier",
    clamp_col: Optional[str] = None,
) -> DataFrame:
    """Tag rows whose ``value_col`` falls outside the per-group fence:
    Tukey ``iqr`` (default — [q1 - k·iqr, q3 + k·iqr], robust to the very
    outliers it hunts), ``zscore`` (mean ± k·σ), or ``mad`` (median ±
    k·1.4826·MAD — the scaled median-absolute-deviation fence, the most
    outlier-resistant of the three; 1.4826 ≈ 1/Φ⁻¹(0.75) makes MAD a
    consistent σ estimator on normal data, so ``k`` reads in sigmas).
    NULL values get NULL
    flags. Adds ``out_col`` plus the two fence columns (``fence_lo``/
    ``fence_hi``) so the caller can report or clamp, not just drop;
    ``clamp_col`` additionally emits the winsorized value (outliers
    pinned to the nearest fence, NULLs preserved) as a double column.

    Shape: one #groups-row aggregation broadcast-joined back — the corpus
    itself never shuffles. The iqr fences use the shared interpolated
    percentile definition, so the whole operator is cross-engine
    hash-verifiable; zscore fences are fold-order floating sums
    (production-fine, but the oracle covers the iqr path).
    """
    if method not in ("iqr", "zscore", "mad"):
        raise ValueError(
            "flag_outliers: method must be 'iqr', 'zscore' or 'mad'"
        )
    if k <= 0:
        raise ValueError("flag_outliers: k must be positive")
    if clamp_col and clamp_col == value_col:
        raise ValueError("flag_outliers: clamp_col must differ from value_col")
    groups = (
        [] if group_cols is None
        else [group_cols] if isinstance(group_cols, str)
        else list(group_cols)
    )
    v = F.col(value_col).cast("double")
    if method == "iqr":
        stats = df.groupBy(*groups).agg(
            F.percentile(v, F.array(F.lit(0.25), F.lit(0.75))).alias("__q")
        ).select(
            *groups,
            (F.col("__q")[0] - F.lit(float(k)) * (F.col("__q")[1] - F.col("__q")[0])
             ).alias("fence_lo"),
            (F.col("__q")[1] + F.lit(float(k)) * (F.col("__q")[1] - F.col("__q")[0])
             ).alias("fence_hi"),
        )
    elif method == "mad":
        from .common import broadcast_group_join as _bgj

        # two passes: per-group median, then the median absolute
        # deviation around it — both #groups-row aggregates, the corpus
        # shuffles on the (tiny) group key only
        med = df.groupBy(*groups).agg(
            F.percentile(v, F.lit(0.5)).alias("__med")
        )
        dev = _bgj(df, groups, med)
        scaled = F.lit(float(k)) * F.lit(1.4826)
        stats = dev.groupBy(*groups).agg(
            F.max("__med").alias("__med"),  # constant within the group
            F.percentile(F.abs(v - F.col("__med")), F.lit(0.5))
            .alias("__mad"),
        ).select(
            *groups,
            (F.col("__med") - scaled * F.col("__mad")).alias("fence_lo"),
            (F.col("__med") + scaled * F.col("__mad")).alias("fence_hi"),
        )
    else:
        stats = df.groupBy(*groups).agg(
            F.avg(v).alias("__m"), F.stddev(v).alias("__s")
        ).select(
            *groups,
            (F.col("__m") - F.lit(float(k)) * F.col("__s")).alias("fence_lo"),
            (F.col("__m") + F.lit(float(k)) * F.col("__s")).alias("fence_hi"),
        )
    from .common import broadcast_group_join

    # null-safe join-back: NULL group values form their own group (the
    # shared convention — see ops/common.py)
    joined = broadcast_group_join(df, groups, stats)
    flag = F.when(
        v.isNull(), F.lit(None).cast("boolean")
    ).otherwise((v < F.col("fence_lo")) | (v > F.col("fence_hi")))
    out = joined.withColumn(out_col, flag)
    if clamp_col:
        out = out.withColumn(
            clamp_col,
            F.when(
                v.isNotNull(),
                F.least(F.greatest(v, F.col("fence_lo")), F.col("fence_hi")),
            ),
        )
    return out


def standardize(
    df: DataFrame,
    cols: Sequence[str],
    group_cols=None,
    method: str = "zscore",
    suffix: str = "_scaled",
) -> DataFrame:
    """Feature scaling for training-data prep: append ``<col><suffix>``
    columns scaled per group (or globally) by one of

    - ``zscore``:  (x - mean) / stddev        (unit variance)
    - ``minmax``:  (x - min) / (max - min)    ([0, 1])
    - ``robust``:  (x - median) / IQR         (outlier-resistant — the
      scikit-learn RobustScaler convention)

    Degenerate groups (zero stddev / zero range / zero IQR) yield NULL
    scaled values rather than infinities (``try_divide``); NULL inputs
    stay NULL. Column names with dots are handled (backtick refs).

    Shape: ONE #groups-row aggregation computes every column's stats in
    the same pass and broadcasts back through the null-safe group join —
    the corpus scans once and never wide-shuffles. zscore uses Welford-
    based stddev (fold-order floating sums: production-fine; the oracle
    covers minmax/robust exactly and zscore at rounded precision).
    """
    if method not in ("zscore", "minmax", "robust"):
        raise ValueError(
            "standardize: method must be 'zscore', 'minmax' or 'robust'"
        )
    cols = list(cols)
    if not cols:
        raise ValueError("standardize: cols must be non-empty")
    groups = (
        [] if group_cols is None
        else [group_cols] if isinstance(group_cols, str)
        else list(group_cols)
    )
    aggs = []
    for i, c in enumerate(cols):
        v = F.col(f"`{c}`").cast("double")
        if method == "zscore":
            aggs += [F.avg(v).alias(f"__c{i}"), F.stddev(v).alias(f"__s{i}")]
        elif method == "minmax":
            aggs += [
                F.min(v).alias(f"__c{i}"),
                (F.max(v) - F.min(v)).alias(f"__s{i}"),
            ]
        else:
            q = F.percentile(v, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
            aggs += [
                q.getItem(1).alias(f"__c{i}"),
                (q.getItem(2) - q.getItem(0)).alias(f"__s{i}"),
            ]
    stats = df.groupBy(*groups).agg(*aggs)

    from .common import broadcast_group_join

    joined = broadcast_group_join(df, groups, stats)
    out = joined
    for i, c in enumerate(cols):
        v = F.col(f"`{c}`").cast("double")
        scale = F.when(F.col(f"__s{i}") != 0, F.col(f"__s{i}"))
        out = out.withColumn(
            f"{c}{suffix}", F.try_divide(v - F.col(f"__c{i}"), scale)
        )
    return out.drop(*[f"__c{i}" for i in range(len(cols))],
                    *[f"__s{i}" for i in range(len(cols))])


# ---------------------------------------------------------------------------
# Persistable mergeable snapshot profiles (r08 — VERDICT r07 task 5):
# per-group sketch STATE saved as ordinary columns of a dataset version —
# HLL registers (binary), fixed-bin histogram counts (array<long>), and the
# linear moments — merged across versions/snapshots without rescanning.
# Spark exposes no partial-state export for approx_percentile's GK summary,
# so the mergeable QUANTILE state is the fixed-bin histogram: bin counts
# merge EXACTLY (vector add), and a quantile read off the merged histogram
# carries a deterministic <= bin-width error — the trade the GK sketch makes
# with rank error, made storable. approx_percentile/sketch_quantiles stays
# the in-plan single-pass path.
# ---------------------------------------------------------------------------


def profile_sketch(
    df: DataFrame,
    group_cols: Union[str, Sequence[str]],
    value_col: Optional[str] = None,
    distinct_col: Optional[str] = None,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
    bins: int = 64,
    lg_config_k: int = 12,
) -> DataFrame:
    """Per-group MERGEABLE profile state, ONE aggregation (map-side
    combined; the per-group state is one HLL sketch + ``bins`` longs):

    ``(group_cols..., n_rows[, n_value, sum_x, min_x, max_x, hist]
    [, sketch, approx_distinct])``

    - ``value_col`` adds exact linear moments plus a FIXED-EDGE histogram
      over ``[lo, hi)`` (required with value_col, and they must be the
      same for every snapshot that will merge — fixed edges are what
      make bin counts add exactly). Out-of-range values clamp into the
      edge bins; NULLs count in ``n_rows`` but not ``n_value``/``hist``.
    - ``distinct_col`` adds the lossless-merge HLL register blob
      (:func:`hll_by_group` convention — non-(int/bigint/string/binary)
      types sketch through their string cast).

    Save the output as a dataset version per snapshot/shard/day; fold
    with :func:`merge_profile_sketches`; read quantiles off the merged
    histogram with :func:`histogram_quantiles`. 100-TB shape: profiling
    a new 1-day increment scans ONLY that increment — the historical
    profile is a few KB per group."""
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if value_col is None and distinct_col is None:
        raise ValueError(
            "profile_sketch: need value_col and/or distinct_col"
        )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    if value_col is not None:
        if lo is None or hi is None or not (float(lo) < float(hi)):
            raise ValueError(
                "profile_sketch: value_col requires explicit lo < hi "
                "(fixed histogram edges are the merge contract)"
            )
        if not 1 <= int(bins) <= 4096:
            raise ValueError("profile_sketch: bins must be in [1, 4096]")
        lo_f, hi_f, nb = float(lo), float(hi), int(bins)
        width = (hi_f - lo_f) / nb
        x = F.col(value_col).cast("double")
        b = F.least(
            F.lit(nb - 1),
            F.greatest(
                F.lit(0),
                F.floor((x - F.lit(lo_f)) / F.lit(width)).cast("int"),
            ),
        )
        aggs += [
            F.sum(F.when(x.isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_value"),
            F.sum(x).alias("sum_x"),
            F.min(x).alias("min_x"),
            F.max(x).alias("max_x"),
            F.array(
                *[
                    F.sum(
                        F.when(x.isNotNull() & (b == i), 1).otherwise(0)
                    ).cast("long")
                    for i in range(nb)
                ]
            ).alias("hist"),
        ]
    if distinct_col is not None:
        dtypes = dict(df.dtypes)
        ref = F.col(f"`{distinct_col}`")
        src = (
            ref
            if dtypes.get(distinct_col)
            in {"string", "int", "bigint", "binary"}
            else ref.cast("string")
        )
        aggs.append(
            F.hll_sketch_agg(src, F.lit(int(lg_config_k))).alias("sketch")
        )
    out = df.groupBy(*[F.col(f"`{k}`") for k in keys]).agg(*aggs)
    if distinct_col is not None:
        out = out.withColumn(
            "approx_distinct", F.hll_sketch_estimate(F.col("sketch"))
        )
    return out


def merge_profile_sketches(
    profiles: Sequence[DataFrame],
    group_cols: Union[str, Sequence[str]],
) -> DataFrame:
    """Fold :func:`profile_sketch` snapshots into one profile per group —
    counts/sums/moments add, histogram bin vectors add element-wise
    (EXACT — same result as profiling the union), HLL registers union
    losslessly (estimate within the configured bound; the
    :func:`hll_merge_groups` caveat on the dropped HIP estimator
    applies). History is never rescanned; the merge input is a few KB
    per (group, snapshot)."""
    if not profiles:
        raise ValueError("merge_profile_sketches: profiles must be non-empty")
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    allp = reduce(lambda a, b: a.unionByName(b), list(profiles))
    cols = set(allp.columns)
    aggs = [F.sum("n_rows").cast("long").alias("n_rows")]
    if "hist" in cols:
        aggs += [
            F.sum("n_value").cast("long").alias("n_value"),
            F.sum("sum_x").alias("sum_x"),
            F.min("min_x").alias("min_x"),
            F.max("max_x").alias("max_x"),
            # element-wise vector add over the (few) snapshot rows of the
            # group: collect the hist arrays, fold with zip_with — the
            # collect_list is bounded by #snapshots, not data size
            F.expr(
                "aggregate(collect_list(hist), "
                "array_repeat(CAST(0 AS BIGINT), size(first(hist))), "
                "(acc, h) -> zip_with(acc, h, (a, b) -> a + b))"
            ).alias("hist"),
        ]
    if "sketch" in cols:
        aggs.append(
            F.hll_union_agg(F.col("sketch"), F.lit(True)).alias("sketch")
        )
    out = allp.groupBy(*keys).agg(*aggs)
    if "sketch" in cols:
        out = out.withColumn(
            "approx_distinct", F.hll_sketch_estimate(F.col("sketch"))
        )
    return out


def histogram_quantiles(
    profile: DataFrame,
    group_cols: Union[str, Sequence[str]],
    qs: Sequence[float],
    lo: float,
    hi: float,
) -> DataFrame:
    """Quantile estimates off a (merged) :func:`profile_sketch` histogram:
    for each group and each q, the first bin whose cumulative count
    reaches q·n, linearly interpolated within the bin — deterministic
    error <= one bin width ((hi-lo)/bins). Output
    ``(group_cols..., q, estimate)``. Shape: posexplode to
    #groups x bins rows (bins is a constant — trivial at any scale),
    one cumulative window per group."""
    from pyspark.sql import Window

    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    qs = [float(q) for q in qs]
    if not qs or not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError("histogram_quantiles: each q must be in (0, 1]")
    lo_f, hi_f = float(lo), float(hi)
    rows = profile.select(
        *keys, F.posexplode("hist").alias("bin", "cnt"),
        F.size("hist").alias("__nb"),
    )
    w = Window.partitionBy(*keys).orderBy("bin")
    wt = Window.partitionBy(*keys)
    rows = rows.select(
        *keys, "bin", "cnt", "__nb",
        F.sum("cnt").over(w).alias("__cum"),
        F.sum("cnt").over(wt).alias("__n"),
    ).select(
        "*", F.explode(F.array(*[F.lit(q) for q in qs])).alias("q")
    )
    target = F.col("q") * F.col("__n")
    width = (F.lit(hi_f) - F.lit(lo_f)) / F.col("__nb")
    hit = rows.filter(F.col("__cum") >= target).withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy(*keys, "q").orderBy("bin")
        ),
    ).filter(F.col("__rn") == 1)
    est = F.lit(lo_f) + width * (
        F.col("bin")
        + (target - (F.col("__cum") - F.col("cnt"))) / F.col("cnt")
    )
    return hit.select(*keys, "q", est.alias("estimate"))
