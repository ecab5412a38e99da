"""Dataset drift detection: compare column distributions between two
snapshots (reference vs current) — the monitoring pass a production
pipeline runs before promoting a new corpus version.

No reference counterpart (spec addition). Numeric columns compare on
shared equal-width histograms (axes pinned by the REFERENCE snapshot so
bins mean the same thing on both sides; current-side outliers clamp into
the edge bins rather than vanishing); categorical columns compare on the
reference's top-K categories plus an __other__ bucket. Divergence is PSI
(population stability index, the industry-standard score with its 0.1 /
0.2 watch/alert thresholds) and Jensen-Shannon (bounded, symmetric),
both epsilon-smoothed so empty bins never divide by zero.

Scale shape: ALL numeric columns fold into one ``stack`` projection per
side — 2 scans of each snapshot total (one for reference bounds, one per
side for counts), each aggregating map-side into (column, bin) partials;
the axis/bounds frames are C-row / C*bins-row broadcasts. Nothing but
per-column summaries ever reaches the driver. NULLs are excluded from
the histograms but reported as their own fraction (a NULL-rate jump is
drift too).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPS = 1e-6


def _bt(name: str) -> str:
    """Backtick-quote an identifier so arbitrary column names ('a-b',
    'my col', reserved words) read as COLUMNS, never as expressions."""
    escaped = name.replace("`", "``")
    return f"`{escaped}`"


def _stack(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    # doubled single quotes in the LABEL literal (the identifier side is
    # backtick-escaped by _bt) — a column named a'b must not break the
    # generated stack() expression (expectations.check does the same)
    pairs = ", ".join(
        f"'{c.replace(chr(39), chr(39) * 2)}', CAST({_bt(c)} AS DOUBLE)"
        for c in cols
    )
    return df.selectExpr(f"stack({len(cols)}, {pairs}) AS (col, x)")


def _finite(x):
    return (
        x.isNotNull() & ~F.isnan(x) & (F.abs(x) != F.lit(float("inf")))
    )


def drift_histograms(
    ref: DataFrame,
    cur: DataFrame,
    cols: Sequence[str],
    bins: int = 10,
) -> DataFrame:
    """Shared-axis histograms for every column on both sides:
    (col, bin, lo_edge, hi_edge, ref_count, cur_count, ref_frac,
    cur_frac). Bin axes derive from the reference's min/max IN-PLAN (a
    C-row broadcast, no driver round-trip); current values outside the
    reference range clamp into the edge bins. Every (col, bin) cell is
    present, empty ones with zero counts. Fractions are over each side's
    FINITE rows (NULL/NaN/Inf excluded — see ``drift_report`` for their
    rates)."""
    if not cols:
        raise ValueError("drift_histograms: need at least one column")
    if bins < 1:
        raise ValueError("drift_histograms: bins must be >= 1")
    sref, scur = _stack(ref, cols), _stack(cur, cols)
    fref = sref.filter(_finite(F.col("x")))
    fcur = scur.filter(_finite(F.col("x")))
    bounds = fref.groupBy("col").agg(
        F.min("x").alias("__lo"), F.max("x").alias("__hi")
    )

    def binned(side: DataFrame, name: str) -> DataFrame:
        width = (F.col("__hi") - F.col("__lo")) / F.lit(bins)
        # clamp the VALUE into [lo, hi] before flooring: a far outlier's
        # raw bin index overflows int32/int64 (ANSI abort, or a wrap into
        # the WRONG edge bin without ANSI); after the clamp the index is
        # provably in [0, bins]
        xc = F.least(F.greatest(F.col("x"), F.col("__lo")), F.col("__hi"))
        raw = F.when(
            width > 0,
            F.floor((xc - F.col("__lo")) / width).cast("int"),
        ).otherwise(F.lit(0))
        b = F.least(raw, F.lit(bins - 1))
        return (
            side.join(F.broadcast(bounds), "col")
            .select("col", b.alias("bin"))
            .groupBy("col", "bin")
            .agg(F.count(F.lit(1)).alias(name))
        )

    axis = bounds.select(
        "col",
        "__lo",
        "__hi",
        F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("bin"),
    ).select(
        "col",
        "bin",
        (F.col("__lo") + (F.col("__hi") - F.col("__lo")) / bins * F.col("bin")).alias(
            "lo_edge"
        ),
        (
            F.col("__lo") + (F.col("__hi") - F.col("__lo")) / bins * (F.col("bin") + 1)
        ).alias("hi_edge"),
    )
    # every frame above the two count aggregations is (C x bins)-sized —
    # broadcast them all so the plan carries no sort-merge join anywhere
    counts = (
        axis.join(F.broadcast(binned(fref, "ref_count")), ["col", "bin"], "left")
        .join(F.broadcast(binned(fcur, "cur_count")), ["col", "bin"], "left")
        .fillna(0, subset=["ref_count", "cur_count"])
    )
    totals = counts.groupBy("col").agg(
        F.sum("ref_count").alias("__rt"), F.sum("cur_count").alias("__ct")
    )
    return (
        counts.join(F.broadcast(totals), "col")
        .select(
            "col",
            "bin",
            "lo_edge",
            "hi_edge",
            "ref_count",
            "cur_count",
            (F.col("ref_count") / F.greatest("__rt", F.lit(1))).alias("ref_frac"),
            (F.col("cur_count") / F.greatest("__ct", F.lit(1))).alias("cur_frac"),
        )
    )


def _divergences(hist: DataFrame) -> DataFrame:
    """(col, psi, js) from a (col, ref_frac, cur_frac) bin table —
    epsilon-smoothed so empty bins contribute finite terms."""
    p = F.col("ref_frac") + F.lit(_EPS)
    q = F.col("cur_frac") + F.lit(_EPS)
    m = (p + q) / 2
    psi_term = (q - p) * (F.log(q) - F.log(p))
    js_term = 0.5 * (p * (F.log(p) - F.log(m)) + q * (F.log(q) - F.log(m)))
    return hist.groupBy("col").agg(
        F.sum(psi_term).alias("psi"), F.sum(js_term).alias("js")
    )


def drift_report(
    ref: DataFrame,
    cur: DataFrame,
    cols: Sequence[str],
    bins: int = 10,
    psi_threshold: float = 0.2,
) -> DataFrame:
    """One row per column: (col, n_ref, n_cur, null_frac_ref,
    null_frac_cur, psi, js, drifted). ``drifted`` applies the standard
    PSI alert threshold (0.2 by default; 0.1 is the usual watch level).
    NULL/NaN/Inf rates are reported separately — a null-rate jump is
    drift the histogram cannot see. A column with ZERO finite reference
    values has no histogram axis: its row is still emitted (the
    null-rate columns carry the signal) with psi/js/drifted NULL —
    "no distribution to compare", not "no drift"."""
    hist = drift_histograms(ref, cur, cols, bins=bins)
    div = _divergences(hist)

    def null_stats(df: DataFrame, n_name: str, f_name: str) -> DataFrame:
        s = _stack(df, cols)
        return s.groupBy("col").agg(
            F.count(F.lit(1)).alias(n_name),
            (
                F.sum(F.when(~_finite(F.col("x")), 1).otherwise(0))
                / F.greatest(F.count(F.lit(1)), F.lit(1))
            ).alias(f_name),
        )
    rstats = null_stats(ref, "n_ref", "null_frac_ref")
    cstats = null_stats(cur, "n_cur", "null_frac_cur")
    # seed the report from a literal frame of the REQUESTED columns: a
    # stacked-agg side emits zero rows when its snapshot is EMPTY, so an
    # inner join would return an empty report — and a monitoring gate
    # reading that as "no drift" would miss the most drastic drift of all.
    # One row per requested column is unconditional; empty sides read as
    # n=0 / null_frac=0 with psi/js NULL ("no distribution to compare").
    base = ref.sparkSession.createDataFrame(
        [(c,) for c in cols], "col: string"
    )
    return (
        base.join(F.broadcast(rstats), "col", "left")
        .join(F.broadcast(cstats), "col", "left")
        .join(F.broadcast(div), "col", "left")
        .select(
            "col",
            F.coalesce("n_ref", F.lit(0).cast("long")).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0).cast("long")).alias("n_cur"),
            F.coalesce("null_frac_ref", F.lit(0.0)).alias("null_frac_ref"),
            F.coalesce("null_frac_cur", F.lit(0.0)).alias("null_frac_cur"),
            "psi",
            "js",
            F.when(
                F.col("psi").isNotNull(), F.col("psi") >= F.lit(psi_threshold)
            ).alias("drifted"),
        )
    )


def schema_drift(ref: DataFrame, cur: DataFrame) -> DataFrame:
    """Schema diff between two snapshots — the drift the value-based
    report can't see (a column silently dropped, added, or retyped by an
    upstream producer breaks consumers before any PSI moves). One row per
    column present in EITHER snapshot:
    ``(column, status, ref_type, cur_type)`` with status in
    {added, removed, type_changed, unchanged}. Pure schema metadata —
    no data is scanned, so it's free to run before every load."""
    rt = {f.name: f.dataType.simpleString() for f in ref.schema.fields}
    ct = {f.name: f.dataType.simpleString() for f in cur.schema.fields}
    rows = []
    for c in sorted(set(rt) | set(ct)):
        if c not in ct:
            st = "removed"
        elif c not in rt:
            st = "added"
        elif rt[c] != ct[c]:
            st = "type_changed"
        else:
            st = "unchanged"
        rows.append((c, st, rt.get(c), ct.get(c)))
    return ref.sparkSession.createDataFrame(
        rows, "column string, status string, ref_type string, cur_type string"
    )


def categorical_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    top_k: int = 20,
    psi_threshold: float = 0.2,
) -> DataFrame:
    """Category-frequency drift for one string/low-cardinality column:
    per-category (category, ref_frac, cur_frac, psi_term) over the
    REFERENCE's top-K categories (by reference count, ties on value) with
    everything else — including categories new in current — folded into
    ``__other__``. NULL is its own category. The top-K set is a K-row
    broadcast; each snapshot is SCANNED once — the reference's folded
    counts re-aggregate the per-category ``rcounts`` frame (cardinality-
    sized), not the raw reference rows."""
    if top_k < 1:
        raise ValueError("categorical_drift: top_k must be >= 1")
    c = F.coalesce(F.col(col).cast("string"), F.lit("__null__"))

    rcounts = ref.select(c.alias("cat")).groupBy("cat").agg(
        F.count(F.lit(1)).alias("rc")
    )
    top = rcounts.orderBy(F.desc("rc"), F.asc("cat")).limit(top_k).select(
        "cat", F.lit(True).alias("__top")
    )

    def fold(cat_counts: DataFrame, count_col: str, name: str) -> DataFrame:
        return (
            cat_counts.join(F.broadcast(top), "cat", "left")
            .select(
                F.when(F.col("__top"), F.col("cat"))
                .otherwise(F.lit("__other__"))
                .alias("category"),
                F.col(count_col),
            )
            .groupBy("category")
            .agg(F.sum(count_col).alias(name))
        )

    ccounts = cur.select(c.alias("cat")).groupBy("cat").agg(
        F.count(F.lit(1)).alias("cc")
    )
    # both sides are <= (top_k + 2)-row aggregates; a full outer join
    # cannot broadcast, but at this size the shuffle moves ~nothing
    counts = fold(rcounts, "rc", "ref_count").join(
        fold(ccounts, "cc", "cur_count"), "category", "full"
    ).fillna(0, subset=["ref_count", "cur_count"])
    totals = counts.agg(
        F.sum("ref_count").alias("__rt"), F.sum("cur_count").alias("__ct")
    )
    frac = counts.crossJoin(F.broadcast(totals)).select(
        "category",
        "ref_count",
        "cur_count",
        (F.col("ref_count") / F.greatest("__rt", F.lit(1))).alias("ref_frac"),
        (F.col("cur_count") / F.greatest("__ct", F.lit(1))).alias("cur_frac"),
    )
    p = F.col("ref_frac") + F.lit(_EPS)
    q = F.col("cur_frac") + F.lit(_EPS)
    return frac.withColumn("psi_term", (q - p) * (F.log(q) - F.log(p)))
