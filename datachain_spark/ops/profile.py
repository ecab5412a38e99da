"""One-pass table profiling: per-column completeness / cardinality /
bounds / moments — the dbt-profile / "describe" surface, built scale-first.

Shape: ONE aggregation over the data computes every statistic for every
profiled column (map-side partial merge; the shuffle carries one partial
row per partition), then the single aggregate row is unpivoted in-plan to
one output row per column — no collect, no per-column scans, no second
pass. ``exact_distinct=True`` swaps approx_count_distinct (HLL, default —
the only sane choice at 100 TB) for exact distinct counts (one expand —
used by the cross-engine oracle, where HLL binaries differ).

No reference counterpart (spec addition; complements corpus_stats which
profiles text specifically).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Profile columns into (column, dtype, n_rows, n_nulls, null_frac,
    n_distinct, min_str, max_str, mean, stddev) rows.

    ``mean``/``stddev`` are NULL for non-numeric columns; ``min_str``/
    ``max_str`` are string-cast so heterogeneous columns share one output
    schema. NULLs are excluded from distinct counts (the SQL convention).
    Complex-typed columns (array/map/struct) are skipped.
    """
    cols = list(columns) if columns is not None else df.columns
    fields = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in fields]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")
    cols = [
        c for c in cols
        if not isinstance(fields[c], (T.ArrayType, T.MapType, T.StructType))
    ]
    if not cols:
        raise ValueError("profile_table: no scalar columns to profile")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        col = F.col(c)
        distinct = (
            F.count_distinct(col) if exact_distinct
            else F.approx_count_distinct(col)
        )
        aggs += [
            F.count(col).alias(f"__nn{i}"),
            distinct.alias(f"__d{i}"),
            F.min(col).cast("string").alias(f"__mn{i}"),
            F.max(col).cast("string").alias(f"__mx{i}"),
        ]
        if isinstance(fields[c], _NUMERIC):
            aggs += [
                F.avg(col.cast("double")).alias(f"__avg{i}"),
                F.stddev(col.cast("double")).alias(f"__sd{i}"),
            ]
        else:
            aggs += [
                F.lit(None).cast("double").alias(f"__avg{i}"),
                F.lit(None).cast("double").alias(f"__sd{i}"),
            ]
    one = df.agg(*aggs)

    # unpivot the single aggregate row in-plan: stack() emits one row per
    # column, all stats typed consistently across stack groups
    groups = []
    for i, c in enumerate(cols):
        groups += [
            F.lit(c), F.lit(fields[c].simpleString()),
            F.col(f"__nn{i}"), F.col(f"__d{i}"),
            F.col(f"__mn{i}"), F.col(f"__mx{i}"),
            F.col(f"__avg{i}"), F.col(f"__sd{i}"),
        ]
    stacked = one.select(
        F.col("__n").alias("n_rows"),
        F.stack(
            F.lit(len(cols)), *groups
        ).alias("column", "dtype", "__nn", "n_distinct", "min_str", "max_str",
                "mean", "stddev"),
    )
    return stacked.select(
        "column", "dtype",
        F.col("n_rows").cast("long"),
        (F.col("n_rows") - F.col("__nn")).cast("long").alias("n_nulls"),
        F.when(F.col("n_rows") > 0,
               (F.col("n_rows") - F.col("__nn")) / F.col("n_rows"))
        .otherwise(F.lit(0.0)).alias("null_frac"),
        F.col("n_distinct").cast("long"),
        "min_str", "max_str", "mean", "stddev",
    )


def dataset_digest(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Order-invariant content checksum of a table: one row
    (n_rows, digest) where digest is the exact DECIMAL sum of a per-row
    64-bit hash over the canonicalized row string — equal datasets give
    equal digests regardless of row order, partitioning, or file layout,
    so two copies of a version (or the two sides of a migration) can be
    compared with one scan each and an 8-byte exchange.

    Canonical form: columns sorted by name, each value string-cast with a
    NULL sentinel, joined with unit separators (so ("a",NULL) never
    collides with (NULL,"a") or ("a","")). The DECIMAL(38,0) sum is
    fold-order independent (integer addition, exact) — the same reason
    the oracle can replay it in DuckDB under ``hash_fn="md5"``.
    Complex-typed columns (array/map/struct) are rejected — cast their
    canonical form explicitly first.
    """
    from .text import _hash64

    cols = sorted(columns) if columns is not None else sorted(df.columns)
    fields = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in fields]
    if missing:
        raise ValueError(f"dataset_digest: unknown columns {missing}")
    complexes = [
        c for c in cols
        if isinstance(fields[c], (T.ArrayType, T.MapType, T.StructType))
    ]
    if complexes:
        raise ValueError(
            f"dataset_digest: complex-typed columns {complexes} — cast a "
            "canonical string form explicitly"
        )
    parts = []
    for c in cols:
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")))
        parts.append(F.lit("\x1f"))
    row_str = F.concat(*parts[:-1])
    h = _hash64(row_str, hash_fn).cast("decimal(38,0)")
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(F.sum(h), F.lit(0).cast("decimal(38,0)"))
        .cast("string")
        .alias("digest"),
    )


def describe(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
) -> DataFrame:
    """pandas-``describe()`` for numeric columns: one row per column with
    (count, mean, stddev, min, q25, q50, q75, max) — ALL columns' stats
    from ONE aggregation (map-side partials, a single shuffle of one
    partial row per partition), unpivoted in-plan like
    :func:`profile_table`. Quantiles use the interpolated percentile
    definition shared with DuckDB; mean is the exact-DECIMAL-sum mean
    (fold-order independent); stddev is a floating aggregate (compare at
    significant digits cross-engine). Non-numeric columns are rejected
    (use profile_table for the mixed-type census).
    """
    cols = list(columns) if columns is not None else [
        f.name for f in df.schema.fields if isinstance(f.dataType, _NUMERIC)
    ]
    fields = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in fields]
    if missing:
        raise ValueError(f"describe: unknown columns {missing}")
    bad = [c for c in cols if not isinstance(fields[c], _NUMERIC)]
    if bad:
        raise ValueError(f"describe: non-numeric columns {bad}")
    if not cols:
        raise ValueError("describe: no numeric columns")

    from .common import exact_mean

    aggs = []
    for i, c in enumerate(cols):
        v = F.col(c).cast("double")
        aggs += [
            F.count(v).alias(f"__n{i}"),
            exact_mean(F.col(c)).alias(f"__mean{i}"),
            F.stddev(v).alias(f"__sd{i}"),
            F.percentile(
                v, F.array(F.lit(0.0), F.lit(0.25), F.lit(0.5),
                           F.lit(0.75), F.lit(1.0))
            ).alias(f"__q{i}"),
        ]
    one = df.agg(*aggs)
    groups = []
    for i, c in enumerate(cols):
        q = F.col(f"__q{i}")
        groups += [
            F.lit(c), F.col(f"__n{i}"), F.col(f"__mean{i}"), F.col(f"__sd{i}"),
            q.getItem(0), q.getItem(1), q.getItem(2), q.getItem(3), q.getItem(4),
        ]
    return one.select(
        F.stack(F.lit(len(cols)), *groups).alias(
            "column", "count", "mean", "stddev",
            "min", "q25", "q50", "q75", "max",
        )
    )
