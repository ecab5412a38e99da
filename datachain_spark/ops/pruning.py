"""File-level zone maps: per-file column min/max indexes and the
prune reports they enable — Iceberg/Delta-manifest-style file skipping,
built Spark-first.

At 100 TB the difference between "scan everything" and "scan the 3 files
whose zones overlap the predicate" IS the query plan. Parquet footers
already hold per-file min/max, but Spark only consults them inside a
scan it has already scheduled; a persisted zone-map INDEX (#files rows —
tiny) lets a pipeline answer "how much would this predicate scan" and
construct the pruned read itself, without touching the data. Pairs with
``save(zorder_by=...)`` / ``compact_dataset``: Z-ordering exists to make
these zones tight.

No reference counterpart (spec addition for warehouse-scale layouts).
"""

from __future__ import annotations

from functools import reduce
from typing import Mapping, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def file_stats_index(
    df: DataFrame,
    cols: Sequence[str],
    file_col: str = "file",
) -> DataFrame:
    """Per-file zone map over a file-source DataFrame: one row per file
    with ``n_rows`` and ``{c}_min`` / ``{c}_max`` for every column in
    ``cols``.

    ONE distributed scan that reads only ``cols`` (column-pruned — the
    footer path Spark itself uses for min/max stays available to the
    scan) plus the ``_metadata.file_path`` constant field; the only
    shuffle carries #files rows. Build it once per snapshot, save it as
    a dataset version, and every later range query consults the index
    instead of the data.

    Falls back to ``input_file_name()`` when the plan carries no
    ``_metadata``. Downstream of a shuffle that function returns the
    EMPTY string — such rows are dropped rather than indexed (a zone map
    of a shuffle result is meaningless), so a non-file plan yields an
    EMPTY index instead of one bogus global zone; prune/scan consumers
    surface that as zero files.
    """
    if not cols:
        raise ValueError("file_stats_index: cols must be non-empty")
    if file_col in df.columns:
        # the caller pre-materialized file identity (e.g. a tombstoned
        # append/extend chain, where _metadata does not survive the
        # visibility join) — index that column as-is
        base = df.select(F.col(file_col), *[F.col(c) for c in cols])
        aggs0 = [F.count(F.lit(1)).cast("long").alias("n_rows")]
        for c in cols:
            aggs0.append(F.min(c).alias(f"{c}_min"))
            aggs0.append(F.max(c).alias(f"{c}_max"))
        return base.groupBy(file_col).agg(*aggs0)
    try:
        base = df.select(
            F.col("_metadata.file_path").alias(file_col),
            *[F.col(c) for c in cols],
        )
    except Exception:
        base = df.select(
            F.input_file_name().alias(file_col), *[F.col(c) for c in cols]
        ).filter(F.col(file_col) != "")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return base.groupBy(file_col).agg(*aggs)


def _keep_expr(intervals: Mapping[str, Tuple]):
    """Zone-overlap predicate: a file MAY contain rows matching every
    ``col BETWEEN lo AND hi`` iff each zone [min, max] overlaps its
    [lo, hi]. NULL bounds (an all-NULL zone for that column) keep the
    file — the conservative choice: skipping is only ever an
    optimization, a kept file is re-filtered row-wise anyway."""
    conds = []
    for c, (lo, hi) in intervals.items():
        mn, mx = F.col(f"{c}_min"), F.col(f"{c}_max")
        overlap = (mn <= F.lit(hi)) & (mx >= F.lit(lo))
        # A comparison that NULLs out for any other reason (e.g. an
        # implicit cast failing on one bound) must also KEEP the file:
        # pruning may only ever skip files proven non-overlapping.
        conds.append(F.when(mn.isNull() | mx.isNull(), F.lit(True))
                     .otherwise(F.coalesce(overlap, F.lit(True))))
    return reduce(lambda a, b: a & b, conds)


def prune_zones(
    index: DataFrame,
    intervals: Mapping[str, Tuple],
    keep_col: str = "kept",
) -> DataFrame:
    """The per-zone prune decision: the index plus a boolean ``keep_col``
    — True when the file's zones overlap EVERY ``col: (lo, hi)`` closed
    range. Pure projection over the #files-row index; no data touched."""
    if not intervals:
        raise ValueError("prune_zones: intervals must be non-empty")
    missing = [
        c for c in intervals
        if f"{c}_min" not in index.columns or f"{c}_max" not in index.columns
    ]
    if missing:
        raise ValueError(f"prune_zones: index lacks zones for {missing}")
    for c, (lo, hi) in intervals.items():
        dt = index.schema[f"{c}_min"].dataType
        if not isinstance(dt, T.NumericType):
            bad = [b for b in (lo, hi)
                   if b is not None and isinstance(b, (int, float))
                   and not isinstance(b, bool)]
            if bad:
                raise ValueError(
                    f"prune_zones: numeric bounds {bad} against "
                    f"{dt.simpleString()} zone column {c!r} — the "
                    "comparison would NULL out; pass bounds of the "
                    "column's type"
                )
    return index.withColumn(keep_col, _keep_expr(intervals))


def prune_report(
    index: DataFrame,
    intervals: Mapping[str, Tuple],
) -> DataFrame:
    """ONE-row skip report for a conjunction of range predicates:
    (total_files, kept_files, total_rows, kept_rows, file_skip_frac,
    row_skip_frac). The answer to "what does this predicate cost" at
    planning time — from the index alone. An EMPTY index (nothing
    indexable) reports 0 files and NULL skip fractions."""
    zones = prune_zones(index, intervals)
    kept = F.col("kept")
    return zones.agg(
        F.count(F.lit(1)).cast("long").alias("total_files"),
        F.sum(kept.cast("long")).cast("long").alias("kept_files"),
        F.sum("n_rows").cast("long").alias("total_rows"),
        F.sum(F.when(kept, F.col("n_rows")).otherwise(F.lit(0)))
        .cast("long").alias("kept_rows"),
    ).select(
        "total_files", "kept_files", "total_rows", "kept_rows",
        F.try_divide(
            F.col("total_files") - F.col("kept_files"), F.col("total_files")
        ).alias("file_skip_frac"),
        F.try_divide(
            F.col("total_rows") - F.col("kept_rows"), F.col("total_rows")
        ).alias("row_skip_frac"),
    )


def pruned_read(
    spark: SparkSession,
    index: DataFrame,
    intervals: Mapping[str, Tuple],
    file_col: str = "file",
    base_path: Optional[str] = None,
) -> DataFrame:
    """Construct the pruned scan itself: read ONLY the files whose zones
    survive ``prune_zones`` (collect is bounded by #files — the zone map
    is driver-sized state by design, like Iceberg's manifest list).
    Callers re-apply the row-level filter; zone overlap is necessary,
    not sufficient. Raises on an empty survivor set (Spark cannot scan
    zero paths) — callers should treat that as an empty result.

    Pass ``base_path`` (the table's root directory) when the layout is
    hive-partitioned: reading survivor LEAF files without it would drop
    the partition columns from the schema (Spark only reconstructs them
    relative to a basePath)."""
    zones = prune_zones(index, intervals)
    files = [r[file_col] for r in
             zones.filter(F.col("kept")).select(file_col).collect()]
    if not files:
        raise ValueError("pruned_read: no files survive the predicate")
    reader = spark.read
    if base_path:
        reader = reader.option("basePath", base_path)
    return reader.parquet(*files)
