"""Mergeable cardinality sketches for corpus monitoring at 100 TB.

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
from typing import Optional, Sequence

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
    for c in cols:
        src = F.col(c) if dtypes.get(c) in sketchable else F.col(c).cast("string")
        aggs.append(F.hll_sketch_agg(src, F.lit(lg_config_k)).alias(f"__sk_{c}"))
    row = df.agg(*aggs)
    # melt the single agg row via explode — ONE aggregation branch in the
    # plan (a per-column union would plan the agg once per column)
    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.hll_sketch_estimate(F.col(f"__sk_{c}")).alias("approx_distinct"),
            F.col("__n").alias("n_rows"),
            F.col(f"__sk_{c}").alias("sketch"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*entries)).alias("p")).select("p.*")


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
