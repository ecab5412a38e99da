"""Z-order (Morton-curve) layout optimization for multi-column data skipping.

The write-side counterpart of predicate pushdown: cluster rows along an
interleaved-bit curve over several columns so parquet file and row-group
min/max statistics stay TIGHT on every participating column at once — a
scan filtered on ANY of them prunes most of a 100-TB table, where a plain
sort only serves its leading column. Same layout idea as Delta Lake's
``OPTIMIZE ZORDER BY`` (public); no reference counterpart (spec addition).

Mechanics: each column is quantized to ``bits`` levels between its global
min and max (one tiny aggregate — 2 x ncols scalars to the driver), the
quantized values' bits are interleaved into one long, and the frame is
range-repartitioned + sorted on that key. Every step is a native Column
expression inside whole-stage codegen; the only data movement is the one
range shuffle any clustering write requires (plus Spark's internal
range-boundary sampling pass). NULLs quantize to level 0 (they cluster
together at the curve's origin — a NULL-heavy column still prunes).

Quantization is plain IEEE double arithmetic ((v - min) / (max - min),
scaled and floored), identical in any engine — the ``zorder_key_orders``
oracle replays it bit-for-bit in DuckDB including the unrolled interleave.

Limits: ncols * bits must fit a signed 64-bit key (<= 63). min==max
columns contribute constant 0 bits (harmless).

Skew: min/max quantization collapses a skewed column onto a few levels
(a power-law column puts ~everything in level 0) — range partitioning
still balances ROWS per file, but min/max tightness degrades.
``strategy="quantile"`` quantizes by approximate quantile boundaries
instead (equal-POPULATION levels; approxQuantile + the JVM Bucketizer,
one extra pass over the clustering columns) — use it when the columns
are heavy-tailed. The quantile sketch's boundaries depend on partition
merge order, so this path trades the minmax path's bit-exact determinism
for skew resistance; the oracle covers the minmax path.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_bounds(
    df: DataFrame, cols: Sequence[str]
) -> dict[str, tuple[float, float]]:
    """Global (min, max) per column — one aggregate, 2 x ncols scalars to
    the driver. Precompute and reuse when writing many batches of the same
    table so every batch shares one quantization grid."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__mn_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__mx_{c}"))
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in cols}


def _check_dims(n: int, bits: int) -> None:
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if n * bits > 63:
        raise ValueError(
            f"{n} cols x {bits} bits = {n * bits} key bits — must be <= 63"
        )


def _interleave(qs: Sequence[Column], bits: int) -> Column:
    """Round-robin bit interleave of already-quantized long columns:
    column j's bit i lands at key position ``i * ncols + j``."""
    n = len(qs)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(qs):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(q, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return key


def zorder_key(
    cols: Sequence[str],
    bounds: dict[str, tuple[float, float]],
    bits: int = 8,
) -> Column:
    """The interleaved Morton key as a Column: column j's quantized bit i
    lands at key position ``i * ncols + j`` (round-robin interleave, the
    standard Z-curve). All-null or min==max columns contribute zeros."""
    n = len(cols)
    _check_dims(n, bits)
    levels = float(2**bits)
    qs = []
    for c in cols:
        mn, mx = bounds[c]
        if mn is None or mx is None or mx == mn:
            qs.append(F.lit(0).cast("long"))
            continue
        frac = (F.col(c).cast("double") - F.lit(float(mn))) / F.lit(
            float(mx) - float(mn)
        )
        q = F.least(
            F.lit(2**bits - 1).cast("long"),
            F.greatest(
                F.lit(0).cast("long"), F.floor(frac * F.lit(levels))
            ),
        )
        qs.append(F.coalesce(q, F.lit(0).cast("long")))
    return _interleave(qs, bits)


def _quantile_keyed(df: DataFrame, cols: Sequence[str], bits: int) -> DataFrame:
    """Equal-population quantization: per-column approxQuantile boundaries
    (one pass, driver holds 2^bits-1 floats per column) + the JVM
    Bucketizer's binary search, then the same bit interleave."""
    from pyspark.ml.feature import Bucketizer

    _check_dims(len(cols), bits)
    levels = 2**bits
    probs = [i / levels for i in range(1, levels)]
    all_bounds = df.approxQuantile(list(cols), probs, 0.001)
    out = df
    qcols = []
    for c, bnds in zip(cols, all_bounds):
        # strictly-increasing splits (duplicate quantiles collapse levels
        # on heavy ties — correct: those values ARE one population bucket)
        splits = [float("-inf")]
        for b in bnds:
            if b > splits[-1]:
                splits.append(float(b))
        splits.append(float("inf"))
        qc = f"__zq_{c}"
        if len(splits) < 3:  # constant column
            out = out.withColumn(qc, F.lit(0).cast("long"))
        else:
            # bucketize a TEMP double copy — the user's column keeps its type
            out = Bucketizer(
                splits=splits, inputCol=qc + "_in", outputCol=qc + "_d",
                handleInvalid="keep",
            ).transform(out.withColumn(qc + "_in", F.col(c).cast("double")))
            nb = len(splits) - 1  # "keep" sends nulls/NaN to bucket nb
            out = out.withColumn(
                qc,
                F.when(F.col(qc + "_d") >= nb, F.lit(0))
                .otherwise(F.col(qc + "_d"))
                .cast("long"),
            ).drop(qc + "_d", qc + "_in")
        qcols.append(qc)
    keyed = out.withColumn("__zkey", _interleave([F.col(c) for c in qcols], bits))
    return keyed.drop(*qcols)


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    num_partitions: Optional[int] = None,
    bounds: Optional[dict[str, tuple[float, float]]] = None,
    strategy: str = "minmax",
) -> DataFrame:
    """Range-repartition + sort the frame along the Z-curve over ``cols``.
    Write the result (``to_parquet``) and downstream scans filtered on any
    participating column prune files AND row groups via parquet min/max
    stats. ``num_partitions`` ~ the desired output file count;
    ``strategy="quantile"`` switches to equal-population quantization for
    heavy-tailed columns (see module docstring)."""
    if strategy not in ("minmax", "quantile"):
        raise ValueError(f"strategy must be 'minmax' or 'quantile', got {strategy!r}")
    if strategy == "quantile":
        if bounds is not None:
            raise ValueError(
                "bounds only apply to strategy='minmax' — the quantile "
                "strategy derives its own per-column grid (silently "
                "ignoring them would break the reuse-one-grid-across-"
                "batches workflow)"
            )
        out = _quantile_keyed(df, cols, bits)
    else:
        if bounds is None:
            bounds = zorder_bounds(df, cols)
        out = df.withColumn("__zkey", zorder_key(cols, bounds, bits))
    if num_partitions:
        out = out.repartitionByRange(num_partitions, F.col("__zkey"))
    else:
        out = out.repartitionByRange(F.col("__zkey"))
    return out.sortWithinPartitions("__zkey").drop("__zkey")
