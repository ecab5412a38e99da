"""Global row numbering at scale — consecutive ids over a total order
WITHOUT a single-partition window (the classic two-pass distributed
prefix, same machinery as ``ops/selection.select_token_budget``):

1. range-repartition on the order columns (one shuffle; Spark samples
   range bounds),
2. per-partition ``row_number`` (window partitioned by the range id, so
   every partition numbers independently),
3. per-partition counts (``num_ranges`` longs) prefix-summed on the
   driver and rejoined as a broadcast offset.

Driver contact: ``num_ranges`` longs. Contrast with the naive
``row_number().over(Window.orderBy(...))``, which funnels the whole
dataset through ONE task and dies at scale — plan-guarded in
``tests/test_plans.py``.

No reference counterpart (the reference's sys__id is a SQLite rowid).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_row_ids(
    df: DataFrame,
    order_by: Union[str, Sequence[str]],
    id_col: str = "row_id",
    start: int = 1,
    num_ranges: Optional[int] = None,
    cache: bool = True,
) -> DataFrame:
    """Add consecutive ``id_col`` (``start``, ``start``+1, ...) following
    the total order of ``order_by``.

    The order columns must form a deterministic total order (include a
    unique tiebreak column — duplicate sort keys would make ids between
    ties partition-dependent, the usual SQL row_number caveat).

    With ``cache=True`` (default) the ranged/sorted frame is persisted so
    the per-partition counts job and the caller's action share one
    shuffle/sort pass; the persisted handle is attached to the result as
    ``result.row_ids_cache`` — call ``result.row_ids_cache.unpersist()``
    once the numbered output is materialized, or it stays pinned until LRU
    eviction (noticeable when numbering many large datasets in one
    session). ``cache=False`` skips the persist entirely: the counts job
    and the caller's action each pay the range shuffle + sort (the sort
    output is re-derivable), but nothing is pinned in executor storage.
    """
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    if not order_cols:
        raise ValueError("assign_row_ids: order_by must name at least one column")
    n_parts = int(
        num_ranges
        or df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    ranked = (
        df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*[F.col(c) for c in order_cols])
        .withColumn("__part", F.spark_partition_id())
    )
    # persisted so the counts job and the caller's action share one
    # shuffle/sort pass; released via result.row_ids_cache (see docstring)
    if cache:
        ranked = ranked.persist()
    w = Window.partitionBy("__part").orderBy(*[F.col(c) for c in order_cols])
    within = ranked.withColumn("__rn", F.row_number().over(w))
    counts = {
        r["__part"]: r["__n"]
        for r in ranked.groupBy("__part").agg(F.count(F.lit(1)).alias("__n")).collect()
    }
    offsets, acc = [], int(start) - 1
    for p in sorted(counts):
        offsets.append((p, acc))
        acc += counts[p]
    if offsets:
        off = df.sparkSession.createDataFrame(offsets, "__part int, __off long")
        within = within.join(F.broadcast(off), "__part", "left")
    else:
        within = within.withColumn("__off", F.lit(int(start) - 1).cast("long"))
    out = within.withColumn(
        id_col, (F.col("__rn") + F.coalesce(F.col("__off"), F.lit(0))).cast("long")
    ).drop("__part", "__rn", "__off")
    if cache:
        out.row_ids_cache = ranked
    return out
