"""Interval (range) join — another operator absent in the reference
(SURVEY.md §2.4 "Not present: … interval/range joins").

Matches left *points* to right *intervals* (start <= point < end, bounds
configurable). Two physical strategies:

- with equality keys (``on=...``): equi-join on the keys + range filter —
  Catalyst already does the right thing (the keys carry selectivity).
- pure range join (no keys): the naive plan is a cartesian product. We bin
  both sides on ``bin_size``: each interval explodes into the bins it
  overlaps, each point maps to one bin, and the join becomes an equi-join on
  the bin id + exact range filter. Shuffle volume = rows × avg bins per
  interval; pick bin_size near the median interval width so the explode
  factor stays ~2.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    start: str,
    end: str,
    on: Union[str, Sequence[str], None] = None,
    bin_size: Optional[float] = None,
    how: str = "inner",
    inclusive_end: bool = False,
) -> DataFrame:
    """Join left rows whose ``point`` falls inside right's [start, end).

    Numeric or timestamp columns (timestamps are binned via epoch seconds).
    ``how`` supports 'inner' and 'left'.
    """
    if how not in ("inner", "left"):
        raise ValueError("interval_join: how must be 'inner' or 'left'")
    keys = [on] if isinstance(on, str) else list(on or [])

    la, ra = left.alias("l"), right.alias("r")
    range_cond = (F.col(f"l.{point}") >= F.col(f"r.{start}")) & (
        (F.col(f"l.{point}") <= F.col(f"r.{end}"))
        if inclusive_end
        else (F.col(f"l.{point}") < F.col(f"r.{end}"))
    )

    if keys:
        cond = range_cond
        for k in keys:
            cond = (F.col(f"l.{k}") == F.col(f"r.{k}")) & cond
        rsel = [F.col(f"r.{c}").alias(c) for c in right.columns if c not in keys]
        return la.join(ra, cond, how).select(
            *[F.col(f"l.{c}").alias(c) for c in left.columns], *rsel
        )

    if bin_size is None:
        raise ValueError("interval_join without keys requires bin_size")

    def to_num(col):
        from pyspark.sql.types import TimestampType, TimestampNTZType

        dt_map = dict(left.dtypes + right.dtypes)
        if dt_map.get(col.replace("l.", "").replace("r.", ""), "").startswith("timestamp"):
            return F.unix_timestamp(F.col(col))
        return F.col(col).cast("double")

    lbin = F.floor(to_num(f"l.{point}") / F.lit(float(bin_size)))
    rlo = F.floor(to_num(f"r.{start}") / F.lit(float(bin_size)))
    rhi = F.floor(to_num(f"r.{end}") / F.lit(float(bin_size)))

    lb = la.withColumn("__bin", lbin)
    rb = ra.withColumn("__bin", F.explode(F.sequence(rlo, rhi)))

    joined = lb.join(rb, (lb["__bin"] == rb["__bin"]) & range_cond, how)
    lsel = [F.col(f"l.{c}").alias(c) for c in left.columns]
    rsel = [
        F.col(f"r.{c}").alias(c if c not in left.columns else f"r_{c}")
        for c in right.columns
    ]
    return joined.select(*lsel, *rsel)
