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


def dataset_diff(
    name: str,
    on: Union[str, Sequence[str]],
    v_old: Optional[str] = None,
    v_new: Optional[str] = None,
    compare: Union[str, Sequence[str], None] = None,
    session=None,
    summary: bool = True,
    status_col: str = "diff",
):
    """Cross-VERSION dataset diff over the metastore: which saved version
    changed what. Resolves two versions of dataset ``name`` (``v_new``
    defaults to the latest, ``v_old`` to the version immediately before
    it; both also accept pins/specifiers like ``"==1.0.0"`` / ``">=1.2"``)
    and compares them key-wise.

    ``summary=True`` (default) returns the release-review artifact: a tiny
    ``(kind, item, n, v_old, v_new)`` frame with one ``status`` row per
    A/D/M/S count plus one ``column`` row per compared column counting the
    MODIFIED rows in which that column's value changed — "3.4k rows
    modified, all of them in the quality_score column" is one glance.
    ``summary=False`` returns the row-level :func:`diff` frame (added /
    deleted / modified rows with ``status_col``) for drill-down.

    Shape: ONE full-outer join on the keys between the two version scans
    (both predicate-pruned parquet reads), then — for the summary — a
    stacked conditional aggregation to a handful of rows; nothing about
    it is driver-side, so diffing two 100-TB versions is one shuffle.
    Composes the oracled :func:`diff` semantics (null-safe key and value
    comparison, deleted rows take old-side values).
    """
    from ..session import Session
    from ..sources.readers import read_dataset

    sess = Session.get() if session is None else session
    rec = sess.metastore.get_record(name)
    if rec is None or not rec.versions:
        raise ValueError(f"dataset_diff: no versions of dataset {name!r}")
    from ..catalog.metastore import parse_version

    ordered = sorted(rec.versions, key=lambda v: parse_version(v.version))
    new_ver = rec.get_version(v_new).version
    if v_old is None:
        older = [v for v in ordered if parse_version(v.version) < parse_version(new_ver)]
        if not older:
            raise ValueError(
                f"dataset_diff: {name!r} has no version before {new_ver}"
            )
        old_ver = older[-1].version
    else:
        old_ver = rec.get_version(v_old).version
    new_ch = read_dataset(name, f"=={new_ver}", session=sess)
    old_ch = read_dataset(name, f"=={old_ver}", session=sess)

    if not summary:
        return diff(
            new_ch, old_ch, on=on, compare=compare,
            same=False, status_col=status_col,
        )

    keys = _namelist(on)
    cmp_cols = _namelist(compare)
    if not cmp_cols:
        common = [c for c in new_ch.df.columns if c in set(old_ch.df.columns)]
        cmp_cols = [c for c in common if c not in set(keys)]

    ldf, rdf = new_ch.df.alias("l"), old_ch.df.alias("r")
    cond = None
    for k in keys:
        c = F.col(f"l.{k}").eqNullSafe(F.col(f"r.{k}"))
        cond = c if cond is None else cond & c
    joined = ldf.join(rdf, cond, "full")
    l_present = F.col(f"l.{keys[0]}").isNotNull()
    r_present = F.col(f"r.{keys[0]}").isNotNull()
    for k in keys[1:]:
        l_present = l_present | F.col(f"l.{k}").isNotNull()
        r_present = r_present | F.col(f"r.{k}").isNotNull()
    col_ne = {
        c: ~F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}")) for c in cmp_cols
    }
    any_ne = F.lit(False)
    for ne in col_ne.values():
        any_ne = any_ne | ne
    # EXCLUSIVE classification mirroring diff()'s when-chain precedence
    # (added wins over deleted): a row whose join keys are NULL on BOTH
    # sides would otherwise count as added AND deleted, making the status
    # counts sum past the row count and diverge from summary=False
    is_added = ~r_present
    is_deleted = r_present & ~l_present
    is_modified = l_present & r_present & any_ne
    is_same = l_present & r_present & ~any_ne

    def _n(cond_col):
        return F.sum(F.when(cond_col, 1).otherwise(0)).cast("long")

    aggs = [
        _n(is_added).alias("__a"), _n(is_deleted).alias("__d"),
        _n(is_modified).alias("__m"), _n(is_same).alias("__s"),
    ] + [
        _n(is_modified & ne).alias(f"__c{i}")
        for i, ne in enumerate(col_ne.values())
    ]
    row = joined.agg(*aggs)
    pairs = [
        F.lit("status"), F.lit(STATUS_ADDED), F.col("__a"),
        F.lit("status"), F.lit(STATUS_DELETED), F.col("__d"),
        F.lit("status"), F.lit(STATUS_MODIFIED), F.col("__m"),
        F.lit("status"), F.lit(STATUS_SAME), F.col("__s"),
    ]
    for i, c in enumerate(cmp_cols):
        pairs += [F.lit("column"), F.lit(c), F.col(f"__c{i}")]
    n_rows = 4 + len(cmp_cols)
    return row.select(
        F.stack(F.lit(n_rows), *pairs).alias("kind", "item", "n")
    ).select(
        "kind", "item", "n",
        F.lit(old_ver).alias("v_old"), F.lit(new_ver).alias("v_new"),
    )


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
