"""Declarative data-quality expectations — the dbt-test / Great-Expectations
style validation pass a production pipeline runs before publishing a
dataset version.

No reference counterpart (spec addition): the reference validates schemas
at read time but has no rule-level data validation surface.

Rules are plain descriptors; ``check`` evaluates ALL row-level rules in a
SINGLE aggregation pass over the table (each rule is one conditional sum —
map-side partial combine, one scalar row out per table scan), plus one
groupBy per ``unique`` rule (a shuffle is unavoidable to count duplicate
keys; the aggregation is count>1 on the key columns only, never the full
rows). ``violations`` tags offending rows for quarantine — a projection
with zero shuffles.

At 100 TB: the row-rule pass is a single scan producing one row; unique
rules shuffle only their key columns with partial aggregation. Nothing is
collected except the per-rule summary (n_rules rows).

Rule constructors::

    not_null("col")                     # col IS NOT NULL
    unique("col", ...)                  # no duplicate key tuples
    accepted_values("col", [...])      # value in list (NULL fails)
    in_range("col", lo, hi)            # lo <= col <= hi (NULL fails)
    matches_regex("col", r"...")       # rlike (NULL fails)
    expression("name", "<bool sql>")    # arbitrary SQL predicate holds
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str
    columns: tuple[str, ...] = ()
    params: tuple = field(default_factory=tuple)

    def predicate(self) -> Optional[Column]:
        """Row-level pass/fail Column (None for set-level rules like
        unique). NULL inputs FAIL closed for every rule except an explicit
        ``expression`` (which follows SQL three-valued logic coalesced to
        false)."""
        if self.kind == "not_null":
            return F.col(self.columns[0]).isNotNull()
        if self.kind == "accepted_values":
            c = F.col(self.columns[0])
            return c.isNotNull() & c.isin(list(self.params))
        if self.kind == "in_range":
            c = F.col(self.columns[0])
            lo, hi = self.params
            return c.isNotNull() & (c >= F.lit(lo)) & (c <= F.lit(hi))
        if self.kind == "matches_regex":
            c = F.col(self.columns[0])
            return c.isNotNull() & c.rlike(self.params[0])
        if self.kind == "expression":
            return F.coalesce(F.expr(self.params[0]), F.lit(False))
        if self.kind == "unique":
            return None
        raise ValueError(f"unknown rule kind {self.kind!r}")


def not_null(col: str, name: Optional[str] = None) -> Rule:
    return Rule(name or f"not_null:{col}", "not_null", (col,))


def unique(*cols: str, name: Optional[str] = None) -> Rule:
    if not cols:
        raise ValueError("unique() needs at least one column")
    return Rule(name or f"unique:{','.join(cols)}", "unique", tuple(cols))


def accepted_values(col: str, values: Sequence[Any], name: Optional[str] = None) -> Rule:
    return Rule(
        name or f"accepted_values:{col}", "accepted_values", (col,), tuple(values)
    )


def in_range(col: str, lo: Any, hi: Any, name: Optional[str] = None) -> Rule:
    return Rule(name or f"in_range:{col}", "in_range", (col,), (lo, hi))


def matches_regex(col: str, pattern: str, name: Optional[str] = None) -> Rule:
    return Rule(name or f"matches_regex:{col}", "matches_regex", (col,), (pattern,))


def expression(name: str, sql_predicate: str) -> Rule:
    return Rule(name, "expression", (), (sql_predicate,))


def check(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate every rule; returns one row per rule:
    (rule, kind, n_violations, n_rows, passed).

    All row-level rules fold into ONE aggregation over a single scan;
    each ``unique`` rule adds one key-column groupBy. Results are unioned
    in rule order (the output is a handful of rows — ordering cost is
    nil)."""
    if not rules:
        raise ValueError("check() needs at least one rule")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")

    out_parts: list[DataFrame] = []
    row_rules = [r for r in rules if r.kind != "unique"]
    if row_rules:
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            F.coalesce(
                F.sum(F.when(~r.predicate(), 1).otherwise(0)), F.lit(0)
            ).alias(f"__v{i}")
            for i, r in enumerate(row_rules)
        ]
        summary = df.agg(*aggs)
        stacked = ", ".join(
            f"'{r.name.replace(chr(39), chr(39) * 2)}', '{r.kind}', __v{i}"
            for i, r in enumerate(row_rules)
        )
        out_parts.append(
            summary.selectExpr(
                f"stack({len(row_rules)}, {stacked}) AS (rule, kind, n_violations)",
                "__n AS n_rows",
            )
        )
    for r in rules:
        if r.kind != "unique":
            continue
        keys = [F.col(c) for c in r.columns]
        dups = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__c"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("__c") > 1, F.col("__c"))), F.lit(0)
                ).alias("n_violations"),
                F.coalesce(F.sum("__c"), F.lit(0)).alias("n_rows"),
            )
            .select(
                F.lit(r.name).alias("rule"),
                F.lit(r.kind).alias("kind"),
                F.col("n_violations").cast("long"),
                F.col("n_rows").cast("long"),
            )
        )
        out_parts.append(dups)
    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.unionByName(p)
    order = F.array_position(F.array(*[F.lit(n) for n in names]), F.col("rule"))
    return out.withColumn("passed", F.col("n_violations") == 0).orderBy(order)


def violations(
    df: DataFrame, rules: Sequence[Rule], keep_cols: Optional[Sequence[str]] = None
) -> DataFrame:
    """Offending rows with the list of failed row-level rules (quarantine
    path). ``unique`` rules are set-level and not included here — use
    ``duplicates`` for those. Zero shuffles: a projection + filter."""
    row_rules = [r for r in rules if r.kind != "unique"]
    if not row_rules:
        raise ValueError("violations() needs at least one row-level rule")
    failed = F.array_compact(
        F.array(
            *[
                F.when(~r.predicate(), F.lit(r.name))
                for r in row_rules
            ]
        )
    )
    out = df.withColumn("failed_rules", failed).filter(F.size("failed_rules") > 0)
    if keep_cols:
        out = out.select(*keep_cols, "failed_rules")
    return out


def duplicates(df: DataFrame, *cols: str) -> DataFrame:
    """Duplicate key tuples with their multiplicities (the set-level
    companion to ``violations``): one key-column groupBy, count > 1."""
    if not cols:
        raise ValueError("duplicates() needs at least one column")
    return (
        df.groupBy(*[F.col(c) for c in cols])
        .agg(F.count(F.lit(1)).alias("n_dup"))
        .filter(F.col("n_dup") > 1)
    )


def impute(
    df: DataFrame,
    cols: Sequence[str],
    strategy: str = "mean",
    group_cols=None,
    flag_col: Optional[str] = None,
) -> DataFrame:
    """Fill NULLs in numeric columns from per-group statistics:
    ``mean`` (published as CAST(exact DECIMAL sum AS DOUBLE)/count — the
    repo's fold-order-independent policy, so imputed values are
    bit-reproducible and cross-engine verifiable) or ``median`` (the
    shared interpolated-percentile definition). ``group_cols=None``
    imputes from the global statistic. NULL group values form their own
    group (null-safe join back, the flag_outliers convention); a group
    whose statistic is itself NULL (all values NULL) leaves the NULLs in
    place. ``flag_col`` optionally records which rows were imputed
    (one boolean per row: true iff ANY listed column was filled).

    Shape: ONE #groups-row aggregation broadcast back; the data never
    shuffles.
    """
    if strategy not in ("mean", "median"):
        raise ValueError("impute: strategy must be 'mean' or 'median'")
    cols = list(cols)
    if not cols:
        raise ValueError("impute: cols must be non-empty")
    groups = (
        [] if group_cols is None
        else [group_cols] if isinstance(group_cols, str)
        else list(group_cols)
    )
    from .common import broadcast_group_join, exact_mean

    aggs = []
    for c in cols:
        v = F.col(c)
        if strategy == "mean":
            stat = exact_mean(v)
        else:
            stat = F.percentile(v.cast("double"), F.lit(0.5))
        aggs.append(stat.alias(f"__fill_{c}"))
    stats = df.groupBy(*groups).agg(*aggs)
    joined = broadcast_group_join(df, groups, stats)
    was_null = None
    for c in cols:
        filled = F.col(c).isNull() & F.col(f"__fill_{c}").isNotNull()
        was_null = filled if was_null is None else (was_null | filled)
    out = joined
    if flag_col:
        out = out.withColumn(flag_col, was_null)
    for c in cols:
        dtype = dict(df.dtypes)[c]
        # NON-NULL values pass through UNTOUCHED (a double round-trip would
        # corrupt bigints > 2^53 and high-precision decimals); only the
        # fill value is cast to the column's dtype (fractional means
        # truncate into integer columns — inherent to in-dtype filling)
        out = out.withColumn(
            c, F.coalesce(F.col(c), F.col(f"__fill_{c}").cast(dtype))
        )
    return out.drop(*[f"__fill_{c}" for c in cols])


def corr_matrix(
    df: DataFrame,
    cols: Sequence[str],
) -> DataFrame:
    """Pairwise Pearson correlations of numeric columns: one row per
    unordered pair (col_a < col_b), computed in ONE aggregation pass
    (d(d-1)/2 corr expressions share the single scan/shuffle). Sample
    correlation — the definition Spark's corr() and DuckDB's corr()
    share. Values are floating aggregates (fold-order sensitive in the
    last ulps); the registry oracle compares at 6 significant digits, the
    profile_orders precedent.
    """
    cols = sorted(set(cols))
    if len(cols) < 2:
        raise ValueError("corr_matrix: need at least 2 columns")
    aggs = []
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            pairs.append((a, b))
            aggs.append(
                F.corr(F.col(a).cast("double"), F.col(b).cast("double"))
                .alias(f"__c_{len(aggs)}")
            )
    one = df.agg(*aggs)
    stacked = []
    for i, (a, b) in enumerate(pairs):
        stacked += [F.lit(a), F.lit(b), F.col(f"__c_{i}")]
    return one.select(
        F.stack(F.lit(len(pairs)), *stacked).alias("col_a", "col_b", "corr")
    )
