"""Privacy auditing: k-anonymity and l-diversity checks over
quasi-identifier columns — the governance companion to PII redaction
(ops/text.redact_pii): redaction removes direct identifiers; these audits
measure whether the REMAINING attribute combinations still single people
out (Sweeney 2002; Machanavajjhala et al. 2007 — public).

No reference counterpart (spec addition). A release gate for
training-data exports: every quasi-identifier combination must be shared
by >= k rows (k-anonymity), and within each combination the sensitive
attribute must take >= l distinct values (l-diversity — k-anonymity alone
leaks when a group is homogeneous in the sensitive column).

Scale shape: ONE groupBy on the quasi-identifier key per audit (map-side
partial combine; l-diversity piggybacks a distinct-count into the same
aggregation); the summary is a second aggregation over the (#groups)-row
frame. Violating-group listings stay distributed; only the 1-row summary
would ever be collected.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _group_sizes(
    df: DataFrame, quasi_cols: Sequence[str], sensitive_col: str | None = None
) -> DataFrame:
    if not quasi_cols:
        raise ValueError("privacy audit: need at least one quasi-identifier column")
    aggs = [F.count(F.lit(1)).alias("group_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).alias("sensitive_distinct")
        )
    return df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)


def k_anonymity_violations(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """Quasi-identifier combinations shared by FEWER than ``k`` rows —
    the groups whose members are re-identifiable: (quasi cols...,
    group_size). NULL attribute values are their own group (SQL groupBy
    semantics): an absent value is itself identifying."""
    if k < 2:
        raise ValueError(f"k_anonymity_violations: k must be >= 2, got {k}")
    return _group_sizes(df, quasi_cols).filter(F.col("group_size") < k)


def k_anonymity_report(
    df: DataFrame, quasi_cols: Sequence[str], k: int
) -> DataFrame:
    """One-row audit summary: (k, n_rows, n_groups, min_group_size,
    n_violating_groups, n_risk_rows, anonymous). ``n_risk_rows`` counts
    the actual people exposed (members of sub-k groups); ``anonymous``
    is the release gate."""
    if k < 2:
        raise ValueError(f"k_anonymity_report: k must be >= 2, got {k}")
    sizes = _group_sizes(df, quasi_cols)
    viol = F.col("group_size") < k
    return sizes.agg(
        F.lit(int(k)).alias("k"),
        F.coalesce(F.sum("group_size"), F.lit(0)).alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("group_size").alias("min_group_size"),
        F.coalesce(F.sum(F.when(viol, 1).otherwise(0)), F.lit(0)).alias(
            "n_violating_groups"
        ),
        F.coalesce(F.sum(F.when(viol, F.col("group_size"))), F.lit(0)).alias(
            "n_risk_rows"
        ),
    ).withColumn("anonymous", F.col("n_violating_groups") == 0)


def l_diversity_violations(
    df: DataFrame, quasi_cols: Sequence[str], sensitive_col: str, l: int
) -> DataFrame:
    """Quasi-identifier groups whose sensitive attribute takes FEWER than
    ``l`` distinct values: (quasi cols..., group_size,
    sensitive_distinct). These groups leak the sensitive value even when
    k-anonymous (everyone in the group shares it). NULL sensitive values
    count as one distinct value only if non-NULL values are absent —
    countDistinct ignores NULLs, so an all-NULL group reports 0."""
    if l < 2:
        raise ValueError(f"l_diversity_violations: l must be >= 2, got {l}")
    sizes = _group_sizes(df, quasi_cols, sensitive_col)
    return sizes.filter(F.col("sensitive_distinct") < l)


def anonymize_small_groups(
    df: DataFrame, quasi_cols: Sequence[str], k: int, method: str = "drop"
) -> DataFrame:
    """Enforce k-anonymity: ``method="drop"`` removes members of sub-k
    groups (suppression); ``method="null"`` keeps the rows but NULLs the
    quasi-identifier columns (generalization to the coarsest level).
    One groupBy + one narrow join of the (#violating-groups)-sized key
    frame back against the corpus — a broadcastable anti/left join for
    realistic violation counts."""
    if method not in ("drop", "null"):
        raise ValueError(f"anonymize_small_groups: unknown method {method!r}")
    viol_keys = k_anonymity_violations(df, quasi_cols, k).select(
        *[F.col(c).alias(f"__v_{c}") for c in quasi_cols]
    )
    cond = None
    for c in quasi_cols:
        eq = F.col(c).eqNullSafe(F.col(f"__v_{c}"))
        cond = eq if cond is None else cond & eq
    if method == "drop":
        return df.join(F.broadcast(viol_keys), cond, "left_anti")
    # membership is detected via a dedicated flag column: a NULL quasi
    # value inside a violating group would make any key column an
    # unusable marker (NULL either way)
    viol_flagged = viol_keys.withColumn("__viol", F.lit(True))
    joined = df.join(F.broadcast(viol_flagged), cond, "left")
    cols = []
    for c in df.columns:
        if c in quasi_cols:
            cols.append(
                F.when(F.col("__viol").isNull(), F.col(c)).alias(c)
            )
        else:
            cols.append(F.col(c))
    return joined.select(*cols)
