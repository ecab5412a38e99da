"""Change-data-capture application: fold a changes feed (insert / update /
delete rows) into a snapshot — the MERGE INTO / CDC-upsert shape that keeps
a continuously-updated corpus current without rewriting history by hand.

Spark-first shape and 100-TB posture:
- the changes side is first reduced to ONE final row per key (a window on
  the CHANGES frame only — the big snapshot is untouched by this step);
- the snapshot then anti-joins the change keys and unions the surviving
  inserts/updates. The anti join broadcasts whenever the change set is
  small (the overwhelmingly common case — a day's changes vs a 100-TB
  base), so the snapshot is never shuffled; with AQE the planner picks
  broadcast automatically from the reduced changes' runtime size.

Semantics (documented, oracle-verified in ``apply_changes_orders``):
- ``insert_op`` and ``update_op`` both mean UPSERT (replace-or-add) — the
  final state is the change row;
- ``delete_op`` removes the key;
- when ``seq_col`` is given, the change with the highest sequence wins per
  key (ties broken by op precedence delete > update > insert, making the
  fold deterministic); without it, duplicate keys in the change set are an
  error (``validate=True``) because the fold would be order-dependent.

No reference counterpart (the reference's delta/diff are read-side
incrementals; this is the write-side fold). Parity-adjacent:
``ops/diff.py`` computes the A/B diff this operator consumes.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Largest reduced change-key set apply_changes_scd2 will auto-broadcast
# (key + ts rows; 1M keeps the driver copy in the tens of MB — the
# _BLOOM_MAX_WORDS precedent of an explicit, documented size contract).
_SCD2_BROADCAST_MAX_KEYS = 1_000_000


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: Union[str, Sequence[str]],
    op_col: str = "op",
    seq_col: Optional[str] = None,
    insert_op: str = "I",
    update_op: str = "U",
    delete_op: str = "D",
    validate: bool = True,
) -> DataFrame:
    """Return the new snapshot after folding ``changes`` into ``base``.

    ``changes`` must carry every ``base`` column plus ``op_col`` (and
    ``seq_col`` when used); extra columns beyond those are rejected so a
    schema drift fails loudly instead of silently dropping data.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    base_cols = base.columns
    missing = [c for c in base_cols + [op_col] if c not in changes.columns]
    if missing:
        raise ValueError(f"apply_changes: changes missing columns {missing}")
    extra = [
        c for c in changes.columns
        if c not in base_cols and c not in {op_col, seq_col}
    ]
    if extra:
        raise ValueError(
            f"apply_changes: unexpected change columns {extra} — align the "
            "change schema with the snapshot before folding"
        )
    ops = {insert_op, update_op, delete_op}
    if validate:
        n_bad = changes.filter(~F.col(op_col).isin(*ops)).limit(1).count()
        if n_bad:
            raise ValueError(
                f"apply_changes: {op_col} contains values outside {sorted(ops)}"
            )

    # reduce the feed to one final row per key (changes frame only — the
    # snapshot is not involved). Op precedence on seq ties: D > U > I.
    prec = (
        F.when(F.col(op_col) == delete_op, 2)
        .when(F.col(op_col) == update_op, 1)
        .otherwise(0)
    )
    if seq_col is not None:
        w = Window.partitionBy(*key_list).orderBy(
            F.col(seq_col).desc(), prec.desc()
        )
        final = (
            changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", seq_col)
        )
    else:
        if validate:
            dup = (
                changes.groupBy(*key_list)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .count()
            )
            if dup:
                raise ValueError(
                    "apply_changes: duplicate keys in the change set need "
                    "seq_col to order them deterministically"
                )
        final = changes
    # snapshot rows whose key is untouched, plus the upsert payloads
    survivors = base.join(
        final.select(*key_list), on=key_list, how="left_anti"
    )
    upserts = final.filter(F.col(op_col) != delete_op).select(*base_cols)
    return survivors.unionByName(upserts)


def apply_changes_scd2(
    history: DataFrame,
    changes: DataFrame,
    keys: Union[str, Sequence[str]],
    ts_col: str,
    op_col: str = "op",
    seq_col: Optional[str] = None,
    insert_op: str = "I",
    update_op: str = "U",
    delete_op: str = "D",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    current_col: str = "is_current",
    validate: bool = True,
    broadcast: Optional[bool] = None,
) -> DataFrame:
    """Fold a changes feed into an SCD TYPE-2 history table: instead of
    overwriting (the :func:`apply_changes` upsert), every change CLOSES
    the key's current row (``to_col`` = change time, ``current_col`` =
    false) and — for inserts/updates — appends a new current version
    (``from_col`` = change time, open-ended). Old versions are never
    touched, so the table answers "what did this key look like at time
    T" with a simple ``from <= T < to`` predicate.

    ``history`` carries the key/attribute columns plus ``from_col`` /
    ``to_col`` / ``current_col``; ``changes`` carries the key/attribute
    columns plus ``op_col`` and ``ts_col`` (and ``seq_col`` when used,
    reduced exactly like apply_changes: highest seq wins, D > U > I on
    ties; without it duplicate keys are rejected under ``validate``).

    100-TB shape: the change feed reduces to one row per key on the
    CHANGES frame alone, then ONE left join against the history closes
    current rows in place — the history never shuffles on the broadcast
    path — and the new versions union on. The broadcast is no longer
    unconditional (r06 verdict #4 / advisor: CDC feeds are not inherently
    broadcast-sized, and a giant backfill would OOM the driver):
    ``broadcast=None`` (default) counts the reduced change keys with a
    bounded ``limit(N+1).count()`` preflight and broadcasts only when
    they fit under ``_SCD2_BROADCAST_MAX_KEYS`` (1M keys), otherwise
    planning a plain shuffle join; ``broadcast=True`` forces the hint
    (skips the preflight job — use when the caller knows the batch is a
    normal CDC tick); ``broadcast=False`` always shuffle-joins.
    Out-of-order batches fail loudly in-plan
    under ``validate`` (a change timestamped before the current row's
    ``from_col`` would create a negative validity interval).
    No reference counterpart; the Kimball SCD2 shape is public
    methodology.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    meta = {from_col, to_col, current_col}
    attr_cols = [c for c in history.columns if c not in set(key_list) | meta]
    missing_h = [c for c in (from_col, to_col, current_col) if c not in history.columns]
    if missing_h:
        raise ValueError(f"apply_changes_scd2: history missing {missing_h}")
    missing_c = [
        c for c in (*key_list, *attr_cols, op_col, ts_col)
        if c not in changes.columns
    ]
    if missing_c:
        raise ValueError(f"apply_changes_scd2: changes missing {missing_c}")
    ops = {insert_op, update_op, delete_op}
    if validate:
        n_bad = changes.filter(~F.col(op_col).isin(*ops)).limit(1).count()
        if n_bad:
            raise ValueError(
                f"apply_changes_scd2: {op_col} outside {sorted(ops)}"
            )

    prec = (
        F.when(F.col(op_col) == delete_op, 2)
        .when(F.col(op_col) == update_op, 1)
        .otherwise(0)
    )
    if seq_col is not None:
        w = Window.partitionBy(*key_list).orderBy(
            F.col(seq_col).desc(), prec.desc()
        )
        final = (
            changes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", seq_col)
        )
    else:
        if validate:
            dup = (
                changes.groupBy(*key_list).count()
                .filter(F.col("count") > 1).limit(1).count()
            )
            if dup:
                raise ValueError(
                    "apply_changes_scd2: duplicate keys in the change set "
                    "need seq_col to order them deterministically"
                )
        final = changes

    chg_keys = final.select(
        *key_list, F.col(ts_col).alias("__chg_ts")
    )
    if broadcast is None:
        # bounded preflight (the edit_distance_join precedent): scan at
        # most threshold+1 reduced change rows, never the history
        broadcast = (
            chg_keys.limit(_SCD2_BROADCAST_MAX_KEYS + 1).count()
            <= _SCD2_BROADCAST_MAX_KEYS
        )
    joined = history.join(
        F.broadcast(chg_keys) if broadcast else chg_keys, key_list, "left"
    )
    hit = F.col(current_col) & F.col("__chg_ts").isNotNull()
    new_to = F.when(hit, F.col("__chg_ts")).otherwise(F.col(to_col))
    if validate:
        new_to = F.when(
            hit & (F.col("__chg_ts") < F.col(from_col)),
            F.raise_error(F.concat(
                F.lit("apply_changes_scd2: out-of-order change — change ts "
                      "precedes the current row's "),
                F.lit(from_col),
            )),
        ).otherwise(new_to)
    closed = joined.select(
        *key_list,
        *attr_cols,
        F.col(from_col),
        new_to.alias(to_col),
        F.when(hit, F.lit(False)).otherwise(F.col(current_col))
        .alias(current_col),
    )
    news = final.filter(F.col(op_col) != delete_op).select(
        *key_list,
        *attr_cols,
        F.col(ts_col).alias(from_col),
        F.lit(None).cast(history.schema[to_col].dataType).alias(to_col),
        F.lit(True).alias(current_col),
    )
    return closed.unionByName(news)


def history_as_of(
    history: DataFrame,
    at,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    keep_validity: bool = False,
) -> DataFrame:
    """Point-in-time snapshot from an SCD2 history
    (:func:`apply_changes_scd2` output): the rows whose validity interval
    covers ``at`` (``from <= at < to``, open-ended current rows
    included). A pure filter — pushes to the scan when the history is
    stored partitioned/sorted on validity. ``keep_validity=False``
    (default) drops the bookkeeping columns so the result looks like a
    plain snapshot."""
    cond = (F.col(from_col) <= F.lit(at)) & (
        F.col(to_col).isNull() | (F.col(to_col) > F.lit(at))
    )
    out = history.filter(cond)
    if not keep_validity:
        drop = [c for c in (from_col, to_col, "is_current") if c in out.columns]
        out = out.drop(*drop)
    return out


def changes_between(
    old: DataFrame,
    new: DataFrame,
    keys: Union[str, Sequence[str]],
    op_col: str = "op",
) -> DataFrame:
    """Derive the change feed that turns ``old`` into ``new`` — the inverse
    of :func:`apply_changes` (``apply_changes(old, changes_between(old,
    new), keys)`` reproduces ``new``). Emits I/U/D rows in the new
    snapshot's schema; unchanged rows are omitted. One full-outer join on
    the keys — both sides shuffle once (this is the snapshot-diff shape,
    run at version-promotion time, not per-query)."""
    key_list = [keys] if isinstance(keys, str) else list(keys)
    if set(old.columns) != set(new.columns):
        raise ValueError("changes_between: snapshots must share a schema")
    val_cols = [c for c in new.columns if c not in key_list]
    o = old.select(
        *key_list, F.struct(*val_cols).alias("__old"), F.lit(True).alias("__in_old")
    )
    n = new.select(
        *key_list, F.struct(*val_cols).alias("__new"), F.lit(True).alias("__in_new")
    )
    j = o.join(n, on=key_list, how="full_outer")
    op = (
        F.when(F.col("__in_old").isNull(), "I")
        .when(F.col("__in_new").isNull(), "D")
        .when(~F.col("__old").eqNullSafe(F.col("__new")), "U")
    )
    j = j.withColumn(op_col, op).filter(F.col(op_col).isNotNull())
    payload = F.when(F.col(op_col) == "D", F.col("__old")).otherwise(F.col("__new"))
    return j.select(
        *key_list, *[payload[c].alias(c) for c in val_cols], F.col(op_col)
    )
