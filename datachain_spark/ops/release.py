"""Release review from persisted sketch state (r08 verdict task 5).

Composes the mergeable profile sketches (ops/sketches.profile_sketch /
merge_profile_sketches / histogram_quantiles) with the version catalog
into a ``release_report`` that compares dataset version N against N-1
WITHOUT scanning either version's data: every number is read off the
few-KB-per-group ``{name}__profile`` datasets persisted at save time.
At 100 TB this is the difference between a release gate that costs two
full scans and one that costs a metadata read — the historical version
may not even be retained anymore (vacuumed), and its profile still
answers.

- :func:`profile_version` — build and persist the profile of a version;
  with ``increment=`` it sketches ONLY the new rows and folds them into
  the previous version's stored profile (append-only contract), so even
  the new version is never fully rescanned.
- :func:`release_report` — per-group metric deltas + fixed-edge
  histogram PSI + interpolated quantile shifts, computed entirely from
  two stored profiles.
- :func:`schema_changes` — column add/remove/retype between two
  versions from the metastore's stored schemas; zero data touched.
- :func:`promote_report` / :func:`promote` — the composed publish gate
  (r09 verdict task 9): drift thresholds + schema policy + expectation
  rules in one decision frame; ``promote`` raises
  :class:`PromotionBlockedError` on any failed check.

No reference counterpart (the reference has no statistics store beyond
per-version row counts — spec addition for warehouse-scale release
gates).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: attrs keys stamped on every saved profile — the merge contract
_CFG_KEYS = ("profile_group_cols", "profile_value_col", "profile_lo",
             "profile_hi", "profile_bins", "profile_distinct_col")


def profile_version(
    name: str,
    group_cols: Union[str, Sequence[str], None] = None,
    value_col: Optional[str] = None,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
    bins: int = 64,
    distinct_col: Optional[str] = None,
    version: Optional[str] = None,
    increment: Optional[DataFrame] = None,
    base_version: Optional[str] = None,
    session=None,
):
    """Build the mergeable profile of a saved version of ``name`` and
    persist it as ``{name}__profile`` (versioned, lineage-linked by
    ``profile_of_version``, config stamped in attrs so later merges and
    reports can verify compatibility).

    ``group_cols=None`` profiles the whole version as one group (a
    constant ``__scope`` key).

    ``increment=<DataFrame>``: the APPEND-ONLY fast path — sketch only
    the given new rows and fold them into the PREVIOUS version's stored
    profile with :func:`~.sketches.merge_profile_sketches` (bin vectors
    add exactly, HLL registers union losslessly, so the merged profile
    is row-identical to profiling the whole new version). The caller
    owns the append-only contract (delta pipelines know their increment;
    a modified-in-place row would be double-counted).

    ``base_version=<data version>`` pins WHICH stored profile the
    increment folds into: the one whose ``profile_of_version`` matches,
    raising when absent. Without it the newest stored profile (of any
    version other than the target) is used — fine for a linear history,
    but a manual ``profile_version`` backfill of an OLDER version in
    between would silently become the merge base and double-count; delta
    pipelines always pass their snapshot's previous version.
    """
    from ..session import Session
    from .sketches import merge_profile_sketches, profile_sketch

    sess = Session.get() if session is None else session
    keys = (
        ["__scope"] if group_cols is None
        else [group_cols] if isinstance(group_cols, str)
        else list(group_cols)
    )
    rec = sess.metastore.get_record(name)
    if rec is None or not rec.versions:
        raise ValueError(f"profile_version: no versions of dataset {name!r}")
    dv = rec.get_version(version)

    def _sketch(df: DataFrame) -> DataFrame:
        if group_cols is None:
            df = df.withColumn("__scope", F.lit("all"))
        return profile_sketch(
            df, keys, value_col=value_col, distinct_col=distinct_col,
            lo=lo, hi=hi, bins=bins,
        )

    if increment is not None:
        if base_version is not None:
            # among (possibly several) stored profiles of the base
            # version, merge into the newest one built with THIS config —
            # a different-config backfill of the same version must not
            # become the base and raise the cfg-mismatch error mid-save
            from ..catalog.metastore import parse_version

            want = _cfg_attrs(keys, value_col, lo, hi, bins, distinct_col)
            prec = _profile_record(sess, name)
            matches = [
                v for v in (prec.versions if prec else [])
                if v.attrs.get("profile_of_version") == base_version
                and all(v.attrs.get(k, "") == want.get(k, "")
                        for k in _CFG_KEYS)
            ]
            if not matches:
                raise ValueError(
                    f"profile_version: increment= with base_version="
                    f"{base_version!r} but no stored profile of that "
                    f"version of {name!r} with this config exists — build "
                    "one full profile of the base first"
                )
            best = max(matches, key=lambda v: parse_version(v.version))
            prev_df = sess.spark.read.parquet(
                sess.metastore.version_data_path(
                    f"{name}__profile", best.version
                )
            )
            prev_attrs = best.attrs
        else:
            prev = _newest_profile(sess, name, exclude_version=dv.version)
            if prev is None:
                raise ValueError(
                    f"profile_version: increment= needs a previous profile "
                    f"of {name!r} to merge into — build one full profile "
                    "first"
                )
            prev_df, prev_attrs = prev
        cfg = _cfg_attrs(keys, value_col, lo, hi, bins, distinct_col)
        stale = {
            k for k in _CFG_KEYS if prev_attrs.get(k, "") != cfg.get(k, "")
        }
        if stale:
            raise ValueError(
                "profile_version: increment profile config differs from the "
                f"stored base profile on {sorted(stale)} — fixed edges and "
                "columns are the merge contract"
            )
        prof = merge_profile_sketches([prev_df, _sketch(increment)], keys)
    else:
        df, _, _ = sess.metastore.load_dataset(sess.spark, name, dv.version)
        prof = _sketch(df)

    attrs = {"profile_of": name, "profile_of_version": dv.version}
    attrs.update(_cfg_attrs(keys, value_col, lo, hi, bins, distinct_col))
    return sess.metastore.save_dataset(
        prof, f"{name}__profile", attrs=attrs,
        dependencies=[{"dataset": name, "version": dv.version}],
    )


def _cfg_attrs(keys, value_col, lo, hi, bins, distinct_col) -> dict:
    return {
        "profile_group_cols": ",".join(keys),
        "profile_value_col": value_col or "",
        "profile_lo": "" if lo is None else repr(float(lo)),
        "profile_hi": "" if hi is None else repr(float(hi)),
        "profile_bins": str(int(bins)),
        "profile_distinct_col": distinct_col or "",
    }


def _newest_profile(sess, name: str, exclude_version: Optional[str] = None):
    """(profile DataFrame, attrs) of the newest stored profile of ``name``
    whose source version is not ``exclude_version``; None when absent."""
    from ..catalog.metastore import parse_version, split_name

    pns, pproj, pbase = split_name(f"{name}__profile")
    prec = sess.metastore._read_record(pns, pproj, pbase)
    cands = [
        v for v in (prec.versions if prec else [])
        if v.attrs.get("profile_of_version") != exclude_version
    ]
    if not cands:
        return None
    best = max(cands, key=lambda v: parse_version(v.version))
    df, _, _ = sess.metastore.load_dataset(
        sess.spark, f"{name}__profile", best.version
    )
    return df, best.attrs


def _profile_record(sess, name: str):
    """The ``{name}__profile`` DatasetRecord (or None) — read ONCE per
    report/promote call and passed through every lookup below; each
    lookup used to re-read the same JSON manifest."""
    from ..catalog.metastore import split_name

    pns, pproj, pbase = split_name(f"{name}__profile")
    return sess.metastore._read_record(pns, pproj, pbase)


def _profile_for(sess, name: str, data_version: str, prec=None):
    from ..catalog.metastore import parse_version

    if prec is None:
        prec = _profile_record(sess, name)
    matches = [
        v for v in (prec.versions if prec else [])
        if v.attrs.get("profile_of_version") == data_version
    ]
    if not matches:
        raise ValueError(
            f"release_report: no stored profile for {name}@{data_version} — "
            "run profile_version at save time"
        )
    best = max(matches, key=lambda v: parse_version(v.version))
    df = sess.spark.read.parquet(
        sess.metastore.version_data_path(f"{name}__profile", best.version)
    )
    return df, best.attrs



def _compaction_chain(rec, version: str) -> set:
    """The set of versions that are the SAME logical release as
    ``version``: itself plus everything reachable through
    ``compacted_from`` links (a compacted copy rewrites files, not
    rows). Default old-version selection skips these — comparing a
    release against its own rewrite is vacuously drift-free."""
    chain = {version}
    cur = version
    while True:
        try:
            dv = rec.get_version(cur)
        except Exception:  # noqa: BLE001 - vacuumed ancestor: chain ends
            break
        src = dv.attrs.get("compacted_from")
        if not src or src in chain:
            break
        chain.add(src)
        cur = src
    return chain



def _default_old_release(rec, new_ver: str, label: str) -> str:
    """The newest version older than ``new_ver`` that is NOT part of its
    compaction chain — the default comparison base shared by
    release_report / schema_changes / the promotion audit. Raises when
    ``new_ver`` has no earlier RELEASE (only rewrites of itself)."""
    from ..catalog.metastore import parse_version

    ordered = sorted(rec.versions, key=lambda v: parse_version(v.version))
    same_release = _compaction_chain(rec, new_ver)
    older = [
        v for v in ordered
        if parse_version(v.version) < parse_version(new_ver)
        and v.version not in same_release
    ]
    if not older:
        skipped = sorted(same_release - {new_ver})
        raise ValueError(
            f"{label}: {rec.name!r} has no RELEASE before {new_ver}"
            + (f" (versions {skipped} are rewrites of the same "
               "release)" if skipped else "")
        )
    return older[-1].version


def _profile_for_release(sess, name: str, rec, version: str, prec=None):
    """Profile lookup that falls back through the version's compaction
    chain: a compacted copy made before profiles were re-linked (or with
    refresh_indexes=False) has no profile of its own, but its chain
    source's profile describes the exact same rows."""
    if prec is None:
        prec = _profile_record(sess, name)
    chain = sorted(
        _compaction_chain(rec, version),
        key=lambda v: (v != version, v),  # the version itself first
    )
    last_err = None
    for v in chain:
        try:
            return _profile_for(sess, name, v, prec=prec)
        except ValueError as exc:
            last_err = exc
    raise last_err


def release_report(
    name: str,
    v_old: Optional[str] = None,
    v_new: Optional[str] = None,
    qs: Sequence[float] = (0.5,),
    psi_eps: float = 0.5,
    round_dp: int = 6,
    session=None,
    _rec=None,
    _prec=None,
) -> DataFrame:
    """Version-over-version release review computed ENTIRELY from the two
    stored profiles — neither data version is scanned (plan-guarded in
    tests: no version data path appears in this DataFrame's plan).

    One row per group:
    ``(group..., n_rows_old, n_rows_new, n_rows_delta, n_value_old,
    n_value_new, mean_old, mean_new, min_old, min_new, max_old, max_new,
    psi[, p{q}_old, p{q}_new per q][, distinct_old, distinct_new])``

    - counts/min/max are EXACT (profile moments); means round to
      ``round_dp``.
    - ``psi`` is the population-stability index between the two
      fixed-edge histograms with Laplace smoothing ``psi_eps`` per bin
      (rounded) — the standard 0.1 watch / 0.2 alert thresholds apply.
    - quantiles interpolate within histogram bins (error <= one bin
      width, the histogram_quantiles bound).
    - HLL distinct estimates are reported when the profiles carry
      sketches; they are ESTIMATES (~2% at the default lg_k) — gate on
      ratios, not equality.

    Groups present in only one version report the other side's counts
    as 0 and value stats as NULL (an appeared/vanished group IS release
    news, not a join dropout).
    """
    from ..catalog.metastore import parse_version
    from ..session import Session

    sess = Session.get() if session is None else session
    rec = _rec if _rec is not None else sess.metastore.get_record(name)
    if rec is None or not rec.versions:
        raise ValueError(f"release_report: no versions of dataset {name!r}")
    prec = _prec if _prec is not None else _profile_record(sess, name)
    new_ver = rec.get_version(v_new).version
    if v_old is None:
        old_ver = _default_old_release(rec, new_ver, "release_report")
    else:
        from ..catalog.metastore import _VERSION_RE
        from ..error import DatasetVersionNotFoundError

        try:
            old_ver = rec.get_version(v_old).version
        except DatasetVersionNotFoundError:
            # the whole point of sketch-state comparison: the old DATA
            # version may already be vacuumed — an EXACT version string
            # still resolves through its surviving profile. A specifier
            # (">=2.0") that matches nothing is a caller error, not
            # vacuumed history — re-raise rather than probe profiles
            # with a pattern they can never carry.
            if not _VERSION_RE.match(str(v_old)):
                raise
            old_ver = str(v_old)

    old_prof, old_attrs = _profile_for_release(sess, name, rec, old_ver,
                                               prec=prec)
    new_prof, new_attrs = _profile_for_release(sess, name, rec, new_ver,
                                               prec=prec)
    stale = {
        k for k in _CFG_KEYS if old_attrs.get(k, "") != new_attrs.get(k, "")
    }
    if stale:
        raise ValueError(
            f"release_report: profile configs differ on {sorted(stale)} — "
            "profiles are only comparable with identical edges/columns"
        )
    keys = [k for k in new_attrs["profile_group_cols"].split(",") if k]
    has_hist = "hist" in new_prof.columns
    has_sketch = "approx_distinct" in new_prof.columns

    def _side(df: DataFrame, tag: str) -> DataFrame:
        cols = [F.col("n_rows").alias(f"n_rows_{tag}")]
        if has_hist:
            cols += [
                F.col("n_value").alias(f"n_value_{tag}"),
                F.col("sum_x").alias(f"sum_x_{tag}"),
                F.col("min_x").alias(f"min_{tag}"),
                F.col("max_x").alias(f"max_{tag}"),
                F.col("hist").alias(f"hist_{tag}"),
            ]
        if has_sketch:
            cols.append(
                F.round(F.col("approx_distinct"), 0)
                .cast("long").alias(f"distinct_{tag}")
            )
        return df.select(*keys, *cols)

    # null-SAFE key equality: profile_sketch keeps a NULL group key as a
    # real group; a plain on=keys join would split it into one vanished
    # + one appeared row instead of comparing it
    lhs = _side(old_prof, "old").alias("l")
    rhs = _side(new_prof, "new").alias("r")
    cond = None
    for k in keys:
        c = F.col(f"l.{k}").eqNullSafe(F.col(f"r.{k}"))
        cond = c if cond is None else cond & c
    joined = lhs.join(rhs, cond, "full")
    n_old = F.coalesce(F.col("n_rows_old"), F.lit(0).cast("long"))
    n_new = F.coalesce(F.col("n_rows_new"), F.lit(0).cast("long"))
    out_cols = [
        *[
            F.coalesce(F.col(f"l.{k}"), F.col(f"r.{k}")).alias(k)
            for k in keys
        ],
        n_old.alias("n_rows_old"),
        n_new.alias("n_rows_new"),
        (n_new - n_old).cast("long").alias("n_rows_delta"),
    ]
    if has_hist:
        lo = float(new_attrs["profile_lo"])
        hi = float(new_attrs["profile_hi"])
        bins = int(new_attrs["profile_bins"])
        width = (hi - lo) / bins

        def _mean(tag: str):
            return F.round(
                F.col(f"sum_x_{tag}")
                / F.nullif(F.col(f"n_value_{tag}"), F.lit(0)),
                round_dp,
            )

        # PSI over smoothed bin fractions; the fold over the bin arrays
        # is an ORDERED left fold — deterministic summation, replayable
        # bit-for-bit by an ordered oracle
        def _frac(tag: str):
            denom = (
                F.col(f"n_value_{tag}").cast("double")
                + F.lit(float(psi_eps) * bins)
            )
            return F.transform(
                F.col(f"hist_{tag}"),
                lambda c: (c.cast("double") + F.lit(float(psi_eps)))
                / denom,
            )

        psi = F.aggregate(
            F.zip_with(
                _frac("old"), _frac("new"),
                lambda a, b: (b - a) * F.log(b / a),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        both = (
            F.col("n_value_old").isNotNull()
            & (F.col("n_value_old") > 0)
            & F.col("n_value_new").isNotNull()
            & (F.col("n_value_new") > 0)
        )
        out_cols += [
            F.col("n_value_old"), F.col("n_value_new"),
            _mean("old").alias("mean_old"), _mean("new").alias("mean_new"),
            F.col("min_old"), F.col("min_new"),
            F.col("max_old"), F.col("max_new"),
            F.when(both, F.round(psi, round_dp)).alias("psi"),
        ]

        def _pq(tag: str, q: float):
            # first bin whose cumulative count reaches q*n, linearly
            # interpolated — the histogram_quantiles formula inlined over
            # the bin array (cum before the hit bin, then within-bin)
            h = F.col(f"hist_{tag}")
            n = F.col(f"n_value_{tag}").cast("double")
            target = F.lit(float(q)) * n
            # index of the first bin where running sum >= target:
            # fold carrying (cum, hit_bin, cum_before, cnt_at_hit)
            folded = F.aggregate(
                h,
                F.struct(
                    F.lit(0.0).alias("cum"),
                    F.lit(-1).alias("bin"),
                    F.lit(0.0).alias("before"),
                    F.lit(0.0).alias("cnt"),
                    F.lit(0).alias("i"),
                ),
                lambda acc, c: F.struct(
                    (acc["cum"] + c.cast("double")).alias("cum"),
                    F.when(
                        (acc["bin"] < 0)
                        & (acc["cum"] + c.cast("double") >= target),
                        acc["i"],
                    ).otherwise(acc["bin"]).alias("bin"),
                    F.when(
                        (acc["bin"] < 0)
                        & (acc["cum"] + c.cast("double") >= target),
                        acc["cum"],
                    ).otherwise(acc["before"]).alias("before"),
                    F.when(
                        (acc["bin"] < 0)
                        & (acc["cum"] + c.cast("double") >= target),
                        c.cast("double"),
                    ).otherwise(acc["cnt"]).alias("cnt"),
                    (acc["i"] + 1).alias("i"),
                ),
            )
            est = (
                F.lit(lo)
                + F.lit(width)
                * (
                    folded["bin"].cast("double")
                    + (target - folded["before"]) / folded["cnt"]
                )
            )
            return F.when(
                F.col(f"n_value_{tag}") > 0, F.round(est, round_dp)
            )

        for q in qs:
            label = f"p{int(round(float(q) * 100)):02d}"
            out_cols += [
                _pq("old", q).alias(f"{label}_old"),
                _pq("new", q).alias(f"{label}_new"),
            ]
    if has_sketch:
        out_cols += [F.col("distinct_old"), F.col("distinct_new")]
    return joined.select(*out_cols)


def schema_changes(
    name: str,
    v_old: Optional[str] = None,
    v_new: Optional[str] = None,
    session=None,
    _rec=None,
) -> DataFrame:
    """Column add/remove/retype between two saved versions, read from the
    metastore's STORED schemas — no data is touched, so it is free to
    run before any load (the drift.schema_drift semantics applied to
    version metadata instead of live DataFrames). One row per column
    present in either version:
    ``(column, status, old_type, new_type)``."""
    import json as _json

    from ..catalog.metastore import parse_version
    from ..session import Session

    sess = Session.get() if session is None else session
    rec = _rec if _rec is not None else sess.metastore.get_record(name)
    if rec is None or not rec.versions:
        raise ValueError(f"schema_changes: no versions of dataset {name!r}")
    new_dv = rec.get_version(v_new)
    if v_old is None:
        old_dv = rec.get_version(
            _default_old_release(rec, new_dv.version, "schema_changes")
        )
    else:
        old_dv = rec.get_version(v_old)

    def _types(dv) -> dict:
        fields = _json.loads(dv.schema_json).get("fields", [])
        out = {}
        for f in fields:
            t = f.get("type")
            out[f["name"]] = t if isinstance(t, str) else _json.dumps(t)
        return out

    ot, nt = _types(old_dv), _types(new_dv)
    rows = []
    for c in sorted(set(ot) | set(nt)):
        if c not in nt:
            st = "removed"
        elif c not in ot:
            st = "added"
        elif ot[c] != nt[c]:
            st = "type_changed"
        else:
            st = "unchanged"
        rows.append((c, st, ot.get(c), nt.get(c)))
    return sess.spark.createDataFrame(
        rows, "column string, status string, old_type string, new_type string"
    )


def promote_report(
    name: str,
    policy: Optional[dict] = None,
    rules: Optional[Sequence] = None,
    v_old: Optional[str] = None,
    v_new: Optional[str] = None,
    qs: Sequence[float] = (),
    round_dp: int = 6,
    session=None,
) -> DataFrame:
    """The dbt-style PUBLISH GATE over the sketch state (r09 verdict task
    9): compose :func:`release_report` (drift vs the previous version,
    profiles only), :func:`schema_changes` (stored schemas only), and
    ``expectations.check`` row-level rules (one scan of the CANDIDATE
    version — the only data this gate touches) into one decision frame:

    ``(check, target, value, threshold, passed)`` — one row per
    (policy check x group), per disallowed schema change, and per
    expectation rule, ordered by (check, target).

    Policy keys (every one optional; omitted checks emit no rows):

    - ``max_psi``: per-group PSI vs the previous version must not exceed
      this (the standard 0.2 alert threshold).
    - ``max_abs_row_delta_frac``: |n_new - n_old| / n_old per group.
      Groups present in only one version FAIL this check by definition —
      an appeared group (n_old = 0) publishes value NULL, a vanished
      group (n_new = 0) publishes 1.0; both get passed=false (a group
      appearing or disappearing is release news, never inside budget).
    - ``min_rows``: per-group floor on the new version's row count.
    - ``allow_added_columns`` / ``allow_removed_columns`` /
      ``allow_type_changes`` (default True/False/False): disallowed
      schema changes emit a failed row each; allowed ones emit nothing.

    100-TB shape: drift and schema checks read KB-sized persisted state;
    the expectation rules fold into ONE map-side-combined aggregation
    over the candidate version. Use :func:`promote` for the boolean
    verdict + raise-on-block behavior."""
    from ..session import Session

    sess = Session.get() if session is None else session
    spark = sess.spark
    pol = dict(policy or {})
    parts: list[DataFrame] = []
    # one read of each manifest per gate call — release_report,
    # schema_changes, and the group-key lookup below all reuse these
    # instead of re-reading the same JSON record per lookup
    rec = sess.metastore.get_record(name)
    if rec is None or not rec.versions:
        raise ValueError(f"promote_report: no versions of {name!r}")
    prec = _profile_record(sess, name)
    new_ver = rec.get_version(v_new).version

    schema_pol = {
        "added": bool(pol.get("allow_added_columns", True)),
        "removed": bool(pol.get("allow_removed_columns", False)),
        "type_changed": bool(pol.get("allow_type_changes", False)),
    }
    drift_keys = [k for k in ("max_psi", "max_abs_row_delta_frac",
                              "min_rows") if k in pol]
    if drift_keys:
        rep = release_report(
            name, v_old=v_old, v_new=v_new, qs=qs, round_dp=round_dp,
            session=sess, _rec=rec, _prec=prec,
        )
        # group keys come from the profile attrs — the same authority
        # release_report reads (incl. its compaction-chain fallback: a
        # head compacted with refresh_indexes=False has no profile of
        # its own, and the gate must not crash where release_report
        # succeeds) — never from pattern-matching output column names (a
        # group column NAMED like a metric would corrupt every check's
        # target otherwise)
        _, new_attrs = _profile_for_release(sess, name, rec, new_ver,
                                            prec=prec)
        keys = [k for k in new_attrs["profile_group_cols"].split(",") if k]
        target = F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
        if "max_psi" in pol:
            if "psi" not in rep.columns:
                raise ValueError(
                    "promote_report: max_psi needs histogram profiles — "
                    "build them with profile_version(value_col=, lo=, hi=)"
                )
            thr = float(pol["max_psi"])
            parts.append(rep.select(
                F.lit("psi").alias("check"),
                target.alias("target"),
                F.col("psi").cast("double").alias("value"),
                F.lit(thr).alias("threshold"),
                # a group with no comparable histogram (one-sided) fails
                F.coalesce(F.col("psi") <= thr, F.lit(False)).alias("passed"),
            ))
        if "max_abs_row_delta_frac" in pol:
            thr = float(pol["max_abs_row_delta_frac"])
            frac = F.when(
                F.col("n_rows_old") > 0,
                F.round(
                    F.abs(F.col("n_rows_delta").cast("double"))
                    / F.col("n_rows_old").cast("double"),
                    round_dp,
                ),
            )
            parts.append(rep.select(
                F.lit("row_delta").alias("check"),
                target.alias("target"),
                frac.alias("value"),
                F.lit(thr).alias("threshold"),
                # vanished groups (n_new = 0) fail regardless of budget;
                # appeared groups fail via the NULL-frac coalesce
                F.when(F.col("n_rows_new") == 0, F.lit(False))
                .otherwise(F.coalesce(frac <= thr, F.lit(False)))
                .alias("passed"),
            ))
        if "min_rows" in pol:
            thr = float(pol["min_rows"])
            parts.append(rep.select(
                F.lit("min_rows").alias("check"),
                target.alias("target"),
                F.col("n_rows_new").cast("double").alias("value"),
                F.lit(thr).alias("threshold"),
                (F.col("n_rows_new") >= thr).alias("passed"),
            ))

    disallowed = [st for st, ok in schema_pol.items() if not ok]
    if disallowed:
        from ..catalog.metastore import _VERSION_RE
        from ..error import DatasetVersionNotFoundError

        try:
            sch = schema_changes(name, v_old=v_old, v_new=v_new,
                                 session=sess, _rec=rec)
        except DatasetVersionNotFoundError:
            if v_old is None or not _VERSION_RE.match(str(v_old)):
                raise
            # the old version was vacuumed: its profile survives (the
            # drift checks above still work) but its SCHEMA record is
            # gone — a gate that cannot verify a disallowed change must
            # fail closed, visibly, not guess
            sch = None
            parts.append(sess.spark.createDataFrame(
                [("schema_unverifiable", str(v_old), None, 0.0, False)],
                "check string, target string, value double, "
                "threshold double, passed boolean",
            ))
        if sch is not None:
            parts.append(
                sch.filter(F.col("status").isin(disallowed)).select(
                    F.concat(F.lit("schema_"), F.col("status")).alias("check"),
                    F.col("column").alias("target"),
                    F.lit(None).cast("double").alias("value"),
                    F.lit(0.0).alias("threshold"),
                    F.lit(False).alias("passed"),
                )
            )

    if rules:
        from .expectations import check as _check

        df, _, _ = sess.metastore.load_dataset(spark, name, new_ver)
        parts.append(_check(df, list(rules)).select(
            F.lit("expectation").alias("check"),
            F.col("rule").alias("target"),
            F.col("n_violations").cast("double").alias("value"),
            F.lit(0.0).alias("threshold"),
            F.col("passed"),
        ))

    if not parts:
        raise ValueError(
            "promote_report: empty policy — set at least one of max_psi/"
            "max_abs_row_delta_frac/min_rows/schema allow_*/rules"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("check", "target")


class PromotionBlockedError(RuntimeError):
    """Raised by :func:`promote` when any gate check fails."""


def promote(
    name: str,
    policy: Optional[dict] = None,
    rules: Optional[Sequence] = None,
    v_old: Optional[str] = None,
    v_new: Optional[str] = None,
    raise_on_block: bool = True,
    audit: bool = True,
    session=None,
):
    """Run the publish gate and return ``(passed, report_rows)`` — or
    raise :class:`PromotionBlockedError` listing every failed check when
    ``raise_on_block`` (the default). The report is tiny (one row per
    check x group/rule); collecting it here is driver-sized by
    construction.

    ``audit=True`` (default) persists the outcome — every check row plus
    the resolved versions, the policy, and the verdict — as a new
    version of ``{name}__promotions`` BEFORE any raise, so a blocked
    gate leaves the same evidence a passing one does. Read it back with
    :func:`promotions` or the ``promotions`` CLI command. (r10 verdict
    task 8: a release should carry its gate evidence.)"""
    from ..session import Session

    sess = Session.get() if session is None else session
    rep = promote_report(
        name, policy=policy, rules=rules, v_old=v_old, v_new=v_new,
        session=sess,
    ).collect()
    failed = [r for r in rep if not r["passed"]]
    if audit:
        _audit_promotion(
            sess, name, policy, rules, v_old, v_new, rep,
            gate_passed=not failed,
        )
    if failed and raise_on_block:
        lines = ", ".join(
            f"{r['check']}[{r['target']}]"
            + (f"={r['value']}" if r["value"] is not None else "")
            for r in failed[:20]
        )
        raise PromotionBlockedError(
            f"promotion of {name!r} blocked by {len(failed)} failed "
            f"check(s): {lines}"
        )
    return (not failed), rep


def _audit_promotion(
    sess, name, policy, rules, v_old, v_new, rep_rows, gate_passed: bool
) -> None:
    """Persist one promote outcome as a new ``{name}__promotions``
    version: the collected check rows, widened with the resolved version
    pair, the canonical policy JSON, and the gate verdict. Driver-sized
    (the report was already collected); the version metadata carries the
    same facts in attrs for listing without reading rows."""
    import json as _json

    rec = sess.metastore.get_record(name)
    new_ver = rec.get_version(v_new).version
    if v_old is not None:
        # persist the RESOLVED comparison base (a specifier like
        # '<1.0.2' resolves differently as releases accrue — the audit
        # must pin the version actually compared), with the same
        # vacuumed-exact-version fallback release_report uses
        from ..catalog.metastore import _VERSION_RE
        from ..error import DatasetVersionNotFoundError

        try:
            old_ver = rec.get_version(str(v_old)).version
        except DatasetVersionNotFoundError:
            if not _VERSION_RE.match(str(v_old)):
                raise
            old_ver = str(v_old)
    else:
        try:
            old_ver = _default_old_release(rec, new_ver, "promote")
        except ValueError:
            old_ver = ""  # single-release gate (rules/min_rows only)
    pol_json = _json.dumps(dict(policy or {}), sort_keys=True,
                           separators=(",", ":"))
    rows = [
        (r["check"], r["target"], r["value"], r["threshold"],
         bool(r["passed"]), old_ver, new_ver, bool(gate_passed), pol_json)
        for r in rep_rows
    ]
    df = sess.spark.createDataFrame(
        rows,
        "check string, target string, value double, threshold double, "
        "passed boolean, v_old string, v_new string, gate_passed boolean, "
        "policy string",
    )
    sess.metastore.save_dataset(
        df, f"{name}__promotions",
        attrs={
            "promotions_of": name,
            "gate_v_old": old_ver,
            "gate_v_new": new_ver,
            "gate_passed": "true" if gate_passed else "false",
            "gate_policy": pol_json,
            "gate_n_rules": str(len(list(rules or []))),
            "gate_n_failed": str(sum(1 for r in rep_rows if not r["passed"])),
        },
        dependencies=[{"dataset": name, "version": new_ver}],
    )


def promotions(name: str, session=None) -> DataFrame:
    """Every persisted promotion outcome of ``name`` (see
    :func:`promote` ``audit=``): the stored check rows of ALL
    ``{name}__promotions`` versions, widened with ``audit_id`` (the
    audit version that recorded them). KB-sized by construction — one
    row per check x group per gate run; no data version is touched."""
    from ..catalog.metastore import parse_version, split_name
    from ..session import Session

    sess = Session.get() if session is None else session
    ns, proj, base = split_name(f"{name}__promotions")
    rec = sess.metastore._read_record(ns, proj, base)
    if rec is None or not rec.versions:
        raise ValueError(
            f"promotions: no recorded promotions of {name!r} — run "
            "promote(name, ..., audit=True) first"
        )
    out = None
    for v in sorted(rec.versions, key=lambda v: parse_version(v.version)):
        df = sess.spark.read.parquet(
            sess.metastore.version_data_path(f"{name}__promotions", v.version)
        ).withColumn("audit_id", F.lit(v.version))
        out = df if out is None else out.unionByName(df)
    return out
