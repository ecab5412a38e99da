"""Release review from persisted sketch state (ops/release): profile
persistence, increment-merge == full-profile equality, the sketch-only
report (with the no-data-scan plan guard), and schema_changes from
stored metadata."""

import pytest
from pyspark.sql import functions as F

import datachain_spark as dc
from datachain_spark.ops.release import (
    profile_version,
    release_report,
    schema_changes,
)


@pytest.fixture()
def fresh_ms(session, tmp_path):
    from datachain_spark.catalog.metastore import Metastore

    old = session.metastore
    session.metastore = Metastore(str(tmp_path / "ms"))
    yield session.metastore
    session.metastore = old


CFG = dict(group_cols="o_orderpriority", value_col="o_totalprice",
           lo=0.0, hi=600000.0, bins=64, distinct_col="o_custkey")


def _orders(session, sf_dir):
    return dc.read_parquet(f"{sf_dir}/orders.parquet", session=session)


def test_profile_increment_merge_equals_full(session, sf_dir, fresh_ms):
    orders = _orders(session, sf_dir)
    v1 = orders.filter(dc.C("o_orderkey") % 3 != 0)
    inc = orders.filter(dc.C("o_orderkey") % 3 == 0)
    v1.save("relp")
    profile_version("relp", **CFG)
    orders.save("relp")
    profile_version("relp", increment=inc.df, **CFG)

    # the merged profile must be row-identical to profiling v2 whole
    from datachain_spark.ops.release import _profile_for

    rec = fresh_ms.get_record("relp")
    merged, _ = _profile_for(session, "relp", rec.latest_version().version)
    from datachain_spark.ops.sketches import profile_sketch

    full = profile_sketch(orders.df, ["o_orderpriority"], **{
        k: v for k, v in CFG.items() if k != "group_cols"})
    m = {r["o_orderpriority"]: r for r in merged.collect()}
    f = {r["o_orderpriority"]: r for r in full.collect()}
    assert set(m) == set(f)
    for k in f:
        assert m[k]["n_rows"] == f[k]["n_rows"]
        assert m[k]["n_value"] == f[k]["n_value"]
        assert list(m[k]["hist"]) == list(f[k]["hist"])
        assert m[k]["min_x"] == f[k]["min_x"]
        assert m[k]["max_x"] == f[k]["max_x"]
        # HLL register union of disjoint shards == direct sketch estimate
        assert m[k]["approx_distinct"] == pytest.approx(
            f[k]["approx_distinct"], rel=1e-9
        )


def test_release_report_values_and_plan_guard(session, sf_dir, fresh_ms):
    orders = _orders(session, sf_dir)
    v1 = orders.filter(dc.C("o_orderkey") % 3 != 0)
    v1.save("relr")
    profile_version("relr", **CFG)
    orders.save("relr")
    profile_version("relr", **CFG)

    rep = release_report("relr")
    # --- plan guard: NEITHER data version is scanned ---
    rec = fresh_ms.get_record("relr")
    files = rep.inputFiles()
    assert files, "report must read the stored profiles"
    for v in rec.versions:
        data_path = fresh_ms.version_data_path("relr", v.version)
        assert not any(data_path in f for f in files), (
            f"report scans {data_path}"
        )
    assert all("relr__profile" in f for f in files)

    rows = {r["o_orderpriority"]: r for r in rep.collect()}
    want_old = {r["o_orderpriority"]: r["n"] for r in
                v1.df.groupBy("o_orderpriority").agg(
                    F.count("*").alias("n")).collect()}
    want_new = {r["o_orderpriority"]: r["n"] for r in
                orders.df.groupBy("o_orderpriority").agg(
                    F.count("*").alias("n")).collect()}
    for g, r in rows.items():
        assert r["n_rows_old"] == want_old[g]
        assert r["n_rows_new"] == want_new[g]
        assert r["n_rows_delta"] == want_new[g] - want_old[g]
        assert r["min_new"] <= r["p50_new"] <= r["max_new"]
        assert r["psi"] is not None and r["psi"] >= 0.0
        # same distribution family (v1 is a ~uniform 2/3 sample): tiny psi
        assert r["psi"] < 0.1
        # HLL estimates near the exact distinct counts
        exact_new = orders.df.filter(
            F.col("o_orderpriority") == g
        ).select("o_custkey").distinct().count()
        assert abs(r["distinct_new"] - exact_new) / exact_new < 0.05
        # p50 within one bin width of the exact median
        med = orders.df.filter(F.col("o_orderpriority") == g).agg(
            F.expr("percentile(o_totalprice, 0.5)")
        ).first()[0]
        assert abs(r["p50_new"] - med) <= (600000.0 / 64)
    # mean check (exact moments, rounded)
    g0 = next(iter(rows))
    exact_mean = orders.df.filter(F.col("o_orderpriority") == g0).agg(
        F.avg("o_totalprice")).first()[0]
    assert rows[g0]["mean_new"] == pytest.approx(exact_mean, abs=1e-4)


def test_release_report_detects_drift_and_new_groups(session, fresh_ms):
    spark = session.spark
    base = spark.range(4000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 100).cast("double").alias("x"),
    )
    dc.DataChain(base, session).save("reld")
    profile_version("reld", group_cols="g", value_col="x",
                    lo=0.0, hi=400.0, bins=40)
    # v2: group 0 shifts up by 200; a brand-new group appears
    shifted = spark.range(4000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.when(F.col("id") % 2 == 0, (F.col("id") % 100) + 200.0)
        .otherwise((F.col("id") % 100).cast("double")).alias("x"),
    ).union(
        spark.range(10).select(
            F.lit("9").alias("g"), F.lit(42.0).alias("x")
        )
    )
    dc.DataChain(shifted, session).save("reld")
    profile_version("reld", group_cols="g", value_col="x",
                    lo=0.0, hi=400.0, bins=40)
    rows = {r["g"]: r for r in release_report("reld").collect()}
    assert rows["0"]["psi"] > 1.0      # hard shift
    assert rows["1"]["psi"] < 0.01     # unchanged
    assert rows["9"]["n_rows_old"] == 0 and rows["9"]["n_rows_new"] == 10
    assert rows["9"]["psi"] is None    # nothing to compare against


def test_release_report_config_mismatch_raises(session, sf_dir, fresh_ms):
    orders = _orders(session, sf_dir)
    orders.filter(dc.C("o_orderkey") % 3 != 0).save("relc")
    profile_version("relc", **CFG)
    orders.save("relc")
    bad = dict(CFG, bins=32)
    profile_version("relc", **bad)
    with pytest.raises(ValueError, match="configs differ"):
        release_report("relc")
    with pytest.raises(ValueError, match="merge contract"):
        profile_version("relc", increment=orders.df.limit(1),
                        **dict(CFG, bins=16))


def test_schema_changes_no_scan(session, sf_dir, fresh_ms):
    orders = _orders(session, sf_dir)
    orders.select("o_orderkey", "o_totalprice").save("rels")
    orders.select(
        "o_orderkey",
        F.col("o_totalprice").cast("string").alias("o_totalprice"),
        F.lit(1).alias("flag"),
    ).save("rels")
    rows = {r["column"]: r for r in schema_changes("rels").collect()}
    assert rows["flag"]["status"] == "added"
    assert rows["o_totalprice"]["status"] == "type_changed"
    assert rows["o_orderkey"]["status"] == "unchanged"


def test_release_report_unknown_specifier_raises(session, sf_dir, fresh_ms):
    """A version SPECIFIER that matches nothing is a caller error — only
    an exact (possibly vacuumed) version string falls through to the
    profile lookup."""
    from datachain_spark.error import DatasetVersionNotFoundError

    orders = _orders(session, sf_dir)
    orders.filter(dc.C("o_orderkey") % 3 != 0).save("relx")
    profile_version("relx", **CFG)
    orders.save("relx")
    profile_version("relx", **CFG)
    with pytest.raises(DatasetVersionNotFoundError):
        release_report("relx", v_old=">=9.0")
    # exact-but-absent version string still probes the profiles (and a
    # version that never had one reports the profile, not the record)
    with pytest.raises(ValueError, match="no stored profile"):
        release_report("relx", v_old="0.9.9")


def test_promote_report_composition_and_plan_guard(session, sf_dir, fresh_ms):
    """The publish gate composes drift + schema + expectation checks into
    one (check, target, value, threshold, passed) frame; with no rules,
    the gate reads ONLY sketch state (no data version in the plan)."""
    from datachain_spark.ops import expectations as ex
    from datachain_spark.ops.release import promote_report

    orders = _orders(session, sf_dir)
    orders.filter(dc.C("o_orderkey") % 3 != 0).save("prom")
    profile_version("prom", **CFG)
    orders.save("prom")
    profile_version("prom", **CFG)

    rep = promote_report(
        "prom",
        policy=dict(max_psi=0.2, max_abs_row_delta_frac=0.3, min_rows=10),
    )
    files = rep.inputFiles()
    assert files and all("__profile" in f for f in files), files[:3]
    rows = rep.collect()
    by_check = {}
    for r in rows:
        by_check.setdefault(r["check"], []).append(r)
    assert set(by_check) == {"psi", "row_delta", "min_rows"}
    assert all(r["passed"] for r in by_check["psi"])  # same distribution
    # v2 adds ~50% rows per group -> row_delta fails at 0.3
    assert all(not r["passed"] for r in by_check["row_delta"])
    assert all(r["passed"] for r in by_check["min_rows"])

    # expectation rules scan the CANDIDATE version only
    rep2 = promote_report(
        "prom",
        policy=dict(min_rows=1),
        rules=[ex.not_null("o_totalprice"),
               ex.expression("no_div3", "o_orderkey % 3 != 0")],
    )
    got = {r["target"]: r for r in rep2.collect() if r["check"] == "expectation"}
    assert got["not_null:o_totalprice"]["passed"]
    assert not got["no_div3"]["passed"]  # v2 contains %3==0 rows
    assert got["no_div3"]["value"] == orders.df.filter(
        F.col("o_orderkey") % 3 == 0
    ).count()


def test_promote_blocks_and_passes(session, sf_dir, fresh_ms):
    from datachain_spark.ops.release import PromotionBlockedError, promote

    orders = _orders(session, sf_dir)
    orders.filter(dc.C("o_orderkey") % 3 != 0).save("promg")
    profile_version("promg", **CFG)
    orders.save("promg")
    profile_version("promg", **CFG)

    ok, rows = promote("promg", policy=dict(max_psi=0.2, min_rows=10))
    assert ok and rows
    with pytest.raises(PromotionBlockedError, match="row_delta"):
        promote("promg", policy=dict(max_abs_row_delta_frac=0.1))
    ok2, rows2 = promote(
        "promg", policy=dict(max_abs_row_delta_frac=0.1),
        raise_on_block=False,
    )
    assert not ok2 and any(not r["passed"] for r in rows2)


def test_promote_schema_policy(session, sf_dir, fresh_ms):
    from datachain_spark.ops.release import promote

    orders = _orders(session, sf_dir)
    cfg = dict(CFG, value_col="o_orderkey", distinct_col=None)
    orders.select("o_orderkey", "o_totalprice", "o_orderpriority").save("proms")
    profile_version("proms", **cfg)
    orders.select("o_orderkey", "o_orderpriority").save("proms")
    profile_version("proms", **cfg)
    ok, rows = promote("proms", policy=dict(min_rows=1),
                       raise_on_block=False)
    failed = [r for r in rows if not r["passed"]]
    assert [(r["check"], r["target"]) for r in failed] == [
        ("schema_removed", "o_totalprice")
    ]
    ok2, _ = promote(
        "proms", policy=dict(min_rows=1, allow_removed_columns=True),
        raise_on_block=False,
    )
    assert ok2

    with pytest.raises(ValueError, match="empty policy"):
        promote("proms", policy=dict(allow_removed_columns=True,
                                     allow_type_changes=True))


def test_cli_promote(session, sf_dir, capsys):
    from datachain_spark.cli import main

    orders = _orders(session, sf_dir)
    # the CLI builds its own Session on --metastore; use the session's
    # real metastore dir (not the fresh_ms swap) so both sides agree
    orders.filter(dc.C("o_orderkey") % 3 != 0).save("cli_prom")
    profile_version("cli_prom", **CFG)
    orders.save("cli_prom")
    profile_version("cli_prom", **CFG)
    ms = session.metastore_dir
    assert main(["--metastore", ms, "promote", "cli_prom",
                 "--max-psi", "0.2", "--min-rows", "1"]) == 0
    out = capsys.readouterr().out
    assert "promotion: PASS" in out
    assert main(["--metastore", ms, "promote", "cli_prom",
                 "--max-row-delta", "0.1"]) == 1
    out = capsys.readouterr().out
    assert "promotion: BLOCKED" in out and "FAIL row_delta" in out


def test_promote_vanished_group_fails_row_delta(session, fresh_ms):
    """A group that disappears in the new version must FAIL row_delta
    even when its 1.0 fraction is inside the budget — a vanished group
    is never 'within budget'."""
    from datachain_spark.ops.release import promote

    spark = session.spark
    v1 = spark.range(200).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.col("id").cast("double").alias("x"),
    )
    dc.DataChain(v1, session).save("vang")
    profile_version("vang", group_cols="g", value_col="x",
                    lo=0.0, hi=200.0, bins=8)
    dc.DataChain(v1.filter(F.col("g") == "0"), session).save("vang")
    profile_version("vang", group_cols="g", value_col="x",
                    lo=0.0, hi=200.0, bins=8)
    ok, rows = promote("vang", policy=dict(max_abs_row_delta_frac=2.0),
                       raise_on_block=False)
    deltas = {r["target"]: r for r in rows if r["check"] == "row_delta"}
    assert deltas["0"]["passed"]          # unchanged group inside budget
    assert not deltas["1"]["passed"]      # vanished group fails closed
    assert deltas["1"]["value"] == 1.0
    assert not ok


def test_promote_max_psi_without_histogram_raises(session, sf_dir, fresh_ms):
    from datachain_spark.ops.release import promote

    orders = _orders(session, sf_dir)
    orders.filter(dc.C("o_orderkey") % 3 != 0).save("nohist")
    profile_version("nohist", group_cols="o_orderpriority",
                    distinct_col="o_custkey")
    orders.save("nohist")
    profile_version("nohist", group_cols="o_orderpriority",
                    distinct_col="o_custkey")
    with pytest.raises(ValueError, match="histogram"):
        promote("nohist", policy=dict(max_psi=0.2))
    # moments-free checks still work on the same profiles
    ok, _ = promote("nohist", policy=dict(min_rows=1),
                    raise_on_block=False)
    assert ok


def test_promote_vacuumed_old_version(session, sf_dir, fresh_ms):
    """Drift checks answer about a vacuumed old version from its
    surviving profile; a disallowed-schema check that can no longer be
    verified (the schema record is gone) fails CLOSED with a visible
    schema_unverifiable row instead of raising or silently passing."""
    from datachain_spark.ops.release import promote

    orders = _orders(session, sf_dir)
    for flt in (dc.C("o_orderkey") % 3 != 0, dc.C("o_orderkey") >= 0):
        orders.filter(flt).save("pvac")
        profile_version("pvac", **CFG)
    removed = fresh_ms.vacuum_dataset("pvac", keep_last=1)
    assert removed == ["1.0.0"]
    # schema checks all allowed: the gate runs purely from sketch state
    ok, rows = promote(
        "pvac", v_old="1.0.0",
        policy=dict(max_psi=0.2, allow_removed_columns=True,
                    allow_type_changes=True),
        raise_on_block=False,
    )
    assert ok and all(r["check"] == "psi" for r in rows)
    # schema checks disallowed (default): fail closed, visibly
    ok2, rows2 = promote("pvac", v_old="1.0.0",
                         policy=dict(max_psi=0.2), raise_on_block=False)
    assert not ok2
    assert [(r["check"], r["passed"]) for r in rows2
            if r["check"] == "schema_unverifiable"] == [
        ("schema_unverifiable", False)
    ]


def test_cli_promote_empty_policy_is_cli_error(session, sf_dir, capsys):
    from datachain_spark.cli import main

    orders = _orders(session, sf_dir)
    orders.save("cli_empty")
    assert main(["--metastore", session.metastore_dir, "promote",
                 "cli_empty", "--allow-removed-columns",
                 "--allow-type-changes"]) == 2
    assert "empty policy" in capsys.readouterr().err


def test_release_default_old_skips_compaction_chain(session, sf_dir, fresh_ms):
    """A compacted copy is the SAME logical release as its source: the
    default old-version pick must skip v_new's compaction ancestry, so
    the report compares releases — not a release against its own
    rewrite (which is vacuously drift-free)."""
    orders = _orders(session, sf_dir)
    orders.filter(dc.C("o_orderkey") % 3 != 0).save("relcc")
    profile_version("relcc", **CFG)            # v 1.0.0 (release A)
    orders.save("relcc")                        # v 1.0.1 (release B)
    profile_version("relcc", **CFG)
    fresh_ms.compact_dataset(session.spark, "relcc",
                             target_file_bytes=1 << 30)  # v 1.0.2 = B'
    rows = release_report("relcc").collect()    # B' vs ?? -> must be A
    assert rows and all(r["n_rows_new"] > r["n_rows_old"] for r in rows)
    # schema default pick follows the same rule
    st = {r["status"] for r in schema_changes("relcc").collect()}
    assert st == {"unchanged"}


def test_release_profile_falls_back_through_compaction_chain(
    session, sf_dir, fresh_ms
):
    """A compacted copy without its own profile (refresh_indexes=False,
    or a pre-relink era copy) answers release_report through its chain
    source's profile — identical rows, identical sketch."""
    orders = _orders(session, sf_dir)
    orders.filter(dc.C("o_orderkey") % 3 != 0).save("relfb")
    profile_version("relfb", **CFG)
    orders.save("relfb")
    profile_version("relfb", **CFG)
    fresh_ms.compact_dataset(session.spark, "relfb",
                             target_file_bytes=1 << 30,
                             refresh_indexes=False)  # B' has NO profile
    rows = release_report("relfb").collect()  # B' vs A via B's profile
    assert rows and all(r["n_rows_new"] > r["n_rows_old"] for r in rows)


def test_release_only_same_release_older_raises_clearly(
    session, sf_dir, fresh_ms
):
    orders = _orders(session, sf_dir)
    orders.save("relone")
    profile_version("relone", **CFG)
    fresh_ms.compact_dataset(session.spark, "relone",
                             target_file_bytes=1 << 30)
    with pytest.raises(ValueError, match="rewrites of the same release"):
        release_report("relone")


def test_promote_report_on_unprofiled_compacted_head(
    session, sf_dir, fresh_ms
):
    """promote_report's group-key lookup must resolve through the same
    compaction-chain fallback release_report uses: a head compacted with
    refresh_indexes=False (no re-linked profile) gates successfully via
    its chain source's profile instead of crashing on 'no stored
    profile'."""
    from datachain_spark.ops.release import promote_report

    orders = _orders(session, sf_dir)
    orders.filter(dc.C("o_orderkey") % 3 != 0).save("promc")
    profile_version("promc", **CFG)
    orders.save("promc")
    profile_version("promc", **CFG)
    fresh_ms.compact_dataset(session.spark, "promc",
                             target_file_bytes=1 << 30,
                             refresh_indexes=False)
    rows = promote_report(
        "promc", policy={"max_psi": 0.2, "min_rows": 1},
    ).collect()
    checks = {r["check"] for r in rows}
    assert {"psi", "min_rows"} <= checks
    assert all(r["passed"] for r in rows if r["check"] == "min_rows")


def test_promote_audit_history(session, sf_dir, fresh_ms):
    """promote(audit=True) persists every gate outcome — check rows,
    resolved versions, policy, verdict — as versions of
    {name}__promotions; a BLOCKED gate (raise path included) leaves the
    same evidence a passing one does, and promotions() replays all of
    it with audit ids."""
    from datachain_spark.ops.release import (
        PromotionBlockedError,
        promote,
        promotions,
    )

    orders = _orders(session, sf_dir)
    orders.filter(dc.C("o_orderkey") % 3 != 0).save("paud")
    profile_version("paud", **CFG)
    orders.save("paud")
    profile_version("paud", **CFG)

    ok, rep = promote("paud", policy=dict(min_rows=1,
                                          max_abs_row_delta_frac=2.0))
    assert ok
    with pytest.raises(PromotionBlockedError):
        promote("paud", policy=dict(max_abs_row_delta_frac=0.01))

    rows = promotions("paud").collect()
    by_audit = {}
    for r in rows:
        by_audit.setdefault(r["audit_id"], []).append(r)
    assert set(by_audit) == {"1.0.0", "1.0.1"}
    first = by_audit["1.0.0"]
    assert all(r["gate_passed"] for r in first)
    assert len(first) == len(rep)
    assert {r["check"] for r in first} == {"min_rows", "row_delta"}
    assert all(r["v_old"] == "1.0.0" and r["v_new"] == "1.0.1"
               for r in first)
    assert '"min_rows":1' in first[0]["policy"]
    blocked = by_audit["1.0.1"]
    assert all(not r["gate_passed"] for r in blocked)
    assert any(not r["passed"] for r in blocked)

    # the version metadata alone carries the verdict (list without rows)
    rec = fresh_ms.get_record("paud__promotions")
    verdicts = {v.version: v.attrs["gate_passed"] for v in rec.versions}
    assert verdicts == {"1.0.0": "true", "1.0.1": "false"}

    # audit=False leaves no trace
    promote("paud", policy=dict(min_rows=1), audit=False)
    assert len(fresh_ms.get_record("paud__promotions").versions) == 2


def test_promotions_empty_raises(session, fresh_ms):
    from datachain_spark.ops.release import promotions

    with pytest.raises(ValueError, match="no recorded promotions"):
        promotions("nosuch_gate")


def test_cli_promotions(session, sf_dir, capsys):
    from datachain_spark.cli import main

    orders = _orders(session, sf_dir)
    orders.filter(dc.C("o_orderkey") % 3 != 0).save("cli_paud")
    profile_version("cli_paud", **CFG)
    orders.save("cli_paud")
    profile_version("cli_paud", **CFG)
    ms = session.metastore_dir
    assert main(["--metastore", ms, "promote", "cli_paud",
                 "--min-rows", "1"]) == 0
    assert main(["--metastore", ms, "promote", "cli_paud",
                 "--max-row-delta", "0.01"]) == 1
    capsys.readouterr()
    assert main(["--metastore", ms, "promotions", "cli_paud"]) == 0
    out = capsys.readouterr().out
    assert "1.0.0 [PASS" in out and "1.0.1 [BLOCKED" in out
    assert main(["--metastore", ms, "promotions", "cli_paud",
                 "--failed-only"]) == 0
    out = capsys.readouterr().out
    assert "FAIL row_delta" in out and "min_rows" not in out


def test_promote_audit_resolves_specifier_v_old(session, sf_dir, fresh_ms):
    """The audit must pin the RESOLVED comparison base: a specifier like
    '<1.0.2' resolves differently as releases accrue, so the stored
    evidence records the version actually compared."""
    from datachain_spark.ops.release import promote, promotions

    orders = _orders(session, sf_dir)
    orders.filter(dc.C("o_orderkey") % 3 != 0).save("pspec")
    profile_version("pspec", **CFG)
    orders.save("pspec")
    profile_version("pspec", **CFG)
    promote("pspec", policy=dict(min_rows=1), v_old="<1.0.1",
            raise_on_block=False)
    rows = promotions("pspec").collect()
    assert all(r["v_old"] == "1.0.0" for r in rows)


def test_delta_profile_base_cfg_backfill_no_midsave_crash(
    session, sf_dir, fresh_ms
):
    """A different-config backfill of the PREVIOUS version's profile must
    not hijack the increment merge base: the fast path merges into the
    newest profile of the base version built with THIS config, and the
    run completes with a correct profile."""
    from datachain_spark.delta import delta_save
    from datachain_spark.ops.release import _profile_for, profile_version
    from datachain_spark.ops.sketches import profile_sketch

    orders = _orders(session, sf_dir)
    cfg = dict(group_cols="o_orderpriority", value_col="o_totalprice",
               lo=0.0, hi=600000.0, bins=32)
    delta_save(orders.filter(dc.C("o_orderkey") % 3 == 1),
               lambda ch: ch, "dcfb", "o_orderkey",
               delta_compare="o_orderkey", profile=cfg)
    # backfill the SAME version with a DIFFERENT config — it is newer,
    # but must not become the merge base for the cfg-A increment
    profile_version("dcfb", version="1.0.0", **dict(cfg, bins=16))
    delta_save(orders.filter(dc.C("o_orderkey") % 3 != 0),
               lambda ch: ch, "dcfb", "o_orderkey",
               delta_compare="o_orderkey", profile=cfg)

    head = fresh_ms.get_record("dcfb").latest_version()
    prec = fresh_ms.get_record("dcfb__profile")
    stored = [v for v in prec.versions
              if v.attrs.get("profile_of_version") == head.version
              and v.attrs.get("profile_bins") == "32"]
    assert stored, "head profile with the pipeline's config missing"
    got = {
        r["o_orderpriority"]: (r["n_rows"], tuple(r["hist"]))
        for r in session.spark.read.parquet(
            fresh_ms.version_data_path("dcfb__profile", stored[-1].version)
        ).collect()
    }
    want = {
        r["o_orderpriority"]: (r["n_rows"], tuple(r["hist"]))
        for r in profile_sketch(
            orders.filter(dc.C("o_orderkey") % 3 != 0).df,
            ["o_orderpriority"], value_col="o_totalprice",
            lo=0.0, hi=600000.0, bins=32,
        ).collect()
    }
    assert got == want
