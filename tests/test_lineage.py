"""Lineage-driven cascade refresh (datachain_spark/lineage.py): staleness
detection off the recorded dependency graph, topological multi-stage
refresh through registered delta pipelines, and the datasets(stale=True)
face. Graph walks read manifest JSON only; pipelines re-run
incrementally via their own delta paths."""

import pytest
from pyspark.sql import functions as F

import datachain_spark as dc
from datachain_spark.delta import delta_save
from datachain_spark.lineage import (
    refresh_downstream,
    register_pipeline,
    stale_datasets,
)


@pytest.fixture()
def fresh_ms(session, tmp_path):
    from datachain_spark.catalog.metastore import Metastore

    old_ms = session.metastore
    old_reg = getattr(session, "_lineage_pipelines", None)
    session.metastore = Metastore(str(tmp_path / "ms"))
    session._lineage_pipelines = {}
    yield session.metastore
    session.metastore = old_ms
    if old_reg is None:
        del session._lineage_pipelines
    else:
        session._lineage_pipelines = old_reg


def _orders(session, sf_dir):
    return dc.read_parquet(f"{sf_dir}/orders.parquet", session=session)


def _register_two_stage(session):
    """src -> derived (filter + mutate) -> released (filter), both delta
    pipelines over read_dataset, so every re-run is incremental."""
    def derived_fn():
        return delta_save(
            dc.read_dataset("src", session=session),
            lambda ch: ch.mutate(price_k=F.round(F.col("o_totalprice") / 1000.0, 3)),
            "derived", "o_orderkey", delta_compare="o_totalprice",
            session=session,
        )

    def released_fn():
        return delta_save(
            dc.read_dataset("derived", session=session),
            lambda ch: ch.filter(dc.C("price_k") >= 100.0),
            "released", "o_orderkey", delta_compare="price_k",
            session=session,
        )

    register_pipeline("derived", derived_fn, session=session)
    register_pipeline("released", released_fn, session=session)
    return derived_fn, released_fn


def test_cascade_refresh_two_stages(session, sf_dir, fresh_ms):
    orders = _orders(session, sf_dir)
    orders.filter(dc.C("o_orderkey") % 3 == 1).save("src")
    derived_fn, released_fn = _register_two_stage(session)
    derived_fn()
    released_fn()

    # upstream append: src advances, both downstream pins are behind
    orders.filter(dc.C("o_orderkey") % 3 != 0).save("src")
    stale = stale_datasets(session=session)
    assert [(r["dataset"], r["upstream"]) for r in stale] == [
        ("local.default.derived", "local.default.src")
    ]  # released pins derived@head, still current until derived moves

    rep = {r["dataset"]: r for r in
           refresh_downstream("src", session=session).collect()}
    assert rep["local.default.derived"]["action"] == "refreshed"
    assert rep["local.default.released"]["action"] == "refreshed"
    assert rep["local.default.derived"]["old_version"] == "1.0.0"
    assert rep["local.default.derived"]["new_version"] == "1.0.1"

    # the cascaded result equals a from-scratch rebuild on the new head
    got = dc.read_dataset("released", session=session)
    want = (
        orders.filter(dc.C("o_orderkey") % 3 != 0)
        .mutate(price_k=F.round(F.col("o_totalprice") / 1000.0, 3))
        .filter(dc.C("price_k") >= 100.0)
    )
    assert got.count() == want.count()
    assert (
        got.df.select("o_orderkey", "price_k").subtract(
            want.df.select("o_orderkey", "price_k")
        ).count() == 0
    )
    # and everything converged: a second cascade is a no-op
    assert stale_datasets(session=session) == []
    rep2 = {r["dataset"]: r["action"] for r in
            refresh_downstream("src", session=session).collect()}
    assert set(rep2.values()) == {"up_to_date"}


def test_cascade_diamond_topo_order(session, sf_dir, fresh_ms):
    """Diamond: src -> a, src -> b, (a JOIN b) -> joined. The join stage
    must run AFTER both parents refreshed (Kahn order), exactly once."""
    orders = _orders(session, sf_dir)
    orders.filter(dc.C("o_orderkey") % 3 == 1).save("src")

    def a_fn():
        return delta_save(
            dc.read_dataset("src", session=session),
            lambda ch: ch.select("o_orderkey", "o_totalprice"),
            "a", "o_orderkey", delta_compare="o_totalprice",
            session=session,
        )

    def b_fn():
        return delta_save(
            dc.read_dataset("src", session=session),
            lambda ch: ch.select("o_orderkey", "o_orderpriority"),
            "b", "o_orderkey", delta_compare="o_orderpriority",
            session=session,
        )

    runs = []

    def joined_fn():
        runs.append(1)
        merged = dc.read_dataset("a", session=session).merge(
            dc.read_dataset("b", session=session), on="o_orderkey",
            inner=True,
        ).select("o_orderkey", "o_totalprice", "o_orderpriority")
        return merged.save("joined")

    register_pipeline("a", a_fn, session=session)
    register_pipeline("b", b_fn, session=session)
    register_pipeline("joined", joined_fn, session=session)
    a_fn(); b_fn(); joined_fn()

    orders.filter(dc.C("o_orderkey") % 3 != 0).save("src")
    runs.clear()
    rows = refresh_downstream("src", session=session).collect()
    order = [r["dataset"] for r in rows]
    assert order.index("local.default.joined") > order.index("local.default.a")
    assert order.index("local.default.joined") > order.index("local.default.b")
    assert runs == [1]  # join stage ran exactly once, after both parents
    assert dc.read_dataset("joined", session=session).count() == (
        orders.filter(dc.C("o_orderkey") % 3 != 0).count()
    )


def test_cascade_strict_and_dry_run(session, sf_dir, fresh_ms):
    orders = _orders(session, sf_dir)
    orders.filter(dc.C("o_orderkey") % 3 == 1).save("src")
    derived_fn, _ = _register_two_stage(session)
    derived_fn()
    # drop the registration to simulate an unknown pipeline
    session._lineage_pipelines.pop("local.default.derived")

    orders.save("src")
    with pytest.raises(ValueError, match="no registered pipeline"):
        refresh_downstream("src", session=session)
    rows = refresh_downstream("src", session=session,
                              strict=False).collect()
    assert [(r["dataset"], r["action"]) for r in rows] == [
        ("local.default.derived", "no_pipeline")
    ]
    # dry_run: reports the would-be work, advances nothing
    register_pipeline("derived", derived_fn, session=session)
    rows = refresh_downstream("src", session=session, dry_run=True).collect()
    assert [r["action"] for r in rows] == ["would_refresh"]
    assert fresh_ms.get_record("derived").latest_version().version == "1.0.0"


def test_cascade_converged_repins_dependencies(session, sf_dir, fresh_ms):
    """A no-change upstream re-save (same rows, new version) must not
    leave the downstream stale forever: the delta converged path re-pins
    the head's dependencies and the cascade reports 'converged'."""
    orders = _orders(session, sf_dir)
    slice1 = orders.filter(dc.C("o_orderkey") % 3 == 1)
    slice1.save("src")
    derived_fn, _ = _register_two_stage(session)
    derived_fn()
    slice1.save("src")  # identical contents, version bump

    rows = refresh_downstream("src", session=session).collect()
    assert [(r["dataset"], r["action"]) for r in rows] == [
        ("local.default.derived", "converged")
    ]
    assert fresh_ms.get_record("derived").latest_version().version == "1.0.0"
    assert stale_datasets(session=session) == []


def test_datasets_stale_flag_and_aux_exclusion(session, sf_dir, fresh_ms):
    from datachain_spark.ops.release import profile_version

    orders = _orders(session, sf_dir)
    orders.filter(dc.C("o_orderkey") % 3 == 1).save("src")
    derived_fn, _ = _register_two_stage(session)
    derived_fn()
    # per-version state datasets (here: a profile, which records a
    # dataset dependency on its source) must not appear as graph nodes
    profile_version("derived", group_cols="o_orderpriority",
                    distinct_col="o_custkey", session=session)
    orders.save("src")

    rows = dc.datasets(session=session, stale=True).to_records()
    assert [(r["dataset"], r["pinned_version"], r["upstream_head"])
            for r in rows] == [("local.default.derived", "1.0.0", "1.0.1")]
    # the plain listing still includes everything, stale or not
    assert dc.datasets(session=session).count() >= 3


def test_flag_api_auto_registers_pipeline(session, sf_dir, fresh_ms):
    """Flag-style delta chains (read_dataset(delta=True...).save) are
    re-runnable by construction, so .save auto-registers the pipeline:
    refresh_downstream heals them after an upstream bump without a
    manual register_pipeline call."""
    orders = _orders(session, sf_dir)
    orders.filter(dc.C("o_orderkey") % 3 == 1).save("fsrc")
    dc.read_dataset(
        "fsrc", session=session, delta=True, delta_on="o_orderkey",
        delta_compare="o_totalprice",
    ).mutate(dbl=F.col("o_totalprice") * 2).save("fder")
    assert "local.default.fder" in session._lineage_pipelines

    orders.filter(dc.C("o_orderkey") % 3 != 0).save("fsrc")
    rows = refresh_downstream("fsrc", session=session).collect()
    assert [(r["dataset"], r["action"]) for r in rows] == [
        ("local.default.fder", "refreshed")
    ]
    assert dc.read_dataset("fder", session=session).count() == (
        orders.filter(dc.C("o_orderkey") % 3 != 0).count()
    )


def test_compaction_preserves_lineage_edge(session, sf_dir, fresh_ms):
    """A compacted copy has identical rows, so it inherits its source
    version's upstream lineage: the cascade keeps healing a compacted
    downstream, and the self-pin (rewrite provenance) never shows up as
    a bogus stale edge."""
    orders = _orders(session, sf_dir)
    orders.filter(dc.C("o_orderkey") % 3 == 1).save("src")
    derived_fn, _ = _register_two_stage(session)
    derived_fn()
    fresh_ms.compact_dataset(session.spark, "derived",
                             target_file_bytes=1 << 30)
    assert stale_datasets(session=session) == []  # no self-stale row

    orders.filter(dc.C("o_orderkey") % 3 != 0).save("src")
    rows = refresh_downstream("src", session=session).collect()
    assert [(r["dataset"], r["action"]) for r in rows] == [
        ("local.default.derived", "refreshed")
    ]
    assert dc.read_dataset("derived", session=session).count() == (
        orders.filter(dc.C("o_orderkey") % 3 != 0).count()
    )


def test_pre_fix_compacted_head_resolves_through_ancestry(
    session, sf_dir, fresh_ms
):
    """A head compacted BEFORE deps were carried forward (self-pin only)
    still resolves its upstream lineage through the compacted_from
    ancestry — the severed-edge era heals instead of silently dropping
    out of the graph."""
    orders = _orders(session, sf_dir)
    orders.filter(dc.C("o_orderkey") % 3 == 1).save("src")
    derived_fn, _ = _register_two_stage(session)
    derived_fn()
    fresh_ms.compact_dataset(session.spark, "derived",
                             target_file_bytes=1 << 30)
    # simulate the pre-fix record: strip the carried upstream deps
    rec = fresh_ms.get_record("derived")
    head = rec.latest_version()
    head.dependencies = [d for d in head.dependencies
                         if d.get("dataset") == "derived"]
    fresh_ms._write_record(rec)

    orders.filter(dc.C("o_orderkey") % 3 != 0).save("src")
    rows = refresh_downstream("src", session=session).collect()
    assert [(r["dataset"], r["action"]) for r in rows] == [
        ("local.default.derived", "refreshed")
    ]


def test_delta_retry_run_keeps_lineage(session, sf_dir, fresh_ms):
    """A retry-triggering delta run must keep recording the source pin
    (the retry union used to rebuild to_process without dependencies)."""
    orders = _orders(session, sf_dir)
    orders.filter(dc.C("o_orderkey") % 3 == 1).save("rsrc")

    def proc(ch):
        return ch.mutate(err=F.when(F.col("o_orderkey") % 5 == 0, "boom")
                         .otherwise(""))

    def fn():
        return delta_save(
            dc.read_dataset("rsrc", session=session), proc, "rder",
            "o_orderkey", delta_compare="o_totalprice",
            delta_retry="err", session=session,
        )

    fn()
    orders.filter(dc.C("o_orderkey") % 3 != 0).save("rsrc")
    fn()  # retry path runs (err rows exist) — deps must survive
    head = fresh_ms.get_record("rder").latest_version()
    pins = [d for d in head.dependencies if d.get("dataset")]
    assert any(d["dataset"] == "rsrc" and d["version"] == "1.0.1"
               for d in pins)


def test_cascade_siblings_run_concurrently(session, sf_dir, fresh_ms,
                                           monkeypatch):
    """Independent Kahn siblings of a diamond refresh CONCURRENTLY
    (r11 verdict task 8): both sibling pipelines must be in flight at
    once — each waits at a shared barrier that only a parallel cascade
    can satisfy — and the report is identical to a sequential
    (parallelism=1) cascade."""
    import threading

    orders = _orders(session, sf_dir)
    orders.filter(dc.C("o_orderkey") % 3 == 1).save("src")

    barrier = threading.Barrier(2, timeout=60)
    gate_on = {"v": False}

    def _sib(name, cols, cmp_col):
        def fn():
            if gate_on["v"]:
                # only passable when BOTH siblings are in flight
                barrier.wait()
            return delta_save(
                dc.read_dataset("src", session=session),
                lambda ch: ch.select(*cols),
                name, "o_orderkey", delta_compare=cmp_col,
                session=session,
            )
        return fn

    a_fn = _sib("a", ["o_orderkey", "o_totalprice"], "o_totalprice")
    b_fn = _sib("b", ["o_orderkey", "o_orderpriority"], "o_orderpriority")

    def joined_fn():
        merged = dc.read_dataset("a", session=session).merge(
            dc.read_dataset("b", session=session), on="o_orderkey",
            inner=True,
        ).select("o_orderkey", "o_totalprice", "o_orderpriority")
        return merged.save("joined")

    register_pipeline("a", a_fn, session=session)
    register_pipeline("b", b_fn, session=session)
    register_pipeline("joined", joined_fn, session=session)
    a_fn(); b_fn(); joined_fn()

    orders.filter(dc.C("o_orderkey") % 3 != 0).save("src")
    gate_on["v"] = True
    rows = refresh_downstream("src", session=session).collect()
    gate_on["v"] = False
    assert not barrier.broken  # both siblings reached the barrier
    rep = {r["dataset"]: r["action"] for r in rows}
    assert rep == {
        "local.default.a": "refreshed",
        "local.default.b": "refreshed",
        "local.default.joined": "refreshed",
    }
    n_joined = dc.read_dataset("joined", session=session).count()
    assert n_joined == orders.filter(dc.C("o_orderkey") % 3 != 0).count()

    # sequential mode (parallelism=1) produces the identical report on
    # the same (now up-to-date) graph
    monkeypatch.setenv("DATACHAIN_SPARK_REFRESH_PARALLELISM", "1")
    rows_seq = refresh_downstream("src", session=session).collect()
    assert [r["dataset"] for r in rows_seq] == [r["dataset"] for r in rows]
    assert all(r["action"] == "up_to_date" for r in rows_seq)
