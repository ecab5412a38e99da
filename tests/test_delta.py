"""Incremental (delta) processing + checkpoints — mirrors the reference's
tests/func/test_delta.py semantics."""

import pytest
from pyspark.sql import functions as F

import datachain_spark as dc
from datachain_spark import C
from datachain_spark.delta import SchemaDriftError, checkpoint_save, delta_save


def _double(ch):
    return ch.mutate(doubled=C.x * 2)


def test_delta_first_run_full(session):
    src = dc.read_values(session=session, id=[1, 2, 3], x=[10, 20, 30])
    out = delta_save(src, _double, "d_full", delta_on="id")
    assert sorted(out.to_list("id", "doubled")) == [(1, 20), (2, 40), (3, 60)]


def test_delta_incremental_union(session):
    src1 = dc.read_values(session=session, id=[1, 2], x=[10, 20])
    delta_save(src1, _double, "d_incr", delta_on="id")
    # v2: row 2 modified, row 3 added, row 1 unchanged
    src2 = dc.read_values(session=session, id=[1, 2, 3], x=[10, 99, 30])
    out = delta_save(src2, _double, "d_incr", delta_on="id")
    assert sorted(out.to_list("id", "doubled")) == [(1, 20), (2, 198), (3, 60)]
    # two result versions exist
    rec = session.metastore.get_record("d_incr")
    assert len(rec.versions) == 2


def test_delta_deleted_rows_drop(session):
    src1 = dc.read_values(session=session, id=[1, 2, 3], x=[1, 2, 3])
    delta_save(src1, _double, "d_del", delta_on="id")
    src2 = dc.read_values(session=session, id=[1, 3], x=[1, 3])
    out = delta_save(src2, _double, "d_del", delta_on="id")
    assert sorted(out.to_values("id")) == [1, 3]


def test_delta_noop_skips(session):
    src = dc.read_values(session=session, id=[1], x=[5])
    delta_save(src, _double, "d_noop", delta_on="id")
    delta_save(src, _double, "d_noop", delta_on="id")  # no changes
    rec = session.metastore.get_record("d_noop")
    assert len(rec.versions) == 1  # checkpoint skip, no new version


def test_delta_schema_drift_raises(session):
    src = dc.read_values(session=session, id=[1], x=[5])
    delta_save(src, _double, "d_drift", delta_on="id")
    src2 = dc.read_values(session=session, id=[1, 2], x=[5, 6])
    with pytest.raises(SchemaDriftError):
        delta_save(src2, lambda ch: ch.mutate(other=C.x + 1), "d_drift", delta_on="id")


def test_delta_retry_error_rows(session):
    src = dc.read_values(session=session, id=[1, 2], x=[1, -1])

    def proc(ch):
        return ch.mutate(
            res=F.when(C.x.column > 0, C.x.column * 2),
            err=F.when(C.x.column < 0, F.lit("negative")),
        )

    delta_save(src, proc, "d_retry", delta_on="id")
    # fix the bad source row; no key change, but retry reprocesses error rows
    src2 = dc.read_values(session=session, id=[1, 2], x=[1, 7])
    out = delta_save(src2, proc, "d_retry", delta_on="id", delta_retry="err")
    recs = {r["id"]: r for r in out.to_records()}
    assert recs[2]["res"] == 14 and recs[2]["err"] is None


def test_checkpoint_save_reuses(session):
    ch = dc.read_values(session=session, x=[1, 2, 3]).filter(C.x > 1)
    out1 = checkpoint_save(ch, "cp1")
    out2 = checkpoint_save(ch, "cp1")  # identical plan -> reuse
    rec = session.metastore.get_record("cp1")
    assert len(rec.versions) == 1
    assert sorted(out2.to_values("x")) == [2, 3]
    # different plan -> new version
    checkpoint_save(ch.filter(C.x > 2), "cp1")
    assert len(session.metastore.get_record("cp1").versions) == 2
