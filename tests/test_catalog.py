"""Dataset versioning / metastore semantics — mirrors the reference's
dataset CRUD + semver tests (tests/unit/test_semver.py, lib/dc/datasets)."""

import pytest

import datachain_spark as dc
from datachain_spark import C
from datachain_spark.catalog.metastore import bump_version, matches_spec, parse_version


def test_semver_parse_bump():
    assert parse_version("1.2.3") == (1, 2, 3)
    assert bump_version("1.2.3") == "1.2.4"
    assert bump_version("1.2.3", "minor") == "1.3.0"
    assert bump_version("1.2.3", "major") == "2.0.0"
    with pytest.raises(ValueError):
        parse_version("1.2")


def test_version_specifiers():
    assert matches_spec("1.2.3", ">=1.2")
    assert matches_spec("1.2.3", "==1.2.3")
    assert matches_spec("1.2.3", "==1.2")
    assert not matches_spec("1.2.3", ">1.2.3")
    assert matches_spec("1.9.0", "~=1.2")
    assert not matches_spec("2.0.0", "~=1.2")
    assert matches_spec("0.9.0", "<1")


def test_save_read_roundtrip(session):
    ch = dc.read_values(session=session, x=[1, 2, 3], s=["a", "b", "c"])
    ch.save("rt1")
    back = dc.read_dataset("rt1", session=session)
    assert sorted(back.to_list("x", "s")) == [(1, "a"), (2, "b"), (3, "c")]


def test_version_bump_and_specifier(session):
    ch = dc.read_values(session=session, x=[1])
    ch.save("vb1")
    ch.mutate(y=2).save("vb1")
    ch.save("vb1", version="2.0.0")
    rec = session.metastore.get_record("vb1")
    assert [v.version for v in rec.versions] == ["1.0.0", "1.0.1", "2.0.0"]
    assert dc.read_dataset("vb1", "<2", session=session).columns == ["x", "y"]
    assert dc.read_dataset("vb1", "==1.0.0", session=session).columns == ["x"]


def test_save_records_stats_and_schema(session):
    ch = dc.read_values(session=session, x=[1, 2], s=["a", "b"])
    ch.save("stats1")
    rec = session.metastore.get_record("stats1")
    v = rec.latest_version()
    assert v.num_rows == 2
    assert "x" in v.schema_json
    assert len(v.preview) == 2


def test_save_job_budget(session):
    """save_dataset must not run a post-write count job: the row count
    rides the write itself (CollectMetrics via df.observe), so a plain
    save is write + preview — the preview's incremental limit-collect
    may take up to two passes when the first file holds fewer than 20
    rows, so the ceiling is 3 jobs (the pre-r11 path was 4+ here:
    write + footer count + preview)."""
    sc = session.spark.sparkContext
    ch = dc.read_values(session=session, x=list(range(200)),
                        s=[str(i) for i in range(200)])
    ch.df.count()  # materialize the input plan outside the probe
    sc.setJobGroup("save_budget", "plain save")
    try:
        ch.save("jobbudget1")
        jobs = sc.statusTracker().getJobIdsForGroup("save_budget")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert 0 < len(jobs) <= 3, f"plain save used {len(jobs)} jobs"
    v = session.metastore.get_record("jobbudget1").latest_version()
    assert v.num_rows == 200 and len(v.preview) == 20


def test_lineage_dependencies(session):
    src = dc.read_values(session=session, x=[1, 2])
    src.save("dep_src")
    derived = dc.read_dataset("dep_src", session=session).mutate(y=C.x + 1)
    derived.save("dep_out")
    rec = session.metastore.get_record("dep_out")
    deps = rec.latest_version().dependencies
    assert {"dataset": "dep_src", "version": "1.0.0"} in deps


def test_namespaces_and_move(session):
    ch = dc.read_values(session=session, x=[1])
    ch.save("myns.myproj.ds1")
    names = [(r.namespace, r.project, r.name) for r in session.metastore.list_datasets()]
    assert ("myns", "myproj", "ds1") in names
    session.metastore.move_dataset("myns.myproj.ds1", "myns.myproj.ds2")
    assert session.metastore.get_record("myns.myproj.ds1") is None
    assert dc.read_dataset("myns.myproj.ds2", session=session).count() == 1


def test_delete_version_and_dataset(session):
    ch = dc.read_values(session=session, x=[1])
    ch.save("del1")
    ch.save("del1")
    session.metastore.delete_dataset("del1", version="1.0.0")
    rec = session.metastore.get_record("del1")
    assert [v.version for v in rec.versions] == ["1.0.1"]
    session.metastore.delete_dataset("del1")
    assert session.metastore.get_record("del1") is None


def test_datasets_meta_chain(session):
    dc.read_values(session=session, x=[1]).save("meta_vis")
    names = dc.datasets(session=session).to_values("name")
    assert "meta_vis" in names


def test_persist_registers_temp(session):
    ch = dc.read_values(session=session, x=[1, 2])
    p = ch.persist()
    assert p.count() == 2
    assert session._temp_datasets


def test_bucketed_save_colocated_join(session):
    """save(bucket_by=...) pre-pays the shuffle at write time: a join of two
    datasets bucketed on the same key/count plans with NO Exchange. Also
    covers fresh-session recovery: dropping the catalog table and re-reading
    re-registers it from the metastore's bucket spec."""
    import datachain_spark as dc
    from datachain_spark.plans import shuffle_count

    spark = session.spark
    n = 200
    left = dc.read_values(session=session, k=list(range(n)), a=[f"L{i}" for i in range(n)])
    right = dc.read_values(session=session, k=list(range(0, 2 * n, 2)), b=[f"R{i}" for i in range(n)])
    left.save("bk_left", bucket_by=["k"], num_buckets=4, bucket_sort=["k"])
    right.save("bk_right", bucket_by=["k"], num_buckets=4, bucket_sort=["k"])

    lt = dc.read_dataset("bk_left", session=session)
    rt = dc.read_dataset("bk_right", session=session)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = lt.merge(rt, on="k", inner=True, null_safe=False)
        assert shuffle_count(joined.df) == 0, joined.df._sc is None or joined.df.explain()
        assert joined.count() == 100  # evens < 200
        # aggregation on the bucket key rides the same layout: no Exchange
        from datachain_spark import func as _f
        agg = lt.group_by(partition_by="k", n=_f.count())
        assert shuffle_count(agg.df) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    # fresh-session path: the in-memory catalog forgot the table
    ms = session.metastore
    rec = ms._read_record(*__import__("datachain_spark.catalog.metastore", fromlist=["split_name"]).split_name("bk_left"))
    tbl = rec.versions[-1].bucket["table"]
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    again = dc.read_dataset("bk_left", session=session)
    assert again.count() == n
    assert spark.catalog.tableExists(tbl)

    session.metastore.delete_dataset("bk_left")
    assert not spark.catalog.tableExists(tbl)
    session.metastore.delete_dataset("bk_right")


def test_export_dataset_table(session, tmp_path):
    import pyarrow.parquet as pq

    ch = dc.read_values(session=session, k=[1, 2, 3], s=["x", "y", "z"])
    ch.save("exp_ds")
    out = str(tmp_path / "export")
    files = dc.export_dataset_table("exp_ds", out, session=session)
    assert files and all(f.endswith(".parquet") for f in files)
    total = sum(pq.read_table(f).num_rows for f in files)
    assert total == 3


def test_namespaces_and_projects(session, tmp_path):
    """create_project / delete_namespace parity: idempotent create, refuse
    deleting missing or non-empty namespaces."""
    import tempfile

    from datachain_spark.catalog.metastore import Metastore

    sess_ms = session.metastore
    ms = Metastore(str(tmp_path / "ms_ns"))
    old, session.metastore = sess_ms, ms
    try:
        session.metastore = ms
        p = dc.create_project("team_a", "proj1", session=session)
        assert "team_a" in p and "proj1" in p
        dc.create_project("team_a", "proj1", session=session)  # idempotent
        assert "team_a" in ms.list_namespaces()

        with pytest.raises(ValueError, match="not found"):
            dc.delete_namespace("nope", session=session)

        ch = dc.read_values(session=session, k=[1, 2])
        ch.save("team_a.proj1.numbers")
        with pytest.raises(ValueError, match="not empty"):
            dc.delete_namespace("team_a", session=session)
        dc.delete_dataset("team_a.proj1.numbers", session=session, force=True)
        dc.delete_namespace("team_a", session=session)
        assert "team_a" not in ms.list_namespaces()
    finally:
        session.metastore = old


def test_datamodel_autoregistration(session):
    """DataModel subclasses self-register in the ModelStore on definition
    (reference lib/data_model.py behavior)."""
    from datachain_spark import DataModel, ModelStore, is_chain_type

    class Signal(DataModel):
        score: float
        tag: str = "x"

    assert ModelStore.get("Signal@v1") is Signal
    assert is_chain_type(Signal)
    assert is_chain_type(list[int]) and is_chain_type(dict[str, float])
    assert not is_chain_type(object)

    class Signal2(DataModel):
        _version = 3
        score: float

    assert ModelStore.get("Signal2@v3") is Signal2


def test_metrics_namespace_and_errors():
    import datachain_spark as dc2

    dc2.metrics.set("stage", "done")
    assert dc2.metrics.get("stage") == "done"
    assert isinstance(dc2.metrics.get(), dict)
    assert issubclass(dc2.FileError, dc2.DataChainError)
    err = dc2.FileError("bad bytes", source="s3://b", path="x.bin")
    assert "s3://b" in str(err)
    assert dc2.is_studio() is False


def test_tarvfile_range_read(tmp_path):
    from datachain_spark import TarVFile

    blob = tmp_path / "blob.bin"
    blob.write_bytes(b"HEADERpayloadTRAILER")
    got = TarVFile.open({"offset": 6, "size": 7, "parent": str(blob)})
    assert got == b"payload"


def test_typed_error_classes(session):
    """Parity with datachain.error: typed lookup failures that still
    satisfy old except-ValueError blocks."""
    import pytest

    import datachain_spark as dc
    from datachain_spark.error import (
        DatasetNotFoundError,
        DatasetVersionNotFoundError,
    )

    with pytest.raises(DatasetNotFoundError):
        dc.read_dataset("definitely_not_there", session=session)
    ch = dc.read_values(session=session, x=[1, 2, 3])
    ch.save("err_probe")
    with pytest.raises(DatasetVersionNotFoundError):
        dc.read_dataset("err_probe", "9.9.9", session=session)
    # subclassing keeps pre-typed callers working
    with pytest.raises(ValueError):
        dc.read_dataset("definitely_not_there", session=session)


def test_compact_dataset(session):
    """Small-file compaction: many-file version -> new patch version with
    fewer files, identical rows, lineage pointing at the source version;
    bucketed versions are rejected."""
    import glob as _glob

    import datachain_spark as dc
    from pyspark.sql import functions as F

    df = session.spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartition(24)  # 24 tiny files
    dc.DataChain(df).save("compact_me")
    p1 = session.metastore.version_data_path("local.default.compact_me", "1.0.0")
    n_before = len(_glob.glob(p1 + "/*.parquet"))
    assert n_before >= 20

    dv = dc.compact_dataset("compact_me", target_file_bytes=1 << 30, session=session)
    assert dv.version == "1.0.1"
    p2 = session.metastore.version_data_path("local.default.compact_me", "1.0.1")
    n_after = len(_glob.glob(p2 + "/*.parquet"))
    assert n_after < n_before and n_after >= 1
    back = dc.read_dataset("compact_me", session=session)
    assert back.count() == 10_000
    assert sorted(r["k"] for r in back.to_records())[:3] == [0, 1, 2]
    rec = session.metastore.get_record("compact_me")
    v = rec.get_version("1.0.1")
    assert v.dependencies == [{"dataset": "compact_me", "version": "1.0.0"}]

    # bucketed version: rejected (file count IS the bucket spec)
    dc.DataChain(df).save("compact_bkt", bucket_by=["k"], num_buckets=4)
    with pytest.raises(ValueError):
        dc.compact_dataset("compact_bkt", session=session)


def test_compact_preserves_metadata_and_source_version(session):
    """Compacting an OLD version must patch-bump from the SOURCE (never
    replacing newer data at the head), carry attrs/signal schema over, keep
    the record description, and validate target size."""
    import datachain_spark as dc
    from pyspark.sql import functions as F

    df1 = session.spark.range(500).select(F.col("id").alias("k")).repartition(8)
    dc.DataChain(df1).save(
        "compact_meta", description="the real description",
        attrs={"team": "data"},
    )
    df2 = session.spark.range(900).select(F.col("id").alias("k")).repartition(8)
    dc.DataChain(df2).save("compact_meta", update_version="minor")

    dv = dc.compact_dataset(
        "compact_meta", version="1.0.0", target_file_bytes=1 << 30,
        session=session,
    )
    # bumped from the SOURCE: 1.0.1, not 1.1.1 — the head stays 1.1.0
    assert dv.version == "1.0.1"
    rec = session.metastore.get_record("compact_meta")
    assert rec.latest_version().version == "1.1.0"
    assert rec.description == "the real description"
    assert dv.attrs["team"] == "data"
    assert dv.attrs["compacted_from"] == "1.0.0"
    latest = dc.read_dataset("compact_meta", session=session)
    assert latest.count() == 900  # head data untouched
    old = dc.read_dataset("compact_meta", "==1.0.1", session=session)
    assert old.count() == 500
    with pytest.raises(ValueError):
        dc.compact_dataset("compact_meta", target_file_bytes=0, session=session)


def test_save_schema_policy(session):
    import datachain_spark as dc
    import pytest as _pytest
    from pyspark.sql import functions as F

    ch = dc.read_values(session=session, k=[1, 2], s=["a", "b"])
    ch.save("sp_ds")

    # additive: new column fine, retype/drop refused
    ch.mutate(extra=F.col("k") * 2).save("sp_ds", schema_policy="additive")
    with _pytest.raises(ValueError, match="retyped"):
        ch.mutate(k=F.col("k").cast("string")).save(
            "sp_ds", schema_policy="additive")
    with _pytest.raises(ValueError, match="dropped or retyped"):
        ch.select("k").save("sp_ds", schema_policy="additive")

    # strict: must match the LATEST version (which now has `extra`)
    with _pytest.raises(ValueError, match="strict"):
        ch.save("sp_ds", schema_policy="strict")
    ch.mutate(extra=F.col("k") * 9).save("sp_ds", schema_policy="strict")

    # unknown policy refused; first save ignores policy (nothing to check)
    with _pytest.raises(ValueError, match="any|additive|strict"):
        ch.save("sp_ds2", schema_policy="nope")
    ch.save("sp_ds3", schema_policy="strict")


def test_ann_index_dataset_workflow(session, sf_dir):
    import datachain_spark as dc
    import pytest as _pytest
    from pyspark.sql import functions as F

    from datachain_spark.error import DatasetNotFoundError
    from datachain_spark.ops.similarity import cosine_topk

    emb = dc.read_parquet(f"{sf_dir}/embeddings.parquet", session=session).mutate(
        embedding=F.col("embedding").cast("array<double>"))
    emb.save("ann_ds")
    ms = session.metastore
    dv = ms.ann_index_dataset(session.spark, "ann_ds", "vec_id", num_cells=8)
    assert dv.attrs["ivf_of_version"] == "1.0.0"
    # the cell-clustered copy is bucketed so probes prune buckets
    idx, _, iv = ms.load_dataset(session.spark, "ann_ds__ivf")
    assert iv.bucket and iv.bucket["by"] == ["cell"]

    qv = [float(v) for v in emb.df.filter(F.col("vec_id") == 0)
          .select("embedding").first()["embedding"]]
    exact = [r["vec_id"] for r in
             cosine_topk(emb.df, qv, k=10, id_cols=["vec_id"]).collect()]
    full = [r["vec_id"] for r in
            ms.ann_search(session.spark, "ann_ds", qv, k=10, n_probe=8,
                          id_cols=["vec_id"]).collect()]
    assert full == exact  # probing every cell degrades to the exact answer
    part = ms.ann_search(session.spark, "ann_ds", qv, k=10, n_probe=2,
                         id_cols=["vec_id"]).collect()
    assert len(part) == 10 and part[0]["vec_id"] == 0

    # a NEW unindexed version refuses loudly; the old one stays pinned
    emb.save("ann_ds")
    with _pytest.raises(DatasetNotFoundError):
        ms.ann_search(session.spark, "ann_ds", qv, k=5)
    assert len(ms.ann_search(session.spark, "ann_ds", qv, k=5,
                             n_probe=8, id_cols=["vec_id"],
                             version="1.0.0").collect()) == 5
