"""ORC / Avro / plain-text sources and sinks (sources/readers.py
read_orc/read_avro/read_text, chain.to_orc/to_avro/to_text_dir)."""

import pytest

import datachain_spark as dcs


def _docs(session):
    return dcs.read_values(
        doc_id=[3, 1, 2],
        text=["alpha", "bravo, with comma", 'quote "q"'],
        score=[0.5, 1.5, 2.5],
        session=session,
    )


def test_orc_roundtrip(session, tmp_path):
    p = str(tmp_path / "docs_orc")
    _docs(session).to_orc(p, sort_by=["doc_id"])
    back = dcs.read_orc(p, session=session).order_by("doc_id").to_records()
    assert [r["doc_id"] for r in back] == [1, 2, 3]
    assert back[1]["text"] == 'quote "q"' and back[0]["score"] == 1.5


def test_orc_partitioned_and_pruned(session, tmp_path):
    p = str(tmp_path / "part_orc")
    dcs.read_values(
        k=[1, 1, 2, 2], part=["a", "a", "b", "b"], session=session
    ).to_orc(p, partition_cols=["part"])
    ch = dcs.read_orc(p, session=session).filter(dcs.C("part") == "a")
    assert ch.count() == 2
    # partition pruning reaches the scan: only the part=a directory is read
    plan = ch.df._jdf.queryExecution().executedPlan().toString()
    assert "part=a" in plan or "PartitionFilters" in plan


def test_avro_import_gated(session, tmp_path):
    # the spark-avro jar is absent in this container: both directions must
    # raise a clear ImportError naming the package, not Spark's generic one
    with pytest.raises(ImportError, match="spark-avro"):
        _docs(session).to_avro(str(tmp_path / "a"))
    with pytest.raises(ImportError, match="spark-avro"):
        dcs.read_avro(str(tmp_path / "a"), session=session)


def test_text_lines_roundtrip(session, tmp_path):
    p = str(tmp_path / "lines")
    dcs.read_values(t=["one", "two", "three"], session=session).to_text_dir(
        p, column="t"
    )
    back = dcs.read_text(p, lines=True, column="t", session=session)
    assert sorted(r["t"] for r in back.to_records()) == ["one", "three", "two"]


def test_text_wholetext_and_path(session, tmp_path):
    d = tmp_path / "files"
    d.mkdir()
    (d / "a.txt").write_text("first\nsecond")
    (d / "b.txt").write_text("third")
    ch = dcs.read_text(
        str(d), lines=False, column="body", include_path=True, session=session
    )
    rows = {r["path"].rsplit("/", 1)[-1]: r["body"] for r in ch.to_records()}
    assert rows == {"a.txt": "first\nsecond", "b.txt": "third"}
    # lines mode over the same tree: one row per line across all files
    n = dcs.read_text(str(d), lines=True, session=session).count()
    assert n == 3


def test_io_registry_oracles(session):
    import __spark_entry__ as e
    from tests.oracle_harness import compare

    q, o = e.queries(), e.oracle_sql()
    for name in ["orc_roundtrip", "text_roundtrip"]:
        ok, detail = compare(
            q[name](session.spark, "/root/testdata/sf0.001"),
            o[name],
            "/root/testdata/sf0.001",
        )
        assert ok, (name, detail)


def test_csv_json_flag_delta(session, tmp_path):
    """read_csv/read_json accept the flag-style delta kwargs: the same
    recorded chain re-runs incrementally as the source files grow."""
    import datachain_spark as dc
    from pyspark.sql import functions as F

    base = session.spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    for fmt, reader in (("csv", dc.read_csv), ("json", dc.read_json)):
        src = str(tmp_path / f"src_{fmt}")
        name = f"flag_{fmt}"
        w1 = base.filter(F.col("k") < 12).coalesce(1).write.mode("overwrite")
        w2 = base.coalesce(1).write.mode("overwrite")
        if fmt == "csv":
            w1.option("header", True).csv(src)
        else:
            w1.json(src)
        kw = dict(delta=True, delta_on="k", delta_compare="v", session=session)
        if fmt == "json":
            kw["format"] = "jsonl"
        out1 = reader(src, **kw).mutate(v3=dc.C("v") * 3).save(name)
        assert out1.count() == 12
        if fmt == "csv":
            w2.option("header", True).csv(src)
        else:
            w2.json(src)
        out2 = reader(src, **kw).mutate(v3=dc.C("v") * 3).save(name)
        assert out2.count() == 20
        got = {(r["k"], r["v3"]) for r in out2.df.collect()}
        assert got == {(i, i * 6) for i in range(20)}
