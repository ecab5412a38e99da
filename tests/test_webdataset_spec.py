"""Spec-style WebDataset sample assembly (reference lib/webdataset.py +
lib/webdataset_laion.py) — replicates the public multimodal wds example on a
locally-built shard."""

import io
import json
import tarfile

import pytest

from datachain_spark.webdataset import (
    CoreFileNotFoundError,
    UnknownFileExtensionError,
    WDSAllFile,
    process_webdataset,
)
from datachain_spark.webdataset_laion import Laion, WDSLaion, process_laion_meta


def _add(tar, name, data: bytes):
    info = tarfile.TarInfo(name)
    info.size = len(data)
    tar.addfile(info, io.BytesIO(data))


@pytest.fixture()
def laion_shard(tmp_path):
    p = tmp_path / "shard-000.tar"
    with tarfile.open(p, "w") as tar:
        for i in range(3):
            meta = {"uid": f"uid-{i}", "caption": f"cap {i}", "width": 10 + i}
            _add(tar, f"sample{i}.jpg", b"\xff\xd8img" + bytes([i]))
            _add(tar, f"sample{i}.json", json.dumps(meta).encode())
            _add(tar, f"sample{i}.txt", f"caption {i}".encode())
    return str(p)


def test_wds_example_flow(session, laion_shard, tmp_path):
    # examples/multimodal/wds.py flow on a local shard
    import datachain_spark as dc

    wds_images = (
        dc.read_storage(str(tmp_path), session=session)
        .filter(dc.C("file.path").glob("*.tar"))
        .gen(laion=process_webdataset(spec=WDSLaion))
    )
    recs = sorted(wds_images.to_records(), key=lambda r: r["laion"]["json"]["uid"])
    assert len(recs) == 3
    assert recs[0]["laion"]["json"]["caption"] == "cap 0"
    assert recs[1]["laion"]["txt"] == "caption 1"
    # core member rides as a virtual tar-range File
    loc = json.loads(recs[2]["laion"]["file"]["location"])[0]
    assert loc["vtype"] == "tar" and loc["size"] == 6

    # merge on a nested model key, as the example does (uid join)
    meta = dc.read_values(
        uid=[f"uid-{i}" for i in range(3)], score=[0.1, 0.2, 0.3], session=session
    )
    joined = meta.merge(wds_images, on="uid", right_on="laion.json.uid", inner=True)
    assert joined.count() == 3


def test_wds_member_bytes_readable(session, laion_shard):
    # the virtual File pointer must read back the exact member bytes
    from datachain_spark.sources.files import File

    gen = process_webdataset(spec=WDSLaion)
    shard = File.at(laion_shard)
    samples = sorted(gen(shard), key=lambda s: s.json.uid)
    assert samples[0].file.read_bytes() == b"\xff\xd8img\x00"
    assert samples[0].json.width == 10


def test_wds_allfile_and_errors(tmp_path):
    from datachain_spark.sources.files import File

    p = tmp_path / "bad.tar"
    with tarfile.open(p, "w") as tar:
        _add(tar, "a.txt", b"only metadata")  # no core member
    with pytest.raises(CoreFileNotFoundError):
        list(process_webdataset(spec=WDSAllFile)(File.at(str(p))))

    q = tmp_path / "unknown.tar"
    with tarfile.open(q, "w") as tar:
        _add(tar, "a.jpg", b"x")
        _add(tar, "a.weird", b"y")
    with pytest.raises(UnknownFileExtensionError):
        list(process_webdataset(spec=WDSLaion)(File.at(str(q))))


def test_laion_meta_npz(tmp_path):
    np = pytest.importorskip("numpy")
    from datachain_spark.sources.files import File

    p = tmp_path / "meta.npz"
    n, d = 4, 8
    arrays = {
        k: np.arange(n * d, dtype="float32").reshape(n, d) + i
        for i, k in enumerate(["b32_img", "b32_txt", "l14_img", "l14_txt"])
    }
    arrays["dedup"] = np.ones((n, 2), dtype="float32")
    np.savez(p, **arrays)
    rows = list(process_laion_meta(File.at(str(p))))
    assert len(rows) == 4
    assert rows[2].index == 2
    assert rows[2].b32_img == pytest.approx((np.arange(n * d).reshape(n, d)[2]).tolist())
    assert rows[0].dedup == [1.0, 1.0]


def test_laion_reader_contract():
    raw = json.dumps({"uid": "u", "caption": "c", "face_bboxes": [[0.1, 0.2, 0.3, 0.4]]})
    m = Laion.model_validate_json(raw)
    assert m.uid == "u" and m.face_bboxes == [[0.1, 0.2, 0.3, 0.4]]


@pytest.fixture()
def laion_filtered_shard(tmp_path):
    # varied captions/dims so each wds_filtered.py predicate discriminates
    samples = [
        ("a b", 400, 300),                    # caption too short
        ("a beautiful cat", 400, 300),        # passes all
        ("one two three four", 150, 400),     # min dimension <= 200
        ("big wide panorama shot", 900, 250), # aspect ratio >= 3
        ("nice dog photo", 300, 250),         # passes all
    ]
    p = tmp_path / "shard-000.tar"
    with tarfile.open(p, "w") as tar:
        for i, (txt, ow, oh) in enumerate(samples):
            meta = {"uid": f"uid-{i}", "original_width": ow, "original_height": oh}
            _add(tar, f"s{i}.jpg", b"\xff\xd8" + bytes([i]))
            _add(tar, f"s{i}.json", json.dumps(meta).encode())
            _add(tar, f"s{i}.txt", txt.encode())
    return str(p)


def test_wds_filtered_example_flow(session, laion_filtered_shard, tmp_path):
    # examples/multimodal/wds_filtered.py verbatim flow: dataset-or-build
    # fallback, then the four func.* filters over nested laion columns
    import datachain_spark as dc
    import datachain_spark.error
    from datachain_spark import C, func

    name = "wds_filtered_example"
    try:
        wds = dc.read_dataset(name, session=session)
    except datachain_spark.error.DatasetNotFoundError:
        wds = (
            dc.read_storage(str(tmp_path), session=session)
            .filter(C("file.path").glob("*.tar"))
            .settings(cache=True)
            .gen(laion=process_webdataset(spec=WDSLaion))
            .save(name)
        )

    wds.print_schema()

    filtered = (
        wds.filter(func.string.length("laion.txt") > 5)
        .filter(func.array.length(func.string.split("laion.txt", " ")) > 2)
        .filter(
            func.least("laion.json.original_width", "laion.json.original_height") > 200
        )
        .filter(
            func.greatest("laion.json.original_width", "laion.json.original_height")
            / func.least("laion.json.original_width", "laion.json.original_height")
            < 3.0
        )
        .persist()
    )

    assert wds.count() == 5
    assert filtered.count() == 2
    kept = sorted(r["laion"]["json"]["uid"] for r in filtered.to_records())
    assert kept == ["uid-1", "uid-4"]


def test_to_webdataset_roundtrip(session, tmp_path):
    # write shards from a chain (binary jpg + json meta + txt caption),
    # read them back through process_webdataset — lossless round trip
    import datachain_spark as dc
    from datachain_spark import C

    n = 20
    src = dc.read_values(
        session=session,
        key=[f"s{i:04d}" for i in range(n)],
        jpg=[b"\xff\xd8img" + bytes([i]) for i in range(n)],
        json=[_mk_json(i) for i in range(n)],
        txt=[f"caption {i}" for i in range(n)],
    )
    out = tmp_path / "shards"
    manifest = src.to_webdataset(
        str(out), "key", {"jpg": "jpg", "json": "json", "txt": "txt"},
        num_shards=3,
    )
    assert 1 <= len(manifest) <= 3
    assert sum(m["samples"] for m in manifest) == n
    assert all(m["bytes"] > 0 for m in manifest)

    back = (
        dc.read_storage(str(out), session=session)
        .filter(C("file.path").glob("*.tar"))
        .gen(laion=process_webdataset(spec=WDSLaion))
    )
    recs = sorted(back.to_records(), key=lambda r: r["laion"]["json"]["uid"])
    assert len(recs) == n
    assert recs[3]["laion"]["txt"] == "caption 3"
    assert recs[3]["laion"]["json"]["uid"] == "uid-0003"
    assert recs[3]["laion"]["file"]["size"] == 6  # jpg member bytes

    # shards are key-range partitioned AND key-sorted within each tar
    import tarfile as _t

    names = []
    for m in sorted(manifest, key=lambda m: m["shard"]):
        with _t.open(m["path"]) as tar:
            keys = [n.split(".")[0] for n in tar.getnames() if n.endswith(".txt")]
            assert keys == sorted(keys)
            names.extend(keys)
    assert names == sorted(names)  # global order across shard ids


def test_to_webdataset_file_uri_and_awkward_columns(session, tmp_path):
    """file:// URIs take the local branch of the remote gate, and column
    names that pandas itertuples would positionalize (leading underscore,
    embedded space) still resolve — the writer iterates to_dict('records')."""
    import datachain_spark as dc

    n = 6
    src = dc.read_values(
        session=session,
        **{
            "_key id": [f"k{i}" for i in range(n)],
            "_data": [b"blob" + bytes([i]) for i in range(n)],
        },
    )
    out = tmp_path / "uri_shards"
    manifest = src.to_webdataset(
        f"file://{out}", "_key id", {"_data": "bin"}, num_shards=2
    )
    assert sum(m["samples"] for m in manifest) == n
    import tarfile as _t

    members = []
    for m in manifest:
        assert not m["path"].startswith("file://")  # local branch strips it
        with _t.open(m["path"]) as tar:
            members.extend(tar.getnames())
    assert sorted(members) == [f"k{i}.bin" for i in range(n)]


def test_webdataset_fsspec_gate(monkeypatch, tmp_path):
    """Remote-URI routing: _is_remote_uri classification, a clear
    ImportError without fsspec, and fs.makedirs/url_to_fs dispatch through a
    fake fsspec module (the package is absent in this container)."""
    import io
    import sys
    import types

    from datachain_spark.webdataset import _fsspec_fs, _is_remote_uri

    assert _is_remote_uri("s3://bucket/prefix")
    assert _is_remote_uri("memory://x")
    assert not _is_remote_uri("/tmp/local")
    assert not _is_remote_uri("file:///tmp/local")

    monkeypatch.setitem(sys.modules, "fsspec", None)
    with pytest.raises(ImportError, match="fsspec"):
        _fsspec_fs("s3://bucket/prefix")

    calls = {}

    class _FakeFS:
        def makedirs(self, path, exist_ok=False):
            calls["makedirs"] = path

        def open(self, path, mode):
            calls["open"] = (path, mode)
            return io.BytesIO()

        def size(self, path):
            return 123

    fake = types.ModuleType("fsspec")
    fake.core = types.SimpleNamespace(
        url_to_fs=lambda p: (_FakeFS(), p.split("://", 1)[1])
    )
    monkeypatch.setitem(sys.modules, "fsspec", fake)
    fs, root = _fsspec_fs("s3://bucket/prefix")
    assert root == "bucket/prefix"
    fs.makedirs(root, exist_ok=True)
    assert calls["makedirs"] == "bucket/prefix"


def _mk_json(i):
    return json.dumps({"uid": f"uid-{i:04d}", "width": 100 + i})
