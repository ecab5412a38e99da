"""File accessor parity surface: open/save/export/upload/at, path helpers,
get_hash/resolve/rebase, typed conversions (reference lib/file.py)."""

import os

import pytest

from datachain_spark.sources.files import (
    AudioFile,
    File,
    ImageFile,
    TextFile,
    VideoFile,
    rebase_path,
)


@pytest.fixture()
def local_file(tmp_path):
    p = tmp_path / "docs" / "a.txt"
    p.parent.mkdir(parents=True)
    p.write_bytes(b"hello file api")
    return File.at(str(p))


def test_at_and_uri_roundtrip(local_file, tmp_path):
    assert local_file.name == "a.txt"
    assert local_file.get_uri() == f"file://{tmp_path}/docs/a.txt"
    assert local_file.get_fs_path() == f"{tmp_path}/docs/a.txt"
    remote = File.at("s3://bucket/data/x.bin")
    assert remote.source == "s3://bucket"
    assert remote.path == "data/x.bin"


def test_open_read_and_length(local_file):
    with local_file.open() as f:
        assert f.read() == b"hello file api"
    with local_file.open("r") as f:
        assert f.read() == "hello file api"
    assert local_file.read(5) == b"hello"
    assert local_file.read_bytes() == b"hello file api"


def test_open_write_refreshes_metadata(tmp_path):
    f = File.at(str(tmp_path / "out" / "new.txt"))
    with f.open("wb") as fh:
        fh.write(b"written via open")
    assert f.size == len(b"written via open")
    assert f.etag
    assert f.read_bytes() == b"written via open"


def test_save_and_export_placements(local_file, tmp_path):
    dst = tmp_path / "saved" / "copy.txt"
    local_file.save(str(dst))
    assert dst.read_bytes() == b"hello file api"

    out = tmp_path / "exported"
    resolved = local_file.resolve()
    for placement, rel in [
        ("filename", "a.txt"),
        ("etag", f"{resolved.etag}.txt"),
        ("fullpath", "a.txt"),
    ]:
        resolved.export(str(out / placement), placement=placement)
        assert (out / placement / rel).read_bytes() == b"hello file api"
    with pytest.raises(ValueError):
        local_file.export(str(out), placement="nope")


def test_export_symlink(local_file, tmp_path):
    out = tmp_path / "links"
    local_file.export(str(out), placement="filename", link_type="symlink")
    link = out / "a.txt"
    assert link.is_symlink()
    assert link.read_bytes() == b"hello file api"


def test_upload_and_resolve(tmp_path):
    f = File.upload(b"uploaded bytes", str(tmp_path / "up" / "u.bin"))
    assert f.size == len(b"uploaded bytes")
    assert f.etag and f.last_modified is not None
    assert f.read_bytes() == b"uploaded bytes"
    # resolve on a missing file zeroes metadata instead of raising
    missing = File.at(str(tmp_path / "gone.bin")).resolve()
    assert missing.size == 0 and missing.etag == ""


def test_path_helpers():
    f = File(source="file:///tmp", path="a/b/report.tar.gz")
    assert f.get_file_suffix() == ".gz"
    assert f.get_file_ext() == "gz"
    assert f.get_file_stem() == "report.tar"
    assert f.get_path_normalized() == "a/b/report.tar.gz"
    with pytest.warns(DeprecationWarning):
        assert f.get_full_name() == "a/b/report.tar.gz"
    with pytest.raises(ValueError):
        File(source="s", path="a/../../etc/passwd").get_path_normalized()
    with pytest.raises(ValueError):
        File(source="s", path="dir/").get_path_normalized()


def test_get_hash_contract():
    a = File(source="s3://b", path="x", version="1", etag="e")
    b = File(source="s3://b", path="x", version="1", etag="e")
    c = File(source="s3://b", path="x", version="1", etag="e", location='{"o":1}')
    assert a.get_hash() == b.get_hash()
    assert a.get_hash() != c.get_hash()
    assert len(a.get_hash()) == 64


def test_typed_conversions(local_file):
    t = local_file.as_text_file()
    assert isinstance(t, TextFile) and t.path == local_file.path
    assert t.read() == "hello file api"
    assert t.as_text_file() is t
    assert isinstance(local_file.as_image_file(), ImageFile)
    assert isinstance(local_file.as_video_file(), VideoFile)
    assert isinstance(local_file.as_audio_file(), AudioFile)


def test_rebase_examples():
    f = File(source="s3://bucket", path="data/2025-05-27/file.wav")
    assert (
        f.rebase("s3://bucket/data", "s3://output-bucket/processed", extension="mp3")
        == "s3://output-bucket/processed/2025-05-27/file.mp3"
    )
    g = File(source="file:///corpus", path="data/audio/file.wav")
    assert (
        g.rebase("data/audio", "/local/output", suffix="_ch1", extension="npy")
        == "/local/output/file_ch1.npy"
    )
    with pytest.raises(ValueError):
        f.rebase("not/there", "/x")
    assert rebase_path("/a/b/c.txt", "/a", "/z") == "/z/b/c.txt"


def test_remote_guards():
    r = File.at("s3://bucket/k.bin")
    with pytest.raises(NotImplementedError):
        with r.open() as _:
            pass
    with pytest.raises(NotImplementedError):
        r.resolve()
