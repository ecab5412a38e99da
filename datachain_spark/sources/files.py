"""The File signal: schema, executor-side accessors, export.

Parity: /root/reference/src/datachain/lib/file.py:200-254 (File model with
source, path, size, version, etag, is_latest, last_modified, location) and
subclasses TextFile/ImageFile/... (:784-1120). ``location`` is a JSON string
pointing into container files (tar members) — kept as a string column like the
reference.

Contents are opened lazily **on executors** via a serializable opener (no
catalog object in the closure — SURVEY.md §7 'UDF object streams' note).
"""

from __future__ import annotations

import hashlib
import json
import os
import posixpath
import tempfile
from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---- executor-local content cache, keyed by (uri, etag) -------------------
# Parity: /root/reference/src/datachain/cache.py (downloaded-file cache keyed
# by etag; consumed by UDFs when settings(cache=True) —
# lib/udf.py:384-392, catalog/catalog.py:563). Each executor keeps its own
# cache dir; identical (uri, etag) pairs are fetched once per machine.

_cache_default = False


def set_file_cache_default(on: bool) -> None:
    """Worker-level switch flipped by the UDF wrappers when the chain ran
    ``settings(cache=True)`` — makes plain ``read_bytes()`` calls inside the
    UDF hit the cache without threading a flag through user code."""
    global _cache_default
    _cache_default = bool(on)


def file_cache_dir() -> str:
    return os.environ.get(
        "DATACHAIN_SPARK_CACHE",
        os.path.join(tempfile.gettempdir(), "datachain_spark_cache"),
    )


def clear_file_cache() -> int:
    """Delete all cached blobs; returns the count removed (CLI clear-cache)."""
    root = file_cache_dir()
    n = 0
    for dirpath, _dirs, names in os.walk(root):
        for name in names:
            os.unlink(os.path.join(dirpath, name))
            n += 1
    return n


def _cached_bytes(uri: str, etag: str, reader) -> bytes:
    key = hashlib.sha256(f"{uri}\x00{etag}".encode()).hexdigest()
    path = os.path.join(file_cache_dir(), key[:2], key)
    if os.path.exists(path):
        with open(path, "rb") as f:
            return f.read()
    data = reader()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)  # atomic: concurrent tasks race benignly
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return data


try:
    from pydantic import BaseModel, Field

    class File(BaseModel):
        """Pydantic File signal — mirrors lib/file.py:217-224."""

        source: str = ""
        path: str = ""
        size: int = 0
        version: str = ""
        etag: str = ""
        is_latest: bool = True
        last_modified: Optional[Any] = None
        location: Optional[str] = None

        def get_uri(self) -> str:
            src = self.source.rstrip("/")
            return f"{src}/{self.path}" if src else self.path

        def get_local_path(self) -> str:
            uri = self.get_uri()
            return uri[7:] if uri.startswith("file://") else uri

        def read_bytes(self, cache: Optional[bool] = None) -> bytes:
            """Open and read; honors tar-member ``location`` pointers
            (parity: TarVFile, lib/file.py:110-196). ``cache=True`` (or the
            worker default set via settings(cache=True)) serves repeat reads
            of the same (uri, etag) from the executor-local cache — parity:
            cache.py / lib/udf.py:384-392. Tar members bypass the cache
            (range reads are already cheap).

            Local files only (no Python-side object-store client in this
            environment). For remote sources, attach bytes JVM-side with
            ``chain.with_file_content()`` before the UDF instead."""
            uri = self.get_uri()
            if "://" in uri and not uri.startswith("file://"):
                raise NotImplementedError(
                    f"read_bytes on remote source {self.source!r} needs a "
                    "Python filesystem client; use "
                    "chain.with_file_content() to attach bytes JVM-side"
                )
            path = self.get_local_path()
            if self.location:
                loc = json.loads(self.location)
                if isinstance(loc, list):
                    loc = loc[0]
                offset, size = int(loc["offset"]), int(loc["size"])
                parent = loc.get("parent")
                ppath = parent if isinstance(parent, str) else path
                with open(ppath, "rb") as f:
                    f.seek(offset)
                    return f.read(size)

            def _plain() -> bytes:
                with open(path, "rb") as f:
                    return f.read()

            use_cache = _cache_default if cache is None else cache
            if use_cache and self.etag:
                return _cached_bytes(self.get_uri(), self.etag, _plain)
            return _plain()

        def read_text(self, encoding: str = "utf-8") -> str:
            return self.read_bytes().decode(encoding)

        @property
        def name(self) -> str:
            return posixpath.basename(self.path)

        @property
        def parent(self) -> str:
            return posixpath.dirname(self.path)

        @property
        def file_stem(self) -> str:
            n = self.name
            stem, dot, _ = n.rpartition(".")
            return stem if dot and stem else n

        @property
        def file_ext(self) -> str:
            n = self.name
            stem, dot, ext = n.rpartition(".")
            return ext if dot and stem else ""

    class TextFile(File):
        """Text accessor specialization. Parity: lib/file.py:784."""

        def read(self, encoding: str = "utf-8") -> str:
            return self.read_text(encoding)

    class Image(BaseModel):
        """Image metadata signal. Parity: lib/file.py:812 (Image model)."""

        width: int = -1
        height: int = -1
        format: str = ""

    class ImageFile(File):
        """Parity: lib/file.py:812. Decode needs PIL (not installed here) —
        get_info falls back to a clearly-marked stub error; the metadata
        model + plumbing are real (ops/multimodal has the executor path)."""

        def read(self):
            raise NotImplementedError(
                "ImageFile.read requires PIL/pillow (not installed in this "
                "container); use ops.multimodal with fake=True for plumbing"
            )

        def get_info(self) -> "Image":
            raise NotImplementedError("image metadata requires PIL/pillow")

    class Video(BaseModel):
        """Parity: lib/file.py:864 (Video model)."""

        width: int = -1
        height: int = -1
        fps: float = -1.0
        duration: float = -1.0
        frames: int = -1
        format: str = ""
        codec: str = ""

    class Audio(BaseModel):
        """Parity: lib/file.py:1318 (Audio model)."""

        sample_rate: int = -1
        channels: int = -1
        duration: float = -1.0
        samples: int = -1
        format: str = ""
        codec: str = ""
        bit_rate: int = -1

    class VideoFile(File):
        """Parity: lib/file.py:880. Frame/fragment extraction requires av/
        opencv — stubbed; see ops.multimodal.sample_video_frames for the
        executor-side 1:N plumbing."""

        def get_info(self) -> "Video":
            raise NotImplementedError("video metadata requires av/opencv")

        def get_frame(self, frame: int):
            raise NotImplementedError("frame extraction requires av/opencv")

    class AudioFile(File):
        """Parity: lib/file.py:1005."""

        def get_info(self) -> "Audio":
            raise NotImplementedError("audio metadata requires soundfile/av")

        def get_fragment(self, start: float, end: float):
            raise NotImplementedError("audio fragments require soundfile/av")

    class AudioFragment(BaseModel):
        """A [start, end) slice of an audio file. Parity: lib/file.py:1120.
        Extraction is env-stubbed (soundfile/av absent); the model carries
        the pointer so downstream UDFs can decode executor-side."""

        audio: AudioFile
        start: float = 0.0
        end: float = -1.0

        def get_np(self):
            raise NotImplementedError("audio decode requires soundfile/av")

    class VideoFrame(BaseModel):
        """A single frame pointer. Parity: lib/file.py:1188."""

        video: VideoFile
        frame: int = 0

        def get_np(self):
            raise NotImplementedError("frame decode requires av/opencv")

    class VideoFragment(BaseModel):
        """A [start, end) video slice. Parity: lib/file.py:1251."""

        video: VideoFile
        start: float = 0.0
        end: float = -1.0

        def save(self, output: str):
            raise NotImplementedError("fragment extraction requires av/opencv")

    class ArrowRow(BaseModel):
        """Provenance marker for parse_tabular rows.
        Parity: lib/arrow.py ArrowRow."""

        file: File
        index: int = 0

except ImportError:  # pragma: no cover
    File = None  # type: ignore[assignment]
    TextFile = ImageFile = VideoFile = AudioFile = None  # type: ignore[assignment]
    Image = Video = Audio = ArrowRow = None  # type: ignore[assignment]
    AudioFragment = VideoFrame = VideoFragment = None  # type: ignore[assignment]


class TarVFile:
    """Virtual-file reader for tar members addressed by a ``location``
    pointer (offset/size/parent) — the open() path File.read_bytes uses for
    webdataset members. Parity: lib/tar.py + lib/file.py:110-196 (the
    reference registers this as the 'tar' vtype reader)."""

    vtype = "tar"

    @classmethod
    def open(cls, location: dict) -> bytes:
        offset, size = int(location["offset"]), int(location["size"])
        parent = location["parent"]
        path = parent[7:] if str(parent).startswith("file://") else str(parent)
        with open(path, "rb") as f:
            f.seek(offset)
            return f.read(size)


FILE_STRUCT = T.StructType([
    T.StructField("source", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("size", T.LongType(), True),
    T.StructField("version", T.StringType(), True),
    T.StructField("etag", T.StringType(), True),
    T.StructField("is_latest", T.BooleanType(), True),
    T.StructField("last_modified", T.TimestampType(), True),
    T.StructField("location", T.StringType(), True),
])

# unique key of a File row (lib/file.py:245-254)
FILE_UNIQUE_KEYS = ("source", "path", "size", "version", "etag", "is_latest", "location")


def export_files(
    df: DataFrame,
    output: str,
    signal: str = "file",
    placement: str = "fullpath",
) -> None:
    """Copy the files referenced by a File struct column to ``output``.

    Parity: to_storage / FileExporter
    (/root/reference/src/datachain/lib/dc/datachain.py:2681-2749,
    lib/file.py:51-83). The reference uses a driver-side thread pool; here
    each partition copies its own files — distributed, no driver bottleneck.

    placement: 'fullpath' (source+path layout), 'filename' (flat),
    'etag' (content-addressed names) — lib/file.py:466-497.
    """
    if placement not in ("fullpath", "filename", "etag"):
        raise ValueError(f"unknown placement: {placement!r}")

    cols = df.select(
        F.col(f"{signal}.source").alias("source"),
        F.col(f"{signal}.path").alias("path"),
        F.col(f"{signal}.etag").alias("etag"),
        F.col(f"{signal}.location").alias("location"),
    )

    def copy_partition(rows):
        import shutil

        for r in rows:
            src = r["source"].rstrip("/")
            uri = f"{src}/{r['path']}" if src else r["path"]
            local = uri[7:] if uri.startswith("file://") else uri
            if placement == "fullpath":
                rel = (src.split("://")[-1] + "/" + r["path"]).lstrip("/")
            elif placement == "filename":
                rel = posixpath.basename(r["path"])
            else:
                ext = posixpath.splitext(r["path"])[1]
                rel = r["etag"] + ext
            dst = os.path.join(output, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if r["location"]:
                loc = json.loads(r["location"])
                if isinstance(loc, list):
                    loc = loc[0]
                parent = loc.get("parent") or local
                with open(parent, "rb") as fi, open(dst, "wb") as fo:
                    fi.seek(int(loc["offset"]))
                    fo.write(fi.read(int(loc["size"])))
            else:
                shutil.copyfile(local, dst)

    cols.foreachPartition(copy_partition)
