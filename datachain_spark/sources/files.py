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
import io
import json
import os
import posixpath
import tempfile
import warnings
from contextlib import contextmanager
from datetime import datetime, timezone
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


def _write_bytes(
    destination: str, data: bytes, client_config: Optional[dict] = None
) -> None:
    """Write bytes to a local path (parents created) or, for remote URIs,
    through fsspec when installed."""
    if "://" in destination and not destination.startswith("file://"):
        try:
            import fsspec  # type: ignore[import-not-found]
        except ImportError:
            raise NotImplementedError(
                f"writing to remote {destination!r} requires fsspec"
            ) from None
        with fsspec.open(destination, "wb", **(client_config or {})) as f:
            f.write(data)
        return
    local = destination[7:] if destination.startswith("file://") else destination
    parent = os.path.dirname(local)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(local, "wb") as f:
        f.write(data)


def rebase_path(
    src_path: str,
    old_base: str,
    new_base: str,
    suffix: str = "",
    extension: str = "",
) -> str:
    """Swap ``old_base`` for ``new_base`` in a file URI, optionally adding a
    stem ``suffix`` and/or replacing the ``extension`` (no dot). Parity:
    /root/reference/src/datachain/lib/utils.py:84-170 (same contract:
    schemes are stripped for matching, ValueError when old_base is absent).
    """

    def _schemeless(p: str) -> str:
        if "://" in p:
            scheme_rest = p.split("://", 1)[1]
            return scheme_rest
        return p

    src_norm = posixpath.normpath(_schemeless(src_path))
    old_norm = posixpath.normpath(_schemeless(old_base))
    idx = src_norm.find(old_norm)
    if idx == -1:
        raise ValueError(f"old_base {old_base!r} not found in {src_path!r}")
    rel = src_norm[idx + len(old_norm):].lstrip("/")
    d, _, fname = rel.rpartition("/")
    stem, dot, ext = fname.rpartition(".")
    if not dot or not stem:
        stem, ext = fname, ""
    new_ext = f".{extension}" if extension else (f".{ext}" if ext else "")
    new_name = f"{stem}{suffix}{new_ext}"
    new_rel = posixpath.join(d, new_name) if d else new_name
    return posixpath.join(new_base.rstrip("/"), new_rel)


try:
    from pydantic import BaseModel, Field, field_validator

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

        def read_bytes(
            self, length: int = -1, cache: Optional[bool] = None
        ) -> bytes:
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
                if 0 <= length < size:
                    size = length
                with open(ppath, "rb") as f:
                    f.seek(offset)
                    return f.read(size)

            def _plain() -> bytes:
                with open(path, "rb") as f:
                    return f.read()

            use_cache = _cache_default if cache is None else cache
            if use_cache and self.etag:
                data = _cached_bytes(self.get_uri(), self.etag, _plain)
                return data[:length] if length >= 0 else data
            if length >= 0:
                with open(path, "rb") as f:
                    return f.read(length)
            return _plain()

        def read_text(self, encoding: str = "utf-8") -> str:
            return self.read_bytes().decode(encoding)

        def read(self, length: int = -1) -> bytes:
            """Parity: lib/file.py:469 — alias of read_bytes."""
            return self.read_bytes(length)

        @field_validator("path", mode="before")
        @classmethod
        def validate_path(cls, path):
            """Normalize to POSIX form — parity lib/file.py:286-289."""
            from pathlib import PurePath

            return PurePath(path).as_posix() if path else ""

        @field_validator("location", mode="before")
        @classmethod
        def validate_location(cls, v):
            """The reference stores location as dict/list (lib/file.py:
            256-284); the Spark column is a JSON string — accept either."""
            if v is None or isinstance(v, str):
                return v or None
            return json.dumps(v)

        def model_dump_custom(self) -> dict:
            """Parity lib/file.py:291-294: plain dict with a stringified
            timestamp (JSON-safe)."""
            res = self.model_dump()
            res["last_modified"] = str(res["last_modified"])
            return res

        def ensure_cached(self) -> None:
            """Pre-warm the executor-local (uri, etag) cache — parity
            lib/file.py:532-538 (catalog client download replaced by the
            cache-routed read)."""
            self.read_bytes(cache=True)

        def get_fs(self):
            """fsspec filesystem for this file's source — parity
            lib/file.py:653-655. Requires fsspec for non-local schemes."""
            uri = self.get_uri()
            scheme = uri.split("://", 1)[0] if "://" in uri else "file"
            try:
                import fsspec  # type: ignore[import-not-found]
            except ImportError:
                if scheme == "file":
                    raise NotImplementedError(
                        "get_fs requires the 'fsspec' package"
                    ) from None
                raise
            return fsspec.filesystem(scheme)

        # -- open / write / export surface (parity lib/file.py:395-540) ----

        @contextmanager
        def open(self, mode: str = "rb", **open_kwargs):
            """Open the file as a stream. Read modes honor tar-member
            ``location`` pointers and the executor cache; write modes
            ("wb"/"w"/"ab"/...) write through to the target path and refresh
            size/etag/last_modified on close — parity lib/file.py:395-436.
            Remote write paths route through fsspec when installed."""
            writing = any(ch in mode for ch in "wax+")
            if not writing:
                uri = self.get_uri()
                if "://" in uri and not uri.startswith("file://"):
                    raise NotImplementedError(
                        f"open for read on remote source {self.source!r} needs "
                        "a Python filesystem client; use "
                        "chain.with_file_content() to attach bytes JVM-side"
                    )
                if self.location:
                    buf = io.BytesIO(self.read_bytes())
                    yield buf if "b" in mode else io.TextIOWrapper(
                        buf, encoding=open_kwargs.get("encoding", "utf-8")
                    )
                    return
                with open(self.get_local_path(), mode, **open_kwargs) as f:
                    yield f
                return
            if self.location:
                raise OSError("writing to a virtual (tar member) file is not supported")
            uri = self.get_uri()
            if "://" in uri and not uri.startswith("file://"):
                try:
                    import fsspec  # type: ignore[import-not-found]
                except ImportError:
                    raise NotImplementedError(
                        f"writing to remote {self.source!r} requires fsspec"
                    ) from None
                with fsspec.open(uri, mode, **open_kwargs) as f:
                    yield f
                return
            target = self.get_local_path()
            parent = os.path.dirname(target)
            if parent:
                os.makedirs(parent, exist_ok=True)
            with open(target, mode, **open_kwargs) as f:
                yield f
            st = os.stat(target)
            self.size = int(st.st_size)
            self.etag = f"{int(st.st_mtime * 1e6):x}-{st.st_size:x}"
            self.last_modified = datetime.fromtimestamp(st.st_mtime, tz=timezone.utc)

        def save(self, destination: str, client_config: Optional[dict] = None) -> None:
            """Write this file's content to ``destination`` (parity
            lib/file.py:473-481). Local destinations create parent dirs;
            remote ones route through fsspec when installed."""
            data = self.read_bytes()
            _write_bytes(destination, data, client_config)

        def export(
            self,
            output: str,
            placement: str = "fullpath",
            use_cache: bool = True,
            link_type: str = "copy",
            client_config: Optional[dict] = None,
        ) -> None:
            """Copy (or symlink) this file under ``output`` using the
            placement layout — parity lib/file.py:498-520."""
            dst = self.get_destination_path(output, placement)
            if link_type == "symlink" and not self.location:
                src = self.get_local_path()
                if "://" not in src:
                    parent = os.path.dirname(dst)
                    if parent:
                        os.makedirs(parent, exist_ok=True)
                    os.symlink(src, dst)
                    return
            self.save(dst, client_config=client_config)

        @classmethod
        def upload(cls, data: bytes, path: str, session=None):
            """Write ``data`` to ``path`` and return the File describing it —
            parity lib/file.py:334-355 (catalog client replaced by direct
            local/fsspec writes)."""
            _write_bytes(path, data, None)
            f = cls.at(path, session=session)
            return f.resolve()

        @classmethod
        def at(cls, uri: str, session=None):
            """Construct a File from a full URI/path — parity
            lib/file.py:359-381. Remote URIs split scheme://netloc as the
            source; local paths split dirname/basename."""
            if "://" in uri and not uri.startswith("file://"):
                scheme, rest = uri.split("://", 1)
                netloc, _, rel = rest.partition("/")
                return cls(source=f"{scheme}://{netloc}", path=rel)
            local = uri[7:] if uri.startswith("file://") else uri
            local = os.path.abspath(local)
            return cls(
                source=f"file://{os.path.dirname(local)}",
                path=os.path.basename(local),
            )

        # -- typed conversions (parity lib/file.py:301-331) -----------------

        def as_text_file(self) -> "TextFile":
            return self if isinstance(self, TextFile) else TextFile(**self.model_dump())

        def as_image_file(self) -> "ImageFile":
            return self if isinstance(self, ImageFile) else ImageFile(**self.model_dump())

        def as_video_file(self) -> "VideoFile":
            return self if isinstance(self, VideoFile) else VideoFile(**self.model_dump())

        def as_audio_file(self) -> "AudioFile":
            return self if isinstance(self, AudioFile) else AudioFile(**self.model_dump())

        # -- path helpers (parity lib/file.py:567-655) ----------------------

        def get_file_suffix(self) -> str:
            """Last part of the file name WITH the dot."""
            e = self.file_ext
            return f".{e}" if e else ""

        def get_file_ext(self) -> str:
            """Last part of the file name without the dot."""
            return self.file_ext

        def get_file_stem(self) -> str:
            return self.file_stem

        def get_full_name(self) -> str:
            """[DEPRECATED] use file.path (parity lib/file.py:579-591)."""
            warnings.warn(
                "file.get_full_name() is deprecated; use file.path",
                DeprecationWarning,
                stacklevel=2,
            )
            return self.path

        def get_path_normalized(self) -> str:
            """Normalized relative path; rejects directories and '..'
            traversal — parity lib/file.py:593-609."""
            if not self.path or self.path.endswith("/"):
                raise ValueError(f"File path must be a file, got {self.path!r}")
            norm = posixpath.normpath(self.path)
            if norm == "." or ".." in norm.split("/"):
                raise ValueError(f"invalid file path {self.path!r}")
            return norm

        def get_fs_path(self) -> str:
            """Path usable with the scheme's filesystem: local files lose the
            file:// prefix, other schemes keep the full URI."""
            uri = self.get_uri()
            return uri[7:] if uri.startswith("file://") else uri

        def get_destination_path(self, output: str, placement: str) -> str:
            """Export layout — parity lib/file.py:631-651."""
            if placement == "filename":
                rel = self.name
            elif placement == "etag":
                rel = f"{self.etag}{self.get_file_suffix()}"
            elif placement == "fullpath":
                rel = self.get_path_normalized()
                src = self.source
                if "://" in src and not src.startswith("file://"):
                    netloc = src.split("://", 1)[1].split("/", 1)[0]
                    rel = posixpath.join(netloc, rel)
            elif placement == "checksum":
                raise NotImplementedError("checksum placement not implemented")
            else:
                raise ValueError(f"unsupported file export placement: {placement!r}")
            return posixpath.join(output, rel)

        def get_hash(self) -> str:
            """sha256 of the identity fingerprint — parity lib/file.py:657-661
            (same source/path/version/etag[/location] contract)."""
            fp = f"{self.source}/{self.path}/{self.version}/{self.etag}"
            if self.location:
                fp += f"/{self.location}"
            return hashlib.sha256(fp.encode()).hexdigest()

        def resolve(self):
            """Re-stat the file and return a refreshed copy — parity
            lib/file.py:663-720. Missing/unreadable files come back with
            zeroed metadata rather than raising."""
            uri = self.get_uri()
            if "://" in uri and not uri.startswith("file://"):
                raise NotImplementedError(
                    f"resolve on remote source {self.source!r} needs a Python "
                    "filesystem client; re-list with read_storage instead"
                )
            try:
                st = os.stat(self.get_local_path())
                return type(self)(
                    source=self.source,
                    path=self.path,
                    size=int(st.st_size),
                    version=self.version,
                    etag=f"{int(st.st_mtime * 1e6):x}-{st.st_size:x}",
                    is_latest=True,
                    last_modified=datetime.fromtimestamp(st.st_mtime, tz=timezone.utc),
                    location=self.location,
                )
            except OSError:
                return type(self)(
                    source=self.source,
                    path=self.path,
                    size=0,
                    version="",
                    etag="",
                    is_latest=True,
                    last_modified=datetime.fromtimestamp(0, tz=timezone.utc),
                    location=self.location,
                )

        def rebase(
            self,
            old_base: str,
            new_base: str,
            suffix: str = "",
            extension: str = "",
        ) -> str:
            """Swap the URI's base directory, optionally adding a stem suffix
            or changing the extension — parity lib/file.py:722-753 /
            lib/utils.rebase_path."""
            return rebase_path(self.get_uri(), old_base, new_base, suffix, extension)

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

        @contextmanager
        def open(self, mode: str = "r", **open_kwargs):
            """Text-mode default — parity lib/file.py:786-792."""
            with super().open(mode, **open_kwargs) as f:
                yield f

        def save(self, destination: str, client_config: Optional[dict] = None) -> None:
            """Write text content — parity lib/file.py:803-809."""
            _write_bytes(destination, self.read_text().encode("utf-8"), client_config)

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

        def save(self, destination: str, client_config: Optional[dict] = None) -> None:
            """Reference re-encodes via PIL by target extension
            (lib/file.py:823-840) — decode lib absent here; raw-byte copy
            is available via File.save on the base class."""
            raise NotImplementedError("image re-encode save requires PIL/pillow")

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
        """Parity: lib/file.py:880. DECODE requires av/opencv (env-stub);
        the frame/fragment POINTER constructors below are pure models — the
        reference also builds them without touching bytes (lib/file.py:
        916-996), and that's what a Spark pipeline fans out on before the
        executor-side decode (ops.multimodal.sample_video_frames)."""

        def get_info(self) -> "Video":
            raise NotImplementedError("video metadata requires av/opencv")

        def get_frame(self, frame: int) -> "VideoFrame":
            """Pointer to one frame — parity lib/file.py:935-944."""
            if frame < 0:
                raise ValueError("frame must be a non-negative integer")
            return VideoFrame(video=self, frame=frame)

        def get_frames(self, start: int = 0, end: Optional[int] = None, step: int = 1):
            """Iterator of frame pointers — parity lib/file.py:916-933.
            ``end=None`` needs the stream's frame count (decode lib)."""
            if start < 0:
                raise ValueError("start_frame must be a non-negative integer.")
            if step < 1:
                raise ValueError("step must be a positive integer.")
            if end is None:
                end = self.get_info().frames  # env-stub raises here
            if end < start:
                raise ValueError("end_frame must be greater than start_frame.")
            for f in range(start, end, step):
                yield self.get_frame(f)

        def get_fragment(self, start: float, end: float) -> "VideoFragment":
            """Pointer to a [start, end) time slice — parity
            lib/file.py:946-963."""
            if start < 0 or end < 0 or start >= end:
                raise ValueError(
                    f"Can't get video fragment for '{self.path}', "
                    f"invalid time range: ({start:.3f}, {end:.3f})"
                )
            return VideoFragment(video=self, start=start, end=end)

        def get_fragments(
            self, duration: float, start: float = 0, end: Optional[float] = None
        ):
            """Split into fixed-duration fragment pointers — parity
            lib/file.py:965-996. ``end=None`` needs stream duration."""
            if duration <= 0:
                raise ValueError("duration must be a positive float.")
            if start < 0:
                raise ValueError("start must be a non-negative float.")
            if end is None:
                end = self.get_info().duration  # env-stub raises here
            if end < start:
                raise ValueError("end must be greater than start.")
            while start < end:
                yield self.get_fragment(start, min(start + duration, end))
                start += duration

    class AudioFile(File):
        """Parity: lib/file.py:1005. Same split as VideoFile: decode is
        env-stubbed, fragment POINTERS are pure models."""

        def get_info(self) -> "Audio":
            raise NotImplementedError("audio metadata requires soundfile/av")

        def get_fragment(self, start: float, end: float) -> "AudioFragment":
            """Pointer to a [start, end) slice — parity lib/file.py:
            1029-1049 (no download, no extraction)."""
            if start < 0 or end < 0 or start >= end:
                raise ValueError(
                    f"Can't get audio fragment for '{self.path}', "
                    f"invalid time range: ({start:.3f}, {end:.3f})"
                )
            return AudioFragment(audio=self, start=start, end=end)

        def get_fragments(
            self, duration: float, start: float = 0, end: Optional[float] = None
        ):
            """Fixed-duration fragment pointers — parity lib/file.py:
            1051-1080."""
            if duration <= 0:
                raise ValueError("duration must be a positive float.")
            if start < 0:
                raise ValueError("start must be a non-negative float.")
            if end is None:
                end = self.get_info().duration  # env-stub raises here
            if end < start:
                raise ValueError("end must be greater than start.")
            while start < end:
                yield self.get_fragment(start, min(start + duration, end))
                start += duration

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
        Parity: lib/file.py:1364-1390 (ArrowRow)."""

        file: File
        index: int = 0
        kwargs: dict = Field(default_factory=dict)

        def open(self):
            """Arrow reader positioned at this row — parity
            lib/file.py:1371-1385 (local sources; remote goes through
            get_fs/fsspec like the reference's non-cached branch)."""
            from pyarrow.dataset import dataset

            uri = self.file.get_uri()
            if "://" in uri and not uri.startswith("file://"):
                ds = dataset(
                    self.file.get_fs_path(), filesystem=self.file.get_fs(), **self.kwargs
                )
            else:
                ds = dataset(self.file.get_local_path(), **self.kwargs)
            return ds.take([self.index]).to_reader()

        def read(self) -> dict:
            """Row contents as a dict — parity lib/file.py:1387-1390."""
            return self.open().read_all().to_pylist()[0]

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
