"""Spec-style WebDataset sample assembly — parity with the reference's
``lib/webdataset.py`` (Builder/get_tar_groups at webdataset.py:90-215,
WDSBasic/WDSAllFile models at :55-87), the API the public multimodal
examples use: ``chain.gen(laion=process_webdataset(spec=WDSLaion))``.

Design: the factory returns a generator UDF over tar-shard ``File`` rows.
Each executor opens its own local tar (no driver involvement), walks members
in archive order grouping by sample stem, reads the small metadata members
(txt/json/...) inline, and emits one typed model per sample whose ``file``
field is a VIRTUAL File pointing at the core member (vtype=tar location —
range-readable later, never extracted). The complement of
``sources/tabular.process_webdataset`` (member rows): this one produces
one nested-model ROW PER SAMPLE.
"""

from __future__ import annotations

import json as _json
import os
import posixpath
import tarfile
from typing import Any, Callable, ClassVar, Iterator, Optional, Sequence, Union, get_args, get_origin

from .error import DataChainError


class WDSError(DataChainError):
    def __init__(self, tar_name: str, message: str):
        super().__init__(f"WebDataset error '{tar_name}': {message}")


class CoreFileDuplicationError(WDSError):
    def __init__(self, tar_name: str, file1: str, file2: str):
        super().__init__(tar_name, f"duplication of files with core extensions: {file1}, {file2}")


class CoreFileNotFoundError(WDSError):
    def __init__(self, tar_name: str, extensions: Sequence[str], stem: str):
        super().__init__(
            tar_name,
            f"no files with the extensions '{','.join(extensions)}' were found for stem {stem}",
        )


class UnknownFileExtensionError(WDSError):
    def __init__(self, tar_name: str, name: str, ext: str):
        super().__init__(tar_name, f"unknown extension '{ext}' of file '{name}'")


try:
    from pydantic import BaseModel, Field

    from .sources.files import File

    class WDSBasic(BaseModel):
        """Parity: webdataset.py:55-56."""

        file: File

    import warnings as _warnings

    # The `json` member suffix is part of the wds convention and the
    # reference's public surface (samples are addressed as `laion.json.uid`),
    # so the field MUST be named `json` even though it shadows pydantic v2's
    # deprecated BaseModel.json() method — shadowing a deprecated method is
    # harmless, but pydantic warns at class creation (once per import, i.e.
    # once per executor) and the noise drowns bench/test tails. Suppress
    # exactly that warning for exactly this definition.
    with _warnings.catch_warnings():
        _warnings.filterwarnings(
            "ignore", message=r'Field name "json(\.|")', category=UserWarning
        )

        class WDSAllFile(WDSBasic):
            """Every conventional wds metadata suffix — parity webdataset.py:59-81."""

            txt: Optional[str] = Field(default=None)
            text: Optional[str] = Field(default=None)
            cap: Optional[str] = Field(default=None)
            transcript: Optional[str] = Field(default=None)
            cls: Optional[int] = Field(default=None)
            cls2: Optional[int] = Field(default=None)
            index: Optional[int] = Field(default=None)
            inx: Optional[int] = Field(default=None)
            id: Optional[int] = Field(default=None)
            json: Optional[dict] = Field(default=None)  # type: ignore[assignment]
            jsn: Optional[dict] = Field(default=None)
            pyd: Optional[bytes] = Field(default=None)
            pickle: Optional[bytes] = Field(default=None)
            pth: Optional[bytes] = Field(default=None)
            ten: Optional[bytes] = Field(default=None)
            tb: Optional[bytes] = Field(default=None)
            mp: Optional[bytes] = Field(default=None)
            msg: Optional[bytes] = Field(default=None)
            npy: Optional[bytes] = Field(default=None)
            npz: Optional[bytes] = Field(default=None)
            cbor: Optional[bytes] = Field(default=None)

    class WDSReadableSubclass(BaseModel):
        """A field type that knows how to read itself from a tar member —
        parity webdataset.py:84-87."""

        @staticmethod
        def _reader(builder: "Builder", item: tarfile.TarInfo) -> "WDSReadableSubclass":
            raise NotImplementedError

except ImportError:  # pragma: no cover
    WDSBasic = WDSAllFile = WDSReadableSubclass = None  # type: ignore[assignment]


DEFAULT_CORE_EXTENSIONS = ("jpg", "jpeg", "png", "gif", "webp", "mp3", "wav", "mp4", "avi")


class BuilderState:
    def __init__(self) -> None:
        self.stem: Optional[str] = None
        self.core_file: Optional[tarfile.TarInfo] = None
        self.data: dict = {}


class Builder:
    """Per-sample accumulator — parity webdataset.py:97-185 (same reader
    dispatch: model_fields type drives how each suffix is parsed)."""

    DEFAULT_TYPES_READERS: ClassVar[dict] = {
        str: lambda bld, item: bld.read_text(item),
        int: lambda bld, item: int(bld.read_text(item)),
        float: lambda bld, item: float(bld.read_text(item)),
        bytes: lambda bld, item: bld.read(item),
        dict: lambda bld, item: _json.loads(bld.read_text(item)),
    }

    def __init__(
        self,
        tar_stream: "File",
        core_extensions: Sequence[str],
        wds_class: type,
        tar: tarfile.TarFile,
        tar_path: str,
        encoding: str = "utf-8",
    ) -> None:
        self._core_extensions = core_extensions
        self._tar_stream = tar_stream
        self._wds_class = wds_class
        self._tar = tar
        self._tar_path = tar_path
        self._encoding = encoding
        self.state = BuilderState()

    def read(self, item: tarfile.TarInfo) -> bytes:
        return self._tar.extractfile(item).read()  # type: ignore[union-attr]

    def read_text(self, item: tarfile.TarInfo) -> str:
        return self.read(item).decode(self._encoding)

    def add(self, item: tarfile.TarInfo) -> None:
        name = posixpath.basename(item.name)
        stem, dot, ext = name.rpartition(".")
        if not dot or not stem:
            stem, ext = name, ""

        if self.state.stem is not None and self.state.stem != stem:
            raise StopIteration

        if self.state.stem is None:
            self.state.stem = stem

        if ext in self._core_extensions:
            if self.state.core_file is not None:
                raise CoreFileDuplicationError(
                    self._tar_stream.path, item.name, self.state.core_file.name
                )
            self.state.core_file = item
        elif ext in self.state.data:
            raise WDSError(
                self._tar_stream.path,
                f"file with extension '.{ext}' already exists in the archive",
            )
        else:
            type_ = self._get_type(ext)
            if type_ is None:
                raise UnknownFileExtensionError(self._tar_stream.path, name, ext)
            if isinstance(type_, type) and issubclass(type_, WDSReadableSubclass):
                reader = type_._reader
            else:
                reader = self.DEFAULT_TYPES_READERS.get(type_)
            if reader is None:
                raise WDSError(
                    self._tar_stream.path,
                    f"unable to find a reader for type {type_}, extension .{ext}",
                )
            self.state.data[ext] = reader(self, item)

    def produce(self):
        if self.state.core_file is None:
            raise CoreFileNotFoundError(
                self._tar_stream.path, self._core_extensions, self.state.stem or ""
            )
        member = self.state.core_file
        file = File(
            source=self._tar_stream.source,
            path=f"{self._tar_stream.path}/{member.name}",
            size=int(member.size),
            version=self._tar_stream.version,
            etag=f"{self._tar_stream.etag}:{member.name}",
            is_latest=True,
            last_modified=self._tar_stream.last_modified,
            location=_json.dumps(
                [
                    {
                        "vtype": "tar",
                        "offset": member.offset_data,
                        "size": member.size,
                        "parent": self._tar_path,
                    }
                ]
            ),
        )
        wds = self._wds_class(**self.state.data | {"file": file})
        self.state = BuilderState()
        return wds

    def _get_type(self, ext: str):
        field = self._wds_class.model_fields.get(ext)
        if field is None:
            return None
        anno = field.annotation
        import types as _types

        origin = get_origin(anno)
        if origin is Union or origin is getattr(_types, "UnionType", None):
            args = [a for a in get_args(anno) if a is not type(None)]
            return args[0] if args else None
        return anno


def get_tar_groups(
    stream: "File",
    tar: tarfile.TarFile,
    tar_path: str,
    core_extensions: Sequence[str],
    spec: type,
    encoding: str = "utf-8",
) -> Iterator[Any]:
    """Walk members in archive order, yield one spec instance per sample
    stem — parity webdataset.py:188-215."""
    builder = Builder(stream, core_extensions, spec, tar, tar_path, encoding)
    # archive order, samples contiguous by stem (the wds convention) —
    # parity with the reference's streaming walk
    for item in tar.getmembers():
        if not item.isfile():
            continue
        try:
            builder.add(item)
        except StopIteration:
            yield builder.produce()
            builder.add(item)
    if builder.state.stem is not None:
        yield builder.produce()


def process_webdataset(
    spec: type = None,
    core_extensions: Sequence[str] = DEFAULT_CORE_EXTENSIONS,
    encoding: str = "utf-8",
) -> Callable:
    """Generator-UDF factory over tar-shard File rows — the reference's
    public entrypoint (webdataset.py:218-236), used as
    ``chain.gen(laion=process_webdataset(spec=WDSLaion))``. Each sample
    becomes one nested-model row; the core member rides as a virtual File
    (tar range pointer), metadata members are parsed by field type."""
    wds_class = spec or WDSAllFile

    def wds_generator(file):
        uri = file.get_uri()
        if "://" in uri and not uri.startswith("file://"):
            raise NotImplementedError(
                "process_webdataset reads local tars in this environment"
            )
        tar_path = file.get_local_path()
        with tarfile.open(tar_path) as tar:
            yield from get_tar_groups(
                file, tar, tar_path, core_extensions, wds_class, encoding
            )

    # real annotation objects (this module uses future-annotations, which
    # would leave strings the UDF inferers can't resolve against a closure):
    # file: File drives struct->model hydration, the return type drives the
    # nested output schema
    wds_generator.__annotations__ = {"file": File, "return": Iterator[wds_class]}
    return wds_generator


def to_webdataset(
    df,
    output: str,
    key_col: str,
    columns: "dict[str, str]",
    num_shards: int = 16,
    shard_prefix: str = "shard-",
) -> "Any":
    """Distributed WebDataset tar-shard writer — the sink half of the wds
    story (the reference only reads wds; a training pipeline also has to
    SHARD its prepared corpus back out, so this is a spec addition).

    ``columns`` maps column -> member extension, e.g.
    ``{"image": "jpg", "meta": "json", "caption": "txt"}``; each row becomes
    one sample (members ``{key}.{ext}``), serialized by extension: binary
    columns raw, ``json`` members via json.dumps for non-strings, everything
    else utf-8 text.

    Scale shape: ``repartitionByRange(num_shards, key)`` +
    ``sortWithinPartitions(key)`` — one range shuffle total, sampled
    boundaries, key-ordered samples within and across shards — then each
    partition streams its rows through ONE tarfile via mapInPandas
    (Arrow batches in, constant memory, no driver involvement). Returns the
    manifest DataFrame (shard, path, samples, bytes) — count() it to force
    the write.

    Remote URIs (``s3://``, ``gs://``, ...) are routed through fsspec (same
    gate as to_json): each executor streams its tar straight to object
    storage via a sequential ``tarfile`` stream over ``fsspec.open`` — no
    local staging, no driver involvement. Plain and ``file://`` paths use
    the local filesystem either way."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    sdf = getattr(df, "df", df)
    missing = [c for c in [key_col, *columns] if c not in sdf.columns]
    if missing:
        raise ValueError(f"to_webdataset: missing columns {missing}")
    remote = _is_remote_uri(output)
    if remote:
        # fail fast on the driver if fsspec is absent (executors would each
        # raise the same ImportError later, less legibly)
        fs, root = _fsspec_fs(output)
        fs.makedirs(root, exist_ok=True)
    else:
        output = output.removeprefix("file://")
        _os.makedirs(output, exist_ok=True)

    exts = dict(columns)
    schema = StructType([
        StructField("shard", LongType()),
        StructField("path", StringType()),
        StructField("samples", LongType()),
        StructField("bytes", LongType()),
    ])

    def write_partition(batches):
        import io as _io
        import tarfile as _tarfile

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        if remote:
            path = output.rstrip("/") + f"/{shard_prefix}{pid:06d}.tar"
        else:
            path = _os.path.join(output, f"{shard_prefix}{pid:06d}.tar")
        tar = fobj = None
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if tar is None:
                if remote:
                    from datachain_spark.webdataset import _fsspec_fs

                    fs, rpath = _fsspec_fs(path)
                    fobj = fs.open(rpath, "wb")
                    # "w|" = sequential stream mode: never seeks, so it
                    # works over non-seekable object-store upload streams
                    tar = _tarfile.open(fileobj=fobj, mode="w|")
                else:
                    tar = _tarfile.open(path, "w")
            # to_dict('records') keeps REAL column names — itertuples
            # renames invalid/underscore-leading identifiers to positional
            # _0/_1 names, breaking rec[col] for e.g. a '__id' column
            for rec in pdf.to_dict("records"):
                key = str(rec[key_col])
                for col, ext in exts.items():
                    v = rec[col]
                    if v is None:
                        continue
                    if isinstance(v, (bytes, bytearray)):
                        data = bytes(v)
                    elif ext == "json" and not isinstance(v, str):
                        data = _json.dumps(v, default=str).encode()
                    else:
                        data = str(v).encode()
                    info = _tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(data)
                    tar.addfile(info, _io.BytesIO(data))
                n += 1
        if tar is not None:
            tar.close()
            if fobj is not None:
                fobj.close()
                from datachain_spark.webdataset import _fsspec_fs

                fs, rpath = _fsspec_fs(path)
                size = fs.size(rpath)
            else:
                size = _os.path.getsize(path)
            import pandas as _pd

            yield _pd.DataFrame(
                [{"shard": pid, "path": path, "samples": n, "bytes": size}]
            )

    prepared = (
        sdf.select(key_col, *exts)
        .repartitionByRange(num_shards, F.col(key_col))
        .sortWithinPartitions(key_col)
    )
    return prepared.mapInPandas(write_partition, schema)


def _is_remote_uri(path: str) -> bool:
    """True for URIs that must route through fsspec (s3://, gs://, ...);
    plain paths and file:// stay on the local filesystem."""
    return "://" in path and not path.startswith("file://")


def _fsspec_fs(path: str):
    """(filesystem, fs-native path) for a remote URI via fsspec — the same
    import gate as DataChain.to_json; raises a clear ImportError when the
    package is absent."""
    try:
        import fsspec  # type: ignore[import-not-found]
    except ImportError:
        raise ImportError(
            f"writing to {path!r} requires the 'fsspec' package"
        ) from None
    return fsspec.core.url_to_fs(path)
