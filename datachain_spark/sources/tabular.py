"""parse_tabular + webdataset: turn File rows into parsed data rows.

Parity:
- parse_tabular (/root/reference/src/datachain/lib/dc/datachain.py:2079-2183,
  ArrowGenerator lib/arrow.py:42-167): a chain of File rows becomes rows
  parsed from those files (parquet/csv/json), with a ``source`` provenance
  column carrying the originating File.
- webdataset (/root/reference/src/datachain/lib/webdataset.py:97-225 +
  lib/tar.py): tar shards expand into grouped samples; members are virtual
  files addressed by (offset, size) into the parent tar, readable via range
  requests (TarVFile, lib/file.py:110-196).

Spark-first: parse_tabular short-circuits to ``spark.read.<fmt>(paths)`` with
``input_file_name()`` provenance when possible (scan-level parallelism,
pushdown, pruning); process_webdataset is a gen-style mapInPandas that reads
tar indexes on executors — the 100-TB path, no driver I/O.
"""

from __future__ import annotations

import json
import os
import posixpath
import tarfile
from typing import TYPE_CHECKING, Iterator, Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .files import FILE_STRUCT

if TYPE_CHECKING:
    from ..chain import DataChain


_SIMPLE_GLOB = r"[^/\[\]{}]*"


def _native_listing_paths(chain: "DataChain"):
    """If the chain is an unmodified single-URI read_storage listing whose
    glob maps onto Spark reader options, return ({reader options}, [root]);
    else None (caller falls back to the explicit path list)."""
    import re

    spec = getattr(chain, "_storage_spec", None)
    if spec is None:
        return None
    root, pattern = spec["root"], spec["pattern"]
    if pattern is None:
        if not spec["recursive"]:
            return None  # 'direct children only' has no exact reader option
        return {"recursiveFileLookup": "true"}, [root]
    m = re.fullmatch(rf"\*\*/({_SIMPLE_GLOB})", pattern)
    if m:
        return {"recursiveFileLookup": "true", "pathGlobFilter": m.group(1)}, [root]
    if re.fullmatch(_SIMPLE_GLOB, pattern) and "*" in pattern:
        # single path component: direct children of root
        return {"pathGlobFilter": pattern}, [root]
    return None


def parse_tabular(
    chain: "DataChain",
    format: str = "parquet",  # noqa: A002
    source: bool = True,
    **options,
) -> "DataChain":
    """Parse the files listed in a File-row chain into data rows.

    Scale path (r04): when the chain is an UNMODIFIED read_storage listing
    of a single URI whose glob is expressible as a Spark reader option
    (no glob, ``*.ext``, or ``**/*.ext``), the directory itself is handed
    to the native reader with ``pathGlobFilter``/``recursiveFileLookup`` —
    file enumeration happens scan-side on executors and NOTHING touches the
    driver. Any filtered/transformed chain (a true subset selection) falls
    back to collecting the explicit path list (driver-side: paths only —
    the listing is orders of magnitude smaller than the data). The fast
    path reads the live directory rather than the cached listing snapshot;
    pass ``update=True`` to read_storage when staleness matters.
    Provenance is attached via ``input_file_name()`` when ``source=True``.
    """
    from ..chain import DataChain as DC

    spark = chain.session.spark
    paths = _native_listing_paths(chain)
    if paths is None:
        files = chain.df.select(
            F.col("file.source").alias("src"), F.col("file.path").alias("p")
        ).collect()
        paths = []
        for r in files:
            src = r["src"]
            base = src[7:] if src.startswith("file://") else src
            paths.append(os.path.join(base, r["p"]))
        if not paths:
            raise ValueError("parse_tabular: no files in chain")
    else:
        root_opts, paths = paths
        options = {**root_opts, **options}

    reader = spark.read.options(**options)
    if format == "parquet":
        df = reader.parquet(*paths)
    elif format == "csv":
        df = reader.option("header", True).option("inferSchema", True).csv(paths)
    elif format in ("json", "jsonl"):
        df = reader.json(paths)
    else:
        raise ValueError(f"parse_tabular: unsupported format {format!r}")

    if source:
        df = df.withColumn("source_path", F.input_file_name())
    return DC(df, chain.session, dependencies=chain._dependencies)


WDS_MEMBER_STRUCT = T.StructType(
    list(FILE_STRUCT.fields)
    + [
        T.StructField("stem", T.StringType()),
        T.StructField("suffix", T.StringType()),
    ]
)


def process_webdataset(chain: "DataChain", extract_meta: bool = True) -> "DataChain":
    """Expand tar-shard File rows into member virtual-file rows grouped by
    sample stem (webdataset convention: sample.jpg + sample.json + ... share
    the basename stem).

    Each output row is a File whose ``location`` holds the
    (vtype=tar, offset, size, parent) pointer — readable later with a range
    request, no extraction (parity: TarVFile). Runs as a gen-style
    mapInPandas: every executor indexes its own tars.
    """
    from ..chain import DataChain as DC

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for file_cell in pdf["file"]:
                src = file_cell["source"]
                base = src[7:] if src.startswith("file://") else src
                tar_path = os.path.join(base, file_cell["path"])
                with tarfile.open(tar_path) as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        name = posixpath.basename(m.name)
                        stem, dot, suffix = name.rpartition(".")
                        if not dot:
                            stem, suffix = name, ""
                        location = json.dumps(
                            [
                                {
                                    "vtype": "tar",
                                    "offset": m.offset_data,
                                    "size": m.size,
                                    "parent": tar_path,
                                }
                            ]
                        )
                        rows.append(
                            (
                                src,
                                f"{file_cell['path']}/{m.name}",
                                int(m.size),
                                file_cell["version"],
                                f"{file_cell['etag']}:{m.name}",
                                True,
                                file_cell["last_modified"],
                                location,
                                stem if stem else name,
                                suffix,
                            )
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WDS_MEMBER_STRUCT.fields]
            )

    flat = chain.df.select("file").mapInPandas(expand, WDS_MEMBER_STRUCT)
    packed = flat.select(
        F.struct(*[F.col(f.name) for f in FILE_STRUCT.fields]).alias("file"),
        F.col("stem"),
        F.col("suffix"),
    )
    return DC(packed, chain.session, dependencies=chain._dependencies)


def group_webdataset_samples(members: "DataChain") -> "DataChain":
    """Group member rows into one row per sample stem: a map
    suffix -> File struct (parity: Builder.get_tar_groups,
    webdataset.py:97-225). One shuffle on (tar parent, stem)."""
    from ..chain import DataChain as DC

    df = members.df
    grouped = (
        df.withColumn("__parent", F.substring_index(F.col("file.path"), "/", 1))
        .groupBy("__parent", "stem")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("suffix"), F.col("file")))
            ).alias("members"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .withColumnRenamed("__parent", "shard")
    )
    return DC(grouped, members.session, dependencies=members._dependencies)
