"""read_storage: list object storage / directories into File rows, with glob
patterns and a TTL-cached listing dataset.

Parity: /root/reference/src/datachain/lib/dc/storage.py:21-261 (glob machinery
lib/dc/storage_pattern.py:11-233; listing generation lib/listing.py:46-233;
4-hour TTL lib/listing.py:26-27; cached as dataset ``lst__<uri>``).

Scale design: the listing itself is produced by a *distributed* two-phase
walk — the driver lists only the first level, then ``mapInPandas`` workers
walk subtrees in parallel — so a bucket with 10^8 keys never funnels through
a single-threaded loop. Locally fsspec is optional; plain os.scandir serves
file:// URIs.
"""

from __future__ import annotations

import os
import posixpath
import re
import stat as stat_mod
import time
from datetime import datetime, timezone
from typing import Iterator, Optional, Sequence, Union

import pandas as pd
from pyspark.sql import functions as F

from ..chain import DataChain
from ..columns import brace_expand, path_glob_to_regex
from ..session import Session
from .files import FILE_STRUCT

LISTING_PREFIX = "lst__"
LISTING_TTL = 4 * 60 * 60  # seconds; parity lib/listing.py:26

_GLOB_CHARS = re.compile(r"[*?\[\]{}]")


def _split_pattern(uri: str) -> tuple[str, Optional[str]]:
    """Split 'dir/**/*.jpg' into (listing root, glob pattern or None)."""
    m = _GLOB_CHARS.search(uri)
    if not m:
        return uri, None
    prefix = uri[: m.start()]
    root = prefix[: prefix.rfind("/") + 1] if "/" in prefix else ""
    return root.rstrip("/"), uri[len(root) :].lstrip("/") if root else uri


def _local_path(uri: str) -> str:
    return uri[7:] if uri.startswith("file://") else uri


def _walk_local(root: str, recursive: bool = True) -> Iterator[tuple]:
    base = _local_path(root)
    stack = [base]
    while stack:
        d = stack.pop()
        try:
            entries = list(os.scandir(d))
        except (NotADirectoryError, FileNotFoundError):
            st = os.stat(d)
            yield (d, st.st_size, st.st_mtime)
            continue
        for e in entries:
            if e.is_dir(follow_symlinks=False):
                if recursive:
                    stack.append(e.path)
            else:
                st = e.stat()
                yield (e.path, st.st_size, st.st_mtime)


def _listing_name(uri: str) -> str:
    safe = re.sub(r"[^a-zA-Z0-9_.-]", "_", uri.rstrip("/"))
    return f"{LISTING_PREFIX}{safe}"


def _distributed_listing(sess: Session, root: str, source: str) -> DataChain:
    """Two-phase parallel walk: the driver lists only the FIRST level, then
    executors walk the subtrees concurrently via mapInPandas. A bucket with
    10^8 keys never funnels through one thread; each top-level prefix is a
    task (and deep trees re-split by the subdirectory fan-out of level one).
    """
    import pandas as pd

    top_files: list[tuple] = []
    subdirs: list[str] = []
    try:
        for e in os.scandir(root):
            if e.is_dir(follow_symlinks=False):
                subdirs.append(e.path)
            else:
                st = e.stat()
                top_files.append((e.path, st.st_size, st.st_mtime))
    except FileNotFoundError:
        raise FileNotFoundError(f"read_storage: no such directory {root!r}")

    def walk_partition(batches):
        for pdf in batches:
            rows = []
            for d in pdf["dir"]:
                for path, size, mtime in _walk_local(d):
                    rows.append((path, int(size), float(mtime)))
            yield pd.DataFrame(rows, columns=["path", "size", "mtime"])

    spark = sess.spark
    parts = []
    if subdirs:
        n_tasks = min(len(subdirs), 64)
        sub_df = spark.createDataFrame(
            [(d,) for d in subdirs], "dir string"
        ).repartition(n_tasks)
        parts.append(
            sub_df.mapInPandas(walk_partition, "path string, size long, mtime double")
        )
    if top_files:
        parts.append(
            spark.createDataFrame(
                [(p, int(s), float(m)) for p, s, m in top_files],
                "path string, size long, mtime double",
            )
        )
    if not parts:
        flat = spark.createDataFrame([], "path string, size long, mtime double")
    else:
        flat = parts[0]
        for p in parts[1:]:
            flat = flat.unionByName(p)

    rel = F.when(
        F.col("path").startswith(root + "/"),
        F.expr(f"substring(path, {len(root) + 2})"),
    ).otherwise(F.col("path"))
    df = flat.select(
        F.lit(source).alias("source"),
        rel.alias("path"),
        F.col("size"),
        F.lit("").alias("version"),
        F.concat_ws(
            "-",
            F.conv((F.col("mtime") * 1e6).cast("long").cast("string"), 10, 16),
            F.conv(F.col("size").cast("string"), 10, 16),
        ).alias("etag"),
        F.lit(True).alias("is_latest"),
        F.timestamp_seconds(F.col("mtime")).alias("last_modified"),
        F.lit(None).cast("string").alias("location"),
    )
    return DataChain(df, sess)


def _hadoop_listing(sess: Session, uri: str) -> DataChain:
    """List a non-local URI (s3a://, gs://, abfs://, hdfs://, or file://)
    through the JVM Hadoop FileSystem — the same connector stack Spark's
    readers use, so any scheme the cluster can read, read_storage can list.

    The RemoteIterator streams entries driver-side in provider page order
    (object-store list APIs are sequential per prefix regardless of caller),
    batched into the session every 100k entries so driver memory stays
    bounded. For tens of millions of keys, pass read_storage a LIST of
    prefix URIs (each prefix lists independently) or skip listing entirely
    via parse_tabular's directory fast path."""
    spark = sess.spark
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(uri)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        raise FileNotFoundError(f"read_storage: no such path {uri!r}")
    root_str = fs.makeQualified(jpath).toString().rstrip("/")
    source = root_str

    status = fs.getFileStatus(jpath)
    rows: list[tuple] = []

    def _row(st) -> tuple:
        full = st.getPath().toString()
        rel = full[len(root_str) + 1:] if full.startswith(root_str + "/") else full
        mtime = st.getModificationTime() / 1000.0
        size = int(st.getLen())
        return (
            source, rel, size, "",
            f"{int(mtime * 1e6):x}-{size:x}", True,
            datetime.fromtimestamp(mtime, tz=timezone.utc), None,
        )

    if status.isFile():
        parent = root_str.rsplit("/", 1)[0]
        st = status
        mtime = st.getModificationTime() / 1000.0
        size = int(st.getLen())
        df = sess.spark.createDataFrame(
            [(
                parent, root_str.rsplit("/", 1)[1], size, "",
                f"{int(mtime * 1e6):x}-{size:x}", True,
                datetime.fromtimestamp(mtime, tz=timezone.utc), None,
            )],
            FILE_STRUCT,
        )
        return DataChain(df, sess)

    parts = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        rows.append(_row(it.next()))
        if len(rows) >= 100_000:
            parts.append(sess.spark.createDataFrame(rows, FILE_STRUCT))
            rows = []
    parts.append(sess.spark.createDataFrame(rows, FILE_STRUCT))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return DataChain(df, sess)


def _list_to_chain(sess: Session, uri: str) -> DataChain:
    """Materialize one root's listing as File rows. Single files
    short-circuit to one row (parity: lib/dc/storage.py single-file path).
    Local paths use the two-phase executor walk; remote schemes go through
    the Hadoop FileSystem connector stack (:func:`_hadoop_listing`)."""
    if "://" in uri and not uri.startswith("file://"):
        return _hadoop_listing(sess, uri)
    root = _local_path(uri).rstrip("/")
    if os.path.isfile(root):
        st = os.stat(root)
        parent = os.path.dirname(root)
        source = f"file://{parent}"
        df = sess.spark.createDataFrame(
            [(
                source, os.path.basename(root), int(st.st_size), "",
                f"{int(st.st_mtime * 1e6):x}-{st.st_size:x}", True,
                datetime.fromtimestamp(st.st_mtime, tz=timezone.utc), None,
            )],
            FILE_STRUCT,
        )
        return DataChain(df, sess)
    source = uri.rstrip("/") if "://" in uri else f"file://{root}"
    return _distributed_listing(sess, root, source)


def dir_expansion(listing: DataChain, column: str = "file") -> DataChain:
    """Per-directory rollup at every depth: each file contributes to all its
    ancestor directories (the reference does this with a recursive CTE,
    /root/reference/src/datachain/data_storage/schema.py:88-148
    DirExpansion); here one explode of path prefixes + one groupBy —
    shuffle on the directory key only.

    Output: (dir, n_files, total_size) including '' for the root.
    """
    df = listing.df.select(
        F.col(f"{column}.path").alias("p"), F.col(f"{column}.size").alias("size")
    )
    # prefixes of a/b/c.txt -> ['', 'a', 'a/b']
    parts = F.split(F.col("p"), "/")
    prefixes = F.transform(
        F.sequence(F.lit(0), F.size(parts) - 1),
        lambda i: F.when(i == 0, F.lit("")).otherwise(
            F.array_join(F.slice(parts, 1, i), "/")
        ),
    )
    exploded = df.select(F.explode(prefixes).alias("dir"), F.col("size"))
    agg = (
        exploded.groupBy("dir")
        .agg(F.count(F.lit(1)).alias("n_files"), F.sum("size").alias("total_size"))
        .orderBy("dir")
    )
    return DataChain(agg, listing.session)


def find(
    listing: DataChain,
    glob: Optional[str] = None,
    min_size: Optional[int] = None,
    max_size: Optional[int] = None,
    suffix: Optional[str] = None,
    column: str = "file",
) -> DataChain:
    """Filesystem-style find over a listing chain (parity:
    /root/reference/src/datachain/data_storage/warehouse.py:939+ and
    catalog.find, glob/type/size predicates). All predicates compile to
    pushable column filters."""
    df = listing.df
    if glob:
        df = df.filter(F.col(f"{column}.path").rlike(path_glob_to_regex(glob)))
    if suffix:
        df = df.filter(F.col(f"{column}.path").endswith(suffix))
    if min_size is not None:
        df = df.filter(F.col(f"{column}.size") >= min_size)
    if max_size is not None:
        df = df.filter(F.col(f"{column}.size") <= max_size)
    return DataChain(df, listing.session, dependencies=listing._dependencies)


def read_storage(
    uri: Union[str, Sequence[str]],
    session: Optional[Session] = None,
    recursive: bool = True,
    update: bool = False,
    column: str = "file",
    delta: bool = False,
    delta_on: Union[str, Sequence[str], None] = None,
    delta_result_on: Union[str, Sequence[str], None] = None,
    delta_compare: Union[str, Sequence[str], None] = None,
    delta_retry: Union[bool, str, None] = None,
    delta_unsafe: bool = False,
    **kwargs,
):
    """List bucket(s)/dir(s) into rows with a ``file`` File-struct column.

    Glob support: ``*``, ``**``, ``?``, ``[seq]``, ``{a,b}``, ``{1..9}``
    (parity: lib/dc/storage_pattern.py). Listings are cached as internal
    datasets ``lst__<uri>`` with a 4h TTL; ``update=True`` forces a re-list
    (parity: lib/listing.py:26-44).

    ``delta=True`` (parity lib/dc/storage.py:33-41, the public
    examples/incremental_processing flow): returns a pending incremental
    chain whose recorded transformations replay over only the new/changed
    files at ``save(name=...)`` time — datachain_spark.delta.DeltaChain.
    """
    if delta:
        if not delta_on:
            raise ValueError("delta=True requires delta_on")
        if delta_result_on is not None:
            raise NotImplementedError(
                "delta_result_on (renamed result keys) is not supported; "
                "keep the delta_on columns unrenamed through the chain"
            )
        from ..delta import DeltaChain

        return DeltaChain(
            lambda: read_storage(
                uri, session=session, recursive=recursive, update=update,
                column=column, **kwargs,
            ),
            delta_on=delta_on,
            delta_compare=delta_compare,
            delta_retry=delta_retry,
            delta_unsafe=delta_unsafe,
            session=Session.get(session),
        )
    uris = [uri] if isinstance(uri, str) else list(uri)
    sess = Session.get(session)

    chains: list[DataChain] = []
    for u in uris:
        for expanded in brace_expand(u):
            root, pattern = _split_pattern(expanded)
            lst_name = _listing_name(root)
            chain = None
            if not update:
                rec = sess.metastore.get_record(lst_name)
                if rec is not None:
                    dv = rec.latest_version()
                    if dv and time.time() - dv.created_at < LISTING_TTL:
                        df, _, _ = sess.metastore.load_dataset(
                            sess.spark, lst_name, dv.version
                        )
                        chain = DataChain(df, sess)
            if chain is None:
                chain = _list_to_chain(sess, root)
                sess.metastore.save_dataset(chain.df, lst_name)
                df, _, _ = sess.metastore.load_dataset(sess.spark, lst_name)
                chain = DataChain(df, sess)
            if pattern:
                regex = path_glob_to_regex(pattern)
                chain = chain._evolve(chain.df.filter(F.col("path").rlike(regex)))
            elif not recursive:
                chain = chain._evolve(chain.df.filter(~F.col("path").contains("/")))
            chains.append(chain)

    out = chains[0]
    for c in chains[1:]:
        out = out._evolve(out.df.unionByName(c.df))

    # pack flat listing columns into the named File struct column
    packed = out.df.select(
        F.struct(*[F.col(f.name) for f in FILE_STRUCT.fields]).alias(column)
    )
    deps = [{"storage": u} for u in uris]
    result = DataChain(packed, sess, dependencies=deps)
    # Record the listing shape on the *unmodified* chain so parse_tabular
    # can hand Spark the directory itself instead of an explicit path list
    # (the 100-TB path: scan-level listing on executors, no driver
    # collect). Any subsequent transformation builds a fresh DataChain and
    # drops this marker — explicit subset selections keep the path list.
    if isinstance(uri, str) and len(brace_expand(uri)) == 1:
        root, pattern = _split_pattern(brace_expand(uri)[0])
        result._storage_spec = {
            "root": root,
            "pattern": pattern,
            "recursive": recursive,
        }
    return result
