"""Source readers: in-memory, tabular formats, datasets, external databases.

Parity map (reference -> here):
- read_values/read_records/read_pandas: /root/reference/src/datachain/lib/dc/
  values.py:18, records.py:21, pandas.py:16 -> spark.createDataFrame
- read_parquet: lib/dc/parquet.py:15 -> spark.read.parquet
- read_csv: lib/dc/csv.py:15-180 -> spark.read.csv
- read_json: lib/dc/json.py:19-90 -> spark.read.json
- read_dataset: lib/dc/datasets.py:27-220 -> metastore version load
- read_database: lib/dc/database.py:298-381 -> spark.read.jdbc
- read_hf: lib/dc/hf.py:17 -> arrow -> createDataFrame (import-gated)
- datasets()/listings(): lib/dc/datasets.py:221-302, lib/dc/listings.py:55-81
"""

from __future__ import annotations

from typing import Any, Iterable, Optional, Sequence, Union

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..chain import DataChain
from ..schema import PYDANTIC, model_to_row_dict, output_spec_to_struct, python_type_to_spark
from ..session import Session

if PYDANTIC:
    from pydantic import BaseModel


def _infer_value_type(values: Sequence[Any]) -> T.DataType:
    for v in values:
        if v is not None:
            if PYDANTIC and isinstance(v, BaseModel):
                from ..schema import model_to_struct

                return model_to_struct(type(v))
            if isinstance(v, list):
                inner = _infer_value_type(v) if v else T.StringType()
                return T.ArrayType(inner, True)
            if isinstance(v, dict):
                return T.MapType(T.StringType(), T.StringType(), True)
            return python_type_to_spark(type(v))
    return T.StringType()


def read_values(
    session: Optional[Session] = None,
    schema: Optional[dict[str, Any]] = None,
    in_memory: bool = False,  # accepted for reference-signature drop-ins;
    # a local Spark session is already in-memory (values.py:22)
    **columns: Sequence[Any],
) -> DataChain:
    """Column-oriented in-memory input: name=[values...].
    Parity: /root/reference/src/datachain/lib/dc/values.py:18 (+
    lib/convert/values_to_tuples.py)."""
    if not columns:
        raise ValueError("read_values requires at least one column")
    sess = Session.get(session)
    names = list(columns)
    lengths = {len(v) for v in columns.values()}
    if len(lengths) > 1:
        raise ValueError(f"read_values: column lengths differ: {lengths}")
    if schema:
        struct = output_spec_to_struct(schema)
    else:
        struct = T.StructType(
            [T.StructField(n, _infer_value_type(columns[n]), True) for n in names]
        )
    rows = [
        tuple(model_to_row_dict(columns[n][i]) for n in names)
        for i in range(next(iter(lengths)))
    ]
    out = DataChain(sess.spark.createDataFrame(rows, struct), sess)
    if PYDANTIC:
        for n in names:
            v = next((x for x in columns[n] if x is not None), None)
            if isinstance(v, BaseModel):
                out = out.with_signal_model(n, type(v))
    return out


def read_records(
    records: Iterable[Union[dict, Any]],
    session: Optional[Session] = None,
    schema: Optional[dict[str, Any]] = None,
) -> DataChain:
    """Row-oriented dicts (or Pydantic objects).
    Parity: lib/dc/records.py:21."""
    sess = Session.get(session)
    records = list(records)
    if PYDANTIC and records and isinstance(records[0], BaseModel):
        model = type(records[0])
        from ..schema import model_to_struct

        struct = model_to_struct(model)
        rows = [model_to_row_dict(r) for r in records]
        return DataChain(sess.spark.createDataFrame(rows, struct), sess)
    if schema:
        struct = output_spec_to_struct(schema)
        return DataChain(sess.spark.createDataFrame(records, struct), sess)
    return DataChain(sess.spark.createDataFrame(records), sess)


def read_pandas(df, session: Optional[Session] = None) -> DataChain:
    """Parity: lib/dc/pandas.py:16 (arrow-accelerated)."""
    sess = Session.get(session)
    return DataChain(sess.spark.createDataFrame(df), sess)


def _pop_delta_kwargs(options: dict) -> Optional[dict]:
    """Extract the flag-style delta kwargs from a file reader's
    ``**options``. Returns DeltaChain constructor kwargs when
    ``delta=True``; None otherwise. Raises when ``delta_*`` kwargs are
    passed WITHOUT ``delta=True`` — they would otherwise fall through to
    the Spark reader as unknown options and silently no-op (the flag API
    must either work or fail loudly)."""
    if options.pop("delta_result_on", None) is not None:
        # same explicit rejection as read_storage/read_dataset (which
        # also accept an explicit None) — the reference's
        # renamed-result-key kwarg (storage.py:38) must not fall
        # through to spark.read.options() as a silent no-op
        raise NotImplementedError(
            "delta_result_on (renamed result keys) is not supported; "
            "keep the delta_on columns unrenamed through the chain"
        )
    delta = bool(options.pop("delta", False))
    dkw = {
        k: options.pop(k)
        for k in ("delta_on", "delta_compare", "delta_retry", "delta_unsafe")
        if k in options
    }
    if not delta:
        if dkw:
            raise ValueError(
                f"{sorted(dkw)} require delta=True (the flag API, "
                "datachain_spark.delta.DeltaChain)"
            )
        return None
    if not dkw.get("delta_on"):
        raise ValueError("delta=True requires delta_on")
    return dkw


def read_parquet(
    path: Union[str, Sequence[str]],
    session: Optional[Session] = None,
    **options: Any,
) -> DataChain:
    """Parity: lib/dc/parquet.py:15. Filters/pruning push into the scan.

    ``delta=True, delta_on=...`` returns a pending incremental chain
    (the flag API, parity lib/dc/storage.py:33-41 applied to direct file
    reads): recorded transformations replay over only the new/changed
    rows at ``save(name=...)`` time — see datachain_spark.delta.DeltaChain.
    """
    sess = Session.get(session)
    dkw = _pop_delta_kwargs(options)
    if dkw is not None:
        from ..delta import DeltaChain

        return DeltaChain(
            lambda: read_parquet(path, session=sess, **options),
            session=sess, **dkw,
        )
    paths = [path] if isinstance(path, str) else list(path)
    df = sess.spark.read.options(**options).parquet(*paths)
    return DataChain(df, sess, dependencies=[{"storage": p} for p in paths])


def read_orc(
    path: Union[str, Sequence[str]],
    session: Optional[Session] = None,
    **options: Any,
) -> DataChain:
    """Columnar ORC scan — same pushdown/pruning guarantees as
    :func:`read_parquet` (ORC carries min/max + bloom indexes Spark's
    reader uses natively). No reference counterpart (spec addition: Hive
    warehouses hand corpora over as ORC as often as parquet)."""
    sess = Session.get(session)
    paths = [path] if isinstance(path, str) else list(path)
    df = sess.spark.read.options(**options).orc(*paths)
    return DataChain(df, sess, dependencies=[{"storage": p} for p in paths])


def read_avro(
    path: Union[str, Sequence[str]],
    session: Optional[Session] = None,
    **options: Any,
) -> DataChain:
    """Avro scan via Spark's external ``spark-avro`` module. Import-gated:
    the jar ships with Spark distributions but is not on the classpath in
    this container — a clear error names the missing package instead of
    Spark's generic 'failed to find data source'."""
    sess = Session.get(session)
    paths = [path] if isinstance(path, str) else list(path)
    try:
        df = sess.spark.read.format("avro").options(**options).load(paths)
    except Exception as exc:  # noqa: BLE001
        if "avro" in str(exc).lower() and "find" in str(exc).lower():
            raise ImportError(
                "read_avro requires the spark-avro module on the Spark "
                "classpath (--packages org.apache.spark:spark-avro_2.13:<ver>)"
            ) from exc
        raise
    return DataChain(df, sess, dependencies=[{"storage": p} for p in paths])


def read_text(
    path: Union[str, Sequence[str]],
    lines: bool = True,
    column: str = "text",
    include_path: bool = False,
    session: Optional[Session] = None,
    **options: Any,
) -> DataChain:
    """Plain-text scan: one row per LINE (``lines=True``, the log/corpus
    default — splits happen executor-side, a 100-TB directory reads as
    ordinary partitioned input) or one row per FILE (``lines=False``,
    Spark's ``wholetext`` — for small-document trees where the file is the
    unit). ``include_path`` adds the source path column (provenance).
    No reference counterpart for the line mode (its File API reads whole
    objects; see sources/files.py for that surface)."""
    sess = Session.get(session)
    paths = [path] if isinstance(path, str) else list(path)
    # NOTE: .text()'s own wholetext keyword (default False) overrides any
    # reader-level option("wholetext", ...) — it must go via the keyword
    df = (
        sess.spark.read.options(**options)
        .text(list(paths), wholetext=not lines)
        .withColumnRenamed("value", column)
    )
    if include_path:
        from pyspark.sql import functions as F

        df = df.withColumn("path", F.input_file_name())
    return DataChain(df, sess, dependencies=[{"storage": p} for p in paths])


def read_csv(
    path: Union[str, Sequence[str]],
    delimiter: Optional[str] = None,
    header: bool = True,
    output: Any = None,
    column: str = "",
    model_name: str = "",
    source: bool = True,  # noqa: ARG001 - compat; provenance via parse_tabular
    nrows: Optional[int] = None,
    column_types: Optional[dict[str, Any]] = None,
    parse_options: Optional[dict[str, Any]] = None,
    session: Optional[Session] = None,
    **options: Any,
) -> DataChain:
    """Parity: lib/dc/csv.py:15-180. ``output`` takes a {name: type} dict,
    a Pydantic model (its fields become the schema), or a list of column
    names (types inferred); ``column`` nests the parsed fields under one
    struct column; ``nrows`` limits rows; ``parse_options`` keys
    delimiter/quote_char/escape_char/ignore_empty_lines map onto the Spark
    CSV reader. ``model_name``/``source`` accepted for signature
    compatibility (file provenance comes from :func:`parse_tabular`).
    ``delta=True, delta_on=...`` returns the flag-style incremental
    chain (see :func:`read_parquet`)."""
    del model_name
    sess = Session.get(session)
    dkw = _pop_delta_kwargs(options)
    if dkw is not None:
        from ..delta import DeltaChain

        return DeltaChain(
            lambda: read_csv(
                path, delimiter=delimiter, header=header, output=output,
                column=column, nrows=nrows, column_types=column_types,
                parse_options=parse_options, session=sess, **options,
            ),
            session=sess, **dkw,
        )
    po = dict(parse_options or {})
    sep = delimiter or po.pop("delimiter", None) or ","
    reader = sess.spark.read.option("header", header).option("sep", sep)
    if "quote_char" in po:
        reader = reader.option("quote", po.pop("quote_char"))
    if "escape_char" in po:
        reader = reader.option("escape", po.pop("escape_char"))
    po.pop("ignore_empty_lines", None)  # Spark skips fully-empty lines already
    names_only: Optional[list] = None
    spec = output if output is not None else column_types
    if isinstance(spec, (list, tuple)):
        names_only, spec = list(spec), None
    if spec is not None:
        if isinstance(spec, dict):
            reader = reader.schema(output_spec_to_struct(spec))
        else:
            from ..schema import model_to_struct

            reader = reader.schema(model_to_struct(spec))
    else:
        reader = reader.option("inferSchema", True)
    paths = [path] if isinstance(path, str) else list(path)
    df = reader.options(**options).csv(list(paths))
    if names_only:
        if len(names_only) != len(df.columns):
            raise ValueError(
                f"read_csv: output names {names_only} do not match "
                f"{len(df.columns)} parsed columns"
            )
        df = df.toDF(*names_only)
    if nrows is not None:
        df = df.limit(nrows)
    if column:
        from pyspark.sql import functions as F

        df = df.select(F.struct(*df.columns).alias(column))
    return DataChain(df, sess, dependencies=[{"storage": p} for p in paths])


def read_json(
    path: Union[str, Sequence[str]],
    format: str = "json",  # noqa: A002
    jmespath: Optional[str] = None,
    spec: Any = None,
    schema_from: Optional[str] = "auto",
    column: Optional[str] = None,
    model_name: Optional[str] = None,
    nrows: Optional[int] = None,
    session: Optional[Session] = None,
    **options: Any,
) -> DataChain:
    """Parity: lib/dc/json.py:19-90. format='json' handles whole-document
    arrays via multiLine; 'jsonl' is line-delimited.

    ``jmespath`` supports the subset the reference's examples actually use
    (dotted descent + ``[]`` array projection, e.g. ``"payload.items[]"``):
    each ``[]`` segment explodes the array, dotted segments descend into
    structs, and a final struct is expanded to its fields.

    Reference-signature extras:
    - ``spec``: a Pydantic model — becomes the Spark read schema, so the
      result has exactly its fields (the reference validates rows against
      the generated model; declaring the schema achieves that Spark-side).
    - ``schema_from``: "auto" (default) infers from the data itself; a PATH
      infers the schema from that sample file only and applies it to the
      full read — at 100 TB this replaces a full-data inference pass.
    - ``column``: wrap the parsed fields under one struct column of this
      name (the reference nests generated models under ``column``);
      default None keeps the flat layout.
    - ``nrows``: row limit. ``model_name`` is accepted for signature
      compatibility (no model codegen here — spec/schema_from define the
      shape).
    """
    del model_name  # signature compatibility; no model codegen needed
    sess = Session.get(session)
    dkw = _pop_delta_kwargs(options)
    if dkw is not None:
        from ..delta import DeltaChain

        return DeltaChain(
            lambda: read_json(
                path, format=format, jmespath=jmespath, spec=spec,
                schema_from=schema_from, column=column, nrows=nrows,
                session=sess, **options,
            ),
            session=sess, **dkw,
        )
    reader = sess.spark.read
    if format == "json":
        reader = reader.option("multiLine", True)
    paths = [path] if isinstance(path, str) else list(path)
    if spec is not None:
        from ..schema import model_to_struct

        reader = reader.schema(model_to_struct(spec))
    elif schema_from and schema_from != "auto":
        sample_reader = sess.spark.read
        if format == "json":
            sample_reader = sample_reader.option("multiLine", True)
        reader = reader.schema(sample_reader.json(schema_from).schema)
    df = reader.options(**options).json(list(paths))

    if jmespath:
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        cur = None
        for seg in jmespath.split("."):
            explode_it = seg.endswith("[]")
            name = seg[:-2] if explode_it else seg
            cur = F.col(name) if cur is None else cur[name]
            if explode_it:
                df = df.select(F.explode(cur).alias("__j"))
                cur = F.col("__j")
        df = df.select(cur.alias("__j"))
        if isinstance(df.schema["__j"].dataType, T.StructType):
            df = df.select("__j.*")
        else:
            df = df.withColumnRenamed("__j", jmespath.replace("[]", "").split(".")[-1])
    if nrows is not None:
        df = df.limit(nrows)
    if column:
        from pyspark.sql import functions as F

        df = df.select(F.struct(*df.columns).alias(column))
    return DataChain(df, sess, dependencies=[{"storage": p} for p in paths])


def read_dataset(
    name: str,
    version: Optional[str] = None,
    session: Optional[Session] = None,
    delta: bool = False,
    delta_on: Union[str, Sequence[str], None] = None,
    delta_result_on: Union[str, Sequence[str], None] = None,
    delta_compare: Union[str, Sequence[str], None] = None,
    delta_retry: Union[bool, str, None] = None,
    delta_unsafe: bool = False,
    prune: Optional[dict] = None,
):
    """Saved dataset version (semver or specifier like '>=1.2').
    Parity: lib/dc/datasets.py:27-220.

    ``delta=True`` returns a pending incremental chain (parity
    lib/dc/datasets.py:36-43): transformations are recorded and replayed
    over only the new/changed/retried rows when ``save(name=...)`` runs —
    see datachain_spark.delta.DeltaChain.

    ``prune={col: (lo, hi), ...}`` scans ONLY the files whose persisted
    zone maps overlap the closed ranges (requires a prior
    ``Metastore.zone_index_dataset`` on this version) and re-applies the
    row-level range filter — the manifest-style skip path for point/range
    lookups on a Z-ordered save. Incompatible with ``delta``."""
    if delta:
        if prune:
            raise ValueError("prune= is incompatible with delta=True")
        if not delta_on:
            raise ValueError("delta=True requires delta_on")
        if delta_result_on is not None:
            raise NotImplementedError(
                "delta_result_on (renamed result keys) is not supported; "
                "keep the delta_on columns unrenamed through the chain"
            )
        from ..delta import DeltaChain

        return DeltaChain(
            lambda: read_dataset(name, version, session),
            delta_on=delta_on,
            delta_compare=delta_compare,
            delta_retry=delta_retry,
            delta_unsafe=delta_unsafe,
            session=Session.get(session),
        )
    sess = Session.get(session)
    df, rec, dv = sess.metastore.load_dataset(sess.spark, name, version)
    if prune:
        pruned = sess.metastore.read_pruned(sess.spark, name, prune, version)
        for c, (lo, hi) in prune.items():
            pruned = pruned.filter(F.col(c).between(lo, hi))
        df = pruned
    out = DataChain(df, sess, dependencies=[{"dataset": name, "version": dv.version}])
    out._dataset_info = {
        "name": name, "version": dv.version,
        "namespace": rec.namespace, "project": rec.project,
    }
    # a prune-less read IS the stored version, row for row — delta_save
    # uses this to pin the immutable source version instead of copying
    # the source into a __delta_source snapshot (a full corpus write per
    # run at 100 TB); any transformation goes through _evolve and drops
    # the marker
    out._pristine_version_read = prune is None
    if dv.signal_schema:
        from ..schema import deserialize_signals

        out._signal_models = deserialize_signals(dv.signal_schema)
    return out


def export_dataset_table(
    name: str,
    output_uri: str,
    version: Optional[str] = None,
    session: Optional[Session] = None,
) -> list[str]:
    """Export a saved dataset version's table to ``output_uri`` as parquet
    and return the written data-file paths. Parity:
    /root/reference/src/datachain/catalog/catalog.py:1407-1434
    (catalog.export_dataset_table -> warehouse parquet export); here the
    export is a distributed Spark write, not a warehouse dump."""
    import glob as _glob

    sess = Session.get(session)
    df, _, _ = sess.metastore.load_dataset(sess.spark, name, version)
    df.write.mode("overwrite").parquet(output_uri)
    if "://" not in output_uri:
        return sorted(_glob.glob(f"{output_uri.rstrip('/')}/*.parquet"))
    return [output_uri]


def delete_dataset(
    name: str,
    version: Optional[str] = None,
    force: bool = False,
    session: Optional[Session] = None,
) -> None:
    """Module-level parity: lib/dc/datasets.py delete_dataset — one version
    or (force) the whole dataset."""
    Session.get(session).metastore.delete_dataset(name, version=version, force=force)


def move_dataset(src: str, dst: str, session: Optional[Session] = None) -> None:
    """Module-level parity: lib/dc/datasets.py move_dataset."""
    Session.get(session).metastore.move_dataset(src, dst)


def compact_dataset(
    name: str,
    version: Optional[str] = None,
    target_file_bytes: int = 128 << 20,
    session: Optional[Session] = None,
):
    """Small-file compaction: rewrite a version as a new patch version with
    ~target-sized files (catalog/metastore.compact_dataset — OPTIMIZE-style
    table maintenance; no reference counterpart). Returns the new
    DatasetVersion."""
    sess = Session.get(session)
    return sess.metastore.compact_dataset(
        sess.spark, name, version=version, target_file_bytes=target_file_bytes
    )


def vacuum_dataset(
    name: str,
    keep_last: int = 3,
    older_than: Optional[float] = None,
    dry_run: bool = False,
    session: Optional[Session] = None,
) -> list[str]:
    """Retention GC: drop all but the newest ``keep_last`` versions (see
    catalog/metastore.vacuum_dataset); returns removed version strings."""
    sess = Session.get(session)
    return sess.metastore.vacuum_dataset(
        name, keep_last=keep_last, older_than=older_than, dry_run=dry_run
    )


def create_project(
    namespace: str,
    name: str,
    descr: Optional[str] = None,
    session: Optional[Session] = None,
) -> str:
    """Module-level parity: lib/projects.py create (descr accepted for
    signature compatibility; the manifest layout has no project metadata)."""
    return Session.get(session).metastore.create_project(namespace, name)


def delete_namespace(name: str, session: Optional[Session] = None) -> None:
    """Module-level parity: lib/namespaces.py delete_namespace — raises on
    missing or non-empty namespaces."""
    Session.get(session).metastore.delete_namespace(name)


def _dbapi_to_arrow(cursor) -> "Any":
    """Materialize a DB-API cursor as a pyarrow Table (column-wise, typed by
    pyarrow inference). Used for the non-JDBC read_database paths."""
    import pyarrow as pa

    names = [d[0] for d in cursor.description]
    rows = cursor.fetchall()
    cols = list(zip(*rows)) if rows else [[] for _ in names]
    return pa.table({n: list(c) for n, c in zip(names, cols)})


def read_database(
    query: str,
    connection: Any,
    session: Optional[Session] = None,
    **options: Any,
) -> DataChain:
    """Run ``query`` against an external database and ingest the result.

    Parity: lib/dc/database.py:298-381 (the reference accepts a SQLAlchemy
    URL string or live connection and streams batches into the chain).

    Connection forms, in order of scale-friendliness:

    - ``jdbc:...`` URL — Spark's JDBC source: the query runs server-side as
      a derived table and, with ``partitionColumn``/``numPartitions``
      options, is read in parallel by the executors. This is the 100-TB
      path; everything below is a driver-side ingest for control-plane
      sized data (same model as the reference, which is single-node).
    - ``sqlite:///path`` or ``sqlite://`` URL — stdlib sqlite3 → Arrow →
      ``createDataFrame`` (no JDBC driver jar needed in this container).
    - ``duckdb:///path`` / ``duckdb://`` URL — duckdb → Arrow.
    - a live DB-API connection object (anything with ``.cursor()`` or
      duckdb's ``.execute().arrow()``) — used as-is, not closed.
    """
    sess = Session.get(session)
    if isinstance(connection, str) and connection.startswith("jdbc:"):
        df = (
            sess.spark.read.format("jdbc")
            .option("url", connection)
            .option("query", query)
            .options(**options)
            .load()
        )
        return DataChain(df, sess, dependencies=[{"database": connection}])

    params = options.pop("params", None)
    owned = None  # connection we opened and must close
    dep = {"database": connection if isinstance(connection, str) else "dbapi"}
    try:
        if isinstance(connection, str) and connection.startswith("sqlite"):
            import sqlite3

            path = connection.split("///", 1)[1] if "///" in connection else ":memory:"
            owned = conn = sqlite3.connect(path or ":memory:")
        elif isinstance(connection, str) and connection.startswith("duckdb"):
            import duckdb

            path = connection.split("///", 1)[1] if "///" in connection else ":memory:"
            owned = conn = duckdb.connect(path or ":memory:")
        elif not isinstance(connection, str):
            conn = connection
        else:
            raise ValueError(
                f"unsupported database url {connection!r}: use jdbc:, "
                "sqlite:, duckdb:, or pass a DB-API connection"
            )
        if hasattr(conn, "execute") and hasattr(conn, "fetch_arrow_table"):
            table = conn.execute(query, params or []).fetch_arrow_table()
        elif "duckdb" in type(conn).__module__:
            table = conn.execute(query, params or []).arrow()
        else:
            cur = conn.cursor()
            cur.execute(query, params or [])
            table = _dbapi_to_arrow(cur)
    finally:
        if owned is not None:
            owned.close()
    df = sess.spark.createDataFrame(table.to_pandas())
    return DataChain(df, sess, dependencies=[dep])


def _hf_split_to_table(ds: Any, limit: int = 0) -> "Any":
    """Materialize one HF-dataset-like split as a pyarrow Table.

    Accepts, in order: objects exposing Arrow data (``.data.table`` — HF
    ``Dataset``; ``.data`` already a Table; ``.to_arrow()``), then
    streaming datasets (``IterableDataset``) iterated as dict rows (bounded
    by ``limit`` when given — matching the reference HFGenerator's limit)."""
    import pyarrow as pa

    data = getattr(ds, "data", None)
    if data is not None:
        table = getattr(data, "table", data)
        if isinstance(table, pa.Table):
            return table.slice(0, limit) if limit else table
    if hasattr(ds, "to_arrow"):
        table = ds.to_arrow()
        return table.slice(0, limit) if limit else table
    if hasattr(ds, "__iter__"):
        rows = []
        for i, row in enumerate(ds):
            if limit and i >= limit:
                break
            rows.append(row)
        return pa.Table.from_pylist(rows)
    raise TypeError(f"read_hf: cannot extract Arrow data from {type(ds)!r}")


def read_hf(
    dataset: Any,
    split: Optional[str] = None,
    session: Optional[Session] = None,
    limit: int = 0,
    **kwargs: Any,
) -> DataChain:
    """HuggingFace datasets -> rows. Parity: lib/hf.py (HFGenerator +
    stream_splits): a DatasetDict with no ``split`` ingests every split and
    adds a ``split`` column; ``limit`` bounds streaming datasets. The
    ``datasets`` package is only required for string names (load_dataset) —
    dataset OBJECTS (anything Arrow-backed or row-iterable) ingest through
    the Arrow batch path with no import."""
    sess = Session.get(session)
    ds = dataset
    if isinstance(dataset, str):
        try:
            import datasets as hf_datasets  # type: ignore[import-not-found]
        except ImportError as exc:
            raise ImportError(
                "read_hf requires the 'datasets' package for named datasets "
                "(not installed here); export to parquet and use "
                "read_parquet, or pass a dataset object"
            ) from exc
        ds = hf_datasets.load_dataset(dataset, split=split, **kwargs)

    # dict-of-splits (DatasetDict-like): one split or all with a marker col
    if hasattr(ds, "keys") and hasattr(ds, "__getitem__") and not hasattr(ds, "data"):
        if split:
            tables = {None: _hf_split_to_table(ds[split], limit)}
        else:
            tables = {name: _hf_split_to_table(ds[name], limit) for name in ds.keys()}
    else:
        tables = {None: _hf_split_to_table(ds, limit)}

    df = None
    for name, table in tables.items():
        part = sess.spark.createDataFrame(table.to_pandas())
        if name is not None:
            part = part.withColumn("split", F.lit(name))
        df = part if df is None else df.unionByName(part)
    return DataChain(df, sess)


def datasets(
    session: Optional[Session] = None, stale: bool = False
) -> DataChain:
    """Meta-chain of saved datasets. Parity: lib/dc/datasets.py:221-302.

    ``stale=True`` (beyond the reference — the lineage-consumer face of
    the recorded dependency graph): one row per (dataset, upstream)
    edge whose head was built from an upstream version that is behind
    that upstream's current head — the work list
    ``lineage.refresh_downstream`` executes. Manifest metadata only; no
    data is scanned.
    """
    sess = Session.get(session)
    if stale:
        from ..lineage import stale_datasets

        rows = [
            (r["dataset"], r["version"], r["upstream"],
             r["pinned_version"], r["upstream_head"])
            for r in stale_datasets(session=sess)
        ]
        struct = T.StructType([
            T.StructField("dataset", T.StringType()),
            T.StructField("version", T.StringType()),
            T.StructField("upstream", T.StringType()),
            T.StructField("pinned_version", T.StringType()),
            T.StructField("upstream_head", T.StringType()),
        ])
        return DataChain(sess.spark.createDataFrame(rows, struct), sess)
    rows = []
    for rec in sess.metastore.list_datasets():
        for v in rec.versions:
            rows.append(
                (rec.namespace, rec.project, rec.name, v.version, v.uuid,
                 float(v.created_at), int(v.num_rows), v.job_hash)
            )
    struct = T.StructType([
        T.StructField("namespace", T.StringType()),
        T.StructField("project", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("version", T.StringType()),
        T.StructField("uuid", T.StringType()),
        T.StructField("created_at", T.DoubleType()),
        T.StructField("num_rows", T.LongType()),
        T.StructField("job_hash", T.StringType()),
    ])
    return DataChain(sess.spark.createDataFrame(rows, struct), sess)


def listings(session: Optional[Session] = None) -> DataChain:
    """Meta-chain of cached storage listings. Parity: lib/dc/listings.py:55-81."""
    from .storage import LISTING_PREFIX

    sess = Session.get(session)
    rows = []
    for rec in sess.metastore.list_datasets():
        if rec.name.startswith(LISTING_PREFIX):
            for v in rec.versions:
                rows.append((rec.name, v.version, float(v.created_at), int(v.num_rows)))
    struct = T.StructType([
        T.StructField("name", T.StringType()),
        T.StructField("version", T.StringType()),
        T.StructField("created_at", T.DoubleType()),
        T.StructField("num_rows", T.LongType()),
    ])
    return DataChain(sess.spark.createDataFrame(rows, struct), sess)
