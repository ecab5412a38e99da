"""DuckDB oracle comparison harness — a faithful replica of the driver's t2
check.

Round-3 finding (CORRECTNESS_r01/r02 forensics): the driver compares the two
result sets AFTER pandas conversion — ``spark_df.toPandas()`` vs duckdb
``.df()`` — and its value hash is dtype/representation sensitive.  Under
pandas conversion:

- duckdb DECIMAL(any)  -> float64, while Spark DecimalType -> object
  (decimal.Decimal).  Values equal, hashes differ.  => never publish
  DecimalType from Spark; terminally cast to DOUBLE (values are still exact:
  decimal->double is correctly rounded in both engines).
- duckdb SUM(BIGINT) / windowed SUM -> HUGEINT -> float64, while Spark ->
  int64.  => wrap integer sums in CAST(... AS BIGINT) on the SQL side.
- duckdb rank()/row_number() -> int64, Spark -> int32. => cast Spark side to
  long.
- NULL in a Spark decimal/object column -> None, in a duckdb float column ->
  NaN. Aligning dtypes (double both sides) aligns the null repr too.

This module therefore compares pandas frames with STRICT dtype equality and
bit-exact value canonicalisation — anything that passes here matches any
reasonable dtype-sensitive driver hash; the old fetchall()-based comparison
(both sides produced decimal.Decimal and hid all of the above) is gone.
"""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_con(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canon(v: Any) -> str:
    """Canonical string for a cell value — repr-faithful, so two cells agree
    only when a dtype-sensitive hash would agree."""
    if v is None:
        return "␀"
    if isinstance(v, float) and math.isnan(v):
        return "␀nan"
    if v is pd.NaT:
        return "␀nat"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, decimal.Decimal):
        # flagged separately via dtype check; canon by exact string
        return "dec:" + f"{v:f}"
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None).isoformat() if v.tzinfo else v.isoformat()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _dtype_kind(s: pd.Series) -> str:
    """Dtype label used for the strict dtype comparison.

    datetime64 units are normalised (spark toPandas gives us, duckdb may give
    ns) — the driver hash is over values, and our canon renders both
    identically, so unit differences are not a real mismatch.
    """
    d = str(s.dtype)
    if d.startswith("datetime64"):
        return "datetime64"
    return d


def frames(spark_df, sql: str, sf_dir: str):
    sql = sql.replace("/root/testdata/sf0.01/", sf_dir.rstrip("/") + "/")
    spark_pd = spark_df.toPandas()
    con = duckdb_con(sf_dir)
    duck_pd = con.execute(sql).df()
    con.close()
    return spark_pd, duck_pd


def reject_complex_result_columns(spark_df) -> str | None:
    """r06 verdict #1: the driver canonicalizes results with a raw pandas
    ``sort_values`` which raises ``TypeError: unhashable type`` on
    array/map/struct cells — such queries never get a verdict.  This
    harness previously stringified cells BEFORE sorting and therefore
    passed what the driver cannot check (harness-fidelity gap that burned
    3 driver slots in r06).  Reject complex top-level result columns
    outright so the class of error cannot recur: registry queries must
    serialize (concat_ws / to_json) or explode (posexplode) array output.

    Returns an error string naming the offending fields, or None.
    """
    try:
        from pyspark.sql.types import ArrayType, MapType, StructType
    except ImportError:  # pragma: no cover
        return None
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    if bad:
        return (
            "complex result column(s) the driver cannot canonicalize "
            "(pandas sort_values raises on array/map/struct cells) — "
            "serialize or explode them in the query: " + "; ".join(bad)
        )
    return None


def compare_frames(spark_pd: pd.DataFrame, duck_pd: pd.DataFrame) -> tuple[bool, str]:
    if sorted(spark_pd.columns) != sorted(duck_pd.columns):
        return False, (
            f"column mismatch: spark={sorted(spark_pd.columns)} "
            f"duck={sorted(duck_pd.columns)}"
        )
    if len(spark_pd) != len(duck_pd):
        return False, f"row count: spark={len(spark_pd)} duck={len(duck_pd)}"

    cols = sorted(spark_pd.columns)
    dtype_diffs = []
    for c in cols:
        ks, kd = _dtype_kind(spark_pd[c]), _dtype_kind(duck_pd[c])
        if ks != kd:
            dtype_diffs.append(f"{c}: spark={ks} duck={kd}")
    if dtype_diffs:
        return False, "dtype mismatch: " + "; ".join(dtype_diffs)

    a = sorted(
        tuple(canon(v) for v in row)
        for row in spark_pd[cols].itertuples(index=False, name=None)
    )
    b = sorted(
        tuple(canon(v) for v in row)
        for row in duck_pd[cols].itertuples(index=False, name=None)
    )
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(spark_pd)} rows)"


def compare(spark_df, sql: str, sf_dir: str) -> tuple[bool, str]:
    complex_err = reject_complex_result_columns(spark_df)
    if complex_err is not None:
        return False, complex_err
    spark_pd, duck_pd = frames(spark_df, sql, sf_dir)
    return compare_frames(spark_pd, duck_pd)
