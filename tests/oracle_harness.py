"""DuckDB oracle comparison harness — mirrors the driver's t2 check:
row count + schema-insensitive, order-insensitive value comparison with
columns sorted by name.
"""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any

import duckdb

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
    """Canonical string for a cell value (engine-neutral)."""
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, decimal.Decimal):
        return f"{v:f}"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def normalize(rows: list[tuple], colnames: list[str]) -> list[tuple[str, ...]]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark_df, sql: str, sf_dir: str) -> tuple[bool, str]:
    # A few oracles address files directly and pin the driver's t2 dir
    # (sf0.01). Re-point them at the dir under test — identity for the
    # driver's own run, correct for local runs at other scale factors.
    sql = sql.replace("/root/testdata/sf0.01/", sf_dir.rstrip("/") + "/")
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    con = duckdb_con(sf_dir)
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count: spark={len(spark_rows)} duck={len(duck_rows)}"
    a = normalize(spark_rows, spark_cols)
    b = normalize(duck_rows, duck_cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(spark_rows)} rows)"
