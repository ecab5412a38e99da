"""Differential tests for the narrow .map()/batch_map Python boundary
(r12 optimization: scalar-iterator pandas_udf shipping ONLY the param
columns, vs the legacy wide mapInPandas path shipping every column).

Every test runs the SAME UDF through both boundaries — the wide path is
forced via DATACHAIN_SPARK_MAP_BOUNDARY=wide — and asserts identical
rows, schema, and column order. The matrix covers the places the two
Arrow conversions could diverge: nullable ints, floats, strings with
nulls, arrays, timestamps, binary, dotted struct params, output
overriding an input column, on_error modes, setup values, and class
UDFs. Plan-shape tests pin the structural claim: no MapInPandas node,
param-pruned scan.
"""

import datetime
import os

import pytest

import datachain_spark as dc
from datachain_spark import C


def _both_boundaries(monkeypatch, build):
    """Collected (narrow, wide) results of the same chain builder."""
    monkeypatch.delenv("DATACHAIN_SPARK_MAP_BOUNDARY", raising=False)
    narrow = build()
    narrow_rows = narrow.df.collect()
    narrow_schema = narrow.df.schema
    monkeypatch.setenv("DATACHAIN_SPARK_MAP_BOUNDARY", "wide")
    wide = build()
    wide_rows = wide.df.collect()
    wide_schema = wide.df.schema
    monkeypatch.delenv("DATACHAIN_SPARK_MAP_BOUNDARY", raising=False)
    return (narrow_rows, narrow_schema), (wide_rows, wide_schema)


def _assert_same(narrow, wide):
    (n_rows, n_schema), (w_rows, w_schema) = narrow, wide
    assert [f.name for f in n_schema.fields] == [f.name for f in w_schema.fields]
    assert [f.dataType for f in n_schema.fields] == [
        f.dataType for f in w_schema.fields
    ]
    assert sorted(map(str, n_rows)) == sorted(map(str, w_rows))


def test_mixed_types_matrix(session, monkeypatch):
    rows = [
        (1, 1.5, "a", [1, 2], datetime.datetime(2030, 1, 1), bytearray(b"x")),
        (2, None, None, [], datetime.datetime(2030, 6, 1), bytearray(b"yz")),
        (None, 2.5, "c", None, None, None),
    ]
    cols = ["i", "f", "s", "arr", "ts", "b"]

    import pandas as pd

    def _pdf(data, names):
        return pd.DataFrame(data, columns=names)

    def build():
        ch = dc.read_pandas(_pdf(rows, cols), session=session)

        def describe(i, f, s, arr, ts, b):
            return (
                f"{i}|{f}|{s}|{list(arr) if arr is not None else None}"
                f"|{ts}|{bytes(b) if b is not None else None}"
            )

        return ch.map(describe, params=cols, output={"d": str})

    n, w = _both_boundaries(monkeypatch, build)
    _assert_same(n, w)
    # the narrow result must actually have taken the narrow path when all
    # params are plain: with every column a param there is still no
    # MapInPandas node
    monkeypatch.delenv("DATACHAIN_SPARK_MAP_BOUNDARY", raising=False)
    plan = build().df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan


def test_output_overrides_input_column(session, monkeypatch):
    def build():
        ch = dc.read_values(session=session, x=[1, 2, 3], y=[10, 20, 30])
        return ch.map(lambda x: x * 100, params=["x"], output={"x": int})

    n, w = _both_boundaries(monkeypatch, build)
    _assert_same(n, w)
    # override keeps position: x first, y second
    assert [f.name for f in n[1].fields] == ["x", "y"]
    assert sorted(r["x"] for r in n[0]) == [100, 200, 300]


def test_on_error_null_and_collect(session, monkeypatch):
    def build_null():
        ch = dc.read_values(session=session, x=[1, 0, 4])
        return ch.map(
            lambda x: 10 // x, params=["x"], output={"q": int}, on_error="null"
        )

    def build_collect():
        ch = dc.read_values(session=session, x=[1, 0, 4])
        return ch.map(
            lambda x: (10 // x, None),
            params=["x"],
            output={"q": int, "error": str},
            on_error="collect",
        )

    for build in (build_null, build_collect):
        n, w = _both_boundaries(monkeypatch, build)
        _assert_same(n, w)
    rows = {r["x"]: r for r in build_collect().df.collect()}
    assert rows[0]["q"] is None and "ZeroDivisionError" in rows[0]["error"]
    assert rows[4]["q"] == 2 and rows[4]["error"] is None


def test_dotted_struct_param_narrow(session, spark, monkeypatch):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "meta": [
                {"path": "a/b.txt", "n": 1},
                None,
                {"path": "c/d.txt", "n": 2},
            ],
        }
    )
    sdf = spark.createDataFrame(pdf, schema="id long, meta struct<path:string,n:long>")

    def build():
        ch = dc.DataChain(sdf)
        return ch.map(
            lambda p: (p or "").upper(), params=["meta.path"], output={"up": str}
        )

    n, w = _both_boundaries(monkeypatch, build)
    _assert_same(n, w)
    monkeypatch.delenv("DATACHAIN_SPARK_MAP_BOUNDARY", raising=False)
    plan = build().df._jdf.queryExecution().executedPlan().toString()
    # the narrow path ships only the nested string, never the struct
    assert "MapInPandas" not in plan and "ArrowEvalPython" in plan


def test_struct_param_falls_back_wide(session, spark, monkeypatch):
    """A whole-struct param must keep the wide path (dict rendering +
    model hydration live there)."""
    import pandas as pd

    pdf = pd.DataFrame({"id": [1], "meta": [{"path": "x", "n": 5}]})
    sdf = spark.createDataFrame(pdf, schema="id long, meta struct<path:string,n:long>")
    ch = dc.DataChain(sdf).map(
        lambda m: m["n"] if m else None, params=["meta"], output={"n2": int}
    )
    plan = ch.df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_setup_values_cross_boundary(session, monkeypatch):
    def build():
        ch = dc.read_values(session=session, x=[1, 2]).setup(k=lambda: 7)
        return ch.map(lambda x, k: x * k, params=["x"], output={"xk": int})

    n, w = _both_boundaries(monkeypatch, build)
    _assert_same(n, w)
    assert sorted(r["xk"] for r in n[0]) == [7, 14]


def test_class_udf_setup_teardown(session, monkeypatch):
    from datachain_spark.udf import Mapper

    class Scale(Mapper):
        def setup(self):
            self.f = 3

        def process(self, x):
            return x * self.f

    def build():
        ch = dc.read_values(session=session, x=[1, 2, 3])
        return ch.map(Scale, params=["x"], output={"sx": int})

    n, w = _both_boundaries(monkeypatch, build)
    _assert_same(n, w)
    assert sorted(r["sx"] for r in n[0]) == [3, 6, 9]


def test_batch_map_both_boundaries(session, monkeypatch):
    def build():
        ch = dc.read_values(session=session, x=[1, 2, 3], y=[4.0, 5.0, 6.0])

        def scaled(xs, ys):
            return [a + b for a, b in zip(xs, ys)]

        return ch.batch_map(scaled, params=["x", "y"], output={"s": float})

    n, w = _both_boundaries(monkeypatch, build)
    _assert_same(n, w)
    monkeypatch.delenv("DATACHAIN_SPARK_MAP_BOUNDARY", raising=False)
    plan = build().df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan


def test_narrow_scan_prunes_columns(session, sf_dir):
    """The structural claim (guide §4.1): with the narrow boundary the
    parquet scan reads only the columns the query touches."""
    li = dc.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"), session=session
    ).filter(C.l_orderkey <= 40)
    out = li.map(
        lambda q, p: q * p,
        params=["l_quantity", "l_extendedprice"],
        output={"gross": float},
    ).select("l_orderkey", "gross")
    plan = out.df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert read_cols == {"l_orderkey", "l_quantity", "l_extendedprice"}
