"""Pydantic <-> StructType signal schema conversion — mirrors the reference's
tests/unit/lib/test_signal_schema.py."""

import datetime
from typing import Optional

import pytest
from pydantic import BaseModel
from pyspark.sql import types as T

import datachain_spark as dc
from datachain_spark.schema import (
    model_to_struct,
    output_spec_to_struct,
    python_type_to_spark,
    row_to_model,
    spark_type_to_python,
)


class Inner(BaseModel):
    name: str
    age: int


class Outer(BaseModel):
    id: int
    person: Inner
    tags: list[str] = []
    score: Optional[float] = None


def test_primitive_mapping():
    assert python_type_to_spark(int) == T.LongType()
    assert python_type_to_spark(str) == T.StringType()
    assert python_type_to_spark(float) == T.DoubleType()
    assert python_type_to_spark(bool) == T.BooleanType()
    assert python_type_to_spark(bytes) == T.BinaryType()
    assert python_type_to_spark(datetime.datetime) == T.TimestampType()
    assert python_type_to_spark(list[int]) == T.ArrayType(T.LongType(), True)
    assert python_type_to_spark(Optional[int]) == T.LongType()
    assert python_type_to_spark(dict[str, int]) == T.MapType(T.StringType(), T.LongType(), True)


def test_nested_model_struct():
    st = model_to_struct(Outer)
    assert st["id"].dataType == T.LongType()
    assert isinstance(st["person"].dataType, T.StructType)
    assert st["person"].dataType["name"].dataType == T.StringType()
    assert st["tags"].dataType == T.ArrayType(T.StringType(), True)
    assert st["score"].dataType == T.DoubleType()


def test_output_spec_variants():
    st = output_spec_to_struct({"a": int, "b": "string", "c": T.DoubleType(), "d": Inner})
    assert st["a"].dataType == T.LongType()
    assert st["b"].dataType == T.StringType()
    assert st["c"].dataType == T.DoubleType()
    assert isinstance(st["d"].dataType, T.StructType)


def test_roundtrip_records_with_models(session):
    recs = [
        Outer(id=1, person=Inner(name="ann", age=30), tags=["x"], score=1.5),
        Outer(id=2, person=Inner(name="bob", age=40)),
    ]
    ch = dc.read_records(recs, session=session)
    assert isinstance(ch.schema["person"].dataType, T.StructType)
    rows = ch.order_by("id").df.collect()
    back = [row_to_model(r, Outer) for r in rows]
    assert back[0].person.name == "ann" and back[0].score == 1.5
    assert back[1].tags == [] or back[1].tags is None or back[1].tags == []


def test_read_values_with_model_instances(session):
    ch = dc.read_values(
        session=session,
        id=[1, 2],
        person=[Inner(name="a", age=1), Inner(name="b", age=2)],
    )
    assert isinstance(ch.schema["person"].dataType, T.StructType)
    out = ch.filter(dc.C("person.age") > 1).to_records()
    assert out[0]["person"]["name"] == "b"


def test_nested_select_and_drop(session):
    ch = dc.read_values(
        session=session,
        id=[1],
        person=[Inner(name="x", age=9)],
    )
    sel = ch.select("id", "person.name")
    assert sel.columns == ["id", "name"]
    dropped = ch.select_except("person.age")
    assert "age" not in dropped.df.select("person.*").columns


def test_spark_type_to_python_roundtrip():
    assert spark_type_to_python(T.LongType()) is int
    assert spark_type_to_python(T.ArrayType(T.DoubleType())) == list[float]
