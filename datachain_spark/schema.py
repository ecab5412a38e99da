"""Signal schema: bidirectional Pydantic <-> Spark StructType conversion.

This replaces datachain's column-flattening SignalSchema
(/root/reference/src/datachain/lib/signal_schema.py:197 and
/root/reference/src/datachain/lib/convert/flatten.py): Spark has native nested
structs, so a Pydantic model maps to a StructType field and nested access is
``col("file.path")`` — no ``__``-delimited flattening is needed.

Python->SQL mapping parity:
/root/reference/src/datachain/lib/convert/python_to_sql.py:23-36
(int->Int64, str/Literal/Enum->String, float->Float, bool->Boolean,
datetime->DateTime, bytes->Binary, list->Array, dict->JSON).
"""

from __future__ import annotations

import datetime
import enum
import typing
from typing import Any, Optional, Union, get_args, get_origin

from pyspark.sql import types as T

try:
    from pydantic import BaseModel

    PYDANTIC = True
except ImportError:  # pragma: no cover - pydantic is expected in this env
    BaseModel = None  # type: ignore[assignment]
    PYDANTIC = False

_PRIMITIVES: dict[type, T.DataType] = {
    int: T.LongType(),
    float: T.DoubleType(),
    str: T.StringType(),
    bool: T.BooleanType(),
    bytes: T.BinaryType(),
    datetime.datetime: T.TimestampType(),
    datetime.date: T.DateType(),
}


def python_type_to_spark(tp: Any) -> T.DataType:
    """Map a Python type annotation to a Spark DataType.

    UInt64 (used by the reference only for sys columns,
    /root/reference/src/datachain/data_storage/schema.py:269-274) maps to
    LongType — we drop sys columns entirely (SURVEY.md §1.3).
    """
    import types as _types

    if tp is None or tp is type(None):
        return T.NullType()
    origin = get_origin(tp)
    if origin is Union or (origin is not None and origin is getattr(_types, "UnionType", object())):
        args = [a for a in get_args(tp) if a is not type(None)]
        if len(args) == 1:
            return python_type_to_spark(args[0])
        raise TypeError(f"unsupported union type: {tp}")
    if origin in (list, tuple, set):
        args = get_args(tp)
        inner = python_type_to_spark(args[0]) if args else T.StringType()
        return T.ArrayType(inner, containsNull=True)
    if origin is dict:
        args = get_args(tp)
        k = python_type_to_spark(args[0]) if args else T.StringType()
        v = python_type_to_spark(args[1]) if len(args) > 1 else T.StringType()
        return T.MapType(k, v, valueContainsNull=True)
    if origin is typing.Literal:
        return T.StringType()
    if isinstance(tp, type):
        if tp in _PRIMITIVES:
            return _PRIMITIVES[tp]
        if issubclass(tp, enum.Enum):
            return T.StringType()
        if PYDANTIC and issubclass(tp, BaseModel):
            return model_to_struct(tp)
    raise TypeError(f"cannot map python type {tp!r} to a Spark type")


def model_to_struct(model: "type[BaseModel]") -> T.StructType:
    """Pydantic model -> StructType (nested models become nested structs)."""
    fields = []
    for name, finfo in model.model_fields.items():
        ann = finfo.annotation
        nullable = _is_optional(ann) or finfo.default is not None or not finfo.is_required()
        fields.append(T.StructField(name, python_type_to_spark(ann), nullable=True if nullable else True))
    return T.StructType(fields)


def _is_optional(ann: Any) -> bool:
    import types as _types

    origin = get_origin(ann)
    if origin is Union or (origin is not None and origin is getattr(_types, "UnionType", object())):
        return type(None) in get_args(ann)
    return False


def spark_type_to_python(dt: T.DataType) -> Any:
    """Spark DataType -> Python annotation (for schema introspection/round-trip)."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return float
    if isinstance(dt, T.StringType):
        return str
    if isinstance(dt, T.BooleanType):
        return bool
    if isinstance(dt, T.BinaryType):
        return bytes
    if isinstance(dt, T.TimestampType):
        return datetime.datetime
    if isinstance(dt, T.DateType):
        return datetime.date
    if isinstance(dt, T.ArrayType):
        return list[spark_type_to_python(dt.elementType)]  # type: ignore[misc]
    if isinstance(dt, T.MapType):
        return dict[
            spark_type_to_python(dt.keyType), spark_type_to_python(dt.valueType)  # type: ignore[misc]
        ]
    if isinstance(dt, T.StructType):
        return dict
    return str


def output_spec_to_struct(output: dict[str, Any]) -> T.StructType:
    """A UDF ``output={'name': type}`` spec -> StructType.

    Values may be Python types, Pydantic models, Spark DataTypes, or DDL
    strings ("bigint"). Parity with datachain's udf output handling
    (/root/reference/src/datachain/lib/udf_signature.py:19-130).
    """
    fields = []
    for name, tp in output.items():
        if isinstance(tp, T.DataType):
            dt = tp
        elif isinstance(tp, str):
            dt = T._parse_datatype_string(tp)
        else:
            dt = python_type_to_spark(tp)
        fields.append(T.StructField(name, dt, nullable=True))
    return T.StructType(fields)


def model_to_row_dict(obj: Any) -> Any:
    """Pydantic instance -> plain dict suitable for Spark Row creation."""
    if PYDANTIC and isinstance(obj, BaseModel):
        return {k: model_to_row_dict(v) for k, v in obj.__dict__.items()}
    if isinstance(obj, dict):
        return {k: model_to_row_dict(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple, set)):
        return [model_to_row_dict(v) for v in obj]
    if isinstance(obj, enum.Enum):
        return obj.value
    return obj


def row_to_model(value: Any, model: "type[BaseModel]") -> Any:
    """Spark Row/dict -> Pydantic instance (inverse of model_to_row_dict).

    Parity: SignalSchema.row_to_objs
    (/root/reference/src/datachain/lib/signal_schema.py:506-530).
    """
    if value is None:
        return None
    data = value.asDict(recursive=True) if hasattr(value, "asDict") else dict(value)
    return model.model_validate(data)
