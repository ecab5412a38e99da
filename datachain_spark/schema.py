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
import json
import typing
from typing import Any, Optional, Union, get_args, get_origin

from pyspark.sql import types as T

try:
    from pydantic import BaseModel

    PYDANTIC = True
except ImportError:  # pragma: no cover - pydantic is expected in this env
    BaseModel = None  # type: ignore[assignment]
    PYDANTIC = False


if PYDANTIC:

    class DataModel(BaseModel):
        """Base class for user signal models. Parity: lib/data_model.py
        DataModel — subclasses are auto-registered in the ModelStore (so
        saved datasets can name them) and may set ``_version`` to version
        the schema."""

        _version: "typing.ClassVar[int]" = 1

        @classmethod
        def __pydantic_init_subclass__(cls, **kwargs: Any) -> None:
            super().__pydantic_init_subclass__(**kwargs)
            ModelStore.register(cls)

        @staticmethod
        def register(models: "Any") -> None:
            """Parity: DataModel.register(list-or-one model classes)."""
            if not isinstance(models, (list, tuple)):
                models = [models]
            for m in models:
                ModelStore.register(m)

    class Sys(BaseModel):
        """Internal per-row signals attached by ``settings(sys=True)``.
        Parity: lib/dc/utils.py:126 — ``sys.id`` (row id) + ``sys.rand``
        (deterministic 63-bit per-row value)."""

        id: int
        rand: int

else:  # pragma: no cover
    Sys = None  # type: ignore[assignment]
    DataModel = None  # type: ignore[assignment]


# Parity: lib/data_model.py DataType — the union of types a signal column
# may carry (primitives + models + containers thereof).
DataType = Any


def is_chain_type(tp: Any) -> bool:
    """True when ``tp`` is usable as a chain column type. Parity:
    lib/data_model.py is_chain_type."""
    import datetime as _dt

    if tp in (int, float, str, bool, bytes, _dt.datetime, _dt.date):
        return True
    if PYDANTIC and isinstance(tp, type) and issubclass(tp, BaseModel):
        return True
    origin = get_origin(tp)
    if origin in (list, dict, tuple, set):
        return all(is_chain_type(a) for a in get_args(tp) if a is not Ellipsis)
    if origin is Union:
        return all(
            a is type(None) or is_chain_type(a) for a in get_args(tp)
        )
    return False

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
    """Pydantic model -> StructType (nested models become nested structs).
    The File signal maps to its canonical struct (FILE_STRUCT): its
    ``last_modified: Optional[Any]`` field is a timestamp on the Spark side,
    which field-by-field mapping can't know."""
    try:
        from .sources.files import FILE_STRUCT, File

        if File is not None and isinstance(model, type) and issubclass(model, File):
            return FILE_STRUCT
    except ImportError:  # pragma: no cover
        pass
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


# --------------------------------------------------------------------------
# Signal-schema serialization: custom Pydantic model definitions persisted
# with each dataset version and reconstructed on read in a fresh session.
# Parity: /root/reference/src/datachain/lib/signal_schema.py:255-465
# (serialize/_serialize_type/_serialize_custom_model and
# deserialize/_resolve_type) and lib/model_store.py (ModelStore registry):
# the version record carries {signal: type-string} plus a _custom_types map
# of {Name@vN: {fields, bases}}; on read, a registered class wins, otherwise
# the model is re-created dynamically from the stored field definitions.
# --------------------------------------------------------------------------

_TYPE_NAMES: dict[type, str] = {
    int: "int",
    float: "float",
    str: "str",
    bool: "bool",
    bytes: "bytes",
    datetime.datetime: "datetime",
    datetime.date: "date",
}
_NAME_TYPES: dict[str, Any] = {v: k for k, v in _TYPE_NAMES.items()}


class ModelStore:
    """Registry of known Pydantic models, keyed 'Name@vN' (version from a
    ``_version`` class attr, default 1). Parity: lib/model_store.py."""

    _store: dict[str, "type[BaseModel]"] = {}

    @classmethod
    def get_name(cls, model: "type[BaseModel]") -> str:
        return f"{model.__name__}@v{getattr(model, '_version', 1)}"

    @classmethod
    def register(cls, model: "type[BaseModel]") -> str:
        name = cls.get_name(model)
        cls._store[name] = model
        return name

    @classmethod
    def get(cls, name: str) -> "Optional[type[BaseModel]]":
        return cls._store.get(name)

    @classmethod
    def reset(cls) -> None:
        """Testing aid: simulate a fresh interpreter with no imports."""
        cls._store = {}


def _serialize_type(tp: Any, custom_types: dict[str, Any]) -> str:
    import types as _types

    if tp is None or tp is type(None):
        return "NoneType"
    origin = get_origin(tp)
    if origin is Union or (origin is not None and origin is getattr(_types, "UnionType", object())):
        args = get_args(tp)
        inner = ", ".join(_serialize_type(a, custom_types) for a in args)
        if type(None) in args and len(args) == 2:
            other = next(a for a in args if a is not type(None))
            return f"Optional[{_serialize_type(other, custom_types)}]"
        return f"Union[{inner}]"
    if origin is list:
        args = get_args(tp)
        inner = _serialize_type(args[0], custom_types) if args else "str"
        return f"list[{inner}]"
    if origin is tuple:
        args = get_args(tp)
        if not args:
            return "tuple[str, ...]"
        if len(args) == 2 and args[1] is Ellipsis:
            return f"tuple[{_serialize_type(args[0], custom_types)}, ...]"
        return "tuple[" + ", ".join(_serialize_type(a, custom_types) for a in args) + "]"
    if origin in (set, frozenset):
        args = get_args(tp)
        inner = _serialize_type(args[0], custom_types) if args else "str"
        return f"set[{inner}]"
    if origin is dict:
        args = get_args(tp)
        k = _serialize_type(args[0], custom_types) if args else "str"
        v = _serialize_type(args[1], custom_types) if len(args) > 1 else "str"
        return f"dict[{k}, {v}]"
    if origin is typing.Literal:
        return "Literal[" + json.dumps(list(get_args(tp))) + "]"
    if isinstance(tp, type):
        if tp in _TYPE_NAMES:
            return _TYPE_NAMES[tp]
        if issubclass(tp, enum.Enum):
            return _serialize_enum(tp, custom_types)
        if PYDANTIC and issubclass(tp, BaseModel):
            return _serialize_custom_model(tp, custom_types)
    raise TypeError(f"cannot serialize type {tp!r}")


_JSONABLE = (str, int, float, bool, type(None))


def _serialize_enum(tp: "type[enum.Enum]", custom_types: dict[str, Any]) -> str:
    """Persist an Enum as a named member table so a fresh interpreter
    rebuilds a real Enum subclass (v2 collapsed enums to plain str)."""
    name = f"{tp.__name__}@enum"
    if name not in custom_types:
        custom_types[name] = {
            "enum": True,
            "int": issubclass(tp, enum.IntEnum)
            or all(isinstance(m.value, int) for m in tp),
            "members": {m.name: m.value for m in tp},
        }
    return name


def _serialize_custom_model(model: "type[BaseModel]", custom_types: dict[str, Any]) -> str:
    name = ModelStore.register(model)
    if name in custom_types:
        return name
    custom_types[name] = {}  # placeholder breaks self-reference cycles
    fields = {}
    for fname, finfo in model.model_fields.items():
        fspec: dict[str, Any] = {
            "type": _serialize_type(finfo.annotation, custom_types),
            "required": finfo.is_required(),
        }
        if not finfo.is_required() and isinstance(finfo.default, _JSONABLE):
            fspec["default"] = finfo.default
        fields[fname] = fspec
    bases = []
    for b in model.__mro__[1:]:
        if (
            PYDANTIC
            and isinstance(b, type)
            and issubclass(b, BaseModel)
            and b is not BaseModel
        ):
            bases.append(_serialize_custom_model(b, custom_types))
    custom_types[name] = {
        "schema_version": 3,
        "name": name,
        "fields": fields,
        "bases": bases,
        "hidden_fields": list(getattr(model, "_hidden_fields", [])),
    }
    return name


def serialize_signals(models: dict[str, "type[BaseModel]"]) -> dict[str, Any]:
    """{column: model} -> JSON-able signal schema dict."""
    custom_types: dict[str, Any] = {}
    out: dict[str, Any] = {
        col: _serialize_type(m, custom_types) for col, m in models.items()
    }
    if custom_types:
        out["_custom_types"] = custom_types
    return out


def _split_args(s: str) -> list[str]:
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i].strip())
            start = i + 1
    parts.append(s[start:].strip())
    return parts


def _deserialize_type(s: str, custom_types: dict[str, Any]) -> Any:
    s = s.strip()
    if s == "NoneType":
        return type(None)
    if s in _NAME_TYPES:
        return _NAME_TYPES[s]
    if s.startswith("Optional[") and s.endswith("]"):
        return Optional[_deserialize_type(s[9:-1], custom_types)]
    if s.startswith("Union[") and s.endswith("]"):
        args = tuple(_deserialize_type(a, custom_types) for a in _split_args(s[6:-1]))
        return Union[args]
    if s.startswith("list[") and s.endswith("]"):
        return list[_deserialize_type(s[5:-1], custom_types)]  # type: ignore[misc]
    if s.startswith("tuple[") and s.endswith("]"):
        args = _split_args(s[6:-1])
        if len(args) == 2 and args[1] == "...":
            return tuple[_deserialize_type(args[0], custom_types), ...]  # type: ignore[misc]
        return tuple[tuple(_deserialize_type(a, custom_types) for a in args)]  # type: ignore[misc]
    if s.startswith("set[") and s.endswith("]"):
        return set[_deserialize_type(s[4:-1], custom_types)]  # type: ignore[misc]
    if s.startswith("Literal[") and s.endswith("]"):
        return typing.Literal[tuple(json.loads(s[8:-1]))]
    if s.startswith("dict[") and s.endswith("]"):
        k, v = _split_args(s[5:-1])
        return dict[_deserialize_type(k, custom_types), _deserialize_type(v, custom_types)]  # type: ignore[misc]
    if s.endswith("@enum"):
        return _resolve_enum(s, custom_types)
    if "@v" in s:
        return _resolve_model(s, custom_types)
    raise TypeError(f"cannot deserialize type string {s!r}")


_ENUM_CACHE: dict[int, dict[str, type]] = {}


def _resolve_enum(name: str, custom_types: dict[str, Any]) -> type:
    cache = _ENUM_CACHE.setdefault(id(custom_types), {})
    if name in cache:
        return cache[name]
    spec = custom_types.get(name)
    if spec is None or not spec.get("enum"):
        raise TypeError(f"unknown enum type {name!r}")
    cls = enum.IntEnum if spec.get("int") else enum.Enum
    rebuilt = cls(name.split("@", 1)[0], spec["members"])
    cache[name] = rebuilt
    return rebuilt


def _resolve_model(name: str, custom_types: dict[str, Any]) -> "type[BaseModel]":
    known = ModelStore.get(name)
    if known is not None:
        return known
    spec = custom_types.get(name)
    if spec is None:
        raise TypeError(f"unknown custom type {name!r} (not registered, no spec)")
    from pydantic import create_model

    # bases: first entry in the persisted MRO that resolves — via the live
    # registry OR recursively from its own persisted spec (v2 fell straight
    # back to BaseModel when the class wasn't imported)
    base: Any = BaseModel
    for bname in spec.get("bases", []):
        b = ModelStore.get(bname)
        if b is None and bname in custom_types:
            b = _resolve_model(bname, custom_types)
        if b is not None:
            base = b
            break
    fields: dict[str, Any] = {}
    for fname, fspec in spec.get("fields", {}).items():
        if isinstance(fspec, str):  # schema_version 2: type string only
            fields[fname] = (_deserialize_type(fspec, custom_types), None)
            continue
        ftype = _deserialize_type(fspec["type"], custom_types)
        if fspec.get("required"):
            fields[fname] = (ftype, ...)  # required stays required
        else:
            fields[fname] = (ftype, fspec.get("default", None))
    model = create_model(name.split("@", 1)[0], __base__=base, **fields)
    ModelStore._store[name] = model
    return model


def deserialize_signals(spec: dict[str, Any]) -> dict[str, "type[BaseModel]"]:
    """Inverse of serialize_signals: {column: model class}, using registered
    classes when available, dynamically re-created models otherwise."""
    if not spec or not PYDANTIC:
        return {}
    custom_types = spec.get("_custom_types", {})
    return {
        col: _deserialize_type(s, custom_types)
        for col, s in spec.items()
        if col != "_custom_types"
    }
