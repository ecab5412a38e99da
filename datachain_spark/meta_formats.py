"""JSON/CSV → Pydantic data-model generation — parity with the reference's
``lib/meta_formats.py`` (``gen_datamodel_code`` at meta_formats.py:40-91,
``read_meta`` at :97-170), used by the public json-csv-reader example.

The reference shells out to the ``datamodel_code_generator`` package; that
dependency is absent here, so the generator is a small recursive inferrer
producing equivalent Pydantic source (nested models for dicts, ``list[T]``
for homogeneous arrays, ``Optional`` for observed nulls). jmespath filtering
uses the real ``jmespath`` package when installed, else a dotted-path subset.
"""

from __future__ import annotations

import io
import json
import keyword
import re
import uuid
from typing import Any, Callable, Iterator, Optional


def generate_uuid() -> uuid.UUID:
    """Parity: meta_formats.py:19-21."""
    return uuid.uuid4()


def load_json_from_string(json_string: str) -> Any:
    """Parity: meta_formats.py:24-30."""
    try:
        return json.loads(json_string)
    except json.JSONDecodeError as e:
        raise ValueError(f"Failed to parse JSON string: {json_string!r}") from e


def process_json(data_string: str, jmespath: Optional[str] = None) -> Any:
    """Parse and optionally jmespath-filter a JSON document — parity:
    meta_formats.py:33-38."""
    json_object = load_json_from_string(data_string)
    if jmespath and jmespath != "@":
        try:
            import jmespath as jp  # type: ignore[import-not-found]

            return jp.search(jmespath, json_object)
        except ImportError:
            cur = json_object
            for seg in jmespath.split("."):
                cur = cur[seg]
            return cur
    return json_object


def _class_name(name: str) -> str:
    parts = re.split(r"[^0-9a-zA-Z]+", name)
    out = "".join(p[:1].upper() + p[1:] for p in parts if p)
    if not out or out[0].isdigit():
        out = f"Model{out}"
    return out


def _field_name(name: str) -> tuple[str, bool]:
    """Python-safe field name; returns (name, needs_alias)."""
    safe = re.sub(r"[^0-9a-zA-Z_]", "_", name)
    if not safe or safe[0].isdigit():
        safe = f"f_{safe}"
    if keyword.iskeyword(safe):
        safe = f"{safe}_"
    return safe, safe != name


class _Gen:
    def __init__(self) -> None:
        self.classes: list[str] = []
        self.used: set[str] = set()

    def type_of(self, value: Any, hint: str) -> str:
        if value is None:
            return "Optional[Any]"
        if isinstance(value, bool):
            return "bool"
        if isinstance(value, int):
            return "int"
        if isinstance(value, float):
            return "float"
        if isinstance(value, str):
            return "str"
        if isinstance(value, dict):
            return self.emit_class(value, hint)
        if isinstance(value, list):
            if not value:
                return "list[Any]"
            elem_types = {self.type_of(v, hint) for v in value}
            if len(elem_types) == 1:
                return f"list[{elem_types.pop()}]"
            if elem_types <= {"int", "float"}:
                return "list[float]"
            return "list[Any]"
        return "Any"

    def emit_class(self, obj: dict, name: str) -> str:
        cname = _class_name(name)
        base, i = cname, 1
        while cname in self.used:
            i += 1
            cname = f"{base}{i}"
        self.used.add(cname)
        lines = [f"class {cname}(UserModel):"]
        if not obj:
            lines.append("    pass")
        for k, v in obj.items():
            fname, aliased = _field_name(k)
            ftype = self.type_of(v, k)
            if v is None:
                default = " = None"
            elif aliased:
                default = f" = Field(alias={k!r})"
            else:
                default = ""
            lines.append(f"    {fname}: {ftype}{default}")
        self.classes.append("\n".join(lines))
        return cname


def gen_datamodel_code(
    source_file: Any,
    format: str = "json",  # noqa: A002
    jmespath: Optional[str] = None,
    model_name: Optional[str] = None,
) -> str:
    """Generate Pydantic model source for a JSON/JSONL/CSV file — parity:
    meta_formats.py:40-91 (root JSON arrays sample the first entry; CSV
    samples header + first row). ``source_file`` is a File, a path string,
    or a file-like object."""
    if not model_name:
        uid_str = str(generate_uuid()).replace("-", "")
        model_name = f"Model{format}{uid_str}"

    if hasattr(source_file, "open"):
        ctx = source_file.open()
    elif isinstance(source_file, str):
        ctx = open(source_file)  # noqa: SIM115
    else:
        ctx = source_file

    def _read(fd) -> str:
        if format == "csv":
            return fd.readline().replace("\r", "") + fd.readline().replace("\r", "")
        if format == "jsonl":
            return fd.readline().replace("\r", "")
        return fd.read()

    if hasattr(ctx, "__enter__"):
        with ctx as fd:
            data_string = _read(fd)
    else:
        data_string = _read(ctx)
    if isinstance(data_string, bytes):
        data_string = data_string.decode("utf-8")

    if format == "csv":
        header, _, row = data_string.partition("\n")
        names = next(iter(__import__("csv").reader(io.StringIO(header))))
        values = next(iter(__import__("csv").reader(io.StringIO(row))), [])

        def _coerce(s: str) -> Any:
            for conv in (int, float):
                try:
                    return conv(s)
                except ValueError:
                    pass
            return s

        json_object: Any = {
            n: _coerce(values[i]) if i < len(values) else None
            for i, n in enumerate(names)
        }
    else:
        json_object = process_json(data_string, jmespath)
        if format == "json" and isinstance(json_object, list):
            json_object = json_object[0]  # sample the 1st object of an array

    if not isinstance(json_object, dict):
        raise ValueError(
            f"cannot generate a model from non-object sample: {type(json_object)}"
        )

    gen = _Gen()
    gen.used.add(model_name)
    lines = [f"class {model_name}(UserModel):"]
    if not json_object:
        lines.append("    pass")
    for k, v in json_object.items():
        fname, aliased = _field_name(k)
        ftype = gen.type_of(v, k)
        if v is None:
            default = " = None"
        elif aliased:
            default = f" = Field(alias={k!r})"
        else:
            default = ""
        lines.append(f"    {fname}: {ftype}{default}")

    header_src = (
        "from typing import Any, Optional\n\n"
        "from pydantic import Field\n\n"
        "from datachain_spark.meta_formats import UserModel\n"
        "from datachain_spark.schema import DataModel\n"
    )
    body = "\n\n\n".join([*gen.classes, "\n".join(lines)])
    epilogue = f"\n\nDataModel.register({model_name})\nspec = {model_name}\n"
    return f"{header_src}\n\n{body}{epilogue}"


try:  # UserModel: permissive base the generated classes extend (parity
    # meta_formats.py UserModel — ignores unknown fields, allows aliases)
    from pydantic import BaseModel, ConfigDict

    class UserModel(BaseModel):
        model_config = ConfigDict(populate_by_name=True, extra="ignore")

except ImportError:  # pragma: no cover
    UserModel = None  # type: ignore[assignment]


def read_meta(
    spec: Any = None,
    schema_from: Optional[str] = None,
    format: str = "json",  # noqa: A002
    jmespath: Optional[str] = None,
    model_name: Optional[str] = None,
    nrows: Optional[int] = None,
) -> Callable:
    """Build a generator UDF parsing JSON/JSONL/CSV files against ``spec``
    (static) or a model generated from ``schema_from`` — parity:
    meta_formats.py:97-170. Use with ``chain.gen(meta=read_meta(...))``."""
    if schema_from:
        model_code = gen_datamodel_code(
            schema_from, format=format, jmespath=jmespath, model_name=model_name
        )
        if not spec:
            gl: dict[str, Any] = {}
            # dont_inherit: this module's `from __future__ import annotations`
            # must NOT leak into the generated code (it would defer the
            # nested-model annotations into strings pydantic can't resolve
            # from an exec namespace)
            code_obj = compile(
                model_code, "<datachain-meta-model>", "exec", dont_inherit=True
            )
            exec(code_obj, gl)  # noqa: S102 — same mechanism as the reference
            spec = gl["spec"]
    if not spec:
        raise ValueError(
            "Must provide a static schema in spec: or metadata sample in schema_from:"
        )

    def parse_data(file) -> Iterator[Any]:
        raw = file.read_text() if hasattr(file, "read_text") else open(file).read()
        if format == "csv":
            import csv as _csv

            rows = list(_csv.DictReader(io.StringIO(raw)))
        elif format == "jsonl":
            rows = [process_json(line, jmespath) for line in raw.splitlines() if line]
        else:
            obj = process_json(raw, jmespath)
            rows = obj if isinstance(obj, list) else [obj]
        for i, row in enumerate(rows):
            if nrows is not None and i >= nrows:
                break
            yield spec.model_validate(row)

    return parse_data
