"""Column references: the ``C`` helper.

Parity with datachain's ``C`` / ``Column``
(/root/reference/src/datachain/query/schema.py:33-64): attribute or call style
(``C.name`` / ``C("file.path")``), with the extra operators the reference adds
on top of SQLAlchemy columns — ``glob`` (case-sensitive shell glob), ``regexp``
and ``in_``. Everything returns / proxies a native pyspark Column so the whole
expression stays inside Catalyst (JVM-side, codegen-able).
"""

from __future__ import annotations

import re
from typing import Any, Union

from pyspark.sql import Column
from pyspark.sql import functions as F


def glob_to_regex(pattern: str) -> str:
    """Translate a shell glob to an anchored regex.

    Supports ``*``, ``**`` (crosses ``/``), ``?``, ``[seq]`` — the subset
    datachain's GLOB uses (SQLite GLOB semantics: case-sensitive, ``*`` crosses
    path separators; /root/reference/src/datachain/query/schema.py:58-60).
    """
    i, n, out = 0, len(pattern), []
    while i < n:
        ch = pattern[i]
        if ch == "*":
            out.append(".*")
            while i + 1 < n and pattern[i + 1] == "*":
                i += 1
        elif ch == "?":
            out.append(".")
        elif ch == "[":
            j = i + 1
            if j < n and pattern[j] in "!^":
                j += 1
            if j < n and pattern[j] == "]":
                j += 1
            while j < n and pattern[j] != "]":
                j += 1
            if j >= n:
                out.append(re.escape(ch))
            else:
                seq = pattern[i + 1 : j]
                if seq.startswith("!"):
                    seq = "^" + seq[1:]
                out.append(f"[{seq}]")
                i = j
        else:
            out.append(re.escape(ch))
        i += 1
    return "^" + "".join(out) + "$"


def path_glob_to_regex(pattern: str) -> str:
    """Path-aware glob: ``*``/``?`` do NOT cross ``/``, ``**`` does.

    Used by read_storage patterns
    (/root/reference/src/datachain/lib/dc/storage_pattern.py semantics).
    """
    i, n, out = 0, len(pattern), []
    while i < n:
        ch = pattern[i]
        if ch == "*":
            if i + 1 < n and pattern[i + 1] == "*":
                out.append(".*")
                i += 1
                # swallow a following separator so "**/x" also matches "x"
                if i + 1 < n and pattern[i + 1] == "/":
                    out[-1] = "(?:.*/)?"
                    i += 1
            else:
                out.append("[^/]*")
        elif ch == "?":
            out.append("[^/]")
        elif ch == "[":
            j = i + 1
            if j < n and pattern[j] in "!^":
                j += 1
            if j < n and pattern[j] == "]":
                j += 1
            while j < n and pattern[j] != "]":
                j += 1
            if j >= n:
                out.append(re.escape(ch))
            else:
                seq = pattern[i + 1 : j]
                if seq.startswith("!"):
                    seq = "^" + seq[1:]
                out.append(f"[{seq}]")
                i = j
        else:
            out.append(re.escape(ch))
        i += 1
    return "^" + "".join(out) + "$"


def brace_expand(pattern: str) -> list[str]:
    """Expand ``{a,b}`` and ``{1..3}`` alternations into concrete patterns.

    Parity: /root/reference/src/datachain/lib/dc/storage_pattern.py:11-233.
    """
    m = re.search(r"\{([^{}]*)\}", pattern)
    if not m:
        return [pattern]
    body = m.group(1)
    rng = re.fullmatch(r"(\d+)\.\.(\d+)", body)
    if rng:
        lo, hi = int(rng.group(1)), int(rng.group(2))
        width = len(rng.group(1)) if rng.group(1).startswith("0") else 0
        alts = [str(v).zfill(width) for v in range(lo, hi + 1)]
    else:
        alts = body.split(",")
    out: list[str] = []
    for alt in alts:
        expanded = pattern[: m.start()] + alt + pattern[m.end() :]
        out.extend(brace_expand(expanded))
    return out


class Col:
    """Thin proxy over a pyspark Column adding glob/regexp/in_ and keeping
    chainability; unwraps via ``.column``. All operators delegate to the
    underlying Column, so arbitrary Spark expressions compose.

    Name-based refs resolve lazily: ``C.age`` works before any SparkSession
    exists (Spark 4 classic requires an active context for ``F.col``).
    """

    __slots__ = ("_col", "_name")

    def __init__(self, column: Union[Column, None] = None, name: str | None = None):
        object.__setattr__(self, "_col", column)
        object.__setattr__(self, "_name", name)

    @property
    def column(self) -> Column:
        if self._col is not None:
            return self._col
        return F.col(self._name)

    # -- datachain extras ------------------------------------------------
    def glob(self, pattern: str) -> Column:
        pats = brace_expand(pattern)
        cond = self.column.rlike(glob_to_regex(pats[0]))
        for p in pats[1:]:
            cond = cond | self.column.rlike(glob_to_regex(p))
        return cond

    def regexp(self, pattern: str) -> Column:
        return self.column.rlike(pattern)

    def in_(self, *values: Any) -> Column:
        if len(values) == 1 and isinstance(values[0], (list, tuple, set)):
            values = tuple(values[0])
        return self.column.isin(*values)

    # ``name`` is Column's alias-returning attr but also a common struct
    # field (File.name) — prefer the field reading in lazy attribute chains;
    # spell C("x").alias(...) for aliasing
    _FIELD_OVERRIDES = frozenset({"name"})

    # -- proxy -----------------------------------------------------------
    def __getattr__(self, item: str) -> Any:
        if item in ("_col", "_name"):
            raise AttributeError(item)
        # nested struct access: C.file.path -> col("file.path") stays lazy
        if self._col is None and not item.startswith("_") and item not in (
            "column", "glob", "regexp", "in_", "alias",
        ):
            # treat as nested field when it's not a Column attribute
            if not hasattr(Column, item) or item in self._FIELD_OVERRIDES:
                return Col(name=f"{self._name}.{item}")
        attr = getattr(self.column, item)
        if isinstance(attr, Column):
            return Col(attr)
        return attr

    def __getitem__(self, item: Any) -> "Col":
        return Col(self.column[item])

    def __repr__(self) -> str:
        if self._col is None:
            return f"Col<{self._name}>"
        return f"Col({self._col!r})"

    def alias(self, name: str) -> Column:
        return self.column.alias(name)


def _binop(name):
    def op(self, other):
        other = unwrap(other)
        return getattr(self.column, name)(other)

    return op


for _name in (
    "__eq__", "__ne__", "__lt__", "__le__", "__gt__", "__ge__",
    "__add__", "__radd__", "__sub__", "__rsub__", "__mul__", "__rmul__",
    "__truediv__", "__rtruediv__", "__mod__", "__rmod__",
    "__and__", "__rand__", "__or__", "__ror__",
    "__pow__", "__rpow__",
):
    setattr(Col, _name, _binop(_name))
Col.__invert__ = lambda self: ~self.column  # type: ignore[assignment]
Col.__neg__ = lambda self: -self.column  # type: ignore[assignment]
Col.__hash__ = None  # type: ignore[assignment]


def unwrap(expr: Any) -> Any:
    """Col | Column | str | literal -> something Spark accepts."""
    if isinstance(expr, Col):
        return expr.column
    return expr


def to_column(expr: Any) -> Column:
    """Anything column-like -> pyspark Column (strings are names)."""
    if isinstance(expr, Col):
        return expr.column
    if isinstance(expr, Column):
        return expr
    if isinstance(expr, str):
        return F.col(expr)
    return F.lit(expr)


class _CMeta(type):
    def __getattr__(cls, item: str) -> Col:
        if item.startswith("_"):
            raise AttributeError(item)
        return Col(name=item)

    def __call__(cls, name: str) -> Col:  # type: ignore[override]
        return Col(name=name)


class C(metaclass=_CMeta):
    """``C.age > 20`` / ``C("file.path").glob("*.jpg")`` column references."""
