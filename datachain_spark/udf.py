"""Python UDF surface: map / gen / agg / batch_map.

Parity: /root/reference/src/datachain/lib/udf.py and
/root/reference/src/datachain/lib/dc/datachain.py:809-1084. The reference runs
row-at-a-time Python UDFs over rows paged out of SQLite, inserts outputs into a
temp table and joins them back on sys__id
(/root/reference/src/datachain/query/dataset.py:655-781). On Spark none of
that machinery exists: a UDF step is a ``mapInPandas`` /
``applyInPandas`` node *inside the same plan* — Arrow-batched, executed in
parallel by executors, no merge-back join, no temp tables.

Signature inference parity: /root/reference/src/datachain/lib/udf_signature.py
(params from the function signature, output names/types from annotations or
the explicit ``output=`` spec).

Class-based UDFs (Mapper/Generator/Aggregator with setup/teardown,
/root/reference/src/datachain/lib/udf.py:186-191) are supported: setup() runs
once per task before the first batch, teardown() after the last.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Iterable, Iterator, Optional, Tuple, Union

import pandas as pd
from pyspark.sql import types as T

from .schema import PYDANTIC, model_to_row_dict, output_spec_to_struct, python_type_to_spark

if PYDANTIC:
    from pydantic import BaseModel


class UDFBase:
    """Base for class-based UDFs. Parity: lib/udf.py:145-191."""

    def setup(self) -> None:  # pragma: no cover - trivial
        pass

    def teardown(self) -> None:  # pragma: no cover - trivial
        pass

    def process(self, *args: Any) -> Any:
        raise NotImplementedError

    # introspection parity (lib/udf.py:167-190). The reference's run/
    # to_udf_wrapper dispatch machinery is intentionally absent: execution
    # is Spark's mapInPandas/applyInPandas, not a Python dispatcher.

    @property
    def name(self) -> str:
        return self.__class__.__name__

    @property
    def verbose_name(self) -> str:
        return self.name


class Mapper(UDFBase):
    """1:1 UDF. Parity: lib/udf.py:394-437."""


class Generator(UDFBase):
    """1:N UDF. Parity: lib/udf.py:500-543."""


class Aggregator(UDFBase):
    """N:M per-group UDF. Parity: lib/udf.py:545-625."""


class BatchMapper(UDFBase):
    """Batched 1:1 UDF. Parity: lib/udf.py:439-498."""


def _callable(func: Union[Callable, UDFBase]) -> tuple[Callable, Optional[UDFBase]]:
    if isinstance(func, UDFBase):
        return func.process, func
    if isinstance(func, type) and issubclass(func, UDFBase):
        inst = func()
        return inst.process, inst
    return func, None


def resolve_setup(setup: Optional[dict[str, Callable[[], Any]]]) -> dict[str, Any]:
    """Evaluate setup() thunks once per task, inside the executor (parity:
    datachain.py:2637-2679 — shared resources like API clients are built on
    first use executor-side, never serialized). Per-task (not per-process)
    construction: an id-keyed process cache can serve stale resources after
    GC id reuse, and tasks deserialize distinct closure copies anyway."""
    if not setup:
        return {}
    return {k: fn() for k, fn in setup.items()}


def infer_params(
    func: Callable, params: Optional[list[str]], exclude: Optional[set] = None
) -> list[str]:
    """Input column names from explicit list or the function signature
    (udf_signature.py:19-230)."""
    if params is not None:
        return list(params) if not isinstance(params, str) else [params]
    target = func.process if isinstance(func, UDFBase) else (
        func().process if isinstance(func, type) and issubclass(func, UDFBase) else func
    )
    sig = inspect.signature(target)
    skip = {"self"} | (exclude or set())
    names = [
        p.name
        for p in sig.parameters.values()
        if p.kind in (p.POSITIONAL_OR_KEYWORD, p.POSITIONAL_ONLY) and p.name not in skip
    ]
    return names


def infer_param_models(
    func: Callable, params: list[str], exclude: Optional[set] = None
) -> dict[str, type]:
    """Pydantic-model annotations on the UDF's positional parameters →
    {input column name: model class}. Drives automatic hydration of struct
    columns (Arrow renders them as dicts) into typed signals, so
    ``def f(file: File)`` receives a real ``File`` — parity with the
    reference's signal-schema row conversion (lib/udf_signature.py +
    signal_schema.row_to_features); there the catalog hydrates every typed
    param, here the annotation opts in. Alignment is positional: the i-th
    entry of ``params`` feeds the i-th positional parameter."""
    if not PYDANTIC:
        return {}
    target = func.process if isinstance(func, UDFBase) else (
        func().process if isinstance(func, type) and issubclass(func, UDFBase) else func
    )
    try:
        import typing

        hints = typing.get_type_hints(target)
        sig = inspect.signature(target)
    except (TypeError, ValueError, NameError):
        return {}
    skip = {"self"} | (exclude or set())
    sig_names = [
        p.name
        for p in sig.parameters.values()
        if p.kind in (p.POSITIONAL_OR_KEYWORD, p.POSITIONAL_ONLY) and p.name not in skip
    ]
    def _model_of(ann) -> Optional[type]:
        import typing

        if isinstance(ann, type) and issubclass(ann, BaseModel):
            return ann
        import types as _types

        origin = typing.get_origin(ann)
        # unwrap list[Model] (agg params are whole-group lists) and
        # Optional[Model] / Model | None
        if origin in (list, typing.Union, getattr(_types, "UnionType", ())):
            for a in typing.get_args(ann):
                m = _model_of(a)
                if m is not None:
                    return m
        return None

    out: dict[str, type] = {}
    for i, col in enumerate(params):
        if i < len(sig_names):
            m = _model_of(hints.get(sig_names[i]))
            if m is not None:
                out[col] = m
    return out


def _hydrator(params: list[str], param_models: Optional[dict[str, type]]):
    """Row-values converter for the models map, or None when nothing to do."""
    models = [(param_models or {}).get(p) for p in params]
    if not any(models):
        return None

    def hyd(vals):
        return [
            m.model_validate(v) if (m is not None and isinstance(v, dict)) else v
            for v, m in zip(vals, models)
        ]

    return hyd


def normalize_output(
    func: Callable, output: Any, default_name: str = "result"
) -> T.StructType:
    """``output`` spec -> StructType.

    Accepts {'name': type}, a single type (named ``default_name``), a
    StructType, a DDL string, or None (inferred from the return annotation).
    """
    if output is None:
        target = func.process if isinstance(func, UDFBase) else func
        ann = inspect.signature(target).return_annotation
        if ann is inspect.Signature.empty:
            raise ValueError(
                "UDF output schema not given and no return annotation to infer from"
            )
        # Iterator[...] / Generator unwrap for gen()
        import typing

        import collections.abc as _cabc

        origin = typing.get_origin(ann)
        # get_origin(typing.Iterator[X]) is collections.abc.Iterator
        if origin in (_cabc.Iterator, _cabc.Generator, _cabc.Iterable):
            args = typing.get_args(ann)
            if args:
                ann = args[0]
        output = ann
        if PYDANTIC and isinstance(output, type) and issubclass(output, BaseModel):
            # a model-typed return annotation nests under the signal name
            # (`.map(result=fn)` -> struct column `result`, fields reachable
            # as result.error) — reference signal naming, udf_signature.py;
            # an EXPLICIT `output=Model` keeps the flat layout for
            # compatibility (declare output={'name': Model} to nest)
            from .schema import model_to_struct

            return T.StructType(
                [T.StructField(default_name, model_to_struct(output), True)]
            )
    if isinstance(output, T.StructType):
        return output
    if isinstance(output, str):
        return T._parse_datatype_string(output)
    if isinstance(output, dict):
        return output_spec_to_struct(output)
    if PYDANTIC and isinstance(output, type) and issubclass(output, BaseModel):
        from .schema import model_to_struct

        return model_to_struct(output)
    return T.StructType([T.StructField(default_name, python_type_to_spark(output), True)])


def _result_to_cells(value: Any, out_names: list[str]) -> list[Any]:
    """One UDF return value -> list of cells aligned with out_names."""
    if PYDANTIC and isinstance(value, BaseModel):
        d = model_to_row_dict(value)
        if len(out_names) == 1 and out_names[0] not in d:
            # output declared as ONE struct column (output={"box": Model}):
            # the whole model is that column's value, not a field spread
            return [d]
        return [d.get(n) for n in out_names]
    if isinstance(value, dict):
        cells = [value.get(n) for n in out_names]
    elif isinstance(value, tuple):
        cells = list(value)
    else:
        cells = [value]
    if PYDANTIC:
        # models nested in dict/tuple returns serialize to struct dicts
        cells = [
            model_to_row_dict(c) if isinstance(c, BaseModel) else c for c in cells
        ]
    return cells


def _extract_param(pdf: pd.DataFrame, name: str) -> pd.Series:
    """Support dotted access into struct columns rendered as dicts by Arrow."""
    if name in pdf.columns:
        return pdf[name]
    if "." in name:
        head, rest = name.split(".", 1)
        if head in pdf.columns:
            series = pdf[head]
            for part in rest.split("."):
                series = series.map(lambda v, p=part: None if v is None else v.get(p))
            return series
    raise KeyError(f"UDF param {name!r} not found in columns {list(pdf.columns)}")


class _Prefetcher:
    """Bounded thread pool warming the executor file cache ahead of row
    processing. Parity: _prefetch_inputs / AsyncMapper keeping ``prefetch``
    files in flight per worker (lib/udf.py:356-383, asyn.py:27). Downloads of
    rows i+1.. overlap the UDF's work on row i; the warmed blobs land in the
    (uri, etag) cache so the UDF's read_bytes() is a local disk hit."""

    def __init__(self, workers: int):
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(max_workers=workers)

    def warm_batch(self, pdf: pd.DataFrame, file_params: list[str]) -> None:
        from .sources.files import File

        if File is None:  # pydantic absent
            return
        for p in file_params:
            for fd in _extract_param(pdf, p).tolist():
                if isinstance(fd, dict) and fd.get("path"):
                    self._pool.submit(self._warm, fd)

    @staticmethod
    def _warm(fd: dict) -> None:
        from .sources.files import File

        try:
            File.model_validate(fd).read_bytes(cache=True)
        except Exception:  # noqa: BLE001 - warming is best-effort
            pass

    def close(self) -> None:
        self._pool.shutdown(wait=False)


def _file_struct_params(df_schema: T.StructType, params: list[str]) -> list[str]:
    """Param names whose column is a File-shaped struct (has path + etag)."""
    out = []
    for p in params:
        name = p.split(".", 1)[0]
        try:
            f = df_schema[name]
        except KeyError:
            continue
        if isinstance(f.dataType, T.StructType):
            names = set(f.dataType.fieldNames())
            if {"path", "etag"} <= names:
                out.append(p)
    return out


def _sanitize_captured_models(*objs: Any) -> None:
    """Make locally-defined pydantic models UDF-shippable.

    pydantic v2 classes created inside a function store a snapshot of the
    defining frame's locals in ``__pydantic_parent_namespace__`` (used only
    to resolve ForwardRefs at model_rebuild time). When such a model rides
    to executors inside a UDF closure, cloudpickle serializes that snapshot
    too — and it routinely contains driver-only state (a Session holding the
    SparkContext), failing with SPARK-5063. The models are fully built by
    the time the UDF ships, so finish any pending rebuild and drop the
    snapshot. Walks the UDF callable's closure cells/defaults, setup
    factories, and nested model field annotations.
    """
    try:
        from pydantic import BaseModel
    except ImportError:  # pragma: no cover
        return
    seen: set = set()
    stack = list(objs)
    while stack:
        obj = stack.pop()
        if id(obj) in seen or obj is None:
            continue
        seen.add(id(obj))
        if isinstance(obj, type) and issubclass(obj, BaseModel):
            if getattr(obj, "__pydantic_parent_namespace__", None):
                try:
                    obj.model_rebuild()
                except Exception:  # noqa: BLE001 — leave unresolved models be
                    continue
                try:
                    obj.__pydantic_parent_namespace__ = None
                except Exception:  # noqa: BLE001
                    pass
            for f in getattr(obj, "model_fields", {}).values():
                stack.append(f.annotation)
            continue
        if isinstance(obj, UDFBase):
            stack.extend(vars(obj).values())
            stack.append(type(obj).process)
        if callable(obj):
            for cell in getattr(obj, "__closure__", None) or ():
                try:
                    stack.append(cell.cell_contents)
                except ValueError:
                    pass
            stack.extend(getattr(obj, "__defaults__", None) or ())
        elif isinstance(obj, dict):
            stack.extend(obj.values())
        elif isinstance(obj, (list, tuple, set, frozenset)):
            stack.extend(obj)


def build_map_fn(
    func: Union[Callable, UDFBase],
    params: list[str],
    out_struct: T.StructType,
    setup: Optional[dict[str, Callable[[], Any]]] = None,
    on_error: str = "raise",
    cache: bool = False,
    prefetch: int = 0,
    file_params: Optional[list[str]] = None,
    param_models: Optional[dict[str, type]] = None,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """mapInPandas function for .map(): passes input through, appends outputs.

    on_error (parity: process_safe error wrapping, lib/udf.py:315-392):
    - 'raise' (default): user exceptions fail the task;
    - 'null': failing rows get NULL outputs;
    - 'collect': like 'null', plus the error string lands in the final
      output column (declare it, e.g. output={..., 'error': str}) — the
      shape delta_retry='error' re-processing consumes.
    """
    out_names = [f.name for f in out_struct.fields]
    if on_error not in ("raise", "null", "collect"):
        raise ValueError(f"map: unknown on_error {on_error!r}")
    _sanitize_captured_models(func, setup, param_models)
    hyd = _hydrator(params, param_models)

    def run_one(call, vals):
        if on_error == "raise":
            return _result_to_cells(call(*vals), out_names)
        try:
            cells = _result_to_cells(call(*vals), out_names)
            # pad to declared width (scalar returns fill only the first cell;
            # with 'collect' the trailing error column stays NULL on success)
            cells = cells + [None] * (len(out_names) - len(cells))
            return cells
        except Exception as exc:  # noqa: BLE001 - user code boundary
            cells = [None] * len(out_names)
            if on_error == "collect":
                cells[-1] = f"{type(exc).__name__}: {exc}"
            return cells

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .sources.files import set_file_cache_default

        # prefetch implies cache-backed reads (the warmed blob must be where
        # read_bytes looks); plain cache=True keeps reference semantics
        set_file_cache_default(cache or prefetch > 0)
        pre = _Prefetcher(prefetch) if prefetch > 0 and file_params else None
        call, inst = _callable(func)
        res = resolve_setup(setup)
        if res:
            base = call
            call = lambda *a: base(*a, **res)
        if inst is not None:
            inst.setup()
        try:
            for pdf in batches:
                if pre is not None and len(pdf):
                    pre.warm_batch(pdf, file_params)
                cols = [_extract_param(pdf, p) for p in params]
                results = [
                    run_one(call, hyd(vals) if hyd else vals)
                    for vals in zip(*[c.tolist() for c in cols])
                ] if len(pdf) else []
                out = pdf.copy()
                for i, n in enumerate(out_names):
                    out[n] = [r[i] for r in results] if results else pd.Series([], dtype=object)
                yield out
        finally:
            if pre is not None:
                pre.close()
            if inst is not None:
                inst.teardown()

    return fn


def build_gen_fn(
    func: Union[Callable, UDFBase],
    params: list[str],
    out_struct: T.StructType,
    setup: Optional[dict[str, Callable[[], Any]]] = None,
    cache: bool = False,
    prefetch: int = 0,
    file_params: Optional[list[str]] = None,
    param_models: Optional[dict[str, type]] = None,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """mapInPandas function for .gen(): each input row yields 0..N output rows;
    the output schema REPLACES the input schema (datachain.py:862-900)."""
    out_names = [f.name for f in out_struct.fields]
    _sanitize_captured_models(func, setup, param_models)
    hyd = _hydrator(params, param_models)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .sources.files import set_file_cache_default

        set_file_cache_default(cache or prefetch > 0)
        pre = _Prefetcher(prefetch) if prefetch > 0 and file_params else None
        call, inst = _callable(func)
        res = resolve_setup(setup)
        if res:
            base = call
            call = lambda *a: base(*a, **res)
        if inst is not None:
            inst.setup()
        try:
            for pdf in batches:
                if pre is not None and len(pdf):
                    pre.warm_batch(pdf, file_params)
                rows: list[list[Any]] = []
                cols = [_extract_param(pdf, p) for p in params]
                for vals in zip(*[c.tolist() for c in cols]):
                    produced = call(*(hyd(vals) if hyd else vals))
                    if produced is None:
                        continue
                    for item in produced:
                        rows.append(_result_to_cells(item, out_names))
                yield pd.DataFrame(rows, columns=out_names)
        finally:
            if pre is not None:
                pre.close()
            if inst is not None:
                inst.teardown()

    return fn


def build_agg_fn(
    func: Union[Callable, UDFBase],
    params: list[str],
    out_struct: T.StructType,
    setup: Optional[dict[str, Callable[[], Any]]] = None,
    cache: bool = False,
    param_models: Optional[dict[str, type]] = None,
) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """applyInPandas function for .agg(): the whole group's param columns are
    passed as sequences; the UDF yields output rows (lib/udf.py:545-625 —
    'whole group passed as lists')."""
    out_names = [f.name for f in out_struct.fields]
    _sanitize_captured_models(func, setup, param_models)
    models = {p: m for p, m in (param_models or {}).items() if m is not None}

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        from .sources.files import set_file_cache_default

        set_file_cache_default(cache)  # settings(cache=True) parity
        call, inst = _callable(func)
        res = resolve_setup(setup)
        if res:
            base = call
            call = lambda *a: base(*a, **res)
        if inst is not None:
            inst.setup()
        try:
            args = [
                [
                    models[p].model_validate(v) if isinstance(v, dict) else v
                    for v in _extract_param(pdf, p).tolist()
                ]
                if p in models
                else _extract_param(pdf, p).tolist()
                for p in params
            ]
            produced = call(*args)
            rows = []
            if produced is not None:
                if isinstance(produced, (tuple, dict)) or (
                    PYDANTIC and isinstance(produced, BaseModel)
                ):
                    produced = [produced]
                for item in produced:
                    rows.append(_result_to_cells(item, out_names))
            return pd.DataFrame(rows, columns=out_names)
        finally:
            if inst is not None:
                inst.teardown()

    return fn


def struct_boundary_fn(
    inner: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]],
    params: list[str],
    out_names: list[str],
) -> Callable:
    """Adapt a mapInPandas-style UDF body to the NARROW Python boundary: a
    scalar-iterator ``pandas_udf`` that receives ONLY the param columns and
    returns the output columns as one struct, so pass-through columns never
    cross JVM<->Python (guide §4.1 — an opaque map defeats Catalyst's column
    pruning; this boundary restores it). The caller re-attaches the struct's
    fields around the untouched JVM columns.

    ``inner`` is a build_map_fn/build_batch_map_fn product: it expects a
    pandas frame holding the param columns (dotted names arrive as literal
    columns, which _extract_param matches first) and yields frames that
    contain at least the output columns. Row cardinality is 1:1 by the map
    contract, which is exactly what the scalar pandas_udf boundary enforces.
    """

    def fn(it: Iterator[Tuple[pd.Series, ...]]) -> Iterator[pd.DataFrame]:
        def pdfs() -> Iterator[pd.DataFrame]:
            for tup in it:
                if not isinstance(tup, tuple):
                    tup = (tup,)
                yield pd.DataFrame(dict(zip(params, tup)))

        for out in inner(pdfs()):
            yield out.loc[:, out_names]

    return fn


def build_batch_map_fn(
    func: Union[Callable, UDFBase],
    params: list[str],
    out_struct: T.StructType,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Batched map: func receives lists of param values for the whole batch and
    returns a sequence of outputs of the same length
    (datachain.py:1037-1084)."""
    out_names = [f.name for f in out_struct.fields]
    _sanitize_captured_models(func)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        call, inst = _callable(func)
        if inst is not None:
            inst.setup()
        try:
            for pdf in batches:
                args = [_extract_param(pdf, p).tolist() for p in params]
                produced = list(call(*args)) if len(pdf) else []
                if len(produced) != len(pdf):
                    raise ValueError(
                        f"batch_map must return one output per input row "
                        f"({len(produced)} != {len(pdf)})"
                    )
                out = pdf.copy()
                cells = [_result_to_cells(v, out_names) for v in produced]
                for i, n in enumerate(out_names):
                    out[n] = [c[i] for c in cells] if cells else pd.Series([], dtype=object)
                yield out
        finally:
            if inst is not None:
                inst.teardown()

    return fn


# Parity alias: the reference exports lib/utils.py AbstractUDF at top level;
# UDFBase is this engine's equivalent root of the class-UDF hierarchy.
AbstractUDF = UDFBase
