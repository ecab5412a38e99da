"""Job metrics and parameters.

Parity: /root/reference/src/datachain/query/metrics.py:1-25 (driver-side
metric dict surfaced to the job record) and query/params.py:7-26 (params from
the DATACHAIN_PARAMS-style env JSON).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Union

_metrics: dict[str, Union[str, int, float, bool]] = {}


def metrics_set(key: str, value: Union[str, int, float, bool]) -> None:
    """query/metrics.py — record a scalar job metric."""
    if not isinstance(key, str) or not key:
        raise TypeError("metric key must be a non-empty string")
    if not isinstance(value, (str, int, float, bool)):
        raise TypeError("metric value must be a scalar")
    _metrics[key] = value


def metrics_get(key: Optional[str] = None):
    return _metrics.copy() if key is None else _metrics[key]


def param(name: str, default: Any = None) -> Any:
    """query/params.py — job parameter from the params env JSON, falling back
    to a plain env var, then the default."""
    raw = os.environ.get("DATACHAIN_SPARK_PARAMS")
    if raw:
        try:
            data = json.loads(raw)
            if name in data:
                return data[name]
        except json.JSONDecodeError:
            pass
    if name in os.environ:
        return os.environ[name]
    return default


class DataChainError(Exception):
    """Base error. Parity: lib/utils.py DataChainError."""


class FileError(DataChainError):
    """File-related error carrying source+path context.
    Parity: lib/file.py FileError."""

    def __init__(self, message: str, source: str = "", path: str = ""):
        self.source, self.path = source, path
        ctx = f" (source={source!r}, path={path!r})" if source or path else ""
        super().__init__(message + ctx)


class _Metrics:
    """Namespace object matching the reference's `datachain.metrics`
    (query/metrics.py): metrics.set(k, v) / metrics.get([k])."""

    set = staticmethod(metrics_set)
    get = staticmethod(metrics_get)


metrics = _Metrics()
