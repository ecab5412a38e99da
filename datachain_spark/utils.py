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
