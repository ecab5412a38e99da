from .inspect import (
    explain_summary,
    join_strategies,
    lint_plan,
    pushed_filters,
    scan_read_schemas,
    shuffle_count,
)

__all__ = [
    "explain_summary", "pushed_filters", "scan_read_schemas",
    "join_strategies", "shuffle_count", "lint_plan",
]
