"""Public exception hierarchy — parity with the reference's
``datachain.error`` (/root/reference/src/datachain/error.py) so user
``except`` blocks port unchanged. Classes subclass ValueError/RuntimeError
where this engine previously raised those bare, keeping existing callers
working.

Reference classes tied to subsystems this engine replaces outright
(QueryScript*, ClientError, TableMissingError, OutdatedDatabaseSchemaError,
PendingIndexingError — SQLite warehouse / script runner / fsspec clients)
are intentionally absent.
"""

from __future__ import annotations

from .utils import DataChainError, FileError  # noqa: F401  (re-export)


class NotFoundError(ValueError):
    """Base for lookup failures (subclasses ValueError: earlier releases
    raised bare ValueError from the metastore — old except blocks keep
    working)."""


class NamespaceNotFoundError(NotFoundError):
    pass


class ProjectNotFoundError(NotFoundError):
    pass


class DatasetNotFoundError(NotFoundError):
    pass


class DatasetVersionNotFoundError(NotFoundError):
    pass


class DatasetInvalidVersionError(ValueError):
    pass


class InvalidDatasetNameError(ValueError):
    pass


class InvalidNamespaceNameError(ValueError):
    pass


class InvalidProjectNameError(ValueError):
    pass


class CheckpointNotFoundError(NotFoundError):
    pass


class JobNotFoundError(NotFoundError):
    pass


__all__ = [
    "DataChainError",
    "FileError",
    "NotFoundError",
    "NamespaceNotFoundError",
    "ProjectNotFoundError",
    "DatasetNotFoundError",
    "DatasetVersionNotFoundError",
    "DatasetInvalidVersionError",
    "InvalidDatasetNameError",
    "InvalidNamespaceNameError",
    "InvalidProjectNameError",
    "CheckpointNotFoundError",
    "JobNotFoundError",
]
