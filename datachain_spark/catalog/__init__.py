from .metastore import DatasetRecord, DatasetVersion, Metastore, parse_version

__all__ = ["Metastore", "DatasetRecord", "DatasetVersion", "parse_version"]
