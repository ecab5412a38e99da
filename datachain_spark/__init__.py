"""datachain_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of iterative/datachain (reference snapshot at
/root/reference, 2025-11-14), re-expressed Spark-first: the DataFrame is the
plan, Catalyst/AQE is the optimizer, Pandas-UDF primitives are the Python
escape hatch, and versioned datasets live on parquet/Delta-style storage.

Public API parity: /root/reference/src/datachain/__init__.py and
/root/reference/src/datachain/lib/dc/__init__.py.
"""

import sys as _sys

from . import functions as func

_sys.modules[__name__ + ".func"] = func

from .chain import DataChain, DatasetMergeError, DatasetPrepareError
from .columns import C, Col

# Drop-in parity: the reference exports `Column` (its SQLAlchemy column ref)
# next to `C`; ours is the same object as Col.
Column = Col


def column(name: str) -> Col:
    """Column reference helper. Parity: datachain.py:266-287 column()/c()."""
    return C(name)


c = column
from .session import Session
from .sources import (
    datasets,
    delete_dataset,
    export_dataset_table,
    listings,
    compact_dataset,
    vacuum_dataset,
    move_dataset,
    read_csv,
    read_database,
    read_dataset,
    read_hf,
    read_json,
    read_orc,
    read_avro,
    read_text,
    read_pandas,
    read_parquet,
    read_records,
    read_storage,
    read_values,
    read_warc,
)
from .card import dataset_card
from .lineage import refresh_downstream, register_pipeline, stale_datasets
from .ops.diff import dataset_diff
from .schema import DataModel, DataType, ModelStore, Sys, is_chain_type
from .sources.files import (
    ArrowRow,
    Audio,
    AudioFile,
    AudioFragment,
    File,
    Image,
    ImageFile,
    TarVFile,
    TextFile,
    Video,
    VideoFile,
    VideoFragment,
    VideoFrame,
)
from .sources.readers import create_project, delete_namespace
from .udf import AbstractUDF, Aggregator, BatchMapper, Generator, Mapper
from .utils import DataChainError, FileError, metrics, param


def is_studio() -> bool:
    """Always False: the reference's flag for running inside its hosted
    SaaS. This engine has no such service; exported so `from datachain
    import is_studio` code paths port unchanged."""
    return False

# Deprecated constructor aliases kept for drop-in compatibility with the
# reference's from_* names (datachain deprecated them in favor of read_*;
# see /root/reference/src/datachain/lib/dc/__init__.py).
from_csv = read_csv
from_dataset = read_dataset
from_hf = read_hf
from_json = read_json
from_pandas = read_pandas
from_parquet = read_parquet
from_records = read_records
from_storage = read_storage
from_values = read_values

__version__ = "0.1.0"

__all__ = [
    "C", "Col", "Column", "DataChain", "DatasetMergeError",
    "DatasetPrepareError", "Session", "Sys",
    "read_values", "read_records", "read_pandas", "read_parquet", "read_csv",
    "read_json", "read_dataset", "read_database", "read_hf", "read_storage",
    "read_warc", "read_orc", "read_avro", "read_text",
    "from_values", "from_records", "from_pandas", "from_parquet", "from_csv",
    "from_json", "from_dataset", "from_hf", "from_storage",
    "datasets", "listings", "delete_dataset", "move_dataset", "compact_dataset", "vacuum_dataset", "dataset_card",
    "export_dataset_table", "dataset_diff",
    "register_pipeline", "refresh_downstream", "stale_datasets",
    "create_project", "delete_namespace",
    "Mapper", "Generator", "Aggregator", "BatchMapper", "AbstractUDF",
    "column", "c", "func",
    "DataModel", "DataType", "ModelStore", "is_chain_type",
    "File", "TextFile", "ImageFile", "VideoFile", "AudioFile", "TarVFile",
    "Image", "Video", "Audio", "ArrowRow",
    "AudioFragment", "VideoFrame", "VideoFragment",
    "DataChainError", "FileError", "metrics", "param", "is_studio",
]
