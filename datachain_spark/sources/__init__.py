from .readers import (
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
    read_values,
)
from .storage import read_storage
from .warc import read_warc

__all__ = [
    "read_values", "read_records", "read_pandas", "read_parquet", "read_csv",
    "read_json", "read_dataset", "read_database", "read_hf", "read_storage",
    "read_orc", "read_avro", "read_text",
    "read_warc",
    "datasets", "listings", "delete_dataset", "move_dataset", "compact_dataset", "vacuum_dataset",
    "export_dataset_table",
]
