from .stream import (
    ann_ingest_stream,
    dedup_against_corpus,
    exact_dedup_stream_to_dataset,
    dedup_stream,
    near_dedup_stream_to_dataset,
    validated_stream_to_dataset,
    read_stream,
    running_counts_stateful,
    sessionize_stream,
    stream_to_dataset,
    windowed_agg,
)

__all__ = [
    "read_stream",
    "ann_ingest_stream",
    "exact_dedup_stream_to_dataset",
    "near_dedup_stream_to_dataset",
    "validated_stream_to_dataset",
    "windowed_agg",
    "sessionize_stream",
    "stream_to_dataset",
    "running_counts_stateful",
    "dedup_stream",
    "dedup_against_corpus",
]
