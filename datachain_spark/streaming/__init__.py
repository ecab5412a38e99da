from .stream import (
    read_stream,
    sessionize_stream,
    stream_to_dataset,
    windowed_agg,
)

__all__ = ["read_stream", "windowed_agg", "sessionize_stream", "stream_to_dataset"]
