from .jobs import (
    read_documents_stream,
    read_events_stream,
    run_to_memory_sink,
    stream_quality_gate,
    stream_dedup_within_watermark,
    stream_session_agg,
    stream_sliding_agg,
    stream_static_enrich,
    stream_stream_join,
    stream_tumbling_agg,
)

__all__ = [
    "read_documents_stream",
    "read_events_stream",
    "run_to_memory_sink",
    "stream_quality_gate",
    "stream_dedup_within_watermark",
    "stream_session_agg",
    "stream_sliding_agg",
    "stream_static_enrich",
    "stream_stream_join",
    "stream_tumbling_agg",
]
