"""Structured Streaming surface."""

from .incremental import (  # noqa: F401
    incremental_extraction_dedup_to_sink,
    incremental_extraction_stream,
    incremental_extraction_to_sink,
    streaming_dedup_within_watermark,
    streaming_sessions,
    windowed_event_counts,
)
from .stateful import stateful_user_totals  # noqa: F401
