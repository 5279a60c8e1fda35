"""Structured Streaming surface."""

from .incremental import incremental_extraction_stream, windowed_event_counts  # noqa: F401
from .stateful import stateful_user_totals  # noqa: F401
