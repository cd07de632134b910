from .services_stream import (  # noqa: F401
    EVENTS_STREAM_SCHEMA,
    EVENTS_STREAM_SCHEMA_NS,
    run_to_memory,
    stream_service_parents,
    stream_services_phase1,
    stream_session_windows,
    stream_signals,
    stream_windowed_counts,
)
from .joins import stream_band_join, stream_events_typed  # noqa: F401
