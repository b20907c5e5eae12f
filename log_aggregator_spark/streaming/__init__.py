from .stream_events import (  # noqa: F401
    stream_events,
    stream_sessionize,
    stream_tumbling_counts,
)
from .stream_pipeline import stream_reassemble, stream_rejects  # noqa: F401
