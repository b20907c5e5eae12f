from .stream_events import (  # noqa: F401
    stream_events,
    stream_sessionize,
    stream_tumbling_counts,
)
from .stream_dedup import (  # noqa: F401
    apply_dedup_batch,
    stream_dedup,
)
from .stream_pipeline import stream_reassemble, stream_rejects  # noqa: F401
