from .stream_pipeline import stream_reassemble  # noqa: F401
