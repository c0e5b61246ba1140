from .tumbling import tumbling_agg, stream_tumbling_agg, read_event_stream  # noqa: F401
