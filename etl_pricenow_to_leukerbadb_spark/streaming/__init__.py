from .jobs import stream_upsert_job, windowed_event_counts  # noqa: F401
