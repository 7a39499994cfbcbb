"""Structured Streaming runtime (SURVEY.md §2.10 [EXT])."""

from etl_pipeline_orchestration_spark.streaming.events_stream import (  # noqa: F401
    EVENTS_STREAM_SCHEMA,
    read_events_stream,
    run_foreach_batch_append,
    run_to_memory,
    session_counts,
    tumbling_counts,
)
from etl_pipeline_orchestration_spark.streaming.upsert import (  # noqa: F401
    stream_upsert_to_warehouse,
    upsert_batch,
)
