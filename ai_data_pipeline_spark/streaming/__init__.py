from ai_data_pipeline_spark.streaming.pipelines import (
    dedup_stream,
    jsonl_stream_sink,
    read_documents_stream,
    read_events_stream,
    read_jsonl_stream,
    run_to_completion,
    session_event_stats,
    sliding_event_counts,
    stream_curation_pipeline,
    stream_qa_pipeline,
    tumbling_event_counts,
)

__all__ = [
    "dedup_stream",
    "jsonl_stream_sink",
    "read_documents_stream",
    "read_events_stream",
    "read_jsonl_stream",
    "run_to_completion",
    "session_event_stats",
    "sliding_event_counts",
    "stream_curation_pipeline",
    "stream_qa_pipeline",
    "tumbling_event_counts",
]
