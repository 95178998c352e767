from kgraph_framework_spark.sources.transcripts import (
    TRANSCRIPTS_FROM_EVENTS_SQL,
    synthesize_transcripts,
    transcripts_from_events,
)

__all__ = [
    "TRANSCRIPTS_FROM_EVENTS_SQL",
    "synthesize_transcripts",
    "transcripts_from_events",
]
