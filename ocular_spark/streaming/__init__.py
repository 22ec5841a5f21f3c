"""Streaming-analog surface.

The reference is pure batch (SURVEY.md §2.8); its incremental-update
and resume semantics map to driver-orchestrated micro-batches with
checkpoints, not Structured Streaming:

  * incremental model updates -> ocular_spark.em.train_font (per-batch
    decode -> treeAggregate -> M-step -> re-broadcast, the foreachBatch
    analog),
  * resume -> em.find_last_complete_iteration checkpoints +
    pipeline.transcribe(skip_already_transcribed=...) anti-join.
"""

from ocular_spark.em import find_last_complete_iteration, train_font  # noqa: F401

# genuine Structured Streaming jobs (added r3): incremental
# transcription with checkpoint resume + native session windows
from ocular_spark.streaming.jobs import (  # noqa: F401
    sessionize_stream,
    transcribe_pages_stream,
)
