"""Plan-level compositions: the serving pipeline and lineage metrics
(the repo's logical plans are declarative DataFrame graphs built in
pipeline.py; Catalyst owns physical planning — see README scale notes)."""

from ocular_spark.pipeline import ModelBundle, decode_metrics, transcribe  # noqa: F401
