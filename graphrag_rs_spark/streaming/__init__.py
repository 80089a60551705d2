"""Incremental / streaming ingestion.

The reference has NO streaming engine (SURVEY.md §2.6: its
"StreamingImporter" is line-buffered file ingest and "incremental" is
micro-batch upsert with rollback, graph/incremental.rs). The honest Spark
mapping is therefore batch + merge-style upsert (incremental.py), plus an
optional Structured Streaming wrapper for transcript arrival
(stream_pipeline.py) for deployments that want continuous builds.
"""
