"""Structured Streaming entry points.

The reference has no streaming surface (processing is batch per chunk;
SURVEY.md §2.11) — this package covers the engine-completeness cases a
production corpus pipeline needs: incremental page ingestion and windowed
event aggregation with late-data handling.
"""
