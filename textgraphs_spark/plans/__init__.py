"""End-to-end pipelines: stage-checkpointed, lineage-tracked plans."""
