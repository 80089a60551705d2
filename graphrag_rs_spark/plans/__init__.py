"""Pipeline plans: stage orchestration, checkpointing, lineage, resume."""
