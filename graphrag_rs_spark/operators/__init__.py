"""Spark operators — one module per pipeline stage plus the training-data
pipeline extras (dedup, similarity search, text analysis, multimodal)."""
