"""End-to-end pipelines (flagship index+query, relational showcase)."""
