"""Lineage manifests + checkpoint/resume state."""
