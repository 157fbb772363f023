"""Reusable Ray Data stage functions (Dataset -> Dataset)."""
