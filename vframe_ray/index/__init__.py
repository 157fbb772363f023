"""Inverted-index build, storage, and query execution."""
