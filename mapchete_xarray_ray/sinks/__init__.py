"""Sinks: zarr-v2-layout tile archive writer (chunk = tile, resumable)."""
