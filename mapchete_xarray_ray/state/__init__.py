"""Durable job state: per-partition lineage records + resume logic."""
