"""Batch pipelines and the driver-facing query registry."""
