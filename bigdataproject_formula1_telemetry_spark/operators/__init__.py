"""Operator library — SURVEY.md §2 re-expressed as Spark DataFrame recipes."""
