"""Incremental / idempotent partition refresh (SURVEY §4 "needs engine
logic"): the reference skips rounds already collected
(``count_documents > 10000``, F1_Data_Collect.ipynb:98) and re-ingests a
round by delete-then-insert (:122).  Engine equivalents:

- ``plan_refresh`` — driver-side planner: which (partition) tuples are
  missing / incomplete vs a wanted list (metadata-only directory listing,
  no data scan).
- ``refresh_partitions`` — dynamic partition overwrite of exactly the
  planned partitions (the delete-then-insert, transactional per
  partition).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark import io


def plan_refresh(
    spark: SparkSession,
    root: str,
    partition_cols: Sequence[str],
    wanted: Sequence[tuple],
    min_rows: int | None = None,
) -> list[tuple]:
    """Partitions to (re)build: wanted minus existing.  With ``min_rows``,
    existing-but-undersized partitions are also replanned (the
    reference's >10000-docs completeness heuristic)."""
    partition_cols = list(partition_cols)
    existing = io.existing_partitions(spark, root, tuple(partition_cols))
    todo = [t for t in wanted if t not in existing]
    if min_rows is not None and existing:
        counts = (
            spark.read.parquet(root)
            .groupBy(*partition_cols)
            .count()
            .collect()
        )
        undersized = {
            tuple(r[c] for c in partition_cols)
            for r in counts
            if r["count"] < min_rows
        }
        todo += [t for t in wanted if t in undersized]
    return sorted(set(todo))


def refresh_partitions(
    build_fn: Callable[[list[tuple]], DataFrame],
    todo: list[tuple],
    root: str,
    partition_cols: Sequence[str],
) -> int:
    """Build and dynamically overwrite exactly ``todo``.  ``build_fn``
    receives the partition tuples and returns their rows; with
    ``partitionOverwriteMode=dynamic`` only those directories are
    replaced — other partitions untouched (idempotent re-runs)."""
    if not todo:
        return 0
    df = build_fn(todo)
    io.write_partitioned(df, root, tuple(partition_cols), mode="overwrite")
    return len(todo)
