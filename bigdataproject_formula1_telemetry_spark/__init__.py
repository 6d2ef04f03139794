"""PySpark-native analytics engine re-expressing the capabilities of the
reference F1-telemetry big-data pipeline (F3ZLoV/BigDataProject_Formula1_Telemetry)
as an idiomatic Spark DataFrame/SQL/Structured-Streaming engine.

Architecture (see SURVEY.md for the full blueprint):

- ``session``    — SparkSession factory tuned for both local[32] testing and
                   1000-executor-scale defaults (AQE, dynamic partition
                   overwrite, Arrow).
- ``schemas``    — explicit StructType for every table (no inference in
                   production paths; SURVEY §1.3).
- ``io``         — partitioned parquet read/write, partition pruning helpers,
                   schema-drift normalization (Gear→nGear).
- ``operators``  — relational recipes, window/time-series library, the
                   distance-grid resampler (signature operator W8), as-of
                   joins, gaps-and-islands segmentation, dedup / similarity /
                   text analysis for training-data pipelines.
- ``sources``    — binary telemetry packet decoding (S14) and replayable
                   streaming sources.
- ``functions``  — scalar column expression helpers (min-max scaling,
                   compound encoding, advice ladders).
- ``plans``      — batch pipelines (bronze→warehouse→lap dataset) and the
                   incremental partition planner.
- ``streaming``  — stateful latest-value merge, throttled sinks, watermarked
                   event-time windows (T1–T6).
"""

__version__ = "0.1.0"

from bigdataproject_formula1_telemetry_spark.session import get_spark  # noqa: F401
