"""SparkSession factory.

The reference parallelizes with a hand-rolled ``ProcessPoolExecutor``
(F1_Data_PreProcessing.ipynb:170-174) and relies on MongoDB to push work
server-side.  Here a single tuned SparkSession replaces all of that: AQE
picks shuffle-partition counts and join strategies at runtime, dynamic
partition overwrite reproduces the reference's delete-then-insert idempotent
re-ingest (F1_Data_Collect.ipynb:122), and Arrow keeps any pandas-UDF
boundary vectorized.

Scale notes (100 TB / 1000-executor design):
- ``spark.sql.shuffle.partitions`` is only an initial value; AQE coalescing
  re-plans it per stage.  On a real cluster raise via SPARK_GRAFT_SHUFFLE.
- ``maxPartitionBytes`` 128m keeps scan tasks memory-bounded regardless of
  input size.
- Session timezone pinned to UTC so event-time semantics are deterministic
  across engines (and vs. the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # Adaptive execution: runtime re-planning, skew-join splitting, partition
    # coalescing — the scale story for every shuffle in this engine.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas-UDF / toPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Reference writes snappy parquet (F1_Data_PreProcessing.ipynb:139).
    "spark.sql.parquet.compression.codec": "snappy",
    # Write timestamps as INT64 micros, not legacy INT96 — round-trippable
    # by every reader (incl. our own explicit-schema read paths).
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # Idempotent per-partition re-ingest (SURVEY §2.1 S5).
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Deterministic event-time across Spark and the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Null-propagating semantics (Spark ≤3 default): the reference's pandas
    # pipelines never hard-fail on div-by-zero / bad casts, they produce
    # NaN/None (e.g. the fillna-heavy cleanup at
    # F1_Data_PreProcessing.ipynb:58-61).  Spark 4 flips ANSI on by default;
    # we flip it back so operators degrade to NULL like the reference.
    "spark.sql.ansi.enabled": "false",
    # Bounded scan tasks at any input scale.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Parquet TIMESTAMP(NANOS) columns (events.ts) are otherwise an illegal
    # type for Spark; read them as long and convert at the IO boundary
    # (io.read_table), losslessly — the testdata has µs resolution.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Quieter local runs; harmless on a cluster.
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(
    app_name: str = "bigdataproject-f1-telemetry-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``) when
    no cluster master is configured — on a real deployment the master comes
    from spark-submit and this argument stays ``None``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = SparkSession.builder.appName(app_name).master(master)
    # Local mode defaults to a 1g heap — far too small for a local[32]
    # driver that is also the executor.  Only meaningful before JVM
    # launch; on a cluster, spark-submit owns this and the conf is inert.
    builder = builder.config(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    )
    for k, v in _DEFAULTS.items():
        builder = builder.config(k, v)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
