"""Table IO: partitioned parquet read/write + schema-drift normalization.

Replaces the reference's hand-built hive layout (``os.makedirs`` + path
f-strings, F1_Data_PreProcessing.ipynb:134-139) and path-constructed
partition reads (F1_web_dashboard_app.py:110-113) with native Spark
``partitionBy`` writes and Catalyst partition pruning (SURVEY §2.1 S9-S12,
§4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from bigdataproject_formula1_telemetry_spark import schemas

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _events_ts_is_nanos(path: str) -> bool:
    """True when the parquet ``ts`` column is TIMESTAMP(NANOS) — illegal
    for Spark's reader, so it needs the long+convert path.  Footer-only
    check (pyarrow), cached per path."""
    if path in _NANOS_CACHE:
        return _NANOS_CACHE[path]
    try:
        import pyarrow.dataset as pads

        schema = pads.dataset(path, format="parquet").schema
        is_nanos = str(schema.field("ts").type) == "timestamp[ns]"
    except Exception as exc:
        # conservative: the driver testdata is nanos.  Log the fallback —
        # it also fires when pyarrow itself is broken, which would
        # otherwise be invisible in the field (only symptom: every ts
        # column silently takes the long+convert path).
        import logging

        logging.getLogger(__name__).warning(
            "parquet footer probe failed for %s (%s); assuming "
            "TIMESTAMP(NANOS) and using the long+convert read path",
            path,
            exc,
        )
        is_nanos = True
    _NANOS_CACHE[path] = is_nanos
    return is_nanos


_NANOS_CACHE: dict[str, bool] = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-generated testdata table with its declared schema.

    The explicit schema skips parquet footer-based inference on the driver
    (SURVEY §1.3 decision: no inference in production paths).

    ``events.ts`` is parquet TIMESTAMP(NANOS) — illegal for Spark's reader —
    so it comes in as long (``nanosAsLong``) and is converted to a µs
    timestamp here with exact integer math (``div 1000``; the testdata has
    no sub-µs components, verified, so this is lossless and matches what
    DuckDB sees).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events" and _events_ts_is_nanos(path):
        phys = StructType(
            [
                StructField("ts", LongType(), True)
                if f.name == "ts"
                else f
                for f in schemas.EVENTS.fields
            ]
        )
        df = spark.read.schema(phys).parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    schema = schemas.TESTDATA_SCHEMAS.get(name)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None) -> None:
    """Expose the testdata tables as temp views so the full Spark SQL
    surface (``spark.sql``) works against them — the engine is usable
    from SQL strings as well as the DataFrame API."""
    for n in names or tuple(schemas.TESTDATA_SCHEMAS):
        read_table(spark, sf_dir, n).createOrReplaceTempView(n)


def write_partitioned(
    df: DataFrame,
    root: str,
    partition_cols: tuple[str, ...] = ("Year", "Round"),
    mode: str = "overwrite",
) -> None:
    """S9: hive-partitioned snappy parquet write.

    With ``partitionOverwriteMode=dynamic`` (set in the session factory),
    ``mode="overwrite"`` replaces only the partitions present in ``df`` —
    the exact semantics of the reference's delete-then-insert re-ingest
    (F1_Data_Collect.ipynb:122) without a full-table rewrite.
    """
    (
        df.write.mode(mode)
        .partitionBy(*partition_cols)
        .option("compression", "snappy")
        .parquet(root)
    )


def read_partition(
    spark: SparkSession, root: str, **partition_values: object
) -> DataFrame:
    """S11: single-partition read via predicate → Catalyst partition pruning.

    Replaces the reference's manual ``.../year={y}/round={r}/telemetry.parquet``
    path construction; ``.explain`` shows PartitionFilters, so only the
    matching directories are listed/scanned regardless of table size.
    """
    df = spark.read.parquet(root)
    for col_name, val in partition_values.items():
        df = df.where(F.col(col_name) == F.lit(val))
    return df


def normalize_telemetry_columns(df: DataFrame) -> DataFrame:
    """Canonicalize known column-name drift: ``Gear`` → ``nGear``.

    The reference patches this ad hoc at two call sites
    (F1_web_dashboard_app.py:115-116, train_by_circuit.py:133-134); the
    engine absorbs it once at the IO boundary.
    """
    if "Gear" in df.columns and "nGear" not in df.columns:
        df = df.withColumnRenamed("Gear", "nGear")
    return df


def upsert_dim(
    spark: SparkSession,
    new_rows: DataFrame,
    path: str,
    keys: tuple[str, ...],
) -> DataFrame:
    """S4 — dimension upsert (Mongo ``update_one(..., upsert=True)`` on
    race_meta, F1_Data_Collect.ipynb:114-118) without a table format:
    read-modify-overwrite with new rows winning per key.

    Small-dim only (race_meta is 149 rows): the whole table rewrites,
    which is exactly what a dim of this size wants.  For large upserts,
    use partition-level dynamic overwrite (write_partitioned) or a table
    format with MERGE."""
    from pyspark.errors import AnalysisException

    try:
        existing = spark.read.parquet(path)
    except AnalysisException as e:
        # only a *missing* table falls back to insert-all; schema drift or
        # any other analysis error must propagate rather than silently
        # discarding the existing dimension rows
        if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
            raise
        deduped = new_rows
    else:
        merged = new_rows.withColumn("__prio", F.lit(0)).unionByName(
            existing.withColumn("__prio", F.lit(1)), allowMissingColumns=True
        )
        from pyspark.sql import Window as _W

        w = _W.partitionBy(*keys).orderBy(F.col("__prio").asc())
        deduped = (
            merged.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", "__prio")
        )
    pdf = deduped.toPandas()  # small dim by contract; breaks read-write cycle
    out = spark.createDataFrame(pdf, schema=deduped.schema)
    out.write.mode("overwrite").parquet(path)
    return out


def existing_partitions(
    spark: SparkSession, root: str, partition_cols: tuple[str, ...]
) -> set[tuple]:
    """Distinct partition tuples already materialized under ``root``.

    Driver-side planner input for incremental ingest (mirrors the
    skip-if-already-collected check at F1_Data_Collect.ipynb:98).  Listing
    partition values is metadata-only — Spark reads directory names, not data.

    Only a *missing* root maps to "no partitions yet"; any other failure
    (permissions, corrupt footers, transient FS errors) propagates — a
    swallowed error here would silently re-plan a full re-ingest.
    """
    from pyspark.errors import AnalysisException

    try:
        rows = (
            spark.read.parquet(root)
            .select(*partition_cols)
            .distinct()
            .collect()
        )
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
            raise
        return set()
    return {tuple(r[c] for c in partition_cols) for r in rows}


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    n_buckets: int = 32,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """Write a catalog table bucketed (and optionally sorted) on the join
    keys — the co-located-join primitive at 100 TB: two tables bucketed
    the same way join with ZERO exchange (and zero sort when
    ``sort_cols`` match), because every bucket pair is already
    co-partitioned on disk.  The classic use: bucket the giant fact table
    once at ingest, then every subsequent join/agg on that key skips its
    shuffle (asserted by ``tests/test_plan_quality.py``).

    Bucketed tables need the session catalog (``saveAsTable``) — plain
    ``.parquet(path)`` writes can't carry bucket metadata.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed catalog table (bucket metadata intact, so joins and
    aggregations on the bucket keys skip their exchange)."""
    return spark.table(table)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Schema-PINNED JSONL corpus reader with a dead-letter contract —
    the interchange format LLM corpora actually ship in (Dolma,
    RedPajama, FineWeb releases are all JSONL shards).

    - The schema is REQUIRED: inference is a whole extra pass at corpus
      scale and drifts nondeterministically across shards (a field null
      in one shard types differently in another).
    - Malformed lines become ROWS with ``corrupt_col`` carrying the raw
      line and every schema field null (PERMISSIVE +
      columnNameOfCorruptRecord) — never a crash, never a silent drop;
      ``where(col(corrupt_col).isNotNull())`` is the dead-letter audit.
    - ``.gz`` shards decompress transparently but are NOT splittable —
      parallelism is shard-count, like the WARC reader; release
      many-shard corpora (the JSONL convention anyway).

    Implementation note: parsed via ``text scan → from_json`` (same
    Jackson parser, same PERMISSIVE semantics) instead of
    ``spark.read.json``, because the native reader's internal corrupt
    column refuses corrupt-only queries
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    dead-letter audit is precisely such a query.  This form keeps every
    column, including the dead-letter one, freely queryable."""
    if corrupt_col in schema.names:
        raise ValueError(
            f"corrupt_col {corrupt_col!r} collides with a schema field"
        )
    from pyspark.sql.types import StringType as _Str

    full = StructType(
        list(schema.fields) + [StructField(corrupt_col, _Str(), True)]
    )
    raw = spark.read.text(path)
    parsed = raw.select(
        F.from_json(
            F.col("value"),
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ).alias("__j"),
        "value",
    )
    cols = [F.col(f"__j.{f.name}").alias(f.name) for f in schema.fields]
    # from_json yields a NULL struct for hopeless lines (vs the native
    # reader's corrupt-field row) — coalesce both shapes onto the raw
    # line so every malformed input surfaces one dead-letter row
    return parsed.select(
        *cols,
        F.when(F.col("__j").isNull(), F.col("value"))
        .otherwise(F.col(f"__j.{corrupt_col}"))
        .alias(corrupt_col),
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    n_shards: int | None = None,
    compress: bool = True,
    mode: str = "overwrite",
) -> None:
    """JSONL shard writer: optional exact shard count (a release wants
    a predictable layout), gzip per shard by default (the distribution
    convention — parallelism across shards, not within)."""
    out = df.repartition(n_shards) if n_shards else df
    w = out.write.mode(mode)
    if compress:
        w = w.option("compression", "gzip")
    w.json(path)
