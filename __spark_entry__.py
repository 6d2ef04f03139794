"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2
(registry in bigdataproject_formula1_telemetry_spark/plans/queries.py).
``oracle_sql()`` — DuckDB-equivalent SQL per query; queries without an
entry are non-SQL-expressible (hash-function-specific) and get the
driver's rows-only check.

Session side effect (contract): running ``entry`` or any ``queries()``
callable pins ``spark.sql.session.timeZone`` to UTC on the caller's
session, and the setting persists afterwards — event-time results must
align with the DuckDB oracle regardless of host timezone.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from bigdataproject_formula1_telemetry_spark.plans import queries as Q

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
_shipped: set[int] = set()


def _ensure_package_shipped(spark: SparkSession) -> None:
    """Python-UDF queries (applyInPandas / mapInPandas / pandas_udf)
    deserialize on executor workers, which must be able to import the
    engine package.  When the driver process was launched from a foreign
    cwd (the grading harness loads this file by path), workers have no
    /root/repo on sys.path — ship the package as a zip via addPyFile,
    which distributes it and prepends it to every worker's sys.path."""
    key = id(spark.sparkContext)
    if key in _shipped:
        return
    import shutil
    import tempfile

    zip_base = os.path.join(
        tempfile.gettempdir(), f"bdp_f1_spark_pkg_{os.getpid()}"
    )
    zip_path = zip_base + ".zip"
    if not os.path.exists(zip_path):
        tmp = shutil.make_archive(
            zip_base,
            "zip",
            root_dir=_REPO_ROOT,
            base_dir="bigdataproject_formula1_telemetry_spark",
        )
        assert tmp == zip_path
    spark.sparkContext.addPyFile(zip_path)
    _shipped.add(key)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_package_shipped(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_package_shipped(spark)
    return Q.q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in Q.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
