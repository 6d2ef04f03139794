"""Report + artifact sinks (SURVEY §2.1 S15/S16).

The reference writes Plotly HTML / matplotlib PNG reports
(F1_Data_Test.ipynb:388-389) and pickled/h5 model artifacts
(train_by_circuit.py:198-199).  Engine equivalents:

- ``write_html_report`` — driver-side render of a *small aggregate*
  DataFrame to a static HTML table (no plotting libs needed).  Guarded by
  a row cap: report sinks are for query results, never raw data.
- ``write_model_artifacts`` / ``read_model_artifacts`` — model tables
  (the ml.py artifact rows) persisted as parquet, replacing per-circuit
  .h5/.pkl files; safe-name keys mirror the reference's filename
  sanitization (re.sub at train_by_circuit.py:194).
"""

from __future__ import annotations

import html
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_REPORT_ROWS = 10_000


def write_html_report(df: DataFrame, path: str, title: str = "report") -> int:
    """Render an aggregate DataFrame as a static HTML table.  Caps at
    ``MAX_REPORT_ROWS`` — the sink collects, so it is only for already-
    reduced results (the reference's plot-cap idea, F1_Data_Test.ipynb:80)."""
    rows = df.limit(MAX_REPORT_ROWS + 1).collect()
    if len(rows) > MAX_REPORT_ROWS:
        raise ValueError(
            f"report sink got more than {MAX_REPORT_ROWS} rows — aggregate first"
        )
    cols = df.columns
    head = "".join(f"<th>{html.escape(c)}</th>" for c in cols)
    body = "".join(
        "<tr>" + "".join(f"<td>{html.escape(str(r[c]))}</td>" for c in cols) + "</tr>"
        for r in rows
    )
    doc = (
        f"<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{html.escape(title)}</title></head><body>"
        f"<h1>{html.escape(title)}</h1>"
        f"<table border='1'><thead><tr>{head}</tr></thead>"
        f"<tbody>{body}</tbody></table></body></html>"
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(doc)
    return len(rows)


def safe_name(name: str) -> str:
    """Filename-safe key (re.sub(r'[^A-Za-z0-9]', '', ...) at
    train_by_circuit.py:194) as a column-friendly helper."""
    import re

    return re.sub(r"[^A-Za-z0-9]", "", name)


def write_model_artifacts(models: DataFrame, path: str) -> None:
    """Persist a model-artifact table (ml.train_* output) as parquet —
    the engine's replacement for per-circuit .h5/.pkl files."""
    models.write.mode("overwrite").parquet(path)


def read_model_artifacts(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
