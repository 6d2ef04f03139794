#!/usr/bin/env python
"""Cross-engine margin probe for the quality_hist card section (r14).

The q57 ``card_merge`` oracle recomputes the merged quality-score
histogram in DuckDB, so every document must land in the SAME fixed bin
in both engines.  The score is per-row scalar IEEE math over integer
counts (no aggregation order), so bit-identity is expected — this
probe proves it at every SF and reports the worst-case distance from
any score to its bin edge (the margin a last-ulp divergence would
need to cross to flip a bin).

Run:  python tools/probe_quality_hist_margins.py
Exits non-zero on any per-doc bin mismatch.
"""
from __future__ import annotations

import math
import os
import sys

import duckdb
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdataproject_formula1_telemetry_spark.operators import text as T
from bigdataproject_formula1_telemetry_spark.plans.pipelines import (
    _QUALITY_HIST_BINS,
    _quality_bin,
)

ORACLE_Q = """
SELECT doc_id,
  CAST(least(floor(q * 100), 99) AS INT) AS b, q
FROM (
  SELECT doc_id,
    ((least(CAST(len(toks) AS DOUBLE) / 20.0, 1.0)
      + (1.0 - least(CASE WHEN length(text) > 0
           THEN CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                     AS DOUBLE)
                / CAST(length(text) AS DOUBLE) * 5.0
           ELSE 0.0 END, 1.0)))
     + least(CASE WHEN len(toks) > 0
         THEN CAST(len(list_filter(lower_toks,
                w -> list_contains(['the','and','of','to','is'], w)))
              AS DOUBLE) / CAST(len(toks) AS DOUBLE) * 10.0
         ELSE 0.0 END, 1.0)) / 3.0 AS q
  FROM (
    SELECT doc_id, text,
      list_filter(regexp_split_to_array(trim(text), '\\s+'),
                  x -> x <> '') AS toks,
      list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                  x -> x <> '') AS lower_toks
    FROM read_parquet('{path}')
    WHERE text IS NOT NULL
  )
)
"""


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    rc = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = f"/root/testdata/{sf}/documents.parquet"
        docs = spark.read.parquet(path)
        srows = (
            docs.where(F.col("text").isNotNull() & (F.length("text") > 0))
            .select(
                "doc_id",
                _quality_bin(F.col("text")).alias("b"),
                T.quality_score(F.col("text")).alias("q"),
            )
            .collect()
        )
        sbin = {r["doc_id"]: (r["b"], r["q"]) for r in srows}
        orows = duckdb.sql(ORACLE_Q.format(path=path)).fetchall()
        obin = {r[0]: (r[1], r[2]) for r in orows}
        assert set(sbin) == set(obin), f"{sf}: doc set mismatch"
        n_bin_mism = sum(
            1 for k in sbin if sbin[k][0] != obin[k][0]
        )
        max_q_delta = max(
            abs(sbin[k][1] - obin[k][1]) for k in sbin
        )
        # margin: distance from q*bins to the nearest integer edge
        margins = [
            min(
                math.fmod(sbin[k][1] * _QUALITY_HIST_BINS, 1.0),
                1.0 - math.fmod(sbin[k][1] * _QUALITY_HIST_BINS, 1.0),
            )
            for k in sbin
            if sbin[k][1] * _QUALITY_HIST_BINS
            < _QUALITY_HIST_BINS  # clamped top bin has no upper edge
        ]
        print(
            f"{sf}: docs={len(sbin)} bin_mismatches={n_bin_mism} "
            f"max|q_spark-q_duck|={max_q_delta:.3e} "
            f"min_edge_margin={min(margins):.3e}"
        )
        if n_bin_mism or max_q_delta != 0.0:
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
