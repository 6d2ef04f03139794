"""Per-section cost table for the q57 fold host (VERDICT r12 item 4).

q57 (`plans/queries.py q57_report_compose`) is a UNION of section
frames, each tagged with a literal ``section`` column — so filtering
the composed query on one section value pushes ``WHERE section = s``
into every union child and prunes the children whose literal can't
match to empty scans, in Spark AND in DuckDB.  Timing the filtered
query per section therefore measures what each fold family actually
costs inside the driver's correctness pass (both engines), which is
the budget that must stay under the ~130 s patience envelope before
any new fold lands.

Usage: python tools/probe_q57_section_costs.py [sf_dir]
Prints a markdown table (spark_s / oracle_s per section, plus the
unfiltered full-pass walls) for SCALING.md.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import SparkSession, functions as F

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("q57-section-costs")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import bigdataproject_formula1_telemetry_spark.plans.queries as Q

    name = next(k for k in Q.QUERIES if k.startswith("q57"))
    fn = Q.QUERIES[name]
    sql = Q.ORACLES[name]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )

    # full-pass walls first (what the driver pays), warm session
    t0 = time.perf_counter()
    n_rows = fn(spark, SF).count()
    full_spark = time.perf_counter() - t0
    t0 = time.perf_counter()
    con.execute(sql).fetchall()
    full_duck = time.perf_counter() - t0

    sections = sorted(
        r["section"]
        for r in fn(spark, SF).select("section").distinct().collect()
    )
    print(f"{name} @ {SF}: {n_rows} rows, {len(sections)} sections")
    print(
        f"full pass: spark {full_spark:.2f} s, oracle {full_duck:.2f} s "
        f"(driver pays both, plus the compare)"
    )
    print("| section | rows | spark_s | oracle_s |")
    print("|---|---|---|---|")
    tot_s = tot_d = 0.0
    for s in sections:
        t0 = time.perf_counter()
        nr = fn(spark, SF).where(F.col("section") == s).count()
        sp = time.perf_counter() - t0
        t0 = time.perf_counter()
        con.execute(
            f"SELECT * FROM ({sql}) WHERE section = ?", [s]
        ).fetchall()
        dk = time.perf_counter() - t0
        tot_s += sp
        tot_d += dk
        print(f"| {s} | {nr} | {sp:.2f} | {dk:.2f} |")
    print(f"| Σ filtered | — | {tot_s:.2f} | {tot_d:.2f} |")
    print(
        "(Σ filtered > full pass is expected: shared setup — reads, "
        "query-frame derivation — repeats per section; the FULL-pass "
        "walls are the driver budget, the per-section split shows where "
        "it goes.)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
