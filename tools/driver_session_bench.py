#!/usr/bin/env python
"""Driver-session-SHAPED bench protocol (VERDICT r10 item 1).

The grading driver measures every bench entry inside ONE long session:
it first runs the 50-query correctness pass (Spark at sf0.01 collected
to pandas, plus the DuckDB oracle for every query in the SAME python
process), then runs the full bench — so entry N is timed after 50
query builds + collects, 50 DuckDB executions, and N-1 bench builds
have aged the JVM (JIT/code-cache state, GC history, executor memory
occupancy) and the python heap (Arrow buffers, pandas frames, duckdb).

Every SCALING.md band before round 11 was probed driver-ALONE, and in
round 10 the two shapes diverged hard (q55 2.155 s vs alone-probe
1.23-1.33; q54 +68%; curation +79%).  This harness reproduces the
driver's session shape so bands are pinned under the distribution that
actually grades us:

    python tools/driver_session_bench.py          # one full session
    for i in 1 2 3; do python tools/driver_session_bench.py; done

Prints the same ONE bench JSON line as bench.py (tagged
"driver_shape": true), after a "correctness_pass_sec" stderr note.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def correctness_pass(sf_dir: str) -> float:
    """The driver's 50-query pass: Spark result AND DuckDB oracle per
    query, both materialized in this process (row/schema/hash compare
    elided — the aging comes from executing, not comparing)."""
    import duckdb

    from bigdataproject_formula1_telemetry_spark import get_spark
    from bigdataproject_formula1_telemetry_spark.plans import queries as Q

    spark = get_spark(app_name="bench")  # the SAME session bench reuses
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    t0 = time.perf_counter()
    for name, fn in Q.QUERIES.items():
        fn(spark, sf_dir).toPandas()
        if name in Q.ORACLES:
            con.execute(Q.ORACLES[name]).fetchdf()
    return time.perf_counter() - t0


def main() -> None:
    corr_sf = os.environ.get("SPARK_GRAFT_CORR_SF_DIR", "/root/testdata/sf0.01")
    sec = correctness_pass(corr_sf)
    print(f"correctness_pass_sec={sec:.1f} sf_dir={corr_sf}", file=sys.stderr)

    # the bench runs in the SAME process and JVM (get_spark getOrCreate
    # returns the session the correctness pass created)
    import json

    import bench

    emitted: list[str] = []
    real_print = print

    def capture(*a, **k):
        if a and isinstance(a[0], str) and a[0].startswith("{"):
            emitted.append(a[0])
        real_print(*a, **k)

    bench.print = capture  # type: ignore[attr-defined]
    try:
        bench.main()
    finally:
        bench.print = real_print  # type: ignore[attr-defined]
    if emitted:
        d = json.loads(emitted[-1])
        d["driver_shape"] = True
        d["correctness_pass_sec"] = round(sec, 1)
        real_print("DRIVER_SHAPE " + json.dumps(d), file=sys.stderr)


if __name__ == "__main__":
    main()
