#!/usr/bin/env python
"""Adjudicate q54's normalized out-of-band driver reading (r14).

Under the r14 canary-normalized instrument (tools/normalize_bench.py)
the r13 driver run's q55 reading is fully explained by the machine
mode, but q54 stays +14% above its normalized band — entry-specific
inflation the shared mode does not explain.  This probe times q54's
two legs under each `_barrier` storage backend, min/med/max of 5
barrier-cold runs each, on a quiet box:

    near  persist  min=1.435 med=1.911 max=2.631   (1.83x spread)
    near  memory   min=1.340 med=1.361 max=1.387   (1.04x spread)
    near  none     min=1.639 med=1.703 max=2.046
    sem   persist  min=1.215 med=1.296 max=1.336
    sem   memory   min=1.118 med=1.164 max=1.212
    sem   none     min=1.604 med=1.743 max=1.931

Verdict: the persist(DISK_ONLY) lineage barrier on the banded frame is
the variance source — a block-manager disk write+read round trip whose
latency tracks machine state, 1.8x spread WITHIN one quiet session
(and worse under the driver's aged/contended shape).  MEMORY_AND_DISK
is faster AND tight (blocks stay in executor memory at this scale,
spill to disk only under pressure — same lineage semantics), and
"none" confirms the barrier itself is still load-bearing (CollapseProject
re-inlines the bucketing into both self-join sides).  q54 therefore
passes storage="memory" to both legs; the repo-wide `_barrier` default
stays DISK_ONLY (the documented 100 TB spill-safety trade-off for the
wide text pipelines, whose entries sit mid-band).

Run on a QUIET box (no concurrent Spark): python tools/probe_q54_storage.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import numpy as np

    from bigdataproject_formula1_telemetry_spark import get_spark, io
    from bigdataproject_formula1_telemetry_spark.operators import (
        dedup as dd,
        semdedup as SD,
        similarity as sim,
    )
    from bigdataproject_formula1_telemetry_spark.plans import queries as Q

    spark = get_spark(app_name="probe54")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    emb = io.read_table(spark, sf, "embeddings")
    rng = np.random.default_rng(7)
    planes = [
        [[float(x) for x in rng.standard_normal(64)] for _ in range(8)]
        for _ in range(4)
    ]

    def leg_near(storage):
        return sim.near_dedup_cosine(
            emb, planes, threshold=0.95, storage=storage
        )

    def leg_sem(storage):
        return SD.semantic_dedup(
            emb, Q._Q54_CENTS, threshold=0.2, keep="min_id", storage=storage
        )

    for label, fn in [("near", leg_near), ("sem", leg_sem)]:
        for storage in ("persist", "memory", "none"):
            fn(storage).write.format("noop").mode("overwrite").save()
            dd.release_barriers()
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                fn(storage).write.format("noop").mode("overwrite").save()
                ts.append(time.perf_counter() - t0)
                dd.release_barriers()
            print(
                f"{label:5s} {storage:8s} min={min(ts):.3f} "
                f"med={sorted(ts)[2]:.3f} max={max(ts):.3f}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
