"""Job/stage counts per bench entry — the slow-mode mechanism probe
(VERDICT r12 item 1).

The r12 driver run was uniformly slower than the four shaped sessions,
but NOT uniformly per entry: computing driver/session-median ratios
from the recorded logs gives q03 3.55x, q01 2.64x, q02 2.63x (the
LIGHTEST pure-JVM entries), q26 2.26x, while the heavy single-pipeline
entries sit at 1.1-1.4x (dsir 1.36x, q49 1.14x, curation 1.11x).  Both
out-of-band entries' plans carry ZERO Python nodes (checked via
executedPlan), so the VERDICT's Python-worker hypothesis is out.  The
inverse-weight pattern instead suggests fixed PER-JOB/PER-STAGE
latency inflation (scheduler/JIT/GC pauses between jobs): entries
whose wall is many short stages inflate most.

This tool measures jobs+stages per entry (job-group bookkeeping via
the status tracker) so the ratio can be checked against
stages-per-second: entries with high stage DENSITY should be the
high-ratio ones.

Usage: python tools/probe_entry_stage_counts.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# r12 driver/session-median inflation ratios (computed from
# BENCH_r12.json vs tools/driver_shape_runs/session_*_r12 logs)
R12_RATIO = {
    "q03_star_join": 3.55,
    "q01_pricing_summary": 2.64,
    "q02_filter_project": 2.63,
    "q26_text_stats": 2.26,
    "q25_dedup_exact": 1.96,
    "q24_tumbling_window": 1.53,
    "dsir_select": 1.36,
    "q30_minhash_near_dedup": 1.16,
    "q54_embedding_near_dedup": 1.30,
    "bm25_topk": 1.17,
    "curation_pipeline": 1.11,
}


def main() -> None:
    from bigdataproject_formula1_telemetry_spark import get_spark, io
    from bigdataproject_formula1_telemetry_spark.operators import (
        dedup as DD,
        dsir as DS,
        retrieval as RT,
    )
    import bigdataproject_formula1_telemetry_spark.plans.queries as Q
    from bigdataproject_formula1_telemetry_spark.plans import pipelines as P

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    docs = io.read_table(spark, SF, "documents").select(
        "doc_id", "lang", "text"
    )
    n_docs = docs.count()
    norm = F.filter(
        F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
        lambda x: x != F.lit(""),
    )
    bm_q = (
        docs.where(F.col("doc_id") % 250 == 1)
        .select("doc_id", norm.alias("__t"))
        .where(F.size("__t") >= 9)
        .select(
            F.concat(F.lit("q"), F.col("doc_id").cast("string")).alias(
                "query_id"
            ),
            F.array_join(F.slice("__t", 4, 6), " ").alias("text"),
        )
        .localCheckpoint(eager=True)
    )

    builds = {
        name: (lambda n=name: Q.QUERIES[n](spark, SF))
        for name in (
            "q01_pricing_summary",
            "q02_filter_project",
            "q03_star_join",
            "q24_tumbling_window",
            "q25_dedup_exact",
            "q26_text_stats",
            "q30_minhash_near_dedup",
            "q54_embedding_near_dedup",
        )
    }
    builds["dsir_select"] = lambda: DS.dsir_select(
        docs, docs.where(F.col("lang") == "en"), k=max(1, n_docs // 5),
        dim=4096, salt="bench-dsir",
    )
    builds["bm25_topk"] = lambda: RT.bm25_topk(
        docs.select("doc_id", "text"), bm_q, k=10
    )
    builds["curation_pipeline"] = lambda: P.curate_documents(
        docs.select("doc_id", "text"), chunk_tokens=512, overlap=64,
        token_budget=4096,
    )

    print(
        "| entry | wall_s | jobs | stages | stages/s | r12 driver/session |"
    )
    print("|---|---|---|---|---|---|")
    for name, build in builds.items():
        build().write.format("noop").mode("overwrite").save()  # warm
        DD.release_barriers()
        group = f"probe-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup("idle", "idle")
        DD.release_barriers()
        jobs = tracker.getJobIdsForGroup(group)
        stages = sum(
            len(tracker.getJobInfo(j).stageIds)
            for j in jobs
            if tracker.getJobInfo(j) is not None
        )
        print(
            f"| {name} | {wall:.3f} | {len(jobs)} | {stages} | "
            f"{stages / wall:.1f} | {R12_RATIO.get(name, float('nan')):.2f} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
