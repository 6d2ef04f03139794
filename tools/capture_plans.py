#!/usr/bin/env python
"""Capture .explain("formatted") for declared queries (and the bench's
DataFrame-shaped extension entries) into plans/<tag>/<name>_<suffix>.txt.

Usage:
    python tools/capture_plans.py r14 before            # all 50 registry queries
    python tools/capture_plans.py r14 after q54_embedding_near_dedup q26_text_stats
    python tools/capture_plans.py r14 before --bench    # bench-only entries too

Plan capture is not timing-sensitive; the files are the judge's evidence
for plan-shape claims (Exchange counts, join strategy, PushedFilters,
BatchEvalPython nodes) in OPTIMIZATION_rNN.md.
"""

from __future__ import annotations

import contextlib
import io as _io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _explain_str(df) -> str:
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    rest = sys.argv[3:]
    want_bench = "--bench" in rest
    names = [a for a in rest if not a.startswith("--")]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from bigdataproject_formula1_telemetry_spark import get_spark
    from bigdataproject_formula1_telemetry_spark.plans import queries as Q

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    targets = names or list(Q.QUERIES)
    for name in targets:
        if name not in Q.QUERIES:
            continue
        try:
            txt = _explain_str(Q.QUERIES[name](spark, sf_dir))
        except Exception as exc:  # capture the failure as evidence too
            txt = f"EXPLAIN FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", file=sys.stderr)

    if want_bench or any(n not in Q.QUERIES for n in names):
        bench_targets = _bench_entries(spark, sf_dir)
        for name, df in bench_targets.items():
            if names and name not in names:
                continue
            try:
                txt = _explain_str(df)
            except Exception as exc:
                txt = f"EXPLAIN FAILED: {exc!r}\n"
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"wrote {path} ({len(txt)} bytes)", file=sys.stderr)

    spark.stop()


def _bench_entries(spark, sf_dir):
    """The bench's DataFrame-shaped extension entries (the release-train
    and index-build entries write real artifacts per run and are probed
    by their own tools instead)."""
    from pyspark.sql import functions as F

    from bigdataproject_formula1_telemetry_spark import io
    from bigdataproject_formula1_telemetry_spark.operators import (
        classifier as _clf,
        dsir as _dsir,
        embed as _em,
        retrieval as _rt,
        sampling as _smp,
        semdedup as _sd,
        similarity as sim,
        text as _text,
    )
    from bigdataproject_formula1_telemetry_spark.plans import pipelines

    docs = io.read_table(spark, sf_dir, "documents")
    emb = io.read_table(spark, sf_dir, "embeddings")
    out = {}
    out["curation_pipeline"] = pipelines.curate_documents(docs)
    out["cdc_chunk_documents"] = _text.cdc_chunks(docs, target_tokens=32)

    docs_d = docs.select("doc_id", "lang", "text")
    n_docs = docs_d.count()
    out["dsir_select"] = _dsir.dsir_select(
        docs_d,
        docs_d.where(F.col("lang") == "en"),
        k=max(1, n_docs // 5),
        dim=4096,
        salt="bench-dsir",
    )

    bm_docs = docs.select("doc_id", "text")
    bm_norm = F.filter(
        F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
        lambda x: x != F.lit(""),
    )
    bm_q = (
        bm_docs.where(F.col("doc_id") % 250 == 1)
        .select("doc_id", bm_norm.alias("__t"))
        .where(F.size("__t") >= 9)
        .select(
            F.concat(F.lit("q"), F.col("doc_id").cast("string")).alias(
                "query_id"
            ),
            F.array_join(F.slice("__t", 4, 6), " ").alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    out["bm25_topk"] = _rt.bm25_topk(bm_docs, bm_q, k=10)
    out["hybrid_topk"] = _rt.hybrid_topk(bm_docs, bm_q, k=10)

    semb_train = _em.hashed_embedding(
        _smp.deterministic_sample(docs, ["doc_id"], 0.25, salt="sd-train"),
        out_col="__semb",
    )
    sd_C = sim.ivf_centroids(
        semb_train, n_clusters=16, max_iter=2, id_col="doc_id", vec_col="__semb"
    )
    semb = _em.hashed_embedding(docs, out_col="__semb")
    out["semdedup_documents"] = _sd.semantic_dedup(
        semb, sd_C, threshold=0.9, id_col="doc_id", vec_col="__semb"
    ).select("doc_id")

    out["knn_arrow_float"] = sim.knn_bruteforce_arrow(
        emb, emb.where("vec_id < 20"), k=10
    )
    return out


if __name__ == "__main__":
    main()
