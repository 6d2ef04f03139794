#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop datasource write (full
computation on executors, no driver collect bottleneck), after a small
warm-up query to absorb JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdataproject_formula1_telemetry_spark import get_spark
from bigdataproject_formula1_telemetry_spark.plans import queries as Q

#: Headline set: one per operator family (agg, filter, star join, window
#: ratio/lag/cumsum, gaps-islands, top-k, 107%-rule, as-of, sessionize,
#: tumbling, SQL resample, exact dedup, text stats, knn, minhash).
HEADLINE = [
    "q01_pricing_summary",
    "q02_filter_project",
    "q03_star_join",
    "q47_shipping_priority",
    "q48_regional_revenue",
    "q52_volume_shipping",
    "q53_returned_top_customers",
    "q05_top1_per_group",
    "q06_window_ratio",
    "q08_window_cumsum",
    "q09_gaps_islands",
    "q16_107_rule",
    "q22_asof_join",
    "q23_sessionize",
    "q24_tumbling_window",
    "q28_resample_grid",
    "q25_dedup_exact",
    "q26_text_stats",
    "q27_knn_cosine",
    "q30_minhash_near_dedup",
    # north-star LLM-data entries — in the bench so the per-round driver
    # run catches their regressions (q54's r2 4.5 s spike was only
    # visible in SCALING.md sweeps, not BENCH_rNN.json)
    "q31_simhash",
    "q49_near_dedup_clustered",
    "q54_embedding_near_dedup",
    "q55_ivf_ann_recall",
]


def _ship_package(spark) -> None:
    """Python-UDF entries (applyInPandas / mapInPandas) deserialize on
    executor workers, which must import the engine package.  From the
    repo cwd the workers find it via sys.path[''], but a foreign-cwd
    invocation (``python /root/repo/bench.py`` from elsewhere) needs the
    package shipped — same addPyFile recipe as ``__spark_entry__``."""
    import shutil
    import tempfile

    zip_base = os.path.join(
        tempfile.gettempdir(), f"bdp_f1_spark_pkg_{os.getpid()}"
    )
    zip_path = zip_base + ".zip"
    if not os.path.exists(zip_path):
        shutil.make_archive(
            zip_base,
            "zip",
            root_dir=os.path.dirname(os.path.abspath(__file__)),
            base_dir="bigdataproject_formula1_telemetry_spark",
        )
    spark.sparkContext.addPyFile(zip_path)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    _ship_package(spark)

    from bigdataproject_formula1_telemetry_spark.operators import dedup as _dedup

    # Per query: one warm-up run (JVM classloading, codegen, Python
    # worker spawn — one-time costs that would otherwise be misattributed
    # to whichever query runs first), then the MINIMUM of N_RUNS timed
    # runs.  min-of-N makes entries reproducible across invocations
    # (sub-second queries were noise-bound at n=1: ±30% run-to-run made
    # regressions unattributable).  Barrier cache blocks are released
    # after each query so one query's DISK_ONLY intermediates can't
    # pressure the next query's timing.
    #
    # PROTOCOL NOTE — barrier-cold timing (round 5, resolves the r3→r4
    # q30/q49 "2× jump"): since round 4 the registry's _q wrapper calls
    # dedup.release_barriers() at build time, so EVERY timed run below
    # rebuilds its pipeline's persist(DISK_ONLY) barrier frames — the
    # honest end-to-end cost.  Before round 4 the warm-up run persisted
    # the barrier plans into the CacheManager and the timed runs'
    # identical plans substituted the already-materialized blocks, so
    # min-of-3 reported a barrier-WARM number (only the post-barrier
    # stages).  A/B measured at sf0.1 in one session (round 5):
    #   q30_minhash_near_dedup   cold 2.19 s  vs  warm 0.70 s
    #   q49_near_dedup_clustered cold 2.48 s  vs  warm 0.79 s
    # The warm figures reproduce r3's reported 0.94 s / 1.05 s; the
    # cold figures match r4's 2.07 s / 2.76 s.  The r3→r4 delta was a
    # measurement-honesty change, not a plan regression (the plans only
    # lost jobs in r4; the 10× ratios improved to 1.21×/1.49×).
    N_RUNS = 3
    timings: dict[str, float] = {}
    for name in HEADLINE:
        Q.QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            Q.QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        _dedup.release_barriers()

    # Composed LLM curation tail over the documents table (doc-level
    # minhash near-dedup → chunk → sharded pack → epoch shuffle) — ONE
    # measured artifact for the training-data extension suite, not just
    # per-stage pytests.  Same barrier-cold protocol as the registry
    # queries: barriers released before every build, so each timed run
    # pays the full dedup pipeline.
    from bigdataproject_formula1_telemetry_spark import io
    from bigdataproject_formula1_telemetry_spark.plans import pipelines

    def build_curation():
        _dedup.release_barriers()
        docs = io.read_table(spark, sf_dir, "documents")
        return pipelines.curate_documents(docs)

    build_curation().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        build_curation().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    timings["curation_pipeline"] = round(best, 3)
    _dedup.release_barriers()

    # End-to-end corpus RELEASE: curate → training shards + manifest →
    # datasheet card, written under one root — the composed artifact a
    # training run actually consumes (pipelines.corpus_release).  The
    # parquet writes run INSIDE the timer: the write is the deliverable,
    # unlike the noop-forced query entries.  Barrier-cold protocol.
    import tempfile as _tf0

    with _tf0.TemporaryDirectory() as rtmp:

        def run_release():
            _dedup.release_barriers()
            docs = io.read_table(spark, sf_dir, "documents")
            return pipelines.corpus_release(docs, os.path.join(rtmp, "release"))

        run_release()
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            run_release()
            best = min(best, time.perf_counter() - t0)
        timings["corpus_release"] = round(best, 3)
        _dedup.release_barriers()

        # the steady-state RELEASE TRAIN step (r7): one increment —
        # half verbatim re-crawls (the exact index must reject), half
        # fresh-prefixed — gated, curated, shard-appended, admitted,
        # manifest_full + card refreshed.  Uses the release written
        # above as base; timed per-append with a fresh inc id each run
        # (retries of ONE id measure the clear-then-write path instead).
        from pyspark.sql import functions as _Fq

        from bigdataproject_formula1_telemetry_spark.operators import (
            exact_index as _eidx0,
        )
        from bigdataproject_formula1_telemetry_spark.plans.pipelines import (
            corpus_release_append as _append,
        )

        docs_r = io.read_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        epath0 = os.path.join(rtmp, "eidx")
        _eidx0.build_exact_index(docs_r, epath0, expected_items=1_000_000)
        head_r = docs_r.orderBy("doc_id").limit(250)

        def inc_for(i: int):
            # fresh content must be UNIQUE per run: run i-1's admitted
            # docs live in the index, so re-sending the same "fresh"
            # text would time the all-duplicate path instead
            return (
                head_r.select(
                    (_Fq.col("doc_id") + 50_000_000).alias("doc_id"), "text"
                )
                .unionByName(
                    head_r.select(
                        (_Fq.col("doc_id") + 60_000_000 + i * 1_000).alias(
                            "doc_id"
                        ),
                        _Fq.concat_ws(
                            " ", _Fq.lit(f"fresh release increment {i}"),
                            _Fq.col("doc_id").cast("string"), _Fq.col("text"),
                        ).alias("text"),
                    )
                )
                .localCheckpoint(eager=True)
            )

        incs = [inc_for(i) for i in range(N_RUNS)]
        best = float("inf")
        for i in range(N_RUNS):
            _dedup.release_barriers()
            t0 = time.perf_counter()
            _append(
                incs[i],
                os.path.join(rtmp, "release"),
                f"bench{i}",
                exact_index_path=epath0,
            )
            best = min(best, time.perf_counter() - t0)
        timings["corpus_release_append"] = round(best, 3)
        _dedup.release_barriers()

        # the SAME append with the O(increment) incremental card
        # (r14, VERDICT r13 item 2): the full-card entry above re-reads
        # every released row per append; this one merges the
        # release-maintained card partials instead
        # (refresh_card="incremental" — the 8.2x sweep win at 500k,
        # made driver-visible).  Identical increment shape and admission
        # work, fresh ids; the delta between the two entries IS the
        # card recompute.
        incs2 = [inc_for(100 + i) for i in range(N_RUNS)]
        best = float("inf")
        for i in range(N_RUNS):
            _dedup.release_barriers()
            t0 = time.perf_counter()
            _append(
                incs2[i],
                os.path.join(rtmp, "release"),
                f"benchinc{i}",
                exact_index_path=epath0,
                refresh_card="incremental",
            )
            best = min(best, time.perf_counter() - t0)
        timings["corpus_release_append_inccard"] = round(best, 3)
        _dedup.release_barriers()

    # int8 serving delta: the same brute-force Arrow kNN (20 queries,
    # k=10) over the float embeddings vs over at-rest int8 codes —
    # each side reads its own stored parquet form, which is the point
    # (the code column is ~8× fewer bytes scanned; quantization itself
    # is a one-time write-path cost, staged outside the timer).
    from bigdataproject_formula1_telemetry_spark.operators import similarity as sim
    import tempfile as _tf

    with _tf.TemporaryDirectory() as qtmp:
        emb = io.read_table(spark, sf_dir, "embeddings")
        q8_path = os.path.join(qtmp, "embeddings_q8.parquet")
        sim.quantize_embeddings(emb).select(
            "vec_id", "embedding_q8"
        ).write.mode("overwrite").parquet(q8_path)
        emb_q8 = spark.read.parquet(q8_path)

        def knn_float():
            return sim.knn_bruteforce_arrow(
                emb, emb.where("vec_id < 20"), k=10
            )

        def knn_q8():
            return sim.knn_bruteforce_arrow(
                emb_q8, emb_q8.where("vec_id < 20"), k=10,
                vec_col="embedding_q8", quantized=True,
            )

        # third serving tier: PQ codes (16× at rest) + ADC lookup search —
        # codebooks trained and codes written ONCE outside the timer
        from bigdataproject_formula1_telemetry_spark.operators import pq as PQ

        books = PQ.pq_train(emb, m=8, n_codes=256, max_iter=2)
        pq_path = os.path.join(qtmp, "embeddings_pq.parquet")
        PQ.pq_encode(emb, books).write.mode("overwrite").parquet(pq_path)
        emb_pq = spark.read.parquet(pq_path)

        def knn_pq():
            return PQ.knn_pq_adc(
                emb_pq, emb.where("vec_id < 20"), books, k=10
            )

        for entry, build in (
            ("knn_arrow_float", knn_float),
            ("knn_arrow_q8", knn_q8),
            ("knn_pq_adc", knn_pq),
        ):
            build().write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                build().write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[entry] = round(best, 3)

    # CDC chunking over the documents table: one narrow Arrow map stage
    # (rolling-hash boundaries, no shuffle) — the sub-document dedup
    # entry point; measured so chunker regressions show in BENCH_rNN.
    from bigdataproject_formula1_telemetry_spark.operators import text as _text

    def build_cdc():
        docs = io.read_table(spark, sf_dir, "documents")
        return _text.cdc_chunks(docs, target_tokens=32)

    build_cdc().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        build_cdc().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    timings["cdc_chunk_documents"] = round(best, 3)

    # Trained-classifier quality scoring: the model is trained ONCE
    # outside the timer (on a 1k-doc deterministic sample labeled by the
    # heuristic quality score — the distill-the-heuristic shape); each
    # timed run scores the whole documents table in one zero-shuffle
    # Arrow pass — the per-corpus cost of a learned quality gate.
    from bigdataproject_formula1_telemetry_spark.operators import (
        classifier as _clf,
        sampling as _smp0,
        text as _textq,
    )
    from pyspark.sql import functions as _Fq

    docs_q = io.read_table(spark, sf_dir, "documents")
    seed = _smp0.deterministic_sample(
        docs_q, ["doc_id"], min(1.0, 1000 / max(docs_q.count(), 1)),
        salt="clf-seed",
    )
    med = seed.agg(
        _Fq.percentile_approx(_textq.quality_score(_Fq.col("text")), 0.5)
    ).first()[0]
    labeled = seed.withColumn(
        "label",
        (_textq.quality_score(_Fq.col("text")) > _Fq.lit(float(med))).cast("int"),
    )
    clf_w = _clf.train_text_classifier(labeled, dim=512, epochs=5)

    def build_clf_score():
        return _clf.score_text_classifier(docs_q, clf_w)

    build_clf_score().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        build_clf_score().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    timings["quality_clf_score"] = round(best, 3)

    # DSIR importance resampling over the documents table: fit both
    # hashed-ngram multinomials (target = the English subset), weight
    # every doc JVM-side, Gumbel-top-k select 20% — the full published
    # selection pipeline (operators/dsir.py; oracle-twinned in q56)
    from bigdataproject_formula1_telemetry_spark.operators import dsir as _dsir

    docs_d = io.read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    n_docs_d = docs_d.count()

    def build_dsir():
        return _dsir.dsir_select(
            docs_d,
            docs_d.where(_Fq.col("lang") == "en"),
            k=max(1, n_docs_d // 5),
            dim=4096,
            salt="bench-dsir",
        )

    build_dsir().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        build_dsir().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    timings["dsir_select"] = round(best, 3)

    # BM25 lexical retrieval (operators/retrieval.py; oracle-twinned in
    # q57's bm25 section): 20 token-slice queries ranked top-10 against
    # the documents corpus — the batch-scoring shape of the lexical
    # retrieval twin of the kNN entries.
    from bigdataproject_formula1_telemetry_spark.operators import (
        retrieval as _rt,
    )

    bm_docs = io.read_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    bm_norm = _Fq.filter(
        _Fq.split(_Fq.lower(_Fq.col("text")), r"[^a-z0-9]+"),
        lambda x: x != _Fq.lit(""),
    )
    bm_q = (
        bm_docs.where(_Fq.col("doc_id") % 250 == 1)
        .select("doc_id", bm_norm.alias("__t"))
        .where(_Fq.size("__t") >= 9)
        .select(
            _Fq.concat(_Fq.lit("q"), _Fq.col("doc_id").cast("string")).alias(
                "query_id"
            ),
            _Fq.array_join(_Fq.slice("__t", 4, 6), " ").alias("text"),
        )
        .localCheckpoint(eager=True)
    )

    def build_bm25():
        return _rt.bm25_topk(bm_docs, bm_q, k=10)

    build_bm25().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        build_bm25().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    timings["bm25_topk"] = round(best, 3)

    # Hybrid retrieval (r11): the same 20 queries through BM25 ⊕
    # hashed-BoW-cosine fused by RRF (retrieval.hybrid_topk) — the
    # two-tower serving shape; the semantic leg pays one corpus
    # hashed_embedding Arrow pass + the knn matmul kernel per run.
    def build_hybrid():
        return _rt.hybrid_topk(bm_docs, bm_q, k=10)

    build_hybrid().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        build_hybrid().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    timings["hybrid_topk"] = round(best, 3)

    # Materialized serving paths (r12, VERDICT r11 item 2): the indexes
    # are built ONCE outside the timer (ingest-time cost, the
    # knn_ivf_materialized pattern); each timed run serves the SAME
    # 20-query batch as bm25_topk/hybrid_topk — so the entry pairs read
    # directly as scan-vs-index on an identical workload.  The lexical
    # leg reads term-bucket-pruned postings (no corpus tokenize pass per
    # batch); the hybrid adds the IVF inverted file (partition-pruned to
    # the probed clusters) — no corpus scan in EITHER leg, the 100 TB
    # steady-state shape.  Since r13 the lexical leg serves df from the
    # terms/ lexicon (postings consumed once, no serve-time barrier);
    # the release_barriers() calls keep the barrier-cold protocol
    # uniform across entries.
    from bigdataproject_formula1_telemetry_spark.operators import (
        bm25_index as _bi,
        embed as _emh,
    )

    with _tf.TemporaryDirectory() as btmp:
        bidx = os.path.join(btmp, "bm25idx")
        _bi.build_bm25_index(bm_docs, bidx, n_buckets=64)

        def build_bm25_indexed():
            _dedup.release_barriers()
            return _bi.bm25_topk_indexed(spark, bidx, bm_q, k=10)

        build_bm25_indexed().write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            build_bm25_indexed().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings["bm25_topk_indexed"] = round(best, 3)
        _dedup.release_barriers()

        demb = _emh.hashed_embedding(
            bm_docs, out_col="__v", dim=256, salt="hashemb"
        ).select(
            _Fq.col("doc_id").alias("vec_id"), _Fq.col("__v").alias("embedding")
        )
        h_C = sim.ivf_centroids(demb, n_clusters=8, max_iter=2)
        hivf = os.path.join(btmp, "hybrid_ivf")
        sim.build_inverted_file(demb, h_C, hivf)

        def build_hybrid_indexed():
            _dedup.release_barriers()
            return _rt.hybrid_topk_indexed(
                spark, bidx, hivf, h_C, bm_q, k=10, nprobe=4
            )

        build_hybrid_indexed().write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            build_hybrid_indexed().write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        timings["hybrid_topk_indexed"] = round(best, 3)
        _dedup.release_barriers()

    # SemDeDup over the documents table: hashed-BoW embed + cluster-
    # scoped semantic dedup (the curate_documents semdedup= gate's
    # exact shape).  Centroids are trained ONCE outside the timer on a
    # deterministic sample (the production shape — reuse across corpus
    # shards); each timed run pays embed → collapse → assign → per-
    # cluster kernel end to end.
    from bigdataproject_formula1_telemetry_spark.operators import (
        embed as _em,
        semdedup as _sd,
    )

    docs_s = io.read_table(spark, sf_dir, "documents")
    semb_train = _em.hashed_embedding(
        _smp0.deterministic_sample(docs_s, ["doc_id"], 0.25, salt="sd-train"),
        out_col="__semb",
    )
    sd_C = sim.ivf_centroids(
        semb_train, n_clusters=16, max_iter=2, id_col="doc_id", vec_col="__semb"
    )

    def build_semdedup():
        _dedup.release_barriers()
        semb = _em.hashed_embedding(docs_s, out_col="__semb")
        return _sd.semantic_dedup(
            semb, sd_C, threshold=0.9, id_col="doc_id", vec_col="__semb"
        ).select("doc_id")

    build_semdedup().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        build_semdedup().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    timings["semdedup_documents"] = round(best, 3)
    _dedup.release_barriers()

    # Exact-dedup index serving: hashes + Bloom sidecar built ONCE
    # outside the timer; each timed run checks a 200-doc increment (100
    # exact copies + 100 fresh) — the steady-state exact-dedup path
    # (bloom prunes fresh docs without touching the hash table).
    from bigdataproject_formula1_telemetry_spark.operators import (
        exact_index as _eidx,
    )

    with _tf.TemporaryDirectory() as etmp:
        docs_e = io.read_table(spark, sf_dir, "documents").select("doc_id", "text")
        epath = os.path.join(etmp, "eidx")
        _eidx.build_exact_index(docs_e, epath, expected_items=1_000_000)
        einc = (
            docs_e.orderBy("doc_id").limit(100)
            .select((_Fq.col("doc_id") + 30_000_000).alias("doc_id"), "text")
            .unionByName(
                docs_e.orderBy("doc_id").limit(100)
                .select(
                    (_Fq.col("doc_id") + 40_000_000).alias("doc_id"),
                    _Fq.concat_ws(
                        " ", _Fq.lit("fresh exact prefix"),
                        _Fq.col("doc_id").cast("string"), _Fq.col("text"),
                    ).alias("text"),
                )
            )
            .localCheckpoint(eager=True)
        )

        def build_exact_search():
            return _eidx.dedup_exact_against_index(spark, einc, epath)

        build_exact_search().write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            build_exact_search().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings["exact_index_search"] = round(best, 3)

    # Materialized-IVF serving: the inverted file is written ONCE outside
    # the timer (ingest-time cost), then each timed run is a 20-query
    # partition-pruned top-10 search — the 100 TB serving path, where the
    # scan reads ~nprobe/n_clusters of the table's directories.
    with _tf.TemporaryDirectory() as itmp:
        emb = io.read_table(spark, sf_dir, "embeddings")
        from bigdataproject_formula1_telemetry_spark.operators import sampling as _smp

        C = sim.ivf_centroids(
            _smp.deterministic_sample(emb, ["vec_id"], 0.4, salt="ivf-train"),
            n_clusters=8,
            max_iter=2,
        )
        ivf_path = os.path.join(itmp, "ivf_table")
        sim.build_inverted_file(emb, C, ivf_path)

        def build_ivf_serve():
            return sim.knn_ivf_materialized(
                spark, ivf_path, emb.where("vec_id < 20"), C, k=10, nprobe=4
            )

        build_ivf_serve().write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            build_ivf_serve().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings["knn_ivf_materialized"] = round(best, 3)

        # IVF-PQ: same router, but the inverted file stores m-byte codes
        # instead of float vectors, and scoring is ADC — the
        # billion-vector layout (partition pruning × code-only scan)
        from bigdataproject_formula1_telemetry_spark.operators import pq as PQ

        books = PQ.pq_train(emb, m=8, n_codes=256, max_iter=2)
        ivfpq_path = os.path.join(itmp, "ivfpq_table")
        PQ.build_inverted_file_pq(emb, C, books, ivfpq_path)

        def build_ivfpq_serve():
            return PQ.knn_ivfpq_materialized(
                spark, ivfpq_path, emb.where("vec_id < 20"), C, books,
                k=10, nprobe=4,
            )

        build_ivfpq_serve().write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            build_ivfpq_serve().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings["knn_ivfpq_materialized"] = round(best, 3)

    # Materialized-MinHash serving: the index over the documents table is
    # written ONCE outside the timer (ingest-time cost), then each timed
    # run is a 200-doc increment search — the steady-state daily-dedup
    # path, where the increment broadcasts and the index is only scanned.
    from bigdataproject_formula1_telemetry_spark.operators import (
        minhash_index as MI,
    )
    from pyspark.sql import functions as _F

    with _tf.TemporaryDirectory() as mtmp:
        docs = io.read_table(spark, sf_dir, "documents").select("doc_id", "text")
        mpath = os.path.join(mtmp, "mhidx")
        MI.build_minhash_index(docs, mpath)
        # increment: 100 copies of indexed docs (must drop) + 100 fresh
        inc = (
            docs.orderBy("doc_id")
            .limit(100)
            .select((_F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
            .unionByName(
                docs.orderBy("doc_id")
                .limit(100)
                .select(
                    (_F.col("doc_id") + 20_000_000).alias("doc_id"),
                    _F.concat_ws(
                        " ",
                        _F.lit("entirely fresh content prefix"),
                        _F.col("doc_id").cast("string"),
                        _F.reverse(_F.col("text")),
                    ).alias("text"),
                )
            )
            .localCheckpoint(eager=True)
        )

        def build_mh_search():
            return MI.dedup_against_index(spark, inc, mpath, 0.8)

        build_mh_search().write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            build_mh_search().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings["minhash_index_search"] = round(best, 3)

    # Reference-shaped ETL benchmark: bronze → 10 m-grid warehouse via the
    # grouped-map resampler (BASELINE.md: reference did 62M rows in ~2h06m
    # ≈ 8.2k input-rows/s with a process pool; we report input rows/s).
    from bigdataproject_formula1_telemetry_spark import schemas
    from bigdataproject_formula1_telemetry_spark.plans import pipelines
    from tests.fixtures import gen_telemetry_raw

    bronze_pdf = gen_telemetry_raw(
        years=(2021, 2022, 2023, 2024),
        rounds=(1, 2, 3),
        drivers=(1, 4, 11, 16, 44, 55, 63, 81),
        laps_per_driver=8,
    )
    n_bronze = len(bronze_pdf)
    # Stage bronze as parquet outside the timer: the engine's bronze layer
    # IS parquet (SURVEY §1.1), so the measured pipeline is scan → clean →
    # grouped resample → write, not driver-side createDataFrame transfer.
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        bronze_path = os.path.join(tmp, "bronze.parquet")
        spark.createDataFrame(bronze_pdf, schema=schemas.TELEMETRY_RAW).write.mode(
            "overwrite"
        ).parquet(bronze_path)
        bronze = spark.read.parquet(bronze_path)
        # warm (Python workers, codegen for this plan), then min-of-N
        pipelines.build_warehouse(bronze).write.format("noop").mode("overwrite").save()
        etl_sec = float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            pipelines.build_warehouse(bronze).write.format("noop").mode("overwrite").save()
            etl_sec = min(etl_sec, time.perf_counter() - t0)
    timings["etl_resample_warehouse"] = round(etl_sec, 3)

    total = round(sum(timings.values()), 3)

    # ── Mode-normalized readings (VERDICT r13 item 1) ────────────────
    # The grading driver's single post-close run exhibits a machine-
    # level slow mode with NON-uniform per-entry multipliers (SCALING
    # r13 adjudication: 0.84–3.55×, not Python workers, not stage
    # density) — absolute bands re-pinned every round kept losing to a
    # fresh worst-case sample on a different entry pair.  The
    # instrument: a CANARY set of pure-JVM TPC-H entries whose plans
    # never change, with per-entry session medians pinned in
    # tools/bench_calibration.json.  canary_mult = median over canaries
    # of (this run's wall / pinned median) measures THIS run's mode
    # intensity; queries_normalized divides every entry by it, so
    # normalized bands (pinned from shaped sessions, where the mult ≈ 1
    # by construction) separate "the machine was slow" from "the plan
    # regressed".  tools/normalize_bench.py applies the same math to
    # any recorded bench line.
    canary_mult = None
    normalized = None
    cal_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tools",
        "bench_calibration.json",
    )
    if os.path.exists(cal_path):
        with open(cal_path) as fh:
            cal = json.load(fh)
        if abs(sf - cal.get("sf", 0.1)) > 1e-9:
            cal = {"canaries": [], "session_median": {}}  # wrong SF: skip
        infl = sorted(
            timings[k] / cal["session_median"][k]
            for k in cal["canaries"]
            if k in timings and cal["session_median"].get(k)
        )
        if infl:
            mid = len(infl) // 2
            canary_mult = round(
                infl[mid]
                if len(infl) % 2
                else (infl[mid - 1] + infl[mid]) / 2.0,
                4,
            )
            normalized = {
                k: round(v / canary_mult, 3) for k, v in timings.items()
            }

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "canary_mult": canary_mult,
                "queries_normalized": normalized,
                "sf": sf,
                "etl_input_rows": n_bronze,
                "etl_rows_per_sec": round(n_bronze / etl_sec, 1),
                # reference ETL: ~60.1M audited lake rows resampled in
                # ~2h06m with a cpu_count-2 process pool
                # (BASELINE.md, F1_Data_PreProcessing.ipynb:187-188)
                "reference_etl_rows_per_sec": 7950.0,
                "etl_speedup_vs_reference": round(n_bronze / etl_sec / 7950.0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
