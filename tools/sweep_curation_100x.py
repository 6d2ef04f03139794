"""500k-document (100×-class) sweep for the COMPOSED curation pipeline.

Extends the round-5 10× measurement (SCALING.md: curation_pipeline
1.15× on a replica corpus) to the 500k-distinct-document scale the
standalone minhash operator was already swept at: the full
``pipelines.curate_documents`` tail (doc-level minhash near-dedup →
context-window chunking → sharded first-fit packing → salt-keyed epoch
shuffle) over

- ``distinct500k`` — 100 word-shuffled variants of each sf0.1 document
  (real shingle load, no exact-collapse shortcut: shuffling the words
  changes every shingle, so the dedup stage does full LSH work), and
- ``planted``      — + 1,000 true near-dups (copy + one appended token,
  fresh ids) whose suppression is asserted, with zero false drops.

Timing protocol: barrier-cold (release_barriers between runs), one
warm-up + min of N_RUNS, same as bench.py.

Usage: python tools/sweep_curation_100x.py [--quick]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from bigdataproject_formula1_telemetry_spark.plans import pipelines
from bigdataproject_formula1_telemetry_spark.operators.dedup import release_barriers

QUICK = "--quick" in sys.argv
REPLICAS = 10 if QUICK else 100
N_PLANTED = 100 if QUICK else 1_000
N_RUNS = 2
OUT = "/tmp/curation_sweep"


def build_corpus(spark) -> None:
    """100 word-shuffled variants per sf0.1 doc, written once as parquet.
    The shuffle is seeded per (doc, replica) — deterministic corpus."""
    import pandas as pd

    src = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    pdf = src.toPandas()
    n_docs = len(pdf)
    rng = np.random.default_rng(99)
    rows_id, rows_text = [], []
    for r, (did, text) in enumerate(zip(pdf["doc_id"], pdf["text"])):
        words = text.split()
        for k in range(REPLICAS):
            w = list(words)
            rng.shuffle(w)
            rows_id.append(int(did) * REPLICAS + k)
            rows_text.append(" ".join(w))
    out = pd.DataFrame({"doc_id": rows_id, "text": rows_text})
    os.makedirs(OUT, exist_ok=True)
    spark.createDataFrame(out).repartition(32).write.mode("overwrite").parquet(
        f"{OUT}/distinct.parquet"
    )
    print(f"  corpus: {len(out)} distinct docs ({n_docs} × {REPLICAS})", flush=True)

    base = out.sample(n=N_PLANTED, random_state=7)
    planted = pd.DataFrame(
        {
            "doc_id": (base["doc_id"] + 100_000_000).to_numpy(),
            "text": (base["text"] + " appended").to_numpy(),
        }
    )
    spark.createDataFrame(planted).write.mode("overwrite").parquet(
        f"{OUT}/planted_extra.parquet"
    )


def main() -> None:
    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("curation-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("building corpus ...", flush=True)
    build_corpus(spark)

    distinct = spark.read.parquet(f"{OUT}/distinct.parquet")
    n = distinct.count()
    results: dict[str, float | int | bool] = {"n_docs": n}

    # --- SemDeDup gate at 500k docs (--semgate runs only this) ---
    # The corpus is 100 word-SHUFFLES per source doc: every variant of a
    # doc has the IDENTICAL hashed-BoW vector (order-invariant by
    # construction), so the identical-vector collapse must fold each
    # 100-variant family to ONE representative before any pairwise work
    # — exactly the paraphrase/template axis the gate exists for, at the
    # scale the shingle path pays full price (shuffling defeats MinHash).
    # Sharp prediction: the EXACT survivor count is recomputed in numpy
    # from the ~n/100 distinct class vectors (collapse → argmax
    # assignment → per-cluster ordered greedy — the pytest oracle, run
    # at full scale), not a loose "about n/100" bar.
    if "--semgate" in sys.argv:
        from bigdataproject_formula1_telemetry_spark.operators import (
            embed as EM,
            semdedup as SDX,
            similarity as simx,
            sampling as smpx,
        )

        semb_train = EM.hashed_embedding(
            smpx.deterministic_sample(
                distinct, ["doc_id"], 0.02, salt="semgate-train"
            ),
            text_col="text", out_col="__semb",
        )
        t0 = time.time()
        C_sg = simx.ivf_centroids(
            semb_train, n_clusters=16, max_iter=2,
            id_col="doc_id", vec_col="__semb",
        )
        results["semgate_train_s"] = round(time.time() - t0, 2)

        def build_semgate():
            release_barriers()
            semb = EM.hashed_embedding(distinct, text_col="text", out_col="__semb")
            return SDX.semantic_dedup(
                semb, C_sg, threshold=0.9, id_col="doc_id",
                vec_col="__semb", keep="min_id",
            ).select("doc_id")

        build_semgate().write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.time()
            build_semgate().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        release_barriers()
        results["semgate_s"] = round(best, 2)
        results["semgate_docs_per_sec"] = round(n / best)

        survivors = [
            r.doc_id
            for r in build_semgate().collect()
        ]
        release_barriers()

        # exact numpy prediction over the distinct class vectors: one
        # representative (min doc_id) per identical-vector family, then
        # the min_id-mode cluster-scoped greedy
        semb_all = EM.hashed_embedding(distinct, text_col="text", out_col="__semb")
        class_rows = (
            semb_all.select("doc_id", "__semb")
            .withColumn("__vk", F.md5(F.to_json(F.struct(F.col("__semb")))))
            .groupBy("__vk")
            .agg(F.min("doc_id").alias("rid"))
            .join(
                semb_all.select(F.col("doc_id").alias("rid"), "__semb"), "rid"
            )
            .collect()
        )
        release_barriers()
        rids = np.array([r["rid"] for r in class_rows])
        RV = np.stack([np.asarray(r["__semb"], dtype=np.float64) for r in class_rows])
        nrm = np.linalg.norm(RV, axis=1)
        exempt = rids[nrm == 0]
        act = nrm > 0
        Rn = RV[act] / nrm[act][:, None]
        rid_a = rids[act]
        Cn = np.asarray(C_sg, dtype=np.float64)
        cl = np.argmax(Rn @ Cn.T, axis=1)
        kept_pred = set(int(i) for i in exempt)
        for c in np.unique(cl):
            members = np.nonzero(cl == c)[0]
            order = members[np.argsort(rid_a[members], kind="stable")]
            P = Rn[order]
            S = P @ P.T  # classes are few (~n/100): full matrix is fine
            for i in range(len(order)):
                if i == 0 or not (S[i, :i] >= 0.9).any():
                    kept_pred.add(int(rid_a[order[i]]))
        results["semgate_survivors"] = len(survivors)
        results["semgate_predicted"] = len(kept_pred)
        results["semgate_classes"] = len(rids)
        results["semgate_ok"] = set(survivors) == kept_pred
        print(
            f"  semgate: {best:.2f} s ({n / best:,.0f} docs/s), survivors "
            f"{len(survivors)} == predicted {len(kept_pred)} "
            f"(classes {len(rids)}): {results['semgate_ok']}",
            flush=True,
        )
        print(json.dumps(results))
        spark.stop()
        return

    # --- WARC ingestion throughput (--warc runs only this) ---
    # A real-shaped crawl segment: every corpus doc wrapped in an HTML
    # response record, one .warc.gz with per-record gzip members (the
    # CommonCrawl convention), one malformed record planted mid-file.
    # Asserted: record count, exactly ONE dead-letter row, resync
    # salvages everything after it, and the documents bridge yields
    # every textual 200.  Wall → records/s and MB/s for SCALING.
    if "--warc" in sys.argv:
        import gzip as _gz

        from bigdataproject_formula1_telemetry_spark.sources import warc as WW

        n_warc = 25_000
        n_seg = 8  # file-level parallelism IS the partitioning
        texts = [
            r["text"]
            for r in distinct.orderBy("doc_id").limit(n_warc).collect()
        ]
        wdir = f"{OUT}/crawl_warc"
        shutil.rmtree(wdir, ignore_errors=True)
        os.makedirs(wdir)
        print(
            f"  building {n_warc:,} records across {n_seg} .warc.gz "
            "segments ...",
            flush=True,
        )
        handles = [
            open(f"{wdir}/crawl-{s:03d}.warc.gz", "wb") for s in range(n_seg)
        ]
        for i, t in enumerate(texts):
            fh = handles[i % n_seg]
            if i == n_warc // 2:
                fh.write(
                    _gz.compress(
                        b"WARC/1.0\r\nWARC-Type: response\r\n"
                        b"Content-Length: nope\r\n\r\nbroken\r\n\r\n"
                    )
                )
            body = f"<html><body><p>{t}</p></body></html>".encode()
            http = (
                f"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
                f"charset=utf-8\r\nContent-Length: {len(body)}\r\n\r\n"
            ).encode() + body
            rec = (
                b"WARC/1.0\r\n"
                b"WARC-Type: response\r\n"
                + f"WARC-Record-ID: <urn:uuid:{i:08d}>\r\n".encode()
                + f"WARC-Target-URI: https://ex.org/{i}\r\n".encode()
                + b"WARC-Date: 2026-08-15T00:00:00Z\r\n"
                + b"Content-Type: application/http;msgtype=response\r\n"
                + f"Content-Length: {len(http)}\r\n\r\n".encode()
                + http
                + b"\r\n\r\n"
            )
            fh.write(_gz.compress(rec))
        for fh in handles:
            fh.close()
        sz_mb = sum(
            os.path.getsize(os.path.join(wdir, f)) for f in os.listdir(wdir)
        ) / 1e6
        t0 = time.time()
        recs = WW.read_warc(spark, wdir).localCheckpoint(eager=True)
        n_rows = recs.count()
        results["warc_parse_s"] = round(time.time() - t0, 2)
        n_err = recs.where(F.col("error").isNotNull()).count()
        t0 = time.time()
        n_docs_out = WW.warc_to_documents(recs).count()
        results["warc_bridge_s"] = round(time.time() - t0, 2)
        results["warc_records"] = n_rows
        results["warc_dead_letters"] = n_err
        results["warc_docs"] = n_docs_out
        results["warc_mb"] = round(sz_mb, 1)
        results["warc_rec_per_s"] = round(n_rows / results["warc_parse_s"])
        results["warc_mb_per_s"] = round(sz_mb / results["warc_parse_s"], 1)
        results["warc_ok"] = (
            n_rows == n_warc + 1 and n_err == 1 and n_docs_out == n_warc
        )
        print(
            f"  parse {results['warc_parse_s']} s ({results['warc_rec_per_s']:,}"
            f" rec/s, {results['warc_mb_per_s']} MB/s of {sz_mb:.0f} MB gz), "
            f"bridge {results['warc_bridge_s']} s — rows {n_rows} "
            f"(want {n_warc + 1}), dead letters {n_err} (want 1), docs "
            f"{n_docs_out}/{n_warc}",
            flush=True,
        )
        print(json.dumps(results))
        spark.stop()
        return

    # --- packing strategy A/B at ~750k chunks (--packing runs only this)
    # First-fit (doc-contiguous) vs best-fit-decreasing: occupancy and
    # wall for both, over REAL chunk sizes (64-token windows over the
    # 500k corpus leave varied remainders), so the default strategy
    # choice is evidence-backed.  Budget invariant asserted exactly:
    # zero bins over budget (no chunk here exceeds it, so zero oversize
    # rows too).
    if "--packing" in sys.argv:
        from bigdataproject_formula1_telemetry_spark.operators import text as TX

        budget = 256
        chunks = (
            TX.chunk_documents(distinct, chunk_tokens=64, overlap=0)
            .withColumn("shard", F.col("doc_id") % 32)
            .localCheckpoint(eager=True)
        )
        n_chunks = chunks.count()
        results["pack_n_chunks"] = n_chunks
        print(f"  packing {n_chunks:,} chunks, budget {budget} ...", flush=True)
        for strat, key in (("first_fit", "ff"), ("best_fit_decreasing", "bfd")):
            release_barriers()
            t0 = time.time()
            agg = (
                TX.pack_sequences(
                    chunks,
                    token_budget=budget,
                    partition_by="shard",
                    strategy=strat,
                )
                .groupBy("shard", "seq_id")
                .agg(
                    F.sum("n_tokens").alias("fill"),
                    F.max(F.col("oversize").cast("int")).alias("over"),
                )
                .agg(
                    F.count(F.lit(1)).alias("bins"),
                    F.sum("fill").alias("tokens"),
                    F.sum(
                        ((F.col("fill") > budget) & (F.col("over") == 0)).cast(
                            "long"
                        )
                    ).alias("bad"),
                    F.sum("over").alias("oversize"),
                )
                .first()
            )
            wall = time.time() - t0
            occ = float(agg["tokens"]) / (int(agg["bins"]) * budget)
            results[f"pack_{key}_s"] = round(wall, 2)
            results[f"pack_{key}_bins"] = int(agg["bins"])
            results[f"pack_{key}_occupancy"] = round(occ, 4)
            results[f"pack_{key}_ok"] = (
                int(agg["bad"] or 0) == 0 and int(agg["oversize"] or 0) == 0
            )
            print(
                f"  {strat}: {wall:.2f} s, bins {agg['bins']:,}, occupancy "
                f"{occ:.2%}, budget violations {int(agg['bad'] or 0)}",
                flush=True,
            )
        results["pack_bfd_fewer_bins"] = (
            results["pack_bfd_bins"] <= results["pack_ff_bins"]
        )
        print(json.dumps(results))
        spark.stop()
        return

    # --- BM25 retrieval at 500k docs (--bm25 runs only this) ---
    # Queries are token-4..9 slices of 100 deterministic variant-0 docs.
    # Sharp prediction: the corpus is 100 word-SHUFFLES per source doc,
    # and BM25 is order-invariant by construction (tf/dl/df see token
    # multisets, never order) — so for each query, ALL of its source
    # doc's variants must (a) match and (b) score identically (spread
    # bounded by float sum associativity).  Honest caveat: the synthetic
    # vocabulary is tiny (~50 words), so the broadcast vocabulary filter
    # keeps most token rows here — this leg measures end-to-end
    # throughput and correctness at scale, not selectivity (real corpora
    # with open vocabularies are where the filter pays).
    if "--bm25" in sys.argv:
        from bigdataproject_formula1_telemetry_spark.operators import (
            retrieval as RT,
        )

        norm = F.filter(
            F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        )
        queries = (
            distinct.where((F.col("doc_id") % (REPLICAS * 50)) == 0)
            .select("doc_id", norm.alias("__t"))
            .where(F.size("__t") >= 9)
            .select(
                F.concat(
                    F.lit("q"),
                    (F.col("doc_id") / REPLICAS).cast("long").cast("string"),
                ).alias("query_id"),
                (F.col("doc_id") / REPLICAS).cast("long").alias("qdid"),
                F.array_join(F.slice("__t", 4, 6), " ").alias("text"),
            )
            .localCheckpoint(eager=True)
        )
        nq = queries.count()
        print(f"  bm25: {nq} queries over {n:,} docs ...", flush=True)
        t0 = time.time()
        n_top = RT.bm25_topk(
            distinct, queries.select("query_id", "text"), k=10
        ).count()
        wall = time.time() - t0
        results["bm25_n_queries"] = nq
        results["bm25_topk_rows"] = n_top
        results["bm25_topk_s"] = round(wall, 2)
        results["bm25_docs_per_s"] = round(n / wall, 1)
        fam = (
            RT.bm25_scores(distinct, queries.select("query_id", "text"))
            .join(queries.select("query_id", "qdid"), "query_id")
            .where((F.col("doc_id") / REPLICAS).cast("long") == F.col("qdid"))
            .groupBy("query_id")
            .agg(
                F.count(F.lit(1)).alias("nfam"),
                (F.max("score") - F.min("score")).alias("spread"),
            )
            .agg(
                F.min("nfam").alias("minfam"),
                F.max("spread").alias("maxspread"),
            )
            .first()
        )
        results["bm25_family_complete"] = int(fam["minfam"]) == REPLICAS
        results["bm25_family_max_spread"] = float(fam["maxspread"])
        results["bm25_ok"] = bool(
            results["bm25_family_complete"] and fam["maxspread"] < 1e-9
        )

        # honest denominator: this corpus makes ~every doc a candidate
        # for ~every query, so the real unit of work is scored
        # (query, doc) pairs, not docs
        n_pairs = RT.bm25_scores(
            distinct, queries.select("query_id", "text")
        ).count()
        results["bm25_candidate_pairs"] = n_pairs
        results["bm25_pairs_per_s"] = round(n_pairs / wall, 1)
        print(
            f"  topk {wall:.2f} s ({results['bm25_docs_per_s']:,.0f} docs/s); "
            f"family completeness {fam['minfam']}/{REPLICAS}, max score "
            f"spread {fam['maxspread']:.2e}",
            flush=True,
        )
        print(json.dumps(results))
        spark.stop()
        return

    # --- hybrid retrieval at 500k docs (--hybrid runs only this) ---
    # BM25 ⊕ hashed-BoW-cosine fused by RRF (retrieval.hybrid_topk).
    # At-scale assertions: every query returns a FULL k (the corpus
    # guarantees ≥k matches), and the fused output is BIT-deterministic
    # across two runs — the tie-handling class of bug (family variants
    # tie exactly in BOTH legs here, by construction) that only
    # surfaces under real multi-partition execution.
    if "--hybrid" in sys.argv:
        from bigdataproject_formula1_telemetry_spark.operators import (
            retrieval as RT,
        )

        norm = F.filter(
            F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        )
        queries = (
            distinct.where((F.col("doc_id") % (REPLICAS * 50)) == 0)
            .select("doc_id", norm.alias("__t"))
            .where(F.size("__t") >= 9)
            .select(
                F.concat(
                    F.lit("q"),
                    (F.col("doc_id") / REPLICAS).cast("long").cast("string"),
                ).alias("query_id"),
                F.array_join(F.slice("__t", 4, 6), " ").alias("text"),
            )
            .localCheckpoint(eager=True)
        )
        nq = queries.count()
        print(f"  hybrid: {nq} queries over {n:,} docs ...", flush=True)
        t0 = time.time()
        a = sorted(
            map(tuple, RT.hybrid_topk(distinct, queries, k=10).collect())
        )
        wall = time.time() - t0
        b = sorted(
            map(tuple, RT.hybrid_topk(distinct, queries, k=10).collect())
        )
        results["hybrid_n_queries"] = nq
        results["hybrid_topk_rows"] = len(a)
        results["hybrid_topk_s"] = round(wall, 2)
        results["hybrid_docs_per_s"] = round(n / wall, 1)
        results["hybrid_full_k"] = len(a) == nq * 10
        results["hybrid_deterministic"] = a == b
        results["hybrid_ok"] = bool(
            results["hybrid_full_k"] and results["hybrid_deterministic"]
        )
        print(
            f"  hybrid topk {wall:.2f} s "
            f"({results['hybrid_docs_per_s']:,.0f} docs/s); "
            f"full_k {results['hybrid_full_k']}, "
            f"deterministic {results['hybrid_deterministic']}",
            flush=True,
        )
        print(json.dumps(results))
        spark.stop()
        return

    # --- MMR diversity re-rank at 500k docs (--mmr runs only this) ---
    # BM25 top-40 pools are TIE-SATURATED by construction here: every
    # 100-variant word-shuffle family has identical term multisets
    # (identical BM25 scores) AND identical hashed-BoW vectors (BoW is
    # order-free), so the greedy faces maximal tie pressure.  At-scale
    # assertions: full k per query, BIT-determinism across two runs
    # under real 32-partition execution, and diversity genuinely bites
    # (the MMR cut never has FEWER distinct families than the plain
    # BM25 cut, and strictly more for at least one query).
    if "--mmr" in sys.argv:
        from bigdataproject_formula1_telemetry_spark.operators import (
            embed as EM,
            retrieval as RT,
        )
        from pyspark.sql import Window

        norm = F.filter(
            F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        )
        queries = (
            distinct.where((F.col("doc_id") % (REPLICAS * 50)) == 0)
            .select("doc_id", norm.alias("__t"))
            .where(F.size("__t") >= 9)
            .select(
                F.concat(
                    F.lit("q"),
                    (F.col("doc_id") / REPLICAS).cast("long").cast("string"),
                ).alias("query_id"),
                F.array_join(F.slice("__t", 4, 6), " ").alias("text"),
            )
            .localCheckpoint(eager=True)
        )
        nq = queries.count()
        print(f"  mmr: {nq} queries over {n:,} docs ...", flush=True)

        # pool depth must EXCEED the family size: the query's own family
        # (REPLICAS identical-score variants) fills the head of the BM25
        # ranking wholesale, so a pool of k <= REPLICAS contains exactly
        # one family and MMR has nothing cross-family to reach for (the
        # first full-scale run measured exactly that: 0/100 diversified
        # at k=40 with 100-variant families)
        pool_k = REPLICAS + 40

        def run_once():
            pool = RT.bm25_topk(distinct, queries, k=pool_k, score_round=6)
            wq = Window.partitionBy("query_id")
            rel = pool.withColumn(
                "score", F.col("score") / F.max("score").over(wq)
            )
            pool_docs = distinct.join(
                F.broadcast(pool.select("doc_id").distinct()),
                "doc_id",
                "left_semi",
            )
            vecs = EM.hashed_embedding(
                pool_docs, text_col="text", out_col="__v"
            ).select("doc_id", "__v")
            out = RT.mmr_rerank(
                rel, vecs, k=10, lam=0.5, vec_col="__v", score_round=6
            )
            return pool, sorted(map(tuple, out.collect()))

        t0 = time.time()
        pool, a = run_once()
        wall = time.time() - t0
        _, b = run_once()
        fam = lambda did: did // REPLICAS  # noqa: E731
        bm10 = {}
        for r in pool.where(F.col("rank") <= 10).collect():
            bm10.setdefault(r["query_id"], set()).add(fam(r["doc_id"]))
        mm10 = {}
        for qid, did, _, _ in a:
            mm10.setdefault(qid, set()).add(fam(did))
        never_fewer = all(
            len(mm10[q]) >= len(bm10.get(q, set())) for q in mm10
        )
        strictly_more = sum(
            len(mm10[q]) > len(bm10.get(q, set())) for q in mm10
        )
        results["mmr_n_queries"] = nq
        results["mmr_rows"] = len(a)
        results["mmr_s"] = round(wall, 2)
        results["mmr_full_k"] = len(a) == nq * 10
        results["mmr_deterministic"] = a == b
        results["mmr_families_never_fewer"] = bool(never_fewer)
        results["mmr_queries_strictly_diversified"] = int(strictly_more)
        results["mmr_ok"] = bool(
            results["mmr_full_k"]
            and results["mmr_deterministic"]
            and never_fewer
            and strictly_more > 0
        )
        print(
            f"  mmr topk {wall:.2f} s; full_k {results['mmr_full_k']}, "
            f"deterministic {results['mmr_deterministic']}, "
            f"never_fewer {never_fewer}, "
            f"strictly_diversified {strictly_more}/{nq}",
            flush=True,
        )
        print(json.dumps(results))
        spark.stop()
        return

    # --- materialized BM25 index at 500k docs (--lexidx runs only this) ---
    # Build the postings index over the full corpus (timed), then serve
    # the same 100 queries indexed vs corpus-scan: results must be
    # rank-identical (rounded ranking on both sides), and the indexed
    # serve documents its wall against the scan — at corpus scale the
    # scan re-derives tf/df/stats from ALL documents per batch while the
    # index reads only the query vocabulary's buckets.
    if "--lexidx" in sys.argv:
        from bigdataproject_formula1_telemetry_spark.operators import (
            bm25_index as BX,
            retrieval as RT,
        )

        norm = F.filter(
            F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        )
        queries = (
            distinct.where((F.col("doc_id") % (REPLICAS * 50)) == 0)
            .select("doc_id", norm.alias("__t"))
            .where(F.size("__t") >= 9)
            .select(
                F.concat(
                    F.lit("q"),
                    (F.col("doc_id") / REPLICAS).cast("long").cast("string"),
                ).alias("query_id"),
                F.array_join(F.slice("__t", 4, 6), " ").alias("text"),
            )
            .localCheckpoint(eager=True)
        )
        nq = queries.count()
        idx = os.path.join(OUT, "lexidx")
        shutil.rmtree(idx, ignore_errors=True)
        print(f"  lexidx: building over {n:,} docs ...", flush=True)
        t0 = time.time()
        BX.build_bm25_index(distinct, idx, n_buckets=64)
        build_s = time.time() - t0
        t0 = time.time()
        served = sorted(
            map(
                tuple,
                BX.bm25_topk_indexed(
                    spark, idx, queries, k=10, score_round=6
                ).collect(),
            )
        )
        idx_s = time.time() - t0
        t0 = time.time()
        scan = sorted(
            map(
                tuple,
                RT.bm25_topk(
                    distinct, queries, k=10, score_round=6
                ).collect(),
            )
        )
        scan_s = time.time() - t0
        # the single-query case is where the index pays: a handful of
        # terms hits a handful of buckets (real partition pruning),
        # while the scan re-derives corpus-wide tf/df/stats regardless
        one_q = queries.limit(1).localCheckpoint(eager=True)
        t0 = time.time()
        s1 = sorted(
            map(
                tuple,
                BX.bm25_topk_indexed(
                    spark, idx, one_q, k=10, score_round=6
                ).collect(),
            )
        )
        one_idx_s = time.time() - t0
        t0 = time.time()
        s2 = sorted(
            map(
                tuple,
                RT.bm25_topk(distinct, one_q, k=10, score_round=6).collect(),
            )
        )
        one_scan_s = time.time() - t0
        results["lexidx_n_queries"] = nq
        results["lexidx_build_s"] = round(build_s, 2)
        results["lexidx_serve_s"] = round(idx_s, 2)
        results["lexidx_scan_s"] = round(scan_s, 2)
        results["lexidx_speedup"] = round(scan_s / idx_s, 2)
        results["lexidx_identical"] = served == scan
        results["lexidx_one_serve_s"] = round(one_idx_s, 2)
        results["lexidx_one_scan_s"] = round(one_scan_s, 2)
        results["lexidx_one_speedup"] = round(one_scan_s / one_idx_s, 2)
        results["lexidx_one_identical"] = s1 == s2
        results["lexidx_ok"] = bool(
            served == scan and len(served) == nq * 10 and s1 == s2
        )
        print(
            f"  lexidx build {build_s:.1f} s; 100-query serve {idx_s:.2f} s "
            f"vs scan {scan_s:.2f} s ({results['lexidx_speedup']}x); "
            f"1-query serve {one_idx_s:.2f} s vs scan {one_scan_s:.2f} s "
            f"({results['lexidx_one_speedup']}x); "
            f"identical {results['lexidx_identical']}/"
            f"{results['lexidx_one_identical']}",
            flush=True,
        )
        print(json.dumps(results))
        spark.stop()
        return

    # --- incremental card maintenance at 500k docs (--cardinc only) ---
    # r13: corpus_card over 500k released-scale rows vs the incremental
    # path's marginal cost per append — partial over ONE 5k-doc
    # increment + merge with the (ingest-time, already-written) base
    # partial.  The merged sum rows must equal the full card's exactly;
    # the sketch-backed fractions within estimator tolerance.
    if "--cardinc" in sys.argv:
        inc = distinct.where(F.col("doc_id") % 100 == 7)  # ~5k docs
        base = distinct.where(F.col("doc_id") % 100 != 7)
        t0 = time.time()
        full = {
            (r["section"], r["key"]): r["value"]
            for r in pipelines.corpus_card(
                distinct, lang_col=None
            ).collect()
        }
        full_s = time.time() - t0
        # base partial = ingest-time cost (written during release build)
        t0 = time.time()
        base_part = pipelines.corpus_card_partial(base, lang_col=None)
        base_part.write.mode("overwrite").parquet(f"{OUT}/card_base_part")
        base_part_s = time.time() - t0
        # the marginal per-append cost: increment partial + merge
        t0 = time.time()
        inc_part = pipelines.corpus_card_partial(inc, lang_col=None)
        merged = {
            (r["section"], r["key"]): r["value"]
            for r in pipelines.merge_card_partials(
                spark.read.parquet(f"{OUT}/card_base_part").unionByName(
                    inc_part
                )
            ).collect()
        }
        inc_s = time.time() - t0
        sums_ok = all(
            merged[k] == full[k]
            for k in (("size", "docs"), ("size", "tokens"), ("size", "chars"),
                      ("pii", "pii_emails"), ("diversity", "ngrams_13"))
        )
        dup_rel = abs(
            merged[("dup", "exact_dup_frac_approx")]
            - full[("dup", "exact_dup_frac_approx")]
        )
        div_rel = abs(
            merged[("diversity", "distinct_13gram_frac_approx")]
            - full[("diversity", "distinct_13gram_frac_approx")]
        ) / max(full[("diversity", "distinct_13gram_frac_approx")], 1e-9)
        results["cardinc_full_card_s"] = round(full_s, 2)
        results["cardinc_base_partial_s"] = round(base_part_s, 2)
        results["cardinc_append_refresh_s"] = round(inc_s, 2)
        results["cardinc_speedup"] = round(full_s / inc_s, 2)
        results["cardinc_sums_exact"] = bool(sums_ok)
        results["cardinc_dup_abs_delta"] = round(dup_rel, 6)
        results["cardinc_div_rel_delta"] = round(div_rel, 6)
        results["cardinc_ok"] = bool(
            sums_ok and dup_rel < 0.05 and div_rel < 0.05
        )
        print(
            f"  cardinc full card {full_s:.1f} s vs per-append refresh "
            f"{inc_s:.1f} s ({results['cardinc_speedup']}x; base partial "
            f"{base_part_s:.1f} s is ingest-time); sums exact {sums_ok}; "
            f"dup Δ {dup_rel:.4f}, diversity relΔ {div_rel:.4f}",
            flush=True,
        )
        print(json.dumps(results))
        spark.stop()
        return

    # --- indexed contamination report at 500k docs (--contamidx only) ---
    # r13 (SCALING r12 residual 1): contamination_report served from the
    # materialized bm25 index vs the scan form, over the full 500k
    # corpus.  The scan form pays three corpus passes (bm25 tf/df, the
    # gram explode, the embedding mapInPandas over ALL docs); the
    # indexed form reads the query vocabulary's postings buckets and
    # then annotates ONLY the report's own rows (pushed isin id filter).
    # Reports must be identical (portably-rounded ranking both sides;
    # the replica families are exact score ties broken by doc_id).
    if "--contamidx" in sys.argv:
        from bigdataproject_formula1_telemetry_spark.operators import (
            bm25_index as BX,
        )

        norm = F.filter(
            F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        )
        bench = (
            distinct.where((F.col("doc_id") % (REPLICAS * 333)) == 0)
            .select("doc_id", norm.alias("__t"))
            .where(F.size("__t") >= 9)
            .select(
                (F.col("doc_id") / REPLICAS).cast("long").alias("bench_id"),
                F.array_join(F.slice("__t", 4, 6), " ").alias("text"),
            )
            .limit(15)
            .localCheckpoint(eager=True)
        )
        nb = bench.count()
        idx = os.path.join(OUT, "contamidx")
        shutil.rmtree(idx, ignore_errors=True)
        print(f"  contamidx: building index over {n:,} docs ...", flush=True)
        t0 = time.time()
        BX.build_bm25_index(distinct, idx, n_buckets=64)
        build_s = time.time() - t0

        def _key(rows_):
            return sorted(
                (
                    r["bench_id"], r["rank"], r["doc_id"],
                    round(r["score"], 9), r["contam_ngrams"],
                    None if r["cos_sim"] is None else round(r["cos_sim"], 9),
                )
                for r in rows_
            )

        # shingle_n=2 so the gram annotation BITES on 6-token bench
        # snippets (8-grams need >= 8 tokens; the q57 fold's lesson)
        common = dict(
            k=5, bench_id_col="bench_id", score_round=6, shingle_n=2
        )
        t0 = time.time()
        scan = _key(
            pipelines.contamination_report(
                distinct, bench, **common
            ).collect()
        )
        scan_s = time.time() - t0
        t0 = time.time()
        served = _key(
            pipelines.contamination_report(
                distinct, bench, bm25_index_path=idx, **common
            ).collect()
        )
        idx_s = time.time() - t0
        grams_bite = sum(1 for r in served if r[4] > 0)
        results["contamidx_n_bench"] = nb
        results["contamidx_rows"] = len(served)
        results["contamidx_build_s"] = round(build_s, 2)
        results["contamidx_scan_s"] = round(scan_s, 2)
        results["contamidx_serve_s"] = round(idx_s, 2)
        results["contamidx_speedup"] = round(scan_s / idx_s, 2)
        results["contamidx_identical"] = served == scan
        results["contamidx_gram_rows"] = grams_bite
        results["contamidx_ok"] = bool(
            served == scan and len(served) == nb * 5 and grams_bite > 0
        )
        print(
            f"  contamidx build {build_s:.1f} s; report scan {scan_s:.2f} s "
            f"vs indexed {idx_s:.2f} s ({results['contamidx_speedup']}x); "
            f"identical {results['contamidx_identical']}; "
            f"gram rows {grams_bite}/{len(served)}",
            flush=True,
        )
        print(json.dumps(results))
        spark.stop()
        return

    # --- fully-indexed hybrid serving at 500k docs (--hybidx only) ---
    # r12 certification of the knn_ivf_materialized matmul-kernel
    # rewrite at scale: BM25 postings index + hashed-embedding IVF
    # inverted file built once over the full corpus, then the same 100
    # queries served by hybrid_topk_indexed.  At nprobe=n_clusters the
    # IVF leg is exact, so the fused output must equal the scan-based
    # hybrid_topk rank-for-rank (the pytest pin, here under real
    # 32-partition execution on the tie-saturated corpus); a second
    # serve at nprobe=4 times the partition-pruned 100 TB shape.
    if "--hybidx" in sys.argv:
        from bigdataproject_formula1_telemetry_spark.operators import (
            bm25_index as BX,
            embed as EM,
            retrieval as RT,
            sampling as SMP,
            similarity as SIM,
        )

        norm = F.filter(
            F.split(F.lower(F.col("text")), r"[^a-z0-9]+"),
            lambda x: x != F.lit(""),
        )
        queries = (
            distinct.where((F.col("doc_id") % (REPLICAS * 50)) == 0)
            .select("doc_id", norm.alias("__t"))
            .where(F.size("__t") >= 9)
            .select(
                F.concat(
                    F.lit("q"),
                    (F.col("doc_id") / REPLICAS).cast("long").cast("string"),
                ).alias("query_id"),
                F.array_join(F.slice("__t", 4, 6), " ").alias("text"),
            )
            .localCheckpoint(eager=True)
        )
        nq = queries.count()
        bidx = os.path.join(OUT, "hyb_bm25idx")
        ivf = os.path.join(OUT, "hyb_ivf")
        shutil.rmtree(bidx, ignore_errors=True)
        shutil.rmtree(ivf, ignore_errors=True)
        n_clusters = 16
        print(f"  hybidx: building over {n:,} docs ...", flush=True)
        t0 = time.time()
        BX.build_bm25_index(
            distinct.select("doc_id", "text"), bidx, n_buckets=64
        )
        demb = EM.hashed_embedding(
            distinct.select("doc_id", "text"), out_col="__v",
            dim=256, salt="hashemb",
        ).select(
            F.col("doc_id").alias("vec_id"), F.col("__v").alias("embedding")
        )
        C = SIM.ivf_centroids(
            SMP.deterministic_sample(demb, ["vec_id"], 0.05, salt="hyb-ivf"),
            n_clusters=n_clusters, max_iter=2,
        )
        SIM.build_inverted_file(demb, C, ivf)
        build_s = time.time() - t0

        # score_round=6 on BOTH forms: this corpus's 100-variant
        # families have IDENTICAL term multisets, so their true BM25
        # scores are equal and an unrounded ranking splits them by
        # float-sum association order — which varies with partition
        # layout, i.e. per RUN.  The first --hybidx run caught exactly
        # that (deterministic=False, scan-mismatch) before rounding
        # was plumbed through the hybrid forms (r12).
        def serve(np_):
            return sorted(
                map(
                    tuple,
                    RT.hybrid_topk_indexed(
                        spark, bidx, ivf, C, queries, k=10, nprobe=np_,
                        score_round=6,
                    ).collect(),
                )
            )

        t0 = time.time()
        exact = serve(n_clusters)
        exact_s = time.time() - t0
        exact2 = serve(n_clusters)
        t0 = time.time()
        pruned = serve(4)
        pruned_s = time.time() - t0
        t0 = time.time()
        scan = sorted(
            map(
                tuple,
                RT.hybrid_topk(
                    distinct.select("doc_id", "text"), queries, k=10,
                    score_round=6,
                ).collect(),
            )
        )
        scan_s = time.time() - t0
        results["hybidx_n_queries"] = nq
        results["hybidx_build_s"] = round(build_s, 2)
        results["hybidx_exact_serve_s"] = round(exact_s, 2)
        results["hybidx_pruned_serve_s"] = round(pruned_s, 2)
        results["hybidx_scan_s"] = round(scan_s, 2)
        results["hybidx_full_k"] = len(exact) == nq * 10
        results["hybidx_deterministic"] = exact == exact2
        results["hybidx_equals_scan_at_full_probe"] = [
            r[:2] + (r[3],) for r in exact
        ] == [r[:2] + (r[3],) for r in scan]
        results["hybidx_ok"] = bool(
            results["hybidx_full_k"]
            and results["hybidx_deterministic"]
            and results["hybidx_equals_scan_at_full_probe"]
        )
        print(
            f"  hybidx build {build_s:.1f} s; exact-probe serve "
            f"{exact_s:.2f} s vs scan {scan_s:.2f} s; pruned (nprobe=4) "
            f"{pruned_s:.2f} s; full_k {results['hybidx_full_k']}, "
            f"deterministic {results['hybidx_deterministic']}, "
            f"rank-identical-to-scan "
            f"{results['hybidx_equals_scan_at_full_probe']}",
            flush=True,
        )
        print(json.dumps(results))
        spark.stop()
        return

    # --- read_release plan bloat vs increment count (--relread only) ---
    # ``read_release`` unions ONE parquet scan per increment; this leg
    # pins the measured cost of that design at many increments (read
    # wall + physical-plan size at 1/10/25/50/100 increments), then
    # compacts and re-measures — the evidence behind the recommended
    # compaction cadence.  Increments are written in the exact
    # ``corpus_release_append`` on-disk layout (write_training_shards
    # under increments/<id>/) from slices of ONE curated corpus, so the
    # leg measures the READER, not 100 append pipelines.  Row-count
    # invariance across compaction is asserted exactly.
    if "--relread" in sys.argv:
        n_inc = 10 if QUICK else 100
        checkpoints = [1, 5, 10] if QUICK else [1, 10, 25, 50, 100]
        base_docs = 20_000
        inc_docs = 200
        docs = distinct.orderBy("doc_id").limit(
            base_docs + n_inc * inc_docs
        ).localCheckpoint(eager=True)
        print(
            f"  curating {base_docs:,} base + {n_inc} × {inc_docs} "
            "increment docs once ...",
            flush=True,
        )
        packed = pipelines.curate_documents(
            docs, chunk_tokens=64, overlap=0, token_budget=256,
            n_pack_shards=2,
        ).localCheckpoint(eager=True)
        ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
        # slices are contiguous id ranges — a 2-literal range predicate,
        # never a 20k-literal isin
        root = f"{OUT}/relread"
        shutil.rmtree(root, ignore_errors=True)
        pipelines.write_training_shards(
            packed.where(F.col("doc_id") <= ids[base_docs - 1]), root
        )

        def read_wall_and_plan():
            t0 = time.time()
            df = pipelines.read_release(spark, root)
            cnt = df.count()
            wall = round(time.time() - t0, 2)
            plan_chars = len(
                df._jdf.queryExecution().executedPlan().toString()
            )
            return cnt, wall, plan_chars

        expected_rows = None
        for i in range(n_inc):
            lo = base_docs + i * inc_docs
            pipelines.write_training_shards(
                packed.where(
                    (F.col("doc_id") > ids[lo - 1])
                    & (F.col("doc_id") <= ids[lo + inc_docs - 1])
                ),
                f"{root}/increments/inc{i:03d}",
            )
            if (i + 1) in checkpoints:
                cnt, wall, plan_chars = read_wall_and_plan()
                expected_rows = cnt
                results[f"relread_{i + 1}_s"] = wall
                results[f"relread_{i + 1}_plan_chars"] = plan_chars
                print(
                    f"  {i + 1:>3} increments: read {wall} s, "
                    f"{cnt:,} rows, plan {plan_chars:,} chars",
                    flush=True,
                )
        t0 = time.time()
        folded = pipelines.compact_release(spark, root)
        results["relread_compact_s"] = round(time.time() - t0, 2)
        cnt, wall, plan_chars = read_wall_and_plan()
        results["relread_compacted_s"] = wall
        results["relread_compacted_plan_chars"] = plan_chars
        results["relread_folded"] = folded
        results["relread_ok"] = folded == n_inc and cnt == expected_rows
        print(
            f"  compact {results['relread_compact_s']} s ({folded} folded); "
            f"post-compaction read {wall} s, {cnt:,} rows "
            f"(invariant: {cnt == expected_rows}), plan {plan_chars:,} chars",
            flush=True,
        )
        print(json.dumps(results))
        spark.stop()
        return

    def build():
        release_barriers()
        return pipelines.curate_documents(distinct)

    print("curate_documents, distinct corpus ...", flush=True)
    build().write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    release_barriers()
    results["curation_s"] = round(best, 2)
    results["docs_per_sec"] = round(n / best)
    print(f"  {best:.2f} s  ({n / best:,.0f} docs/s)", flush=True)

    # quality at scale: planted near-dups suppressed, zero false drops
    print("dedup-stage recall on planted near-dups ...", flush=True)
    from bigdataproject_formula1_telemetry_spark.operators import dedup as D

    planted = distinct.unionByName(
        spark.read.parquet(f"{OUT}/planted_extra.parquet")
    )
    kept = D.near_dedup_minhash(planted, threshold=0.8)
    stats = (
        planted.select("doc_id")
        .exceptAll(kept.select("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("dropped"),
            F.sum((F.col("doc_id") >= 100_000_000).cast("long")).alias(
                "dropped_planted"
            ),
        )
        .first()
    )
    release_barriers()
    results["dropped"] = stats["dropped"]
    results["dropped_planted"] = int(stats["dropped_planted"] or 0)
    results["recall_ok"] = (
        stats["dropped"] == N_PLANTED and stats["dropped_planted"] == N_PLANTED
    )
    print(
        f"  dropped {stats['dropped']} ({stats['dropped_planted']} planted)",
        flush=True,
    )

    # decontamination at scale: a 500-doc "benchmark" sampled verbatim
    # from the corpus — exactly those docs share 8-grams (word-shuffled
    # siblings don't), so the expected drop set is known
    print("decontaminate vs a 500-doc benchmark ...", flush=True)
    from bigdataproject_formula1_telemetry_spark.operators import sampling as SA

    bench = SA.deterministic_sample(
        distinct, ["doc_id"], 500 / n, salt="bench-eval"
    )
    n_bench = bench.count()
    t0 = time.time()
    kept = D.decontaminate(distinct, bench)
    kept_n = kept.count()
    results["decontaminate_s"] = round(time.time() - t0, 2)
    results["bench_docs"] = n_bench
    results["decon_dropped"] = n - kept_n
    # every benchmark doc must be gone; a few extra drops are legitimate
    # (short docs whose word-shuffle happens to reproduce a benchmark
    # sibling's exact token order share that full-text shingle)
    leak = kept.join(bench.select("doc_id"), "doc_id").count()
    results["decon_ok"] = leak == 0 and (n - kept_n) <= n_bench + 200
    print(
        f"  {results['decontaminate_s']} s — dropped {n - kept_n} "
        f"(benchmark {n_bench}, leaked {leak})",
        flush=True,
    )
    # semantic decontamination at scale — with a sharp prediction: the
    # corpus is word-shuffled variants, so every variant of a benchmark
    # doc's SOURCE shares its exact bag of words → hashed-BoW cosine 1.0
    # → the semantic pass must drop exactly REPLICAS × (distinct sources
    # in the benchmark), the overlap class the 8-gram pass provably
    # cannot see (it dropped only the ~500 verbatim members above)
    print("semantic decontaminate vs the same benchmark ...", flush=True)
    from bigdataproject_formula1_telemetry_spark.operators import embed as EM

    n_sources = (
        bench.select((F.col("doc_id") / REPLICAS).cast("long").alias("s"))
        .distinct()
        .count()
    )
    t0 = time.time()
    sem_kept = EM.semantic_decontaminate(distinct, bench, threshold=0.999)
    sem_kept_n = sem_kept.count()
    results["semantic_decon_s"] = round(time.time() - t0, 2)
    results["semantic_dropped"] = n - sem_kept_n
    results["semantic_expected"] = n_sources * REPLICAS
    # >= expected: every bag-identical sibling must go.  Tight upper
    # band: the synthetic vocabulary is tiny (~31 tokens), so a few
    # DISTINCT sources have near-identical token bags — legitimate
    # positives at this threshold, bounded to +1%.
    results["semantic_ok"] = (
        n_sources * REPLICAS
        <= (n - sem_kept_n)
        <= int(n_sources * REPLICAS * 1.01)
    )
    print(
        f"  {results['semantic_decon_s']} s — dropped {n - sem_kept_n} "
        f"(expected {n_sources * REPLICAS} = {n_sources} sources × {REPLICAS})",
        flush=True,
    )

    # LM quality filter at scale: train a vocab-capped unigram LM on the
    # 500k corpus (one word-count job + bounded collect), then score
    # every document with the zero-shuffle Arrow form — the CCNet-gate
    # cost a 100 TB curation run would actually pay
    print("unigram-LM train (vocab 50k) + perplexity score ...", flush=True)
    from bigdataproject_formula1_telemetry_spark.operators import lm as L

    t0 = time.time()
    model = L.unigram_lm(distinct, vocab_size=50_000)
    logp, unk = L.collect_lm(model)  # terminal action → times the train
    results["lm_train_s"] = round(time.time() - t0, 2)
    results["lm_vocab"] = len(logp)
    scored = L.doc_perplexity_arrow(distinct, logp, unk)
    scored.write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.time()
        L.doc_perplexity_arrow(distinct, logp, unk).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.time() - t0)
    results["lm_score_s"] = round(best, 2)
    results["lm_docs_per_sec"] = round(n / best)
    bad = scored.where(
        F.col("ppl").isNull() | F.isnan("ppl") | (F.col("ppl") <= 0)
    ).count()
    results["lm_ok"] = bad == 0 and scored.count() == n
    print(
        f"  train {results['lm_train_s']} s (vocab {len(logp)}), "
        f"score {best:.2f} s ({n / best:,.0f} docs/s)",
        flush=True,
    )
    # incremental dedup at scale: index the 500k corpus ONCE (ingest
    # cost), then search a 5k daily increment — half verbatim copies of
    # indexed docs (must drop), half fresh permutations (word-order
    # reversal changes every 3-gram shingle, so Jaccard ≈ 0 → must keep)
    print("materialized MinHash index: build + increment search ...", flush=True)
    from bigdataproject_formula1_telemetry_spark.operators import (
        minhash_index as MI,
    )

    n_half = 250 if QUICK else 2_500
    mpath = f"{OUT}/mhidx"
    t0 = time.time()
    MI.build_minhash_index(distinct, mpath)
    results["mhidx_build_s"] = round(time.time() - t0, 2)
    head = distinct.orderBy("doc_id").limit(n_half)
    inc = (
        head.select((F.col("doc_id") + 1_000_000_000).alias("doc_id"), "text")
        .unionByName(
            head.select(
                (F.col("doc_id") + 2_000_000_000).alias("doc_id"),
                F.array_join(
                    F.reverse(F.split(F.col("text"), " ")), " "
                ).alias("text"),
            )
        )
        .localCheckpoint(eager=True)
    )
    MI.dedup_against_index(spark, inc, mpath, 0.8).write.format("noop").mode(
        "overwrite"
    ).save()
    best = float("inf")
    for _ in range(N_RUNS):
        t0 = time.time()
        MI.dedup_against_index(spark, inc, mpath, 0.8).write.format(
            "noop"
        ).mode("overwrite").save()
        best = min(best, time.time() - t0)
    results["mhidx_search_s"] = round(best, 2)
    kept_ids = [
        r["doc_id"]
        for r in MI.dedup_against_index(spark, inc, mpath, 0.8)
        .select("doc_id")
        .collect()
    ]
    n_copies_kept = sum(1 for i in kept_ids if i < 2_000_000_000)
    results["mhidx_ok"] = n_copies_kept == 0 and len(kept_ids) == n_half
    print(
        f"  build {results['mhidx_build_s']} s, search {best:.2f} s for a "
        f"{2*n_half}-doc increment — copies dropped "
        f"{n_half - n_copies_kept}/{n_half}, fresh kept {len(kept_ids)}/{n_half}",
        flush=True,
    )
    # pigeonhole hamming join at scale: 500k random 64-bit fingerprints
    # (SimHash/dHash domain) + 1,000 planted ≤4-flip pairs — recall of
    # the planted set must be exact (the banding GUARANTEES it), random
    # collisions are counted honestly, and the pair join stays linear
    # (random hashes → astronomically sparse band buckets)
    print("hamming near-dup join, 500k fingerprints ...", flush=True)
    from bigdataproject_formula1_telemetry_spark.operators.dedup import (
        hamming_near_dup_pairs,
    )

    rng_h = np.random.default_rng(17)
    base_h = rng_h.integers(-(2**63), 2**63, n, dtype=np.int64)
    n_pl = 100 if QUICK else 1_000
    planted_ids = rng_h.choice(n, size=n_pl, replace=False)
    flips = rng_h.integers(0, 5, size=n_pl)
    extra = []
    for j, src in enumerate(planted_ids):
        v = int(base_h[src]) & 0xFFFFFFFFFFFFFFFF
        for bit in rng_h.choice(64, size=int(flips[j]), replace=False):
            v ^= 1 << int(bit)
        extra.append(v - (1 << 64) if v >= (1 << 63) else v)  # signed wrap
    all_h = np.concatenate([base_h, np.asarray(extra, dtype=np.int64)])
    import pandas as _pd

    hdf = spark.createDataFrame(
        _pd.DataFrame(
            {"doc_id": np.arange(len(all_h), dtype=np.int64), "simhash": all_h}
        )
    ).repartition(32)
    t0 = time.time()
    pairs = hamming_near_dup_pairs(hdf, max_hamming=4)
    got_pairs = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    results["hamming_join_s"] = round(time.time() - t0, 2)
    expected_pairs = {
        (int(min(src, n + j)), int(max(src, n + j)))
        for j, src in enumerate(planted_ids)
    }
    missed = expected_pairs - got_pairs
    results["hamming_pairs_found"] = len(got_pairs)
    results["hamming_planted_missed"] = len(missed)
    results["hamming_ok"] = len(missed) == 0
    print(
        f"  {results['hamming_join_s']} s — {len(got_pairs)} pairs, "
        f"planted missed {len(missed)}/{n_pl}",
        flush=True,
    )

    # ExactSubstr span dedup at scale: ONE 30-token paragraph planted
    # at the head of 1,000 docs — after remove_duplicate_spans exactly
    # one copy may survive corpus-wide, every other doc keeps its own
    # text minus the paragraph.  The heavy stage (the O(n_tokens) span
    # explode + hash shuffle, ~35M span rows here) is the honest
    # published cost of substring-level dedup.
    print("ExactSubstr span dedup, 500k docs ...", flush=True)
    from bigdataproject_formula1_telemetry_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    para = " ".join(f"qq{i}" for i in range(30))
    n_para = 100 if QUICK else 1_000
    tagged = distinct.withColumn(
        "text",
        F.when(
            F.col("doc_id") % F.lit(n // n_para) == 0,
            F.concat_ws(" ", F.lit(para), F.col("text")),
        ).otherwise(F.col("text")),
    )
    t0 = time.time()
    cleaned = remove_duplicate_spans(tagged, span_tokens=30)
    with_para = cleaned.where(F.col("text").contains("qq0 qq1 ")).count()
    results["exactsubstr_s"] = round(time.time() - t0, 2)
    results["exactsubstr_para_survivors"] = with_para
    results["exactsubstr_ok"] = with_para == 1
    print(
        f"  {results['exactsubstr_s']} s — paragraph survives in "
        f"{with_para} doc(s) (must be 1)",
        flush=True,
    )

    # ADVERSARIAL hot-key leg: the SAME 30-token boilerplate paragraph
    # planted in EVERY one of the 500k docs — the license-header/nav-text
    # shape that breaks a window-over-span-hash plan (one partition gets
    # ALL 500k occurrences; a window partition cannot be split).  The
    # groupBy-keeper plan must still excise to a single global-first
    # occurrence.  Wall time legitimately exceeds the uniform leg (ALL
    # 500k docs gain a cut and are rewritten by the excision kernel);
    # the straggler check is that the ratio stays small-constant (~2-3×,
    # the rewrite work) rather than blowing up on the one hot key —
    # partial aggregation absorbs it, AQE can split the join-back.
    print("ExactSubstr HOT KEY: boilerplate in EVERY doc ...", flush=True)
    boiler = " ".join(f"zz{i}" for i in range(30))
    all_tagged = distinct.withColumn(
        "text", F.concat_ws(" ", F.lit(boiler), F.col("text"))
    )
    t0 = time.time()
    hot_cleaned = remove_duplicate_spans(all_tagged, span_tokens=30)
    with_boiler = hot_cleaned.where(F.col("text").contains("zz0 zz1 ")).count()
    results["exactsubstr_hotkey_s"] = round(time.time() - t0, 2)
    results["exactsubstr_hotkey_survivors"] = with_boiler
    results["exactsubstr_hotkey_ratio_vs_uniform"] = round(
        results["exactsubstr_hotkey_s"] / max(results["exactsubstr_s"], 1e-9), 2
    )
    results["exactsubstr_hotkey_ok"] = with_boiler == 1
    print(
        f"  {results['exactsubstr_hotkey_s']} s "
        f"({results['exactsubstr_hotkey_ratio_vs_uniform']}× the uniform leg) — "
        f"boilerplate survives in {with_boiler} doc(s) (must be 1)",
        flush=True,
    )

    # Trained-classifier gate at scale, with an EXACT planted outcome:
    # half the corpus (doc_id % 2 == 0) gets a marker token appended ×8
    # (8 repeats ≈ a boilerplate-phrase-strength signal after L2
    # normalization — a single occurrence is statistically too weak for
    # a 2k-label sample over this tiny synthetic vocabulary, verified by
    # a numpy replica of the trainer); a 2k-doc sample labeled by the
    # marker trains the hashed-BoW logistic regression; scoring ALL
    # 500k docs must then separate the halves PERFECTLY.
    print("trained classifier: 2k-sample train + full-corpus score ...", flush=True)
    from bigdataproject_formula1_telemetry_spark.operators import (
        classifier as CL,
        sampling as SA2,
    )

    marked = distinct.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat_ws(" ", F.col("text"), F.lit(" ".join(["markertok"] * 8))),
        ).otherwise(F.col("text")),
    ).withColumn("label", (F.col("doc_id") % 2 == 0).cast("int"))
    seed = SA2.deterministic_sample(
        marked, ["doc_id"], 2000 / n, salt="clf-sweep"
    ).localCheckpoint(eager=True)
    t0 = time.time()
    w = CL.train_text_classifier(seed, dim=1024, epochs=15)
    results["clf_train_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    scored = CL.score_text_classifier(marked, w)
    agg = scored.agg(
        F.sum(((F.col("quality_prob") >= 0.5) != (F.col("label") == 1)).cast("long")).alias("wrong"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    results["clf_score_s"] = round(time.time() - t0, 2)
    results["clf_docs_per_sec"] = round(n / max(results["clf_score_s"], 1e-9))
    results["clf_misclassified"] = int(agg["wrong"])
    results["clf_ok"] = agg["wrong"] == 0 and agg["n"] == n
    print(
        f"  train {results['clf_train_s']} s (2k sample), score "
        f"{results['clf_score_s']} s ({results['clf_docs_per_sec']:,} docs/s) — "
        f"misclassified {agg['wrong']}/{n} (must be 0)",
        flush=True,
    )

    # Multiclass tagger at scale, same planted-outcome protocol as the
    # binary leg: three thirds of the corpus (doc_id % 3) get three
    # DISTINCT marker tokens appended ×8, a 3k-doc sample labeled by
    # the marker trains the softmax tagger, and scoring ALL 500k docs
    # must predict the planted class for ≥95% of rows (the fastText-
    # class separability bar; the markers are strong but ride on 100
    # word-shuffle variants of real text, so 100% is not guaranteed
    # the way the binary 8×-marker construction was verified to be).
    print("multiclass tagger: 3k-sample train + full-corpus score ...", flush=True)
    mc_classes = ["newsy", "lawly", "codey"]
    mc_marked = distinct.withColumn(
        "label",
        F.element_at(
            F.array(*[F.lit(c) for c in mc_classes]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ),
    ).withColumn(
        "text",
        F.concat_ws(
            " ",
            F.col("text"),
            F.concat_ws(
                " ", *[F.concat(F.lit("mk"), F.col("label"))] * 8
            ),
        ),
    )
    mc_seed = SA2.deterministic_sample(
        mc_marked, ["doc_id"], 3000 / n, salt="mclf-sweep"
    ).localCheckpoint(eager=True)
    t0 = time.time()
    mc_model = CL.train_text_multiclass(mc_seed, dim=1024, epochs=15)
    results["mclf_train_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    mc_agg = (
        CL.score_text_multiclass(mc_marked, mc_model)
        .agg(
            F.sum((F.col("label_pred") == F.col("label")).cast("long")).alias(
                "right"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .first()
    )
    results["mclf_score_s"] = round(time.time() - t0, 2)
    results["mclf_docs_per_sec"] = round(n / max(results["mclf_score_s"], 1e-9))
    mc_acc = int(mc_agg["right"]) / int(mc_agg["n"])
    results["mclf_accuracy"] = round(mc_acc, 4)
    results["mclf_ok"] = mc_acc >= 0.95 and int(mc_agg["n"]) == n
    print(
        f"  train {results['mclf_train_s']} s (3k sample, 3 classes), score "
        f"{results['mclf_score_s']} s ({results['mclf_docs_per_sec']:,} docs/s)"
        f" — planted-class accuracy {mc_acc:.2%} (must be ≥95%)",
        flush=True,
    )

    # Sentence-aligned chunking throughput (the r7 operator's missing
    # scale figure): one JVM aggregate fold per doc over the 500k
    # corpus.  The synthetic docs carry NO terminal punctuation (one
    # giant "sentence" each — the fold's trivial path), so the leg
    # injects a period after every 8th word JVM-side first: ~6-7
    # sentences per ~50-token doc against a 16-token budget exercises
    # the real greedy split/pack path.  Invariants here are cheap
    # sanity (every doc yields chunks; multiple chunks per doc on
    # average); the packing semantics are pinned by the pytest suite.
    print("sentence_chunks over the full corpus ...", flush=True)
    from bigdataproject_formula1_telemetry_spark.operators import text as TX2

    sentenced = distinct.withColumn(
        "text", F.regexp_replace(F.col("text"), r"((?:\S+ ){7}\S+) ", "$1. ")
    )
    release_barriers()
    t0 = time.time()
    sc_agg = (
        TX2.sentence_chunks(sentenced, chunk_tokens=16)
        .agg(
            F.count(F.lit(1)).alias("chunks"),
            F.countDistinct("doc_id").alias("docs"),
        )
        .first()
    )
    results["sentence_chunks_s"] = round(time.time() - t0, 2)
    results["sentence_chunks_rows"] = int(sc_agg["chunks"])
    results["sentence_chunks_docs_per_sec"] = round(
        n / max(results["sentence_chunks_s"], 1e-9)
    )
    results["sentence_chunks_ok"] = (
        int(sc_agg["docs"]) == n and int(sc_agg["chunks"]) > 2 * n
    )
    print(
        f"  {results['sentence_chunks_s']} s — {sc_agg['chunks']:,} chunks "
        f"from {sc_agg['docs']:,}/{n:,} docs "
        f"({results['sentence_chunks_docs_per_sec']:,} docs/s)",
        flush=True,
    )

    # Exact-dedup index + Bloom sidecar at scale: index the 500k corpus
    # once, check a 5k increment (half verbatim copies — must drop; half
    # fresh-prefixed — must keep).  The Bloom prune is measured: the
    # fraction of FRESH docs that still probe the hash table must sit
    # near the filter's design fpr (1%), not near 1.
    print("exact index: build + Bloom-pruned increment search ...", flush=True)
    from bigdataproject_formula1_telemetry_spark.operators import (
        exact_index as EIX,
    )

    epath = f"{OUT}/eidx"
    t0 = time.time()
    EIX.build_exact_index(distinct, epath, expected_items=2 * n)
    results["eidx_build_s"] = round(time.time() - t0, 2)
    head_e = distinct.orderBy("doc_id").limit(n_half)
    einc = (
        head_e.select((F.col("doc_id") + 3_000_000_000).alias("doc_id"), "text")
        .unionByName(
            head_e.select(
                (F.col("doc_id") + 4_000_000_000).alias("doc_id"),
                F.concat_ws(
                    " ", F.lit("fresh"), F.col("doc_id").cast("string"),
                    F.col("text"),
                ).alias("text"),
            )
        )
        .localCheckpoint(eager=True)
    )
    t0 = time.time()
    kept_e = [
        r["doc_id"]
        for r in EIX.dedup_exact_against_index(spark, einc, epath)
        .select("doc_id")
        .collect()
    ]
    results["eidx_search_s"] = round(time.time() - t0, 2)
    n_copies_kept = sum(1 for i in kept_e if i < 4_000_000_000)
    results["eidx_ok"] = n_copies_kept == 0 and len(kept_e) == n_half
    # bloom prune effectiveness on the fresh half
    bits, m_bits, k = EIX._load_bloom(spark, epath)
    import numpy as _np

    fresh_hb = (
        einc.where(F.col("doc_id") >= 4_000_000_000)
        .select(F.xxhash64(F.md5(F.col("text"))).alias("hb"))
        .toPandas()["hb"]
        .to_numpy(dtype=_np.int64)
    )
    fp_rate = float(
        EIX._test_bits(bits, EIX._positions(fresh_hb, m_bits, k)).mean()
    )
    results["eidx_bloom_fp_rate"] = round(fp_rate, 4)
    results["eidx_bloom_ok"] = fp_rate <= 0.03  # 3× the 1% design point
    print(
        f"  build {results['eidx_build_s']} s, search "
        f"{results['eidx_search_s']} s — copies dropped "
        f"{n_half - n_copies_kept}/{n_half}, fresh kept "
        f"{len(kept_e) }/{n_half}, bloom fp on fresh {fp_rate:.2%}",
        flush=True,
    )

    # FULL web-curation preset at 500k: every published gate on (main
    # content extraction, C4, Gopher, FineWeb, repetition, corpus line
    # dedup, near-dedup, span dedup, chunk/pack/shuffle).  1,000 planted
    # article-shaped pages (HTML with nav boilerplate + compliant prose)
    # must ALL survive; the organic word-salad corpus is counted
    # honestly (most of it legitimately dies at the quality gates —
    # that is the preset doing its job on salad).
    print("FULL web preset over 500k + 1k planted articles ...", flush=True)
    from bigdataproject_formula1_telemetry_spark.plans import (
        pipelines as PL,
    )

    # each planted article is GENUINELY distinct (id-salted content in
    # every paragraph) — shared-template near-copies would be correctly
    # killed by line dedup / near-dedup, which is not the claim here
    n_art = 100 if QUICK else 1_000
    para = lambda j: F.concat(
        F.lit(f"<p>The article number "), F.col("id").cast("string"),
        F.lit(f" section {j} discusses the topic key"),
        F.col("id").cast("string"), F.lit(f"x{j} and explains that many "
        "of the central ideas have practical value with great clarity "
        "for readers today.</p>"),
    )
    arts = spark.range(n_art).select(
        (F.col("id") + 900_000_000).alias("doc_id"),
        F.concat(
            F.lit('<nav><a href="/">Home</a> <a href="/x">More</a></nav>'),
            *[para(j) for j in range(4)],
            F.lit("<p>The closing line of article "),
            F.col("id").cast("string"),
            F.lit(" ends this unique document properly.</p>"),
        ).alias("text"),
    )
    web = distinct.unionByName(arts).localCheckpoint(eager=True)
    release_barriers()
    t0 = time.time()
    packed = PL.curate_documents(
        web, **PL.web_curation_kwargs(),
        chunk_tokens=128, overlap=16, token_budget=1024,
    )
    srow = (
        packed.select("doc_id")
        .distinct()
        .agg(
            F.sum((F.col("doc_id") >= 900_000_000).cast("long")).alias("p"),
            F.sum((F.col("doc_id") < 900_000_000).cast("long")).alias("o"),
        )
        .first()
    )
    n_planted_surv = int(srow["p"] or 0)
    n_organic_surv = int(srow["o"] or 0)
    results["web_preset_s"] = round(time.time() - t0, 2)
    release_barriers()
    results["web_preset_planted_survivors"] = n_planted_surv
    results["web_preset_organic_survivors"] = n_organic_surv
    results["web_preset_ok"] = n_planted_surv == n_art
    print(
        f"  {results['web_preset_s']} s — planted articles surviving "
        f"{n_planted_surv}/{n_art} (must be all), organic word-salad "
        f"surviving {n_organic_surv}/{n} (the gates' honest verdict)",
        flush=True,
    )

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
