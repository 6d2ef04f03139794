"""500k-vector (100×-class) scale sweep for the embedding operators.

Round-5 counterpart of the 500k-document sweep in SCALING.md: the
document axis (minhash/simhash) got its 100× treatment in rounds 3-4;
this script gives the embedding axis (q54 near-dedup, q55 IVF recall)
the same protocol, with the replica-adversarial variant and a planted
near-dup recall check.

Corpora (written once to /tmp/emb_sweep, ~130 MB each, seeded):

- ``distinct500k`` — 500,000 i.i.d. standard-normal 64-dim vectors
  (distinct content, near-zero pairwise cosines — max off-diagonal over
  1.25e11 pairs ≈ 0.9 < the 0.95 threshold, and the worst case for IVF:
  no cluster structure to exploit).
- ``planted``      — distinct500k + 1,000 near-duplicates (copy + 1%%
  Gaussian perturbation, cosine ≈ 0.9999, fresh ids ≥ 10,000,000).
- ``replica500k``  — 50,000 distinct vectors × 10 EXACT copies each
  (the adversarial shape that OOM'd the uncapped pair join before the
  identical-vector collapse, SCALING.md round-3 war story).
- ``clustered500k`` — a 64-center Gaussian mixture (centers ~N(0,1)^64,
  per-point noise sigma=0.7): the realistic embedding-manifold shape IVF
  exists to exploit.  The IVF recall gate runs here; the i.i.d. corpus's
  recall is ALSO reported as the documented structureless floor (on data
  with no cluster structure, recall ~ fraction-of-corpus-probed — an
  information-theoretic property, not an implementation defect; q55's
  docstring calls this out at sf scale too).

LSH geometry scales with the corpus: 4 tables × 16 hyperplanes (65,536
buckets, ≈7.6 vectors/bucket) instead of q54's sf-scale 4×8 — band
width grows with log2(n) exactly as the minhash band math does.

Timing protocol: barrier-cold (``release_barriers`` between runs, the
BENCH_r05 protocol), min of N_RUNS after one warm-up.

Usage: python tools/sweep_embeddings_100x.py [--quick]
(--quick = 50k vectors / 100 planted, for a fast plumbing check).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from bigdataproject_formula1_telemetry_spark.operators import sampling, similarity as sim
from bigdataproject_formula1_telemetry_spark.operators.dedup import release_barriers

QUICK = "--quick" in sys.argv
PCA_ONLY = "--pca" in sys.argv  # run ONLY the PCA→IVF-PQ compression leg
SEMINDEX_ONLY = "--semindex" in sys.argv  # run ONLY the semantic-index
# admission leg (added after the round's recorded full run — lets the
# new leg be measured clean without re-timing the whole suite)
N = 50_000 if QUICK else 500_000
N_DISTINCT_REPLICA = N // 10
N_PLANTED = 100 if QUICK else 1_000
DIM = 64
N_RUNS = 2
OUT = "/tmp/emb_sweep"


def write_corpus(path: str, ids: np.ndarray, vecs: np.ndarray) -> None:
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1), type=pa.float32()), DIM
            ).cast(pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, path)


def build_corpora() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(42)
    base = rng.standard_normal((N, DIM)).astype(np.float32)
    write_corpus(f"{OUT}/distinct.parquet", np.arange(N, dtype=np.int64), base)

    keep = rng.choice(N, size=N_PLANTED, replace=False)
    dup = base[keep] + 0.01 * rng.standard_normal((N_PLANTED, DIM)).astype(np.float32)
    write_corpus(
        f"{OUT}/planted_extra.parquet",
        np.arange(10_000_000, 10_000_000 + N_PLANTED, dtype=np.int64),
        dup,
    )
    # source index of each planted twin — the semdedup leg predicts its
    # outcome exactly from (source, twin) cluster assignments
    np.save(f"{OUT}/planted_src.npy", keep)
    np.save(f"{OUT}/planted_dup.npy", dup)

    small = base[:N_DISTINCT_REPLICA]
    rep_ids = np.arange(N, dtype=np.int64)
    rep_vecs = np.tile(small, (10, 1))
    write_corpus(f"{OUT}/replica.parquet", rep_ids, rep_vecs)

    centers = rng.standard_normal((64, DIM)).astype(np.float32)
    assign = rng.integers(0, 64, size=N)
    clustered = centers[assign] + 0.7 * rng.standard_normal((N, DIM)).astype(
        np.float32
    )
    write_corpus(
        f"{OUT}/clustered.parquet", np.arange(N, dtype=np.int64), clustered
    )


def timed(label: str, build, results: dict) -> None:
    build().write.format("noop").mode("overwrite").save()  # warm-up
    best = float("inf")
    for _ in range(N_RUNS):
        release_barriers()
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    release_barriers()
    results[label] = round(best, 2)
    print(f"  {label}: {best:.2f} s", flush=True)


def main() -> None:
    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    print(f"building corpora (n={N}) ...", flush=True)
    build_corpora()

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("emb-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    distinct = spark.read.parquet(f"{OUT}/distinct.parquet")
    planted = distinct.unionByName(spark.read.parquet(f"{OUT}/planted_extra.parquet"))
    replica = spark.read.parquet(f"{OUT}/replica.parquet")

    # scale-sized LSH geometry: 65,536 buckets for 500k vectors
    g = np.random.default_rng(7)
    planes = [
        [[float(x) for x in g.standard_normal(DIM)] for _ in range(16)]
        for _ in range(4)
    ]
    results: dict[str, float | int | bool] = {"n": N}

    # --- semantic-index admission at scale (--semindex runs only this) ---
    # Build the (inc, cluster)-partitioned index over the full corpus
    # (ingest cost, timed once), then admit a 5k increment: 2,500
    # near-copies of stored vectors + 2,500 fresh.  Sharp predictions:
    # dropped == the EXACT numpy count of copies whose source cluster is
    # inside their nprobe=2 probe set (boundary misses predicted, not
    # excused); fresh rows NEVER drop (max cosine of an i.i.d. 64-dim
    # vector vs 500k others ≈ 0.64 ≪ 0.95).
    if SEMINDEX_ONLY:
        from bigdataproject_formula1_telemetry_spark.operators import (
            semdedup as SDX,
        )

        sd_train0 = sampling.deterministic_sample(
            distinct, ["vec_id"], 0.1 if QUICK else 0.02, salt="semdedup-train"
        )
        C_si = sim.ivf_centroids(sd_train0, n_clusters=64, max_iter=2)
        si_path = f"{OUT}/sem_index"
        t0 = time.time()
        SDX.build_semantic_index(distinct, C_si, si_path, "base")
        results["semindex_build_s"] = round(time.time() - t0, 2)

        src_idx2 = np.load(f"{OUT}/planted_src.npy")
        n_inc = min(250 if QUICK else 2_500, len(src_idx2))
        src_idx2 = src_idx2[:n_inc]
        base_tbl2 = pq.read_table(
            f"{OUT}/distinct.parquet", columns=["vec_id", "embedding"]
        )
        base_mat2 = np.asarray(
            base_tbl2.column("embedding").combine_chunks().flatten()
        ).reshape(N, DIM).astype(np.float64)
        rng_si = np.random.default_rng(99)
        copies = base_mat2[src_idx2] + 0.01 * rng_si.standard_normal(
            (n_inc, DIM)
        )
        fresh = rng_si.standard_normal((n_inc, DIM))
        inc_rows = [
            (int(20_000_000 + i), v.tolist()) for i, v in enumerate(copies)
        ] + [
            (int(30_000_000 + i), v.tolist()) for i, v in enumerate(fresh)
        ]
        inc_df = spark.createDataFrame(
            inc_rows, schema="vec_id long, embedding array<double>"
        ).localCheckpoint(eager=True)

        def build_admission():
            return SDX.semantic_dedup_against_index(
                spark, inc_df, si_path, C_si, threshold=0.95, nprobe=2
            )

        timed("semindex_search_s", build_admission, results)

        # numpy prediction: copy i drops iff argmax-cluster(source) is in
        # its own top-2 probes (the index stores sources at THEIR argmax)
        Cn2 = np.asarray(C_si, dtype=np.float64)

        def _nrm(M):
            nn = np.linalg.norm(M, axis=1)
            nn[nn == 0] = 1.0
            return M / nn[:, None]

        src_cl = np.argmax(_nrm(base_mat2[src_idx2]) @ Cn2.T, axis=1)
        probe_sims = _nrm(copies) @ Cn2.T
        top2 = np.argpartition(-probe_sims, 1, axis=1)[:, :2]
        predicted = int(sum(src_cl[i] in top2[i] for i in range(n_inc)))

        kept_ids = {
            r.vec_id for r in build_admission().select("vec_id").collect()
        }
        dropped_copies = sum(
            1 for i in range(n_inc) if (20_000_000 + i) not in kept_ids
        )
        dropped_fresh = sum(
            1 for i in range(n_inc) if (30_000_000 + i) not in kept_ids
        )
        results["semindex_inc_rows"] = 2 * n_inc
        results["semindex_dropped_copies"] = dropped_copies
        results["semindex_predicted_drops"] = predicted
        results["semindex_dropped_fresh"] = dropped_fresh
        results["semindex_ok"] = (
            dropped_copies == predicted and dropped_fresh == 0
        )
        print(
            f"  admission: dropped {dropped_copies} copies (predicted "
            f"{predicted}), {dropped_fresh} fresh",
            flush=True,
        )
        print(json.dumps(results))
        spark.stop()
        return

    # --- PCA → IVF-PQ end-to-end compression at 500k (--pca runs only
    # this).  ANISOTROPIC corpus (the shape PCA exists for — the main
    # sweep corpora are isotropic, where kNN-overlap claims are
    # meaningless, see operators/pca.py docstring): a 64-center mixture
    # whose variance concentrates in 16 rotated directions.  Pipeline:
    # PCA 64→16 float32, PQ m=4 over the compressed column → 4-byte
    # codes, a 64× design-point reduction of the 256-byte float32
    # vectors.  Sharp planted prediction: 1%-perturbed copies of corpus
    # vectors must retrieve their SOURCE in the routed ADC top-10
    # whenever the source's IVF cell is probed, and the probe-set hit
    # count is itself predicted exactly in numpy (boundary misses
    # predicted, not excused). ---
    if PCA_ONLY:
        from bigdataproject_formula1_telemetry_spark.operators import (
            pca as PCAx,
            pq as PQx,
        )

        rngp = np.random.default_rng(202)
        scales = np.array(
            [10, 8, 6, 5, 4, 4, 3, 3, 2.5, 2.5, 2, 2, 1.5, 1.5, 1.2, 1.2]
            + [0.25] * (DIM - 16)
        )
        basis = np.linalg.qr(rngp.standard_normal((DIM, DIM)))[0]
        centers_a = (rngp.standard_normal((64, DIM)) * scales) @ basis.T
        assign_a = rngp.integers(0, 64, size=N)
        pts = centers_a[assign_a] + 0.2 * rngp.standard_normal((N, DIM))
        write_corpus(
            f"{OUT}/aniso.parquet",
            np.arange(N, dtype=np.int64),
            pts.astype(np.float32),
        )
        aniso = spark.read.parquet(f"{OUT}/aniso.parquet")

        K_PCA = 16
        ptrain0 = sampling.deterministic_sample(
            aniso, ["vec_id"], 0.1, salt="pca-train"
        )
        t0 = time.time()
        model = PCAx.pca_train(ptrain0, k=K_PCA)
        results["pca_train_s"] = round(time.time() - t0, 2)
        results["pca_explained_frac"] = round(
            sum(model["explained_variance"]) / model["total_variance"], 4
        )
        t0 = time.time()
        PCAx.pca_transform(aniso, model).select(
            "vec_id", F.col("embedding_pca").alias("embedding")
        ).write.mode("overwrite").parquet(f"{OUT}/aniso_pca.parquet")
        results["pca_transform_s"] = round(time.time() - t0, 2)
        comp = spark.read.parquet(f"{OUT}/aniso_pca.parquet")

        ptrain = sampling.deterministic_sample(
            comp, ["vec_id"], 0.1, salt="pca-pq-train"
        )
        t0 = time.time()
        # fold_partials=True: this local corpus reads in ~32 partitions,
        # below the auto threshold — forcing the executor-side grouped
        # fold here makes the leg's EXACT numpy twin (below) certify the
        # wide-scan fold path at 500k scale (the paths are bit-equal by
        # the unit tests; this proves it on real artifacts)
        books = PQx.pq_train(
            ptrain, m=4, n_codes=256, max_iter=2, fold_partials=True
        )
        C_pq = sim.ivf_centroids(
            ptrain, n_clusters=64, max_iter=2, fold_partials=True
        )
        results["pca_pq_train_s"] = round(time.time() - t0, 2)
        ivfpq_path = f"{OUT}/aniso_ivfpq"
        t0 = time.time()
        PQx.build_inverted_file_pq(comp, C_pq, books, ivfpq_path)
        results["pca_ivfpq_build_s"] = round(time.time() - t0, 2)

        def du(p):
            if os.path.isfile(p):
                return os.path.getsize(p)
            total = 0
            for root, _, files in os.walk(p):
                total += sum(
                    os.path.getsize(os.path.join(root, f)) for f in files
                )
            return total

        results["pca_float_bytes"] = du(f"{OUT}/aniso.parquet")
        results["pca_ivfpq_bytes"] = du(ivfpq_path)
        results["pca_at_rest_design_x"] = DIM * 4 // 4  # 256 B → 4 B codes
        results["pca_at_rest_measured_x"] = round(
            results["pca_float_bytes"] / results["pca_ivfpq_bytes"], 1
        )

        n_probes_q = 50
        src = pts[:n_probes_q]
        pert = src + 0.01 * (
            np.linalg.norm(src, axis=1, keepdims=True) / np.sqrt(DIM)
        ) * rngp.standard_normal((n_probes_q, DIM))
        probes_raw = spark.createDataFrame(
            [(1_000_000_000 + i, v.tolist()) for i, v in enumerate(pert)],
            "vec_id long, embedding array<double>",
        )
        probes = PCAx.pca_transform(probes_raw, model).select(
            "vec_id", F.col("embedding_pca").alias("embedding")
        ).localCheckpoint(eager=True)

        # COMPLETE numpy twin of the stored index + ADC search (the r7
        # rewrite: the old prediction was routing-only — necessary but
        # not sufficient, since at 500k each of the 64 cells holds ~8k
        # codes and the 4-byte ADC ranking must ALSO place the source in
        # the top-10; it passed at --quick scale only because cells were
        # near-empty).  Twin inputs are the ARTIFACTS (stored compressed
        # vectors, stored codes/clusters, the collected probe vectors),
        # so every float decision is replayed bit-for-bit:
        #   1. re-encode + re-assign the whole corpus flat in numpy and
        #      assert equality with the stored inverted file, then
        #   2. replay the kernel's routing/LUT/tie-break arithmetic for
        #      the exact predicted top-10 per probe.
        import duckdb as _dk

        comp_tbl = _dk.sql(
            f"SELECT vec_id, embedding FROM read_parquet('{OUT}/aniso_pca.parquet/*.parquet') ORDER BY vec_id"
        ).fetchnumpy()
        comp_ids = comp_tbl["vec_id"].astype(np.int64)
        comp_X = np.stack(
            [np.asarray(v, dtype=np.float64) for v in comp_tbl["embedding"]]
        )
        idx_tbl = _dk.sql(
            f"SELECT vec_id, pq_codes, ivf_cluster FROM read_parquet('{ivfpq_path}/*/*.parquet', hive_partitioning=1) ORDER BY vec_id"
        ).fetchnumpy()
        assert np.array_equal(
            idx_tbl["vec_id"].astype(np.int64), comp_ids
        ), "inverted file lost rows"
        stored_codes = np.stack(
            [np.asarray(c, dtype=np.int64) for c in idx_tbl["pq_codes"]]
        )
        stored_cells = idx_tbl["ivf_cluster"].astype(np.int64)

        books_np = [np.asarray(b, dtype=np.float64) for b in books]
        bounds = PQx._split(K_PCA, len(books_np))
        codes_np = PQx._assign_codes(comp_X, books_np, bounds)
        C_np = np.asarray(C_pq, dtype=np.float64)
        norms = np.linalg.norm(comp_X, axis=1)
        norms[norms == 0] = 1.0
        cells_np = np.argmax((comp_X / norms[:, None]) @ C_np.T, axis=1)
        code_mism = int((codes_np != stored_codes).any(axis=1).sum())
        cell_mism = int((cells_np != stored_cells).sum())
        results["pca_twin_code_mismatches"] = code_mism
        results["pca_twin_cell_mismatches"] = cell_mism

        timed(
            "pca_knn_ivfpq_s",
            lambda: PQx.knn_ivfpq_materialized(
                spark, ivfpq_path, probes, C_pq, books, k=10, nprobe=8
            ),
            results,
        )
        got = PQx.knn_ivfpq_materialized(
            spark, ivfpq_path, probes, C_pq, books, k=10, nprobe=8
        ).collect()
        by_q: dict[int, list] = {}
        for r in got:
            by_q.setdefault(r.query_id, []).append((r.adc_dist, r.neighbor_id))
        hits = sum(
            1
            for q, v in by_q.items()
            if (q - 1_000_000_000) in [nid for _, nid in sorted(v)]
        )

        # 2. kernel-exact search replay from the STORED codes
        probe_rows = sorted(probes.collect(), key=lambda r: r["vec_id"])
        predicted_hits = 0
        for r in probe_rows:
            x = np.asarray(r["embedding"], dtype=np.float64)
            nrm = np.linalg.norm(x)
            sims = (x / (nrm if nrm else 1.0)) @ C_np.T
            top = np.argpartition(-sims, 7)[:8]
            routed = np.isin(stored_cells, top)
            lut = np.empty((len(books_np), books_np[0].shape[0]))
            for mi, (s0, e0) in enumerate(bounds):
                diff = books_np[mi] - x[s0:e0][None, :]
                lut[mi, : books_np[mi].shape[0]] = (diff * diff).sum(axis=1)
            acc = np.zeros(len(comp_ids))
            for mi in range(len(books_np)):
                acc += lut[mi, stored_codes[:, mi]]
            cand = np.nonzero(routed)[0]
            order = sorted(
                ((acc[i], int(comp_ids[i])) for i in cand),
                key=lambda t: (t[0], t[1]),
            )[:10]
            src_id = int(r["vec_id"]) - 1_000_000_000
            if src_id in {nid for _, nid in order}:
                predicted_hits += 1

        results["pca_source_in_top10"] = hits
        results["pca_predicted_probe_hits"] = predicted_hits
        results["pca_ok"] = (
            hits == predicted_hits and code_mism == 0 and cell_mism == 0
        )
        print(
            f"  pca train {results['pca_train_s']} s (expl "
            f"{results['pca_explained_frac']:.1%}), transform "
            f"{results['pca_transform_s']} s, ivfpq build "
            f"{results['pca_ivfpq_build_s']} s, search "
            f"{results['pca_knn_ivfpq_s']} s — at-rest "
            f"{results['pca_at_rest_measured_x']}× (design "
            f"{results['pca_at_rest_design_x']}×), source-in-top10 "
            f"{hits}/{n_probes_q} == predicted {predicted_hits}",
            flush=True,
        )
        print(json.dumps(results))
        spark.stop()
        return

    print("near_dedup_cosine, distinct corpus ...", flush=True)
    timed(
        "near_dedup_distinct_s",
        lambda: sim.near_dedup_cosine(distinct, planes, threshold=0.95),
        results,
    )
    survivors = sim.near_dedup_cosine(distinct, planes, threshold=0.95).count()
    release_barriers()
    results["distinct_survivors"] = survivors
    results["false_drops"] = N - survivors

    print("near_dedup_cosine, planted near-dups ...", flush=True)
    kept = sim.near_dedup_cosine(planted, planes, threshold=0.95)
    dropped = (
        planted.select("vec_id")
        .exceptAll(kept.select("vec_id"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("vec_id") >= 10_000_000).cast("long")).alias("n_planted"),
        )
        .first()
    )
    release_barriers()
    results["planted_dropped"] = dropped["n"]
    results["planted_dropped_planted"] = int(dropped["n_planted"] or 0)
    results["planted_recall_ok"] = (
        dropped["n"] == N_PLANTED and dropped["n_planted"] == N_PLANTED
    )
    print(f"  dropped {dropped['n']} ({dropped['n_planted']} planted)", flush=True)

    print("near_dedup_cosine, 10-way exact-replica corpus ...", flush=True)
    timed(
        "near_dedup_replica_s",
        lambda: sim.near_dedup_cosine(replica, planes, threshold=0.95),
        results,
    )
    rep_surv = sim.near_dedup_cosine(replica, planes, threshold=0.95).count()
    release_barriers()
    results["replica_survivors"] = rep_surv
    results["replica_ok"] = rep_surv == N_DISTINCT_REPLICA
    results["replica_vs_distinct_ratio"] = round(
        results["near_dedup_replica_s"] / results["near_dedup_distinct_s"], 2
    )

    # --- SemDeDup at scale: cluster-scoped semantic dedup ---
    # Centroids trained once on a 2% deterministic sample (the
    # production shape).  Sharp predictions:
    #   distinct  → ZERO drops (max pairwise cosine ≈ 0.9 < 0.95)
    #   planted   → dropped == the EXACT number of (source, twin) pairs
    #               whose two members assign to the same centroid,
    #               computed independently in numpy (cluster-scoped
    #               dedup misses cross-boundary pairs BY CONTRACT —
    #               the prediction covers that, no loose recall bar);
    #               every dropped id must be a member of such a pair
    #   replica   → survivors == N/10 exactly (identical-vector
    #               collapse, any threshold)
    from bigdataproject_formula1_telemetry_spark.operators import semdedup as SD

    print("semdedup (cluster-scoped semantic dedup) ...", flush=True)
    sd_train = sampling.deterministic_sample(
        distinct, ["vec_id"], 0.1 if QUICK else 0.02, salt="semdedup-train"
    )
    t0 = time.time()
    C_sd = sim.ivf_centroids(sd_train, n_clusters=64, max_iter=2)
    results["semdedup_train_s"] = round(time.time() - t0, 2)

    timed(
        "semdedup_distinct_s",
        lambda: SD.semantic_dedup(distinct, C_sd, threshold=0.95),
        results,
    )
    sd_surv = SD.semantic_dedup(distinct, C_sd, threshold=0.95).count()
    release_barriers()
    results["semdedup_distinct_survivors"] = sd_surv
    results["semdedup_false_drops"] = N - sd_surv

    # numpy-predicted planted outcome: same-cluster (source, twin) pairs
    src_idx = np.load(f"{OUT}/planted_src.npy")
    dup_vecs = np.load(f"{OUT}/planted_dup.npy").astype(np.float64)
    base_tbl = pq.read_table(f"{OUT}/distinct.parquet", columns=["vec_id", "embedding"])
    base_mat = np.asarray(
        base_tbl.column("embedding").combine_chunks().flatten()
    ).reshape(N, DIM).astype(np.float64)
    Cn = np.asarray(C_sd, dtype=np.float64)

    def _assign(M):
        nrm = np.linalg.norm(M, axis=1)
        nrm[nrm == 0] = 1.0
        return np.argmax((M / nrm[:, None]) @ Cn.T, axis=1)

    a_src = _assign(base_mat[src_idx])
    a_dup = _assign(dup_vecs)
    same = a_src == a_dup
    predicted_drops = int(same.sum())
    pair_members = set(int(s) for s in src_idx[same]) | set(
        int(10_000_000 + i) for i in np.nonzero(same)[0]
    )
    kept_sd = SD.semantic_dedup(planted, C_sd, threshold=0.95)
    dropped_ids = [
        r.vec_id
        for r in planted.select("vec_id")
        .exceptAll(kept_sd.select("vec_id"))
        .collect()
    ]
    release_barriers()
    results["semdedup_planted_dropped"] = len(dropped_ids)
    results["semdedup_planted_predicted"] = predicted_drops
    results["semdedup_planted_ok"] = (
        len(dropped_ids) == predicted_drops
        and all(i in pair_members for i in dropped_ids)
    )
    print(
        f"  planted: dropped {len(dropped_ids)} (predicted {predicted_drops}, "
        f"cross-boundary misses {int((~same).sum())})",
        flush=True,
    )

    timed(
        "semdedup_replica_s",
        lambda: SD.semantic_dedup(replica, C_sd, threshold=0.95),
        results,
    )
    sd_rep = SD.semantic_dedup(replica, C_sd, threshold=0.95).count()
    release_barriers()
    results["semdedup_replica_survivors"] = sd_rep
    results["semdedup_replica_ok"] = sd_rep == N_DISTINCT_REPLICA

    # --- IVF at scale: 64 clusters, nprobe 8, 100 queries, k=10 ---
    def ivf_leg(corpus, tag: str) -> None:
        print(f"[{tag}] ivf_centroids (2% sample, 2 Lloyd rounds) ...", flush=True)
        t0 = time.time()
        train = sampling.deterministic_sample(
            corpus, ["vec_id"], 0.1 if QUICK else 0.02, salt="sweep-ivf"
        )
        C = sim.ivf_centroids(train, n_clusters=64, max_iter=2)
        results[f"{tag}_ivf_train_s"] = round(time.time() - t0, 2)
        queries = corpus.where(F.col("vec_id") < 100)

        timed(
            f"{tag}_knn_exact_s",
            lambda: sim.knn_bruteforce_arrow(corpus, queries, k=10),
            results,
        )
        timed(
            f"{tag}_knn_ivf_s",
            lambda: sim.knn_ivf_arrow(corpus, queries, C, k=10, nprobe=8),
            results,
        )

        exact = sim.knn_bruteforce_arrow(corpus, queries, k=10).select(
            "query_id", "neighbor_id"
        )
        ivf = sim.knn_ivf_arrow(corpus, queries, C, k=10, nprobe=8).select(
            "query_id", F.col("neighbor_id").alias("ivf_neighbor_id")
        )
        joined = exact.join(
            ivf,
            (exact["query_id"] == ivf["query_id"])
            & (exact["neighbor_id"] == ivf["ivf_neighbor_id"]),
            "left",
        )
        rec = joined.groupBy(exact["query_id"]).agg(
            (F.count("ivf_neighbor_id") / F.lit(10.0)).alias("recall")
        )
        mean_recall = rec.agg(F.avg("recall")).first()[0]
        results[f"{tag}_ivf_mean_recall"] = round(mean_recall, 3)
        print(f"  [{tag}] mean recall {mean_recall:.3f}", flush=True)

    clustered = spark.read.parquet(f"{OUT}/clustered.parquet")
    ivf_leg(clustered, "clustered")
    ivf_leg(distinct, "iid")

    # --- int8 serving at scale: quantize once (write-path cost, staged
    # outside the timer), then brute-force kNN on the stored codes;
    # top-k overlap vs the float path must hold at 500k ---
    print("int8 serving leg (quantize once, kNN on codes) ...", flush=True)
    q8_path = f"{OUT}/distinct_q8.parquet"
    sim.quantize_embeddings(distinct).select("vec_id", "embedding_q8").write.mode(
        "overwrite"
    ).parquet(q8_path)
    q8 = spark.read.parquet(q8_path)
    queries_q8 = q8.where(F.col("vec_id") < 100)
    queries_f = distinct.where(F.col("vec_id") < 100)
    timed(
        "knn_q8_s",
        lambda: sim.knn_bruteforce_arrow(
            q8, queries_q8, k=10, vec_col="embedding_q8", quantized=True
        ),
        results,
    )
    f_top = sim.knn_bruteforce_arrow(distinct, queries_f, k=10).collect()
    q_top = sim.knn_bruteforce_arrow(
        q8, queries_q8, k=10, vec_col="embedding_q8", quantized=True
    ).collect()
    fa: dict[int, set] = {}
    qa: dict[int, set] = {}
    for r in f_top:
        fa.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in q_top:
        qa.setdefault(r.query_id, set()).add(r.neighbor_id)
    overlap = sum(
        len(s & qa.get(qid, set())) / 10.0 for qid, s in fa.items()
    ) / len(fa)
    results["q8_topk_overlap"] = round(overlap, 3)
    results["q8_overlap_ok"] = overlap >= 0.9
    print(f"  q8 top-10 overlap {overlap:.3f}", flush=True)
    # the gate runs on the realistic (clustered) corpus; the i.i.d.
    # number is the structureless floor (~nprobe/n_clusters + the
    # query's own cluster), reported for honesty not gated
    results["ivf_recall_ok"] = results["clustered_ivf_mean_recall"] >= 0.8

    # --- PQ / IVF-PQ at scale: train on a 10% deterministic sample,
    # build the float-free inverted file once (ingest cost), then the
    # serving path is a partition-pruned scan of 8-byte codes.  Quality
    # gate on the clustered (realistic) corpus: PQ top-10 inside the
    # exact float top-50 ---
    print("PQ / IVF-PQ serving leg (clustered corpus) ...", flush=True)
    from bigdataproject_formula1_telemetry_spark.operators import pq as PQlib

    train = sampling.deterministic_sample(
        clustered, ["vec_id"], 0.1, salt="pq-train"
    )
    t0 = time.time()
    books = PQlib.pq_train(train, m=8, n_codes=256, max_iter=2)
    results["pq_train_s"] = round(time.time() - t0, 2)
    C_pq = sim.ivf_centroids(train, n_clusters=64, max_iter=2)
    ivfpq_path = f"{OUT}/ivfpq_table"
    t0 = time.time()
    PQlib.build_inverted_file_pq(clustered, C_pq, books, ivfpq_path)
    results["ivfpq_build_s"] = round(time.time() - t0, 2)

    def du(p):
        if os.path.isfile(p):
            return os.path.getsize(p)
        total = 0
        for root, _, files in os.walk(p):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return total

    results["ivfpq_bytes"] = du(ivfpq_path)
    results["float_bytes"] = du(f"{OUT}/clustered.parquet")
    results["pq_compression_at_rest"] = round(
        results["float_bytes"] / results["ivfpq_bytes"], 1
    )
    # quality gate (well-posed at PQ's distortion scale): a 1%-perturbed
    # copy of a corpus vector must retrieve its SOURCE in the routed
    # top-10.  (Top-10-vs-exact-top-50 overlap is deliberately NOT the
    # gate: in a dense Gaussian cluster the exact neighbor gaps are
    # noise-scale, below 8-byte-PQ resolution — an information property
    # of the code budget, not an implementation defect.)
    src_rows = clustered.where(F.col("vec_id") < 50).collect()
    rngq = np.random.default_rng(123)
    probe_rows = []
    for r in src_rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        v = v + rngq.normal(0, 0.01 * np.linalg.norm(v) / np.sqrt(len(v)), len(v))
        probe_rows.append((int(r["vec_id"]) + 1_000_000_000, v.tolist()))
    probes = spark.createDataFrame(
        probe_rows, schema="vec_id long, embedding array<double>"
    )
    timed(
        "knn_ivfpq_s",
        lambda: PQlib.knn_ivfpq_materialized(
            spark, ivfpq_path, probes, C_pq, books, k=10, nprobe=8
        ),
        results,
    )
    got_pq = PQlib.knn_ivfpq_materialized(
        spark, ivfpq_path, probes, C_pq, books, k=10, nprobe=8
    ).collect()
    g10_d: dict[int, list] = {}
    for r in got_pq:
        g10_d.setdefault(r.query_id, []).append((r.adc_dist, r.neighbor_id))
    g10 = {q: [n for _, n in sorted(v)] for q, v in g10_d.items()}
    hits = sum(
        1 for qid, nbrs in g10.items() if (qid - 1_000_000_000) in nbrs
    )
    top1 = sum(
        1 for qid, nbrs in g10.items() if nbrs and nbrs[0] == qid - 1_000_000_000
    )
    results["ivfpq_source_in_top10"] = round(hits / len(probe_rows), 3)
    results["ivfpq_source_top1"] = round(top1 / len(probe_rows), 3)
    results["ivfpq_quality_ok"] = hits / len(probe_rows) >= 0.9
    print(
        f"  pq train {results['pq_train_s']} s, ivfpq build "
        f"{results['ivfpq_build_s']} s, search {results['knn_ivfpq_s']} s, "
        f"{results['pq_compression_at_rest']}× at rest, source-in-top10 "
        f"{hits}/{len(probe_rows)} (top1 {top1})",
        flush=True,
    )

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
