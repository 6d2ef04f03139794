"""Similarity search tests: brute-force kNN sanity on real embeddings and
sign-LSH recall vs the exact baseline."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark import io
from bigdataproject_formula1_telemetry_spark.operators import similarity as sim
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return io.read_table(spark, SF_SMOKE, "embeddings")


def np_topk(pdf, qid, k=5):
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in pdf.itertuples(index=False)}
    q = vecs[qid]
    scores = []
    for vid, v in vecs.items():
        if vid == qid:
            continue
        cos = float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
        scores.append((-cos, vid))
    return [vid for _, vid in sorted(scores)[:k]]


def test_bruteforce_matches_numpy(spark, emb):
    pdf = emb.toPandas()
    queries = emb.where(F.col("vec_id") < 3)
    got = sim.knn_bruteforce(emb, queries, k=5).toPandas()
    for qid in range(3):
        g = got[got["query_id"] == qid].sort_values("cos_sim", ascending=False)
        assert list(g["neighbor_id"]) == np_topk(pdf, qid, 5)


def test_lsh_recall_vs_bruteforce(spark, emb):
    rng = np.random.default_rng(42)
    dim = 64
    # 10 independent tables × 3 planes: recall from the union of buckets
    tables = [rng.normal(size=(3, dim)).tolist() for _ in range(10)]
    queries = emb.where(F.col("vec_id") < 20)
    exact = sim.knn_bruteforce(emb, queries, k=5).toPandas()
    approx = sim.knn_lsh(emb, queries, tables, k=5).toPandas()
    recalls = []
    for qid in range(20):
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        if e:
            recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) > 0.5, np.mean(recalls)
    # approx scores are true cosines (scoring is exact inside the bucket)
    merged = approx.merge(exact, on=["query_id", "neighbor_id"], suffixes=("_a", "_e"))
    assert np.allclose(merged["cos_sim_a"], merged["cos_sim_e"], atol=1e-9)


def test_lsh_bucket_determinism(spark, emb):
    rng = np.random.default_rng(1)
    planes = rng.normal(size=(4, 64)).tolist()
    a = emb.select("vec_id", sim.signlsh_bucket(F.col("embedding"), planes).alias("b")).toPandas()
    b = emb.select("vec_id", sim.signlsh_bucket(F.col("embedding"), planes).alias("b")).toPandas()
    m = a.merge(b, on="vec_id")
    assert (m["b_x"] == m["b_y"]).all()
    assert a["b"].nunique() > 1


def test_near_dedup_cosine_planted_duplicates(spark):
    """Planted near-identical vectors must be dropped (keep-lowest-id),
    everything else kept — checked against a numpy brute-force oracle."""
    import pandas as pd

    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 16))
    rows = [(i, base[i].tolist()) for i in range(40)]
    # ids 100..104 are near-dups of ids 0..4 (tiny perturbation)
    for j in range(5):
        rows.append((100 + j, (base[j] + 0.01 * rng.standard_normal(16)).tolist()))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    sdf = spark.createDataFrame(pdf)
    planes = [
        [[float(x) for x in rng.standard_normal(16)] for _ in range(6)]
        for _ in range(6)
    ]
    kept = sorted(
        r.vec_id
        for r in sim.near_dedup_cosine(sdf, planes, threshold=0.95).collect()
    )

    # numpy oracle: greedy drop id_b of every pair with cosine >= 0.95
    vecs = {r[0]: np.array(r[1]) for r in rows}
    ids = sorted(vecs)
    dropped = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            c = vecs[a] @ vecs[b] / (
                np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])
            )
            if c >= 0.95:
                dropped.add(b)
    assert kept == [i for i in ids if i not in dropped]
    assert set(range(100, 105)).isdisjoint(kept)


def test_cosine_dup_pairs_precision_exact(spark):
    """Every emitted pair must genuinely clear the threshold (verification
    makes precision exact even when LSH buckets collide)."""
    import pandas as pd

    rng = np.random.default_rng(9)
    pdf = pd.DataFrame(
        {
            "vec_id": range(30),
            "embedding": [rng.standard_normal(8).tolist() for _ in range(30)],
        }
    )
    sdf = spark.createDataFrame(pdf)
    planes = [[[float(x) for x in rng.standard_normal(8)] for _ in range(2)]]
    got = sim.cosine_dup_pairs(sdf, planes, threshold=0.9).toPandas()
    vecs = pdf.set_index("vec_id")["embedding"].map(np.array)
    for r in got.itertuples(index=False):
        a, b = vecs[r.id_a], vecs[r.id_b]
        c = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert c >= 0.9 - 1e-9


def test_ivf_full_probe_equals_bruteforce(spark, emb):
    """nprobe == n_clusters degenerates IVF to exact search: every cluster
    is probed, so the candidate set is the whole corpus."""
    C = sim.ivf_centroids(emb, n_clusters=4, max_iter=4)
    queries = emb.where(F.col("vec_id") < 5)
    exact = sim.knn_bruteforce(emb, queries, k=5).toPandas()
    ivf = sim.knn_ivf(emb, queries, C, k=5, nprobe=4).toPandas()
    for qid in range(5):
        e = exact[exact["query_id"] == qid].sort_values("cos_sim", ascending=False)
        a = ivf[ivf["query_id"] == qid].sort_values("cos_sim", ascending=False)
        assert list(e["neighbor_id"]) == list(a["neighbor_id"]), qid


def test_ivf_recall_vs_bruteforce(spark, emb):
    """Partial probing keeps most of the true neighbors (the whole point
    of the inverted file: ~nprobe/n_clusters of the corpus scanned)."""
    C = sim.ivf_centroids(emb, n_clusters=8, max_iter=6)
    queries = emb.where(F.col("vec_id") < 20)
    exact = sim.knn_bruteforce(emb, queries, k=5).toPandas()
    ivf = sim.knn_ivf(emb, queries, C, k=5, nprobe=3).toPandas()
    recalls = []
    for qid in range(20):
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(ivf[ivf["query_id"] == qid]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.6, recalls


def test_ivf_centroids_deterministic_and_normalized(spark, emb):
    C1 = sim.ivf_centroids(emb, n_clusters=4, max_iter=3)
    C2 = sim.ivf_centroids(emb, n_clusters=4, max_iter=3)
    assert np.allclose(np.asarray(C1), np.asarray(C2))
    norms = np.linalg.norm(np.asarray(C1), axis=1)
    assert np.allclose(norms, 1.0)


def test_near_dedup_replica_corpus_and_identity_grouping(spark):
    """Replica-heavy corpus (every vector duplicated 10x): the identity
    grouping must keep exactly one copy per distinct vector without the
    pair join ever seeing the copies, and survivors must equal the
    single-copy result."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(30, 8))
    rows = []
    for r in range(10):
        for i in range(30):
            rows.append((r * 1000 + i, [float(x) for x in base[i]]))
    sdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = [rng.normal(size=(4, 8)).tolist() for _ in range(3)]
    kept = sorted(
        r.vec_id for r in sim.near_dedup_cosine(sdf, planes, 0.95).collect()
    )
    single = spark.createDataFrame(rows[:30], "vec_id long, embedding array<double>")
    kept_single = sorted(
        r.vec_id for r in sim.near_dedup_cosine(single, planes, 0.95).collect()
    )
    # every survivor is a replica-0 id, and matches the single-copy run
    assert kept == kept_single


def test_near_dedup_zero_vectors_survive(spark):
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0])]
    sdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = [[[0.3, -0.7], [0.9, 0.1]]]
    kept = sorted(r.vec_id for r in sim.near_dedup_cosine(sdf, planes, 0.95).collect())
    # identical zero vectors have NULL cosine -> both survive; the
    # identical unit vectors dedup to the min id
    assert kept == [0, 1, 2]


def test_near_dedup_null_vectors_survive(spark):
    """NULL embeddings must not crash the Arrow bucket assigner: they map
    to the zero vector (candidate later rejected by the exact cosine),
    mirroring the zero-norm exemption above."""
    rows = [(0, None), (1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, None)]
    sdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    planes = [[[0.3, -0.7], [0.9, 0.1]]]
    kept = sorted(r.vec_id for r in sim.near_dedup_cosine(sdf, planes, 0.95).collect())
    # NULL vectors survive (no defined similarity); the identical unit
    # vectors dedup to the min id
    assert kept == [0, 1, 3]


def test_knn_lsh_null_vectors_do_not_crash(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, None), (3, [0.0, 1.0])]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.where(F.col("vec_id") == 0)
    planes = [[[0.3, -0.7], [0.9, 0.1]]]
    out = sim.knn_lsh(corpus, queries, planes, k=2).collect()
    assert all(r.neighbor_id != 2 or r.cos_sim is None for r in out)


def test_knn_bruteforce_arrow_matches_hof_form(spark, emb):
    """The Arrow-matmul exact kNN must return the same neighbor sets and
    (to float-noise) the same scores as the interpreted-HOF form."""
    q = emb.where(F.col("vec_id") < 10)
    a = sim.knn_bruteforce(emb, q, k=5).orderBy("query_id", "neighbor_id").collect()
    b = (
        sim.knn_bruteforce_arrow(emb, q, k=5)
        .orderBy("query_id", "neighbor_id")
        .collect()
    )
    assert [(r.query_id, r.neighbor_id) for r in a] == [
        (r.query_id, r.neighbor_id) for r in b
    ]
    for ra, rb in zip(a, b):
        assert abs(ra.cos_sim - rb.cos_sim) < 1e-9


def test_knn_bruteforce_arrow_null_and_zero_vectors(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, None), (3, [0.0, 0.0]), (4, [0.5, 0.1])]
    sdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sim.knn_bruteforce_arrow(sdf, sdf.where(F.col("vec_id") == 0), k=3).collect()
    got = sorted(r.neighbor_id for r in out)
    # NULL and zero-norm vectors never enter the top-k while finite
    # candidates remain
    assert got == [1, 4]


def test_knn_ivf_arrow_matches_join_form(spark, emb):
    """The fused single-scan IVF form must return the same neighbors as
    the join-based inverted-file form for the same quantizer."""
    C = sim.ivf_centroids(emb, n_clusters=8, max_iter=3)
    q = emb.where(F.col("vec_id") < 10)
    a = sim.knn_ivf(emb, q, C, k=5, nprobe=4).orderBy("query_id", "neighbor_id").collect()
    b = (
        sim.knn_ivf_arrow(emb, q, C, k=5, nprobe=4)
        .orderBy("query_id", "neighbor_id")
        .collect()
    )
    assert [(r.query_id, r.neighbor_id) for r in a] == [
        (r.query_id, r.neighbor_id) for r in b
    ]
    for ra, rb in zip(a, b):
        assert abs(ra.cos_sim - rb.cos_sim) < 1e-9


def test_knn_ivf_null_corpus_vectors_do_not_crash(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, None), (3, [0.0, 1.0])]
    sdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C = [[1.0, 0.0], [0.0, 1.0]]
    q = sdf.where(F.col("vec_id") == 0)
    for fn in (sim.knn_ivf, sim.knn_ivf_arrow):
        out = fn(sdf, q, C, k=3, nprobe=2).collect()
        assert all(r.neighbor_id != 2 or r.cos_sim is None for r in out)


def test_knn_arrow_null_query_vectors_yield_no_rows(spark):
    """A NULL *query* embedding must not crash the Arrow forms (np.stack
    on a 0-d NaN array did); it yields zero output rows for that query —
    the documented Arrow-form divergence from the NULL-sim-filling
    expression form.  Finite queries in the same set are unaffected."""
    rows = [(0, [1.0, 0.0]), (1, None), (2, [0.9, 0.1]), (3, [0.0, 1.0])]
    sdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = sdf.where(F.col("vec_id").isin(0, 1))
    C = [[1.0, 0.0], [0.0, 1.0]]
    for out in (
        sim.knn_bruteforce_arrow(sdf, q, k=2).collect(),
        sim.knn_ivf_arrow(sdf, q, C, k=2, nprobe=2).collect(),
    ):
        assert {r.query_id for r in out} == {0}
        assert sorted(r.neighbor_id for r in out) == [2, 3]
    # all-NULL query set → empty frame, not a crash
    all_null = sdf.where(F.col("vec_id") == 1)
    assert sim.knn_bruteforce_arrow(sdf, all_null, k=2).count() == 0


def test_knn_arrow_string_ids_preserved(spark):
    """Id field types in the Arrow forms derive from the input schemas:
    string vec_ids must survive with string output columns and the same
    neighbors as the expression form."""
    rows = [
        ("a", [1.0, 0.0]),
        ("b", [0.9, 0.1]),
        ("c", [0.0, 1.0]),
        ("d", [0.5, 0.2]),
    ]
    sdf = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    q = sdf.where(F.col("vec_id") == "a")
    out = sim.knn_bruteforce_arrow(sdf, q, k=2)
    assert dict(out.dtypes) == {
        "query_id": "string",
        "neighbor_id": "string",
        "cos_sim": "double",
    }
    got = [(r.query_id, r.neighbor_id) for r in
           out.orderBy(F.col("cos_sim").desc()).collect()]
    ref = [(r.query_id, r.neighbor_id) for r in
           sim.knn_bruteforce(sdf, q, k=2)
           .orderBy(F.col("cos_sim").desc()).collect()]
    assert got == ref == [("a", "b"), ("a", "d")]


def test_embedding_quantization_roundtrip_preserves_cosine(spark, emb):
    """int8 quantize → dequantize on real embeddings: max elementwise
    error ≤ scale/254 (half a code step), kNN neighbor sets unchanged,
    and zero vectors survive as exact zeros."""
    q = sim.quantize_embeddings(emb)
    assert dict(q.dtypes)["embedding_q8"] == "array<tinyint>"
    back = sim.dequantize_embeddings(q.drop("embedding"))

    a = {r.vec_id: r.embedding for r in emb.collect()}
    b = {r.vec_id: (r.embedding, r.q8_scale) for r in
         sim.quantize_embeddings(emb).select(
             "vec_id", "q8_scale",
             sim.F.col("embedding").alias("orig")
         ).join(back.select("vec_id", "embedding"), "vec_id")
         .select("vec_id", "embedding", "q8_scale").collect()}
    for vid, (vb, scale) in b.items():
        err = np.max(np.abs(np.array(a[vid]) - np.array(vb)))
        assert err <= scale / 254.0 + 1e-12, (vid, err, scale)

    queries = emb.where(F.col("vec_id") < 5)
    exact = sim.knn_bruteforce(emb, queries, k=5).collect()
    approx = sim.knn_bruteforce(back, queries.select("vec_id", "embedding"), k=5).collect()
    exact_sets: dict = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx_sets: dict = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    # random embeddings have tightly clustered top-5 cosines, so 8-bit
    # rounding may legitimately swap a marginal neighbor — require high
    # overlap, and bound the cosine perturbation directly below
    overlaps = [
        len(exact_sets[q] & approx_sets[q]) / 5.0 for q in exact_sets
    ]
    assert sum(overlaps) / len(overlaps) >= 0.8, overlaps
    cos_by_pair = {(r.query_id, r.neighbor_id): r.cos_sim for r in approx}
    both = [
        (r.cos_sim, cos_by_pair[(r.query_id, r.neighbor_id)])
        for r in exact
        if (r.query_id, r.neighbor_id) in cos_by_pair
    ]
    assert both and all(abs(e - a) < 0.02 for e, a in both)

    z = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    zq = sim.dequantize_embeddings(
        sim.quantize_embeddings(z).drop("embedding")
    ).first()
    assert zq.embedding == [0.0, 0.0, 0.0]


def test_knn_quantized_serving_overlap(spark, emb):
    """int8 serving path: kNN scored directly on quantize_embeddings
    codes (quantized=True, float32 matmul) must keep mean top-k overlap
    >= 0.9 vs the float path for both Arrow forms — cosine is invariant
    to the per-vector q8_scale, so the only divergence is 8-bit rounding
    perturbing near-ties."""
    q8 = sim.quantize_embeddings(emb).select("vec_id", "embedding_q8")
    queries_f = emb.where(F.col("vec_id") < 10)
    queries_q = q8.where(F.col("vec_id") < 10)

    def overlap(a, b, k):
        na = {}
        for r in a:
            na.setdefault(r.query_id, set()).add(r.neighbor_id)
        tot = 0.0
        cnt = 0
        nb = {}
        for r in b:
            nb.setdefault(r.query_id, set()).add(r.neighbor_id)
        for qid, s in na.items():
            tot += len(s & nb.get(qid, set())) / k
            cnt += 1
        return tot / cnt

    k = 5
    f_bf = sim.knn_bruteforce_arrow(emb, queries_f, k=k).collect()
    q_bf = sim.knn_bruteforce_arrow(
        q8, queries_q, k=k, vec_col="embedding_q8", quantized=True
    ).collect()
    assert overlap(f_bf, q_bf, k) >= 0.9

    C = sim.ivf_centroids(emb, n_clusters=8, max_iter=2)
    f_ivf = sim.knn_ivf_arrow(emb, queries_f, C, k=k, nprobe=4).collect()
    q_ivf = sim.knn_ivf_arrow(
        q8, queries_q, C, k=k, nprobe=4, vec_col="embedding_q8", quantized=True
    ).collect()
    assert overlap(f_ivf, q_ivf, k) >= 0.9


def test_inverted_file_partition_prunes_and_matches_join_form(spark, emb, tmp_path):
    """The materialized-IVF path (build_inverted_file → knn_ivf_materialized)
    must (a) push the union of probed cluster ids down as a PARTITION
    filter — the scan reads ~nprobe/n_clusters of the table's
    directories, the whole point of materializing the inverted file —
    and (b) return exactly the flat-corpus join form's results (same
    probe math, same tie-break)."""
    import re

    C = sim.ivf_centroids(emb, n_clusters=8, max_iter=3)
    root = str(tmp_path / "ivf_table")
    sim.build_inverted_file(emb, C, root)

    queries = emb.where(F.col("vec_id") < 2)
    got = sim.knn_ivf_materialized(spark, root, queries, C, k=5, nprobe=3)

    plan = got._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ivf_cluster" in m.group(1), plan[:2000]

    g = got.toPandas().sort_values(
        ["query_id", "cos_sim", "neighbor_id"], ascending=[True, False, True]
    )
    f = (
        sim.knn_ivf(emb, queries, C, k=5, nprobe=3)
        .toPandas()
        .sort_values(
            ["query_id", "cos_sim", "neighbor_id"], ascending=[True, False, True]
        )
    )
    assert list(g["query_id"]) == list(f["query_id"])
    assert list(g["neighbor_id"]) == list(f["neighbor_id"])
    assert np.allclose(g["cos_sim"].to_numpy(), f["cos_sim"].to_numpy(), atol=1e-9)

    # the filter is a strict subset: fewer clusters probed than exist
    # (2 queries x nprobe 3 => at most 6 of the 8 cluster directories)
    in_list = re.search(r"IN \(([^)]*)\)", m.group(1))
    assert in_list is not None, m.group(1)
    probed_ids = set(int(x) for x in re.findall(r"\d+", in_list.group(1)))
    assert 0 < len(probed_ids) <= 6, m.group(1)


def test_inverted_file_incremental_append_and_quantized_serving(spark, emb, tmp_path):
    """The 100 TB maintenance + serving combos, composed from existing
    pieces: (a) new vectors appended to the inverted file (one more
    assignment pass, mode="append") are found by the partition-pruned
    search; (b) an inverted file built from int8 codes serves kNN
    directly on the codes (cosine is scale-invariant), top-k overlap vs
    the float path ≥ 0.9."""
    import re

    C = sim.ivf_centroids(emb, n_clusters=8, max_iter=3)
    root = str(tmp_path / "ivf_inc")
    old = emb.where(F.col("vec_id") >= 100)
    new = emb.where(F.col("vec_id") < 100)
    sim.build_inverted_file(old, C, root)
    sim.build_inverted_file(new, C, root, mode="append")

    queries = emb.where(F.col("vec_id") < 2)
    got = sim.knn_ivf_materialized(spark, root, queries, C, k=5, nprobe=3)
    flat = sim.knn_ivf(emb, queries, C, k=5, nprobe=3)
    g = got.toPandas().sort_values(
        ["query_id", "cos_sim", "neighbor_id"], ascending=[True, False, True]
    )
    f = flat.toPandas().sort_values(
        ["query_id", "cos_sim", "neighbor_id"], ascending=[True, False, True]
    )
    assert list(g["neighbor_id"]) == list(f["neighbor_id"])

    # quantized inverted file: codes partitioned by (float-assigned)
    # cluster, searched directly
    q8 = sim.quantize_embeddings(emb).select(
        "vec_id", F.col("embedding_q8").alias("embedding")
    )
    root_q8 = str(tmp_path / "ivf_q8")
    sim.build_inverted_file(q8, C, root_q8)
    got_q8 = sim.knn_ivf_materialized(spark, root_q8, q8.where(F.col("vec_id") < 2), C, k=5, nprobe=3)
    plan = got_q8._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*ivf_cluster", plan)
    gq = got_q8.toPandas()
    overlap = 0.0
    for qid in (0, 1):
        a = set(g[g["query_id"] == qid]["neighbor_id"])
        b = set(gq[gq["query_id"] == qid]["neighbor_id"])
        overlap += len(a & b) / 5.0
    assert overlap / 2 >= 0.9, overlap / 2


def test_ivf_balance_report(spark, tmp_path):
    import numpy as np
    from bigdataproject_formula1_telemetry_spark.operators import similarity as sim

    rng = np.random.default_rng(6)
    # two tight clusters, deliberately imbalanced 3:1
    a = rng.normal(0, 0.05, (150, 8)) + np.array([1.0] * 8)
    b = rng.normal(0, 0.05, (50, 8)) + np.array([-1.0] * 8)
    X = np.vstack([a, b])
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>",
    )
    C = sim.ivf_centroids(df, n_clusters=2, max_iter=5)
    p = str(tmp_path / "ivf_bal")
    sim.build_inverted_file(df, C, p)
    rep = sim.ivf_balance_report(spark, p).collect()
    counts = sorted(r["n_vectors"] for r in rep)
    assert counts == [50, 150]
    assert rep[0]["n_vectors"] == 150  # ordered hot-first
    # the gauge a re-cluster trigger computes
    ratio = max(counts) / (sum(counts) / len(counts))
    assert 1.4 < ratio <= 2.0


def test_pairwise_cosine_udf_one_side_all_null_batch(spark):
    """Regression: an Arrow batch whose LEFT column is entirely NULL
    must still build a correctly-shaped nan filler (the dim comes from
    either column).  With the filler keyed to the left column only this
    crashed np.stack — and surfaced as an ordering-dependent flake in
    near_dedup_cosine, because whether such a batch occurs depends on
    partitioning."""
    df = spark.createDataFrame(
        [(None, [1.0, 0.0]), (None, [0.0, 1.0])],
        "va array<double>, vb array<double>",
    )
    cos = sim._pairwise_cosine_udf()
    out = df.select(cos("va", "vb").alias("c")).collect()
    import math
    assert all(r["c"] is None or math.isnan(r["c"]) for r in out)
    # and the symmetric case
    df2 = spark.createDataFrame(
        [([1.0, 0.0], None)], "va array<double>, vb array<double>"
    )
    [r2] = df2.select(cos("va", "vb").alias("c")).collect()
    assert r2["c"] is None or math.isnan(r2["c"])


def test_embedding_health_report(spark):
    rows = [
        (0, [1.0, 2.0]),
        (1, [3.0, 4.0]),
        (2, None),
        (3, [0.0, 0.0]),
        (4, [float("nan"), 1.0]),
        (5, [1.0, 2.0, 3.0]),  # dim mismatch vs majority dim 2
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    rep = {r["key"]: r["value"] for r in sim.embedding_health_report(df).collect()}
    assert rep["n_rows"] == 6
    assert rep["n_null"] == 1
    assert rep["n_zero_norm"] == 1
    assert rep["n_nan"] == 1
    assert rep["n_dim_mismatch"] == 1
    assert rep["dim_mode"] == 2.0
    assert rep["norm_p50"] is not None and rep["norm_p50"] > 0


def test_cosine_dup_pairs_bucket_cap_groupby_not_window(spark, caplog):
    """Adversarial degenerate bucket: many near-identical vectors land in
    one sign-LSH bucket in every table.  max_bucket_size must drop those
    buckets via the groupBy+anti-join shape (logged, never silent), and a
    cap larger than any bucket must be a no-op — mirroring
    test_bucket_cap_bounds_adversarial_corpus on the embedding axis."""
    import logging

    import pandas as pd

    rng = np.random.default_rng(17)
    base = rng.standard_normal(8)
    n = 40
    vecs = [(base + rng.standard_normal(8) * 1e-3).tolist() for _ in range(n)]
    vecs += [rng.standard_normal(8).tolist() for _ in range(4)]
    pdf = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": vecs})
    sdf = spark.createDataFrame(pdf)
    planes = [[[float(x) for x in rng.standard_normal(8)] for _ in range(2)]]

    uncapped = sim.cosine_dup_pairs(sdf, planes, threshold=0.99).count()
    assert uncapped == n * (n - 1) // 2

    with caplog.at_level(
        logging.WARNING,
        logger="bigdataproject_formula1_telemetry_spark.operators.similarity",
    ):
        capped = sim.cosine_dup_pairs(
            sdf, planes, threshold=0.99, max_bucket_size=10
        ).count()
    assert capped == 0
    assert any("oversized LSH bucket" in r.message for r in caplog.records)

    assert (
        sim.cosine_dup_pairs(
            sdf, planes, threshold=0.99, max_bucket_size=len(vecs)
        ).count()
        == uncapped
    )


def test_arrow_knn_heavy_ties_layout_invariant(spark):
    """r7 regression twin of test_pq heavy-ties: EXACT duplicate vectors
    tie at cos_sim 1.0 — the Arrow kernels' per-batch pre-truncation
    must use the global (sim desc, id asc) order, not batch row order."""
    import numpy as np

    rng = np.random.default_rng(21)
    base = rng.standard_normal(16)
    dup = base.tolist()
    rows = [(int(i), dup) for i in range(40)] + [
        (1000 + int(i), rng.standard_normal(16).tolist()) for i in range(100)
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(9)
    q = spark.createDataFrame(
        [(99_999, dup)], "vec_id long, embedding array<double>"
    )
    got = sim.knn_bruteforce_arrow(corpus, q, k=10).collect()
    # the 40 exact duplicates all tie at 1.0: winners must be ids 0..9
    assert [r["neighbor_id"] for r in got] == list(range(10))
    got2 = sim.knn_bruteforce_arrow(corpus.repartition(3), q, k=10).collect()
    assert [r["neighbor_id"] for r in got2] == list(range(10))

    C = sim.ivf_centroids(corpus, n_clusters=3, max_iter=2)
    ivf = sim.knn_ivf_arrow(corpus, q, C, k=10, nprobe=3).collect()
    assert [r["neighbor_id"] for r in ivf] == list(range(10))


@pytest.mark.slowtier
def test_ivf_centroids_many_partitions_invariance(spark, emb):
    """The executor-side groupBy(c) pre-reduce must not change the
    result vs other partitionings of the same rows (the pca.py
    invariance contract): repartitioned corpora train to the same
    centroids, and re-running on the SAME frame is exactly equal."""
    C1 = sim.ivf_centroids(emb, n_clusters=4, max_iter=3)
    C17 = sim.ivf_centroids(emb.repartition(17), n_clusters=4, max_iter=3)
    C1b = sim.ivf_centroids(emb.coalesce(1), n_clusters=4, max_iter=3)
    assert np.allclose(np.asarray(C1), np.asarray(C17), atol=1e-9)
    assert np.allclose(np.asarray(C1), np.asarray(C1b), atol=1e-9)
    # exact determinism on an identical frame (ordered fold)
    again = sim.ivf_centroids(emb.repartition(17), n_clusters=4, max_iter=3)
    assert np.asarray(C17).tolist() == np.asarray(again).tolist()
    # the grouped executor-side fold and the narrow-scan driver fold add
    # each cluster's partition rows in the SAME pid order — bit-equal
    folded = sim.ivf_centroids(
        emb.repartition(17), n_clusters=4, max_iter=3, fold_partials=True
    )
    direct = sim.ivf_centroids(
        emb.repartition(17), n_clusters=4, max_iter=3, fold_partials=False
    )
    assert np.asarray(folded).tolist() == np.asarray(direct).tolist()
