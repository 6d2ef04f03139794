"""Product quantization (operators/pq.py): training determinism,
reconstruction-error ordering, ADC recall vs an exact numpy oracle,
degradation paths."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT

from bigdataproject_formula1_telemetry_spark import io
from bigdataproject_formula1_telemetry_spark.operators import pq as PQ


@pytest.fixture(scope="module")
def emb(spark):
    return io.read_table(spark, SF_CORRECT, "embeddings")


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    return ids, X


def test_train_shapes_and_determinism(spark, emb):
    books = PQ.pq_train(emb, m=4, n_codes=64, max_iter=2)
    assert len(books) == 4
    dims = [len(b[0]) for b in books]
    assert sum(dims) == 64 and max(dims) - min(dims) <= 1
    assert all(len(b) <= 64 for b in books)
    again = PQ.pq_train(emb, m=4, n_codes=64, max_iter=2)
    for a, b in zip(books, again):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_reconstruction_error_improves_with_codebook_size(spark, emb, emb_np):
    _, X = emb_np
    scale = float((X * X).sum(axis=1).mean())

    def mse(n_codes):
        books = PQ.pq_train(emb, m=4, n_codes=n_codes, max_iter=3)
        codes = PQ.pq_encode(emb, books)
        rec = {
            r["vec_id"]: np.asarray(r["embedding"])
            for r in PQ.pq_reconstruct(codes, books).collect()
        }
        ids, Xf = emb_np
        R = np.stack([rec[i] for i in ids])
        return float(((Xf - R) ** 2).sum(axis=1).mean())

    e_small, e_big = mse(8), mse(128)
    assert e_big < e_small  # more codes → strictly better quantization
    assert e_big / scale < 0.5  # and it genuinely explains the vectors


def _recalls(emb, emb_np, m):
    ids, X = emb_np
    books = PQ.pq_train(emb, m=m, n_codes=256, max_iter=3)
    codes = PQ.pq_encode(emb, books)
    queries = emb.where(F.col("vec_id") < 10)
    rows = PQ.knn_pq_adc(codes, queries, books, k=10).collect()
    out: dict[int, list] = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append(r)
    assert set(out) == set(range(10))
    pos = {v: i for i, v in enumerate(ids)}
    r10, r10in50 = [], []
    for q in range(10):
        nbrs = [r["neighbor_id"] for r in out[q]]
        assert len(nbrs) == 10
        # distances come back sorted ascending, neighbor-id tiebreak
        ds = [r["adc_dist"] for r in out[q]]
        assert ds == sorted(ds)
        d = ((X - X[pos[q]]) ** 2).sum(axis=1)
        order = np.argsort(d, kind="stable")
        exact10 = [int(ids[i]) for i in order if ids[i] != q][:10]
        exact50 = [int(ids[i]) for i in order if ids[i] != q][:50]
        r10.append(len(set(nbrs) & set(exact10)) / 10.0)
        r10in50.append(len(set(nbrs) & set(exact50)) / 10.0)
    return float(np.mean(r10)), float(np.mean(r10in50))


def test_adc_recall_vs_exact_oracle(spark, emb, emb_np):
    """64-dim uniform-random vectors are the HARD case for PQ (distance
    concentration: exact top-10 gaps are tiny), so the well-posed checks
    are (a) the relaxed recall@10-in-top-50, (b) strict recall@10 at a
    level far above chance (10/500 = 0.02), and (c) monotone quality in
    m.  Measured on this corpus: m=8 → 0.50/0.89, m=16 → 0.73/1.00."""
    r10_m8, r50_m8 = _recalls(emb, emb_np, m=8)
    assert r50_m8 >= 0.8, (r10_m8, r50_m8)
    assert r10_m8 >= 0.3, (r10_m8, r50_m8)
    r10_m16, r50_m16 = _recalls(emb, emb_np, m=16)
    assert r50_m16 >= 0.95 and r10_m16 >= 0.6, (r10_m16, r50_m16)
    assert r10_m16 > r10_m8  # finer subspaces → strictly better ranking


def test_self_match_excluded_and_k_respected(spark, emb):
    books = PQ.pq_train(emb, m=4, n_codes=32, max_iter=1)
    codes = PQ.pq_encode(emb, books)
    queries = emb.where(F.col("vec_id") < 3)
    out = PQ.knn_pq_adc(codes, queries, books, k=5).collect()
    per_q: dict[int, list] = {}
    for r in out:
        assert r["query_id"] != r["neighbor_id"]
        per_q.setdefault(r["query_id"], []).append(r)
    assert all(len(v) == 5 for v in per_q.values())


def test_null_handling(spark, emb):
    books = PQ.pq_train(emb, m=4, n_codes=16, max_iter=1)
    dim = sum(len(b[0]) for b in books)
    nulls = spark.createDataFrame(
        [Row(vec_id=1, embedding=None)],
        schema=f"vec_id long, embedding array<double>",
    )
    # NULL corpus vector → zero-vector codes (a row, not a crash)
    codes = PQ.pq_encode(nulls, books).collect()
    assert len(codes) == 1 and len(codes[0]["pq_codes"]) == 4
    # NULL query vector → no result rows
    corpus_codes = PQ.pq_encode(emb, books)
    out = PQ.knn_pq_adc(corpus_codes, nulls, books, k=3).collect()
    assert out == []


def test_ivfpq_materialized(spark, emb, tmp_path):
    from bigdataproject_formula1_telemetry_spark.operators import similarity as sim

    books = PQ.pq_train(emb, m=8, n_codes=256, max_iter=2)
    C = sim.ivf_centroids(emb, n_clusters=8, max_iter=2)
    path = str(tmp_path / "ivfpq")
    PQ.build_inverted_file_pq(emb, C, books, path)
    stored = spark.read.parquet(path)
    assert set(stored.columns) == {"vec_id", "pq_codes", "ivf_cluster"}  # no floats
    queries = emb.where(F.col("vec_id") < 8)

    # full probe == flat ADC search exactly (same candidates, same
    # distances, same tiebreak)
    flat_codes = PQ.pq_encode(emb, books)
    flat = {
        (r["query_id"], r["neighbor_id"]): r["adc_dist"]
        for r in PQ.knn_pq_adc(flat_codes, queries, books, k=5).collect()
    }
    full = {
        (r["query_id"], r["neighbor_id"]): r["adc_dist"]
        for r in PQ.knn_ivfpq_materialized(
            spark, path, queries, C, books, k=5, nprobe=8
        ).collect()
    }
    assert full.keys() == flat.keys()
    for key in flat:
        assert full[key] == pytest.approx(flat[key], rel=1e-12)

    # pruned probe: plan carries PartitionFilters, and the results are
    # EXACTLY the numpy-recomputed top-5 of ADC distance restricted to
    # each query's probed clusters (routing math replicated from-scratch
    # — random vectors have no cluster locality, so overlap-with-full is
    # not a meaningful bar; exactness of the restriction is)
    pruned_df = PQ.knn_ivfpq_materialized(
        spark, path, queries, C, books, k=5, nprobe=3
    )
    plan = pruned_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cluster" in plan

    srows = stored.collect()
    sids = np.array([r["vec_id"] for r in srows])
    scodes = np.stack([np.asarray(r["pq_codes"], dtype=np.int64) for r in srows])
    sclusters = np.array([r["ivf_cluster"] for r in srows])
    Cn = np.asarray(C, dtype=np.float64)
    Bs = [np.asarray(b, dtype=np.float64) for b in books]
    dims = np.cumsum([0] + [b.shape[1] for b in Bs])
    q_rows = queries.select("vec_id", "embedding").collect()
    expected: dict[int, list] = {}
    for r in q_rows:
        x = np.asarray(r["embedding"], dtype=np.float64)
        sims = (x / np.linalg.norm(x)) @ Cn.T
        probe = set(np.argpartition(-sims, 2)[:3].tolist())
        dist = np.zeros(len(sids))
        for mi, B in enumerate(Bs):
            diff = B[scodes[:, mi]] - x[dims[mi]:dims[mi + 1]][None, :]
            dist += (diff * diff).sum(axis=1)
        ok = np.isin(sclusters, list(probe)) & (sids != r["vec_id"])
        cand = sorted(zip(dist[ok], sids[ok]))[:5]
        expected[r["vec_id"]] = cand
    got: dict[int, list] = {}
    for r in pruned_df.collect():
        got.setdefault(r["query_id"], []).append(
            (r["adc_dist"], r["neighbor_id"])
        )
    assert set(got) == set(expected)
    for q in expected:
        exp_ids = [int(i) for _, i in expected[q]]
        got_ids = [int(i) for _, i in sorted(got[q])]
        assert got_ids == exp_ids, q
        for (de, _), (dg, _) in zip(expected[q], sorted(got[q])):
            assert dg == pytest.approx(de, rel=1e-9)


def _aniso_corpus(spark, n=2000, dim=32, seed=5):
    """Anisotropic, cross-subspace-correlated vectors: z ~ N(0,1)^dim
    with a decaying spectrum, mixed by a fixed random orthogonal matrix
    so the variance directions do NOT align with the contiguous
    subspace split — exactly the structure OPQ's rotation recovers."""
    rng = np.random.default_rng(seed)
    spectrum = np.exp(-np.arange(dim) / 6.0)
    Q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
    X = rng.normal(size=(n, dim)) * spectrum[None, :]
    X = X @ Q.T
    return (
        spark.createDataFrame(
            [(i, X[i].tolist()) for i in range(n)],
            schema="vec_id long, embedding array<double>",
        ),
        X,
    )


def test_opq_beats_plain_pq_on_anisotropic_data(spark):
    df, X = _aniso_corpus(spark)
    m, n_codes = 4, 64

    def recon_mse(codes_df, books, rotation=None):
        rec = {
            r["vec_id"]: np.asarray(r["embedding"])
            for r in PQ.pq_reconstruct(codes_df, books).collect()
        }
        R = np.stack([rec[i] for i in range(len(X))])
        target = X if rotation is None else X @ np.asarray(rotation).T
        return float(((target - R) ** 2).sum(axis=1).mean())

    plain_books = PQ.pq_train(df, m=m, n_codes=n_codes, max_iter=3)
    plain_mse = recon_mse(PQ.pq_encode(df, plain_books), plain_books)

    R, opq_books = PQ.opq_train(df, m=m, n_codes=n_codes, n_rot_iters=3, pq_max_iter=3)
    Rm = np.asarray(R)
    # R is orthogonal
    assert np.allclose(Rm @ Rm.T, np.eye(Rm.shape[0]), atol=1e-8)
    opq_mse = recon_mse(PQ.opq_encode(df, R, opq_books), opq_books, rotation=R)
    # the rotation must find real structure: strictly better quantization
    assert opq_mse < 0.9 * plain_mse, (opq_mse, plain_mse)


def test_opq_search_retrieves_planted_neighbor(spark):
    df, X = _aniso_corpus(spark, n=1000)
    R, books = PQ.opq_train(df, m=4, n_codes=64, n_rot_iters=2, pq_max_iter=2)
    codes = PQ.opq_encode(df, R, books)
    # probes: perturbed copies of corpus vectors
    rng = np.random.default_rng(8)
    probes = spark.createDataFrame(
        [
            (1_000_000 + i, (X[i] + rng.normal(0, 0.01, X.shape[1])).tolist())
            for i in range(10)
        ],
        schema="vec_id long, embedding array<double>",
    )
    out = PQ.knn_pq_adc(codes, probes, books, k=5, rotation=R).collect()
    tops: dict[int, list] = {}
    for r in out:
        tops.setdefault(r["query_id"], []).append((r["adc_dist"], r["neighbor_id"]))
    hits = sum(
        1
        for qid, v in tops.items()
        if (qid - 1_000_000) in [n for _, n in sorted(v)]
    )
    assert hits >= 9, hits


def test_opq_ivfpq_materialized_end_to_end(spark, tmp_path):
    """The full billion-vector stack with a learned rotation: OPQ train
    → rotated coarse centroids → float-free inverted file → routed ADC
    search with query rotation — planted perturbed probes must retrieve
    their source."""
    from bigdataproject_formula1_telemetry_spark.operators import similarity as sim

    df, X = _aniso_corpus(spark, n=1000)
    R, books = PQ.opq_train(df, m=4, n_codes=64, n_rot_iters=2, pq_max_iter=2)
    rotated = PQ.rotate_embeddings(df, R)
    C = sim.ivf_centroids(rotated, n_clusters=8, max_iter=2)
    path = str(tmp_path / "opq_ivf")
    PQ.build_inverted_file_pq(df, C, books, path, rotation=R)
    rng = np.random.default_rng(21)
    probes = spark.createDataFrame(
        [
            (1_000_000 + i, (X[i] + rng.normal(0, 0.005, X.shape[1])).tolist())
            for i in range(10)
        ],
        schema="vec_id long, embedding array<double>",
    )
    out = PQ.knn_ivfpq_materialized(
        spark, path, probes, C, books, k=5, nprobe=4, rotation=R
    ).collect()
    tops: dict[int, list] = {}
    for r in out:
        tops.setdefault(r["query_id"], []).append((r["adc_dist"], r["neighbor_id"]))
    hits = sum(
        1
        for qid, v in tops.items()
        if (qid - 1_000_000) in [nb for _, nb in sorted(v)]
    )
    assert hits >= 9, hits


def test_knn_pq_adc_rerank_improves_and_converges(spark):
    """ADC + exact re-rank: the short-list re-score must (a) emit TRUE
    cosines, (b) recall at least as well as plain ADC, and (c) equal
    exact brute force when the candidate list covers the corpus."""
    import numpy as np
    from bigdataproject_formula1_telemetry_spark.operators import (
        pq as PQ,
        similarity as sim,
    )
    from pyspark.sql import functions as F

    rng = np.random.default_rng(21)
    n, dim = 300, 16
    X = rng.standard_normal((n, dim))
    corpus = spark.createDataFrame(
        [(int(i), [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    books = PQ.pq_train(corpus, m=4, n_codes=16, max_iter=4)
    codes = PQ.pq_encode(corpus, books).localCheckpoint(eager=True)
    queries = corpus.where(F.col("vec_id") < 8)

    exact = sim.knn_bruteforce(corpus, queries, k=5).toPandas()
    rr = PQ.knn_pq_adc_rerank(
        codes, corpus, queries, books, k=5, rerank_factor=4
    ).toPandas()
    # (a) true cosines
    vecs = {int(i): X[i] for i in range(n)}
    for r in rr.itertuples(index=False):
        a, b = vecs[r.query_id], vecs[r.neighbor_id]
        c = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert abs(c - r.cos_sim) < 1e-9
    # (b) recall >= plain ADC's
    adc = PQ.knn_pq_adc(codes, queries, books, k=5,
                        query_vec_col="embedding").toPandas()
    def recall(df, col):
        rs = []
        for qid in range(8):
            e = set(exact[exact["query_id"] == qid]["neighbor_id"])
            a = set(df[df["query_id"] == qid][col])
            rs.append(len(e & a) / len(e))
        return sum(rs) / len(rs)
    assert recall(rr, "neighbor_id") >= recall(adc, "neighbor_id") - 1e-9
    # (c) full-cover candidate list == exact
    full = PQ.knn_pq_adc_rerank(
        codes, corpus, queries, books, k=5, rerank_factor=n // 5 + 1
    ).toPandas()
    for qid in range(8):
        e = list(exact[exact["query_id"] == qid].sort_values(
            "cos_sim", ascending=False)["neighbor_id"])
        g = list(full[full["query_id"] == qid].sort_values(
            "cos_sim", ascending=False)["neighbor_id"])
        assert e == g, qid
    import pytest as _pt
    with _pt.raises(ValueError, match="rerank_factor"):
        PQ.knn_pq_adc_rerank(codes, corpus, queries, books, rerank_factor=0)


def test_heavy_ties_respect_global_id_tiebreak(spark):
    """r7 regression: when many candidates share one exact ADC distance
    (PQ collapses near-identical vectors to identical codes), the
    returned top-k must be the GLOBAL (adc_dist asc, neighbor_id asc)
    head — per-batch pre-truncation once let partition row order decide
    which tied candidates survived, so the winner set depended on the
    physical layout."""
    rng = np.random.default_rng(11)
    base = rng.standard_normal(8)
    # 120 near-copies of one point (identical codes => identical ADC
    # distance) + scattered background, shuffled across partitions so
    # ties straddle Arrow batches
    rows = [
        (int(i), (base + 1e-7 * rng.standard_normal(8)).tolist())
        for i in range(120)
    ] + [(1000 + int(i), rng.standard_normal(8).tolist()) for i in range(200)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(7)
    books = PQ.pq_train(corpus, m=2, n_codes=16, max_iter=3)
    codes = PQ.pq_encode(corpus, books)
    q = spark.createDataFrame(
        [(99_999, base.tolist())], "vec_id long, embedding array<double>"
    )
    got = PQ.knn_pq_adc(codes, q, books, k=10).collect()

    # exact numpy oracle: ADC distance for EVERY corpus id, then the
    # (dist, id) head — engine-independent
    bounds = PQ._split(8, 2)
    books_np = [np.asarray(b, dtype=np.float64) for b in books]
    code_map = {
        r["vec_id"]: np.asarray(r["pq_codes"], dtype=np.int64)
        for r in codes.collect()
    }
    lut = []
    for mi, (s0, e0) in enumerate(bounds):
        diff = books_np[mi] - base[s0:e0][None, :]
        lut.append((diff * diff).sum(axis=1))
    dist = {
        i: float(sum(lut[mi][c[mi]] for mi in range(2)))
        for i, c in code_map.items()
    }
    want = sorted(dist.items(), key=lambda t: (t[1], t[0]))[:10]
    assert [(r["neighbor_id"], round(r["adc_dist"], 12)) for r in got] == [
        (i, round(d, 12)) for i, d in want
    ]
    # layout invariance: a different partitioning returns the same set
    codes2 = PQ.pq_encode(corpus.repartition(3), books)
    got2 = PQ.knn_pq_adc(codes2, q, books, k=10).collect()
    assert [r["neighbor_id"] for r in got2] == [r["neighbor_id"] for r in got]


def test_ivfpq_heavy_ties_layout_invariant(spark):
    rng = np.random.default_rng(12)
    base = rng.standard_normal(8)
    rows = [
        (int(i), (base + 1e-7 * rng.standard_normal(8)).tolist())
        for i in range(80)
    ] + [(1000 + int(i), rng.standard_normal(8).tolist()) for i in range(200)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(5)
    books = PQ.pq_train(corpus, m=2, n_codes=16, max_iter=3)
    from bigdataproject_formula1_telemetry_spark.operators import similarity as sim

    C = sim.ivf_centroids(corpus, n_clusters=4, max_iter=2)
    q = spark.createDataFrame(
        [(99_999, base.tolist())], "vec_id long, embedding array<double>"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        p1, p2 = f"{tmp}/a", f"{tmp}/b"
        PQ.build_inverted_file_pq(corpus, C, books, p1)
        PQ.build_inverted_file_pq(corpus.repartition(11), C, books, p2)
        a = PQ.knn_ivfpq_materialized(spark, p1, q, C, books, k=10, nprobe=4).collect()
        b = PQ.knn_ivfpq_materialized(spark, p2, q, C, books, k=10, nprobe=4).collect()
    assert [r["neighbor_id"] for r in a] == [r["neighbor_id"] for r in b]
    assert len(a) == 10
    # deterministic winners: the (dist, id) order means the tied
    # near-copy family contributes its LOWEST ids
    fam = [r["neighbor_id"] for r in a if r["neighbor_id"] < 1000]
    assert fam == sorted(fam)


@pytest.mark.slowtier
def test_pq_train_many_partitions_invariance(spark, emb):
    """The executor-side groupBy(m, c) pre-reduce must be invariant to
    the corpus partitioning and exactly deterministic on an identical
    frame (ordered pid fold)."""
    b1 = PQ.pq_train(emb, m=4, n_codes=32, max_iter=2)
    b17 = PQ.pq_train(emb.repartition(17), m=4, n_codes=32, max_iter=2)
    for a, b in zip(b1, b17):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-9)
    again = PQ.pq_train(emb.repartition(17), m=4, n_codes=32, max_iter=2)
    assert [np.asarray(x).tolist() for x in b17] == [
        np.asarray(x).tolist() for x in again
    ]
    # grouped executor-side fold ≡ narrow-scan driver fold, bit-for-bit
    folded = PQ.pq_train(
        emb.repartition(17), m=4, n_codes=32, max_iter=2, fold_partials=True
    )
    direct = PQ.pq_train(
        emb.repartition(17), m=4, n_codes=32, max_iter=2, fold_partials=False
    )
    assert [np.asarray(x).tolist() for x in folded] == [
        np.asarray(x).tolist() for x in direct
    ]


@pytest.mark.slowtier
def test_opq_train_many_partitions_invariance(spark, emb):
    """The pid-bucket pre-reduce of the OPQ cross-covariance partials
    must be invariant to the corpus partitioning (rotation R compared
    loosely — SVD sign conventions are fixed by the shared code path)."""
    R1, _ = PQ.opq_train(emb, m=4, n_codes=32, n_rot_iters=2, pq_max_iter=2)
    R17, _ = PQ.opq_train(
        emb.repartition(17), m=4, n_codes=32, n_rot_iters=2, pq_max_iter=2
    )
    assert np.allclose(np.asarray(R1), np.asarray(R17), atol=1e-6)
