"""SemDeDup tests: survivor-set equality against a from-scratch numpy
oracle, keep-mode semantics, replica collapse, exempt vectors, and the
oversized-cluster guard."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.operators import semdedup, similarity as sim


def np_semdedup(ids, vecs, centroids, threshold, keep):
    """Reference implementation, straight from the paper's description:
    exact-collapse → assign → per-cluster ordered greedy drop."""
    vecs = {i: (None if v is None else np.asarray(v, dtype=np.float64)) for i, v in zip(ids, vecs)}
    # exact collapse: identical non-zero vectors → min-id representative
    groups: dict[bytes, list[int]] = {}
    exempt, rep_of = [], {}
    for i in sorted(vecs):
        v = vecs[i]
        if v is None or np.linalg.norm(v) == 0:
            exempt.append(i)
            continue
        groups.setdefault(v.tobytes(), []).append(i)
    reps = {min(m): vecs[min(m)] for m in groups.values()}
    for m in groups.values():
        for i in m:
            rep_of[i] = min(m)
    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1)[:, None]
    # assign reps to nearest centroid by cosine
    clusters: dict[int, list[int]] = {}
    for i, v in reps.items():
        vn = v / np.linalg.norm(v)
        clusters.setdefault(int(np.argmax(Cn @ vn)), []).append(i)
    kept_reps = set()
    for cl, members in clusters.items():
        vn = {i: reps[i] / np.linalg.norm(reps[i]) for i in members}
        if keep == "min_id":
            order = sorted(members)
        else:
            csim = {i: float(vn[i] @ Cn[cl]) for i in members}
            rev = keep == "high_centroid_sim"
            order = sorted(members, key=lambda i: (-csim[i] if rev else csim[i], i))
        for pos, i in enumerate(order):
            if not any(float(vn[i] @ vn[j]) >= threshold for j in order[:pos]):
                kept_reps.add(i)
    survivors = set(exempt)
    for i, r in rep_of.items():
        if i == r and r in kept_reps:
            survivors.add(i)
    return survivors


def rand_centroids(rng, k, dim):
    return [rng.standard_normal(dim).tolist() for _ in range(k)]


@pytest.mark.parametrize("keep", ["low_centroid_sim", "high_centroid_sim", "min_id"])
def test_matches_numpy_oracle(spark, keep):
    rng = np.random.default_rng(42)
    dim, n = 8, 80
    vecs = [rng.standard_normal(dim).tolist() for _ in range(n)]
    # plant near-duplicate groups (tight noise → cosine ≈ 1 > 0.9)
    for base in (3, 11, 27):
        for twin in (base + 40, base + 41):
            vecs[twin] = (np.asarray(vecs[base]) + rng.standard_normal(dim) * 1e-2).tolist()
    ids = list(range(n))
    sdf = spark.createDataFrame(pd.DataFrame({"vec_id": ids, "embedding": vecs}))
    C = rand_centroids(rng, 4, dim)

    got = set(
        r.vec_id
        for r in semdedup.semantic_dedup(sdf, C, threshold=0.9, keep=keep).collect()
    )
    want = np_semdedup(ids, vecs, C, 0.9, keep)
    assert got == want
    # the planted groups genuinely deduplicated (sanity that the test bites)
    assert len(want) < n


def test_keep_mode_picks_expected_member(spark):
    """One tight duplicate trio at known distances from the centroid:
    low_centroid_sim must keep the farthest member, high_centroid_sim the
    closest, min_id the smallest id."""
    c = np.zeros(6)
    c[0] = 1.0
    rot = np.zeros(6)
    rot[1] = 1.0

    def at_angle(deg):
        th = np.deg2rad(deg)
        return (np.cos(th) * c + np.sin(th) * rot).tolist()

    # trio within ~4° of each other (pairwise cos > 0.99), distinct
    # centroid angles; plus one far-away singleton
    rows = pd.DataFrame(
        {
            "vec_id": [10, 11, 12, 99],
            "embedding": [at_angle(20), at_angle(22), at_angle(24), (-c).tolist()],
        }
    )
    sdf = spark.createDataFrame(rows)
    C = [c.tolist()]
    for keep, expect in [
        ("low_centroid_sim", 12),  # farthest from centroid survives
        ("high_centroid_sim", 10),  # closest survives (also min id here)
        ("min_id", 10),
    ]:
        got = sorted(
            r.vec_id
            for r in semdedup.semantic_dedup(
                sdf, C, threshold=0.99, keep=keep
            ).collect()
        )
        assert got == sorted([expect, 99]), keep


def test_replica_corpus_collapses_before_pairing(spark):
    """Exact copies collapse to the min-id representative regardless of
    keep mode — the c² term only ever sees distinct vectors."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal(8).tolist()
    other = rng.standard_normal(8).tolist()
    rows = pd.DataFrame(
        {
            "vec_id": range(12),
            "embedding": [base] * 10 + [other] * 2,
        }
    )
    sdf = spark.createDataFrame(rows)
    C = rand_centroids(rng, 2, 8)
    got = sorted(
        r.vec_id
        for r in semdedup.semantic_dedup(
            sdf, C, threshold=0.999, keep="low_centroid_sim"
        ).collect()
    )
    assert got == [0, 10]


def test_null_and_zero_vectors_survive(spark):
    rng = np.random.default_rng(3)
    rows = [
        (0, rng.standard_normal(4).tolist()),
        (1, None),
        (2, [0.0, 0.0, 0.0, 0.0]),
        (3, rng.standard_normal(4).tolist()),
    ]
    sdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C = rand_centroids(rng, 2, 4)
    got = sorted(
        r.vec_id for r in semdedup.semantic_dedup(sdf, C, threshold=0.5).collect()
    )
    assert 1 in got and 2 in got


def test_oversized_cluster_guard_keeps_and_logs(spark, caplog):
    """A cluster above max_cluster_size is skipped (members all kept) with
    a logged warning — never a straggler, never silent."""
    import logging

    rng = np.random.default_rng(5)
    base = rng.standard_normal(8)
    vecs = [(base + rng.standard_normal(8) * 1e-3).tolist() for _ in range(30)]
    sdf = spark.createDataFrame(pd.DataFrame({"vec_id": range(30), "embedding": vecs}))
    C = [base.tolist(), (-base).tolist()]
    with caplog.at_level(
        logging.WARNING,
        logger="bigdataproject_formula1_telemetry_spark.operators.semdedup",
    ):
        got = semdedup.semantic_dedup(
            sdf, C, threshold=0.9, max_cluster_size=10
        ).count()
    assert got == 30
    assert any("oversized cluster" in r.message for r in caplog.records)
    # with the guard lifted the cluster dedups down to one survivor
    assert (
        semdedup.semantic_dedup(sdf, C, threshold=0.9).count() == 1
    )


def test_dropped_rows_have_a_near_neighbor(spark):
    """Soundness: every dropped id has SOME other input vector with
    cosine ≥ threshold (the paper's drop condition is against
    earlier-ordered items, which are in particular other items)."""
    rng = np.random.default_rng(11)
    dim, n = 8, 50
    vecs = [rng.standard_normal(dim).tolist() for _ in range(n)]
    for t in range(30, 40):
        vecs[t] = (np.asarray(vecs[t - 30]) + rng.standard_normal(dim) * 5e-3).tolist()
    sdf = spark.createDataFrame(pd.DataFrame({"vec_id": range(n), "embedding": vecs}))
    C = rand_centroids(rng, 3, dim)
    kept = set(
        r.vec_id for r in semdedup.semantic_dedup(sdf, C, threshold=0.95).collect()
    )
    X = np.stack([np.asarray(v) for v in vecs])
    Xn = X / np.linalg.norm(X, axis=1)[:, None]
    S = Xn @ Xn.T
    np.fill_diagonal(S, -1)
    for i in set(range(n)) - kept:
        assert S[i].max() >= 0.95 - 1e-9


def test_partitioning_invariance(spark):
    """Survivors must not depend on how rows are partitioned (the kernel
    sorts by id before any float work)."""
    rng = np.random.default_rng(13)
    vecs = [rng.standard_normal(8).tolist() for _ in range(40)]
    for t in range(25, 35):
        vecs[t] = (np.asarray(vecs[t - 25]) + rng.standard_normal(8) * 1e-2).tolist()
    pdf = pd.DataFrame({"vec_id": range(40), "embedding": vecs})
    C = rand_centroids(rng, 3, 8)
    a = spark.createDataFrame(pdf).repartition(1)
    b = spark.createDataFrame(pdf.iloc[::-1]).repartition(16)
    ga = sorted(r.vec_id for r in semdedup.semantic_dedup(a, C, threshold=0.9).collect())
    gb = sorted(r.vec_id for r in semdedup.semantic_dedup(b, C, threshold=0.9).collect())
    assert ga == gb


def test_blocked_matmul_equals_unblocked(spark):
    """The block schedule is an implementation detail: block=3 must give
    byte-identical survivors to the default block size."""
    rng = np.random.default_rng(19)
    vecs = [rng.standard_normal(6).tolist() for _ in range(25)]
    for t in range(18, 25):
        vecs[t] = (np.asarray(vecs[t - 18]) + rng.standard_normal(6) * 1e-2).tolist()
    ids = list(range(25))
    C = rand_centroids(rng, 2, 6)
    kern_small = semdedup._semdedup_kernel(C, 0.9, "low_centroid_sim", frozenset(), block=3)
    kern_big = semdedup._semdedup_kernel(C, 0.9, "low_centroid_sim", frozenset())
    pdf = pd.DataFrame({"__m_id": ids, "__v": vecs})
    a = sorted(kern_small((0,), pdf)["__lost"])
    b = sorted(kern_big((0,), pdf)["__lost"])
    assert a == b and len(a) > 0


def test_string_ids_preserved(spark):
    rng = np.random.default_rng(23)
    base = rng.standard_normal(6)
    rows = pd.DataFrame(
        {
            "vec_id": ["doc-a", "doc-b", "doc-c"],
            "embedding": [
                base.tolist(),
                (base + rng.standard_normal(6) * 1e-3).tolist(),
                rng.standard_normal(6).tolist(),
            ],
        }
    )
    sdf = spark.createDataFrame(rows)
    C = rand_centroids(rng, 2, 6)
    got = semdedup.semantic_dedup(sdf, C, threshold=0.95, keep="min_id").collect()
    ids = sorted(r.vec_id for r in got)
    assert ids == ["doc-a", "doc-c"]


def test_bad_args_raise(spark):
    sdf = spark.createDataFrame([(0, [1.0, 0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="keep"):
        semdedup.semantic_dedup(sdf, [[1.0, 0.0]], keep="nope")
    with pytest.raises(ValueError, match="centroids"):
        semdedup.semantic_dedup(sdf, [])


def test_min_id_mode_matches_duckdb_oracle(spark, duck):
    """Cross-engine gate: the min_id keep mode's drop condition —
    ∃ smaller-id same-cluster item with cosine ≥ θ — is plain SQL, so
    the ENTIRE operator (collapse → assign → within-cluster drop) is
    recomputed in DuckDB over the real embeddings table and the
    survivor sets must be identical."""
    from tests.conftest import SF_SMOKE, register_views
    from bigdataproject_formula1_telemetry_spark import io

    register_views(duck, SF_SMOKE)
    emb = io.read_table(spark, SF_SMOKE, "embeddings")
    rng = np.random.default_rng(31)
    k, dim = 4, 64
    C = (lambda M: (M / np.linalg.norm(M, axis=1)[:, None]).tolist())(
        rng.standard_normal((k, dim))
    )
    threshold = 0.2  # low threshold so the within-cluster join really fires

    got = sorted(
        r.vec_id
        for r in semdedup.semantic_dedup(
            emb, C, threshold=threshold, keep="min_id"
        ).collect()
    )

    cent_rows = ", ".join(
        f"({i}, {[float(x) for x in c]}::DOUBLE[])" for i, c in enumerate(C)
    )
    sql = f"""
    WITH cents(cid, cv) AS (VALUES {cent_rows}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    nz AS (SELECT *, sqrt(list_inner_product(v, v)) AS nrm FROM e),
    reps AS (SELECT min(vec_id) AS id, v FROM nz WHERE nrm > 0 GROUP BY v),
    asg AS (
        SELECT r.id, r.v,
               (SELECT cid FROM cents
                ORDER BY list_cosine_similarity(r.v, cv) DESC, cid
                LIMIT 1) AS cl
        FROM reps r
    ),
    drops AS (
        SELECT DISTINCT a.id FROM asg a JOIN asg b
        ON a.cl = b.cl AND b.id < a.id
           AND list_cosine_similarity(a.v, b.v) >= {threshold}
    )
    SELECT id AS vec_id FROM asg WHERE id NOT IN (SELECT id FROM drops)
    UNION ALL
    SELECT vec_id FROM nz WHERE nrm = 0 OR nrm IS NULL
    ORDER BY vec_id
    """
    want = [r[0] for r in duck.execute(sql).fetchall()]
    assert got == want
    assert 0 < len(got) < emb.count()  # the join genuinely dropped rows


def test_centroid_similarity_matches_numpy(spark):
    rng = np.random.default_rng(41)
    vecs = [rng.standard_normal(6).tolist() for _ in range(40)] + [None, [0.0] * 6]
    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    C = [rng.standard_normal(6).tolist() for _ in range(3)]
    got = {
        r.vec_id: r.centroid_sim
        for r in semdedup.centroid_similarity(sdf, C).collect()
    }
    Cn = np.asarray(C)
    Cn = Cn / np.linalg.norm(Cn, axis=1)[:, None]
    for i, v in enumerate(vecs):
        if v is None or not np.linalg.norm(v):
            assert got[i] is None
        else:
            vn = np.asarray(v) / np.linalg.norm(v)
            assert got[i] == pytest.approx(float((Cn @ vn).max()), abs=1e-12)


def test_prototype_prune_drops_cluster_cores(spark):
    """Rows planted ON the centroid (prototypicality ≈ 1) are pruned
    first; edge rows survive; NULL/zero vectors always survive; the
    realized keep-rate lands near keep_fraction."""
    rng = np.random.default_rng(43)
    dim = 8
    c0 = rng.standard_normal(dim)
    c0 /= np.linalg.norm(c0)
    # 50 core rows = centroid + tiny noise, 50 edge rows = far cone
    core = [(c0 + rng.standard_normal(dim) * 0.01).tolist() for _ in range(50)]
    edge = [(c0 + rng.standard_normal(dim) * 2.0).tolist() for _ in range(50)]
    rows = [(i, v) for i, v in enumerate(core + edge)] + [(100, None)]
    sdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup.prototype_prune(sdf, [c0.tolist()], keep_fraction=0.5)
    kept = set(r.vec_id for r in out.collect())
    assert 100 in kept  # NULL exempt
    core_kept = len(kept & set(range(50)))
    edge_kept = len(kept & set(range(50, 100)))
    assert edge_kept > 40 and core_kept < 10  # cores pruned, edges kept
    # keep-rate within the sketch band
    assert abs((len(kept) - 1) / 100 - 0.5) < 0.1

    # keep_fraction=1 is the identity; explicit cutoff skips the sizing agg
    assert semdedup.prototype_prune(sdf, [c0.tolist()], 1.0).count() == 101
    explicit = semdedup.prototype_prune(
        sdf, [c0.tolist()], cutoff=0.99
    ).collect()
    for r in explicit:
        if r.embedding is not None and np.linalg.norm(r.embedding):
            vn = np.asarray(r.embedding) / np.linalg.norm(r.embedding)
            assert float(vn @ c0) <= 0.99 + 1e-12
    with pytest.raises(ValueError, match="keep_fraction"):
        semdedup.prototype_prune(sdf, [c0.tolist()], 0.0)


def test_d4_composition(spark):
    """D4 = semantic_dedup then prototype_prune: planted near-dup twins
    collapse to one survivor AND the surviving corpus is thinner at the
    prototypical core than semantic_dedup alone."""
    rng = np.random.default_rng(47)
    dim = 8
    centers = [rng.standard_normal(dim) for _ in range(2)]
    vecs = []
    for i in range(100):
        c = centers[i % 2]
        vecs.append((c + rng.standard_normal(dim) * (0.05 + 0.5 * (i % 10) / 10)).tolist())
    # twins of the first 10
    for i in range(10):
        vecs.append((np.asarray(vecs[i]) + rng.standard_normal(dim) * 1e-3).tolist())
    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    C = [c.tolist() for c in centers]
    dd = semdedup.semantic_dedup(sdf, C, threshold=0.99)
    d4 = semdedup.d4_prune(sdf, C, threshold=0.99, keep_fraction=0.7)
    n_dd, n_d4 = dd.count(), d4.count()
    assert n_d4 < n_dd < 110  # dedup bit, then diversification bit
    # d4 survivors are a subset of semantic_dedup survivors
    assert d4.join(dd, "vec_id", "left_anti").count() == 0


def test_prototype_prune_matches_duckdb_oracle(spark, duck):
    """Cross-engine: with an explicit cutoff the prune is a pure filter —
    recompute max-cosine-to-centroid and the filter in DuckDB over the
    real embeddings table; survivor sets must be identical."""
    from tests.conftest import SF_SMOKE, register_views
    from bigdataproject_formula1_telemetry_spark import io

    register_views(duck, SF_SMOKE)
    emb = io.read_table(spark, SF_SMOKE, "embeddings")
    rng = np.random.default_rng(53)
    C = (lambda M: (M / np.linalg.norm(M, axis=1)[:, None]).tolist())(
        rng.standard_normal((3, 64))
    )
    cutoff = 0.15
    got = sorted(
        r.vec_id
        for r in semdedup.prototype_prune(emb, C, cutoff=cutoff).collect()
    )
    cent_rows = ", ".join(
        f"({i}, {[float(x) for x in c]}::DOUBLE[])" for i, c in enumerate(C)
    )
    sql = f"""
    WITH cents(cid, cv) AS (VALUES {cent_rows}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    scored AS (
        SELECT vec_id,
               (SELECT max(list_cosine_similarity(v, cv)) FROM cents) AS ps,
               sqrt(list_inner_product(v, v)) AS nrm
        FROM e
    )
    SELECT vec_id FROM scored
    WHERE nrm = 0 OR nrm IS NULL OR ps <= {cutoff}
    ORDER BY vec_id
    """
    want = [r[0] for r in duck.execute(sql).fetchall()]
    assert got == want
    assert 0 < len(got) < emb.count()


def test_admission_against_materialized_index(spark, tmp_path):
    """Steady-state admission: increment rows with a stored near-dup in
    their probed cluster(s) are dropped (numpy oracle), the index scan
    is partition-pruned with the increment broadcast, survivors append
    back, and a retried admission of already-admitted content drops
    everything (idempotent convergence)."""
    import re

    rng = np.random.default_rng(71)
    dim, n = 8, 120
    base = rng.standard_normal((n, dim))
    stored = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(base)],
        "vec_id long, embedding array<double>",
    )
    C = sim.ivf_centroids(stored, n_clusters=4, max_iter=3)
    root = str(tmp_path / "sem_ivf")
    sim.build_inverted_file(stored, C, root)

    # increment: 10 near-copies of stored vectors + 10 fresh + exempt rows
    inc_rows = [
        (1000 + i, (base[i] + rng.standard_normal(dim) * 1e-3).tolist())
        for i in range(10)
    ] + [
        (2000 + i, rng.standard_normal(dim).tolist()) for i in range(10)
    ] + [(3000, None), (3001, [0.0] * dim)]
    inc = spark.createDataFrame(inc_rows, "vec_id long, embedding array<double>")

    out = semdedup.semantic_dedup_against_index(
        spark, inc, root, C, threshold=0.95, nprobe=2
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*ivf_cluster", plan), plan[:1500]
    assert "BroadcastHashJoin" in plan

    kept = set(r.vec_id for r in out.collect())
    # numpy oracle: same probe math (top-nprobe centroids), max cosine
    # vs stored members of the probed clusters
    Cn = np.asarray(C)
    Sn = base / np.linalg.norm(base, axis=1)[:, None]
    stored_cl = np.argmax(Sn @ Cn.T, axis=1)
    want = {3000, 3001}
    for vid, v in inc_rows:
        if v is None or not np.linalg.norm(v):
            continue
        x = np.asarray(v) / np.linalg.norm(v)
        sims_c = x @ Cn.T
        probes = set(np.argsort(-sims_c)[:2])
        members = [j for j in range(n) if stored_cl[j] in probes]
        mx = max((float(x @ Sn[j]) for j in members), default=-1)
        if mx < 0.95:
            want.add(vid)
    assert kept == want
    assert all(2000 <= i < 2010 or i >= 3000 for i in kept)

    # admit survivors, then a RETRIED admission of the same increment
    # drops every non-exempt row it admitted before (convergent)
    surv = inc.join(
        spark.createDataFrame([(i,) for i in sorted(kept)], "vec_id long"),
        "vec_id", "semi",
    ).where(F.col("embedding").isNotNull())
    sim.build_inverted_file(surv, C, root, mode="append")
    again = semdedup.semantic_dedup_against_index(
        spark, inc, root, C, threshold=0.95, nprobe=2
    )
    kept2 = set(r.vec_id for r in again.collect())
    assert kept2 == {3000, 3001}

    # empty / all-exempt increment short-circuits
    empty = inc.where("vec_id < 0")
    assert (
        semdedup.semantic_dedup_against_index(spark, empty, root, C).count() == 0
    )


def test_semantic_index_retention(spark, tmp_path):
    """Dedup-horizon policy on the embedding axis: expiring an increment
    makes its vectors semantically admissible again; base always
    survives; metadata-only (no scan)."""
    rng = np.random.default_rng(89)
    dim = 8
    base = rng.standard_normal((20, dim))
    base_sdf = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(base)],
        "vec_id long, embedding array<double>",
    )
    C = sim.ivf_centroids(base_sdf, n_clusters=2, max_iter=3)
    root = str(tmp_path / "sem_ret")
    semdedup.build_semantic_index(base_sdf, C, root, "base")

    day1 = rng.standard_normal((5, dim))
    day1_sdf = spark.createDataFrame(
        [(100 + i, v.tolist()) for i, v in enumerate(day1)],
        "vec_id long, embedding array<double>",
    )
    semdedup.incremental_semantic_dedup(
        spark, day1_sdf, root, C, threshold=0.95, append=True,
        increment_id="day-001",
    )
    assert semdedup.list_semantic_increments(spark, root) == ["base", "day-001"]

    # near-copies of day-1 vectors are dropped while day-001 is live...
    probe = spark.createDataFrame(
        [(500 + i, (day1[i] + rng.standard_normal(dim) * 1e-3).tolist())
         for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    assert (
        semdedup.semantic_dedup_against_index(
            spark, probe, root, C, threshold=0.95, nprobe=2
        ).count()
        == 0
    )

    gone = semdedup.expire_semantic_increments(
        spark, root, keep=lambda i: False
    )
    assert gone == ["day-001"]
    assert semdedup.list_semantic_increments(spark, root) == ["base"]
    # ...and admissible again once expired; base content still dedups
    assert (
        semdedup.semantic_dedup_against_index(
            spark, probe, root, C, threshold=0.95, nprobe=2
        ).count()
        == 5
    )
    base_probe = spark.createDataFrame(
        [(600, (base[0] + rng.standard_normal(dim) * 1e-3).tolist())],
        "vec_id long, embedding array<double>",
    )
    assert (
        semdedup.semantic_dedup_against_index(
            spark, base_probe, root, C, threshold=0.95, nprobe=2
        ).count()
        == 0
    )


def test_semantic_dup_pairs_matches_numpy(spark):
    """Every emitted pair is a genuine within-cluster pair at/above
    threshold (id_a < id_b), exact copies contribute identity edges,
    and the pair set equals the numpy within-cluster enumeration."""
    rng = np.random.default_rng(97)
    dim, n = 8, 60
    vecs = [rng.standard_normal(dim).tolist() for _ in range(n)]
    for t in range(40, 50):
        vecs[t] = (np.asarray(vecs[t - 40]) + rng.standard_normal(dim) * 5e-3).tolist()
    vecs.append(vecs[0])  # exact copy → identity edge (0, 60)
    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    C = rand_centroids(rng, 3, dim)
    got = {
        (r.id_a, r.id_b): r.cos_sim
        for r in semdedup.semantic_dup_pairs(sdf, C, threshold=0.95).collect()
    }
    # numpy oracle: collapse → assign → within-cluster pairs
    Cn = np.asarray(C, dtype=np.float64)
    Cn = Cn / np.linalg.norm(Cn, axis=1)[:, None]
    reps = list(range(61))
    reps.remove(60)  # 60 collapses onto 0
    X = np.stack([np.asarray(vecs[i], dtype=np.float64) for i in reps])
    Xn = X / np.linalg.norm(X, axis=1)[:, None]
    cl = np.argmax(Xn @ Cn.T, axis=1)
    want = {(0, 60): 1.0}
    for a in range(len(reps)):
        for b in range(a + 1, len(reps)):
            if cl[a] == cl[b] and float(Xn[a] @ Xn[b]) >= 0.95:
                want[(reps[a], reps[b])] = float(Xn[a] @ Xn[b])
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    assert len(got) >= 11  # 10 planted + identity edge


def test_semantic_duplicate_clusters_and_leakage_free_split(spark):
    """Family labels: min-id connected component over the semantic
    pairs; a whole paraphrase family lands in ONE split when gating on
    the cluster label."""
    from bigdataproject_formula1_telemetry_spark.operators import sampling

    rng = np.random.default_rng(101)
    dim = 8
    vecs = [rng.standard_normal(dim).tolist() for _ in range(30)]
    # family {2, 30, 31}: 30 near 2, 31 near 30 (chain)
    vecs.append((np.asarray(vecs[2]) + rng.standard_normal(dim) * 1e-3).tolist())
    vecs.append((np.asarray(vecs[30]) + rng.standard_normal(dim) * 1e-3).tolist())
    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    C = rand_centroids(rng, 2, dim)
    labels = {
        r.id: r.cluster
        for r in semdedup.semantic_duplicate_clusters(
            sdf, C, threshold=0.99
        ).collect()
    }
    assert len(labels) == 32
    assert labels[2] == labels[30] == labels[31] == 2
    singles = [i for i in range(30) if i != 2]
    assert all(labels[i] == i for i in singles)

    split = sampling.assign_split(
        semdedup.semantic_duplicate_clusters(sdf, C, threshold=0.99),
        [F.col("cluster")],
        {"train": 0.5, "val": 0.5},
        salt="semsplit",
    )
    fam = {r.id: r.split for r in split.collect() if r.id in (2, 30, 31)}
    assert len(set(fam.values())) == 1  # whole family in one split


def test_semantic_index_compaction(spark, tmp_path):
    """Folding incs into base preserves admission verdicts exactly and
    leaves one inc= partition; a no-op compaction returns 0."""
    rng = np.random.default_rng(107)
    dim = 8
    base = rng.standard_normal((15, dim))
    base_sdf = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(base)],
        "vec_id long, embedding array<double>",
    )
    C = sim.ivf_centroids(base_sdf, n_clusters=2, max_iter=3)
    root = str(tmp_path / "sem_cmp")
    semdedup.build_semantic_index(base_sdf, C, root, "base")
    for day in range(3):
        inc = spark.createDataFrame(
            [(100 * (day + 1) + i, v.tolist())
             for i, v in enumerate(rng.standard_normal((4, dim)))],
            "vec_id long, embedding array<double>",
        )
        semdedup.incremental_semantic_dedup(
            spark, inc, root, C, threshold=0.95, append=True,
            increment_id=f"day-{day:03d}",
        )
    assert len(semdedup.list_semantic_increments(spark, root)) == 4

    probe_rows = [
        (900 + i, (v + rng.standard_normal(dim) * 1e-3).tolist())
        for i, v in enumerate(
            np.vstack([base[:3], rng.standard_normal((3, dim))])
        )
    ]
    probe = spark.createDataFrame(
        probe_rows, "vec_id long, embedding array<double>"
    )
    before = sorted(
        r.vec_id
        for r in semdedup.semantic_dedup_against_index(
            spark, probe, root, C, threshold=0.95, nprobe=2
        ).collect()
    )
    folded = semdedup.compact_semantic_index(spark, root)
    assert folded == 3
    assert semdedup.list_semantic_increments(spark, root) == ["base"]
    after = sorted(
        r.vec_id
        for r in semdedup.semantic_dedup_against_index(
            spark, probe, root, C, threshold=0.95, nprobe=2
        ).collect()
    )
    assert after == before
    assert semdedup.compact_semantic_index(spark, root) == 0


def test_combined_duplicate_clusters_closes_both_axes(spark):
    """A verbatim-ish copy (lexical edge, semantically sub-threshold)
    and a word-shuffle paraphrase (semantic edge, lexically invisible)
    of the same document land in ONE combined family — while each
    single-axis clustering only sees its own edge."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        dedup as DD,
        embed as EM,
    )

    rng = np.random.default_rng(109)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lam", "mu", "nu", "xi"]
    base = " ".join(rng.choice(words, size=60))
    appended = base + " zulu"                       # lexical near-dup
    shuf = base.split(); rng.shuffle(shuf)
    paraphrase = " ".join(shuf)                     # bag-identical
    organics = [
        " ".join(rng.choice(
            ["one", "two", "three", "four", "five", "six", "seven",
             "eight", "nine", "ten", "eleven", "twelve"], size=60))
        for _ in range(6)
    ]
    docs = spark.createDataFrame(
        [(0, base), (1, appended), (2, paraphrase)]
        + [(10 + i, t) for i, t in enumerate(organics)],
        "doc_id long, text string",
    )
    semb = EM.hashed_embedding(docs, out_col="__semb")
    C = sim.ivf_centroids(semb, n_clusters=2, id_col="doc_id", vec_col="__semb")

    combined = {
        r.id: r.cluster
        for r in semdedup.combined_duplicate_clusters(
            docs, C, lexical_threshold=0.8, semantic_threshold=0.9999
        ).collect()
    }
    assert combined[0] == combined[1] == combined[2] == 0
    assert all(combined[10 + i] == 10 + i for i in range(6))

    lex_only = {
        r.id: r.cluster
        for r in DD.duplicate_clusters(docs, threshold=0.8).collect()
    }
    assert lex_only[0] == lex_only[1] and lex_only[2] != lex_only[0]

    sem_only = {
        r.id: r.cluster
        for r in semdedup.semantic_duplicate_clusters(
            semb, C, threshold=0.9999, id_col="doc_id", vec_col="__semb"
        ).collect()
    }
    assert sem_only[0] == sem_only[2] and sem_only[1] != sem_only[0]


def test_semantic_dup_pairs_dense_family_cap(spark):
    """A dense NEAR-identical family (exact-collapse can't fold it) is
    quadratic edge mass; past max_pairs_per_cluster the cluster degrades
    to hub edges marked cos_sim NULL — bounded output, over-merge
    direction, and CC still puts every involved row in ONE family."""
    rng = np.random.default_rng(113)
    dim = 8
    base = rng.standard_normal(dim)
    base /= np.linalg.norm(base)
    # 40 near-copies (distinct vectors) + 5 unrelated
    vecs = [(base + rng.standard_normal(dim) * 1e-3).tolist() for _ in range(40)]
    vecs += [rng.standard_normal(dim).tolist() for _ in range(5)]
    sdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    C = [base.tolist(), (-base).tolist()]

    full = semdedup.semantic_dup_pairs(sdf, C, threshold=0.95)
    n_full = full.count()
    assert n_full >= 40 * 39 // 2  # quadratic without the cap

    capped = semdedup.semantic_dup_pairs(
        sdf, C, threshold=0.95, max_pairs_per_cluster=100
    )
    rows = capped.collect()
    assert len(rows) == 39  # hub edges only: bounded by family size
    assert all(r.cos_sim is None for r in rows)  # degraded marker
    assert all(r.id_a == 0 for r in rows)  # hub = min involved id

    # CC over the capped edges: one family covering all 40, organics solo
    from bigdataproject_formula1_telemetry_spark.operators.dedup import (
        connected_components,
    )

    comp = {
        r.id: r.component for r in connected_components(capped).collect()
    }
    assert all(comp[i] == 0 for i in range(40))
    assert not any(i in comp for i in range(40, 45))

    # sub-cap clusters are bit-identical to the uncapped output
    same = semdedup.semantic_dup_pairs(
        sdf, C, threshold=0.95, max_pairs_per_cluster=10_000
    )
    assert sorted(map(str, same.collect())) == sorted(map(str, full.collect()))


def test_build_semantic_index_normalizes_raw_centroids(spark, tmp_path):
    """r6 ADVICE: index assignment must share the admission probes'
    SPHERICAL geometry even for raw (non-unit) centroids, e.g. plain
    k-means means.  On c0=(10,0) vs c1=(0,1), x≈(0.5,0.86) argmaxes
    dot-product to c0 but cosine to c1 — a raw-matrix assigner would
    store x in a partition nprobe=1 never probes, and the admission
    path would silently re-admit x's duplicates forever."""
    C = [[10.0, 0.0], [0.0, 1.0]]
    x = [0.5, 0.86]
    stored = spark.createDataFrame(
        [(1, x)], "vec_id long, embedding array<double>"
    )
    root = str(tmp_path / "semidx_raw")
    semdedup.build_semantic_index(stored, C, root, "base")
    # stored under the cluster the NORMALIZED assigner picks
    assert spark.read.parquet(root).first()["ivf_cluster"] == 1

    inc = spark.createDataFrame(
        [(100, x), (101, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = semdedup.semantic_dedup_against_index(
        spark, inc, root, C, threshold=0.99, nprobe=1
    )
    # the exact copy IS found (pre-fix it survived); the fresh vector
    # in the other cluster is kept
    assert {r.vec_id for r in out.collect()} == {101}
