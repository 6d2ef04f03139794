"""Semantic deduplication (SemDeDup): cluster-scoped embedding dedup.

Public method — Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication" (arXiv:2303.09540): assign
every embedding to its nearest k-means centroid, compute pairwise cosine
similarities WITHIN each cluster only, and greedily drop any item whose
similarity to an earlier-ordered cluster-mate clears the threshold.  The
processing order decides which member of a duplicate group survives; the
paper found keeping the member with the LOWEST cosine to its centroid
(the least prototypical example) performed best, so that is the default
``keep`` mode here.

This complements the two other near-dedup axes in the repo:

- ``dedup.near_dedup_minhash`` — lexical (shingle Jaccard): catches
  verbatim/boilerplate overlap, blind to paraphrase.
- ``similarity.near_dedup_cosine`` — sign-LSH cosine at HIGH thresholds
  (≥ 0.95): catches near-identical vectors pair-by-pair; recall decays
  as the threshold drops (hyperplane agreement probability falls).
- ``semantic_dedup`` (this module) — cluster-scoped cosine: exact
  within-cluster similarities, so it stays reliable at the moderate
  thresholds (0.7–0.9) where semantic templates/paraphrases live, and
  its candidate generation cost is Σ c_i² instead of corpus².

Scale design (100 TB):

- Candidate scope is the CLUSTER, never the corpus: one narrow
  ``applyInPandas`` over ``groupBy(cluster)`` — a single shuffle of
  (id, vector, cluster) rows.  Per-cluster work is one blocked numpy
  matmul (O(B·c) memory for a c-vector cluster), and only LOSER ids
  leave the executors.
- Size ``n_clusters`` so the biggest cluster fits an executor (the
  paper used 50k clusters for LAION-440M ⇒ ~9k vectors/cluster).
  ``max_cluster_size`` is the guard: oversized clusters are SKIPPED
  (all members kept) with a logged warning — never a straggler/OOM,
  never silent; ``similarity.ivf_balance_report`` audits the layout.
- Replica corpora are collapsed to min-id representatives BEFORE
  clustering (``similarity._collapse_identical`` — the same hardening
  as every other near-dedup entry point), so a million exact copies
  contribute ONE row to the c² term, not 10¹² pairs.
- Zero-norm and NULL vectors are exempt (kept): their cosine is
  undefined, mirroring ``near_dedup_cosine``.
- Determinism: group rows are sorted by id inside the kernel before
  any float work, orderings tie-break on id, and the blocked matmul
  has a fixed block schedule — results are partitioning- and
  retry-invariant.
"""

from __future__ import annotations

import logging
from collections.abc import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from .similarity import _collapse_identical, _expand_losers, _np_assigner, l2_norm

logger = logging.getLogger(__name__)

_KEEP_MODES = ("low_centroid_sim", "high_centroid_sim", "min_id")


def _semdedup_kernel(centroids, threshold: float, keep: str,
                     skip_clusters: frozenset[int], block: int = 1024):
    """Per-cluster loser selection: given one cluster's (id, vec) rows,
    emit the ids SemDeDup drops.  One blocked lower-triangular cosine
    matmul per cluster; only loser ids are returned."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    cnorm = np.linalg.norm(C, axis=1)
    cnorm[cnorm == 0] = 1.0
    Cn = C / cnorm[:, None]

    def dedup_cluster(key, pdf):
        cl = int(key[0])
        out_empty = pd.DataFrame({"__lost": pd.Series([], dtype=pdf["__m_id"].dtype)})
        if cl in skip_clusters or len(pdf) < 2:
            return out_empty
        # sort by id FIRST: pandas group order is partitioning-dependent,
        # everything after this line is deterministic
        pdf = pdf.sort_values("__m_id", kind="mergesort").reset_index(drop=True)
        X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0] = 1.0  # zero-norm rows are filtered upstream
        Xn = X / norms[:, None]
        ids = pdf["__m_id"].to_numpy()
        if keep == "min_id":
            order = np.argsort(ids, kind="stable")
        else:
            csim = Xn @ Cn[cl]
            sign = 1.0 if keep == "low_centroid_sim" else -1.0
            # lexsort: last key is primary → centroid-sim, ties by id
            order = np.lexsort((ids, sign * csim))
        P = Xn[order]
        n = len(P)
        dropped = np.zeros(n, dtype=bool)
        for a in range(1, n, block):
            b = min(a + block, n)
            # rows a:b against ALL earlier-ordered columns 0:b, then mask
            # to the strictly-lower triangle (j < i)
            S = P[a:b] @ P[:b].T
            cols = np.arange(b)
            rows = np.arange(a, b)
            S[cols[None, :] >= rows[:, None]] = -np.inf
            dropped[a:b] = S.max(axis=1) >= threshold
        return pd.DataFrame({"__lost": ids[order][dropped]})

    return dedup_cluster


def semantic_dedup(
    df: DataFrame,
    centroids: Iterable[Iterable[float]],
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "low_centroid_sim",
    max_cluster_size: int = 1_000_000,
    storage: str = "memory",
) -> DataFrame:
    """SemDeDup over ``df[vec_col]``: keep one member of every
    within-cluster semantic-duplicate group, drop the rest; rows whose
    vector is NULL or zero-norm always survive.

    ``centroids`` is the trained coarse quantizer
    (``similarity.ivf_centroids`` on a deterministic sample — the same
    k×dim list the IVF/IVF-PQ serving paths broadcast).  ``keep``
    selects the surviving member per duplicate group:

    - ``"low_centroid_sim"`` (paper default): least-prototypical member
      survives — retains cluster-edge diversity.
    - ``"high_centroid_sim"``: most-prototypical member survives.
    - ``"min_id"``: smallest id survives (the convention of the repo's
      other dedup operators; fully order-independent).

    Returns ``df`` minus the losers (same schema — a filter, not a
    projection)."""
    if keep not in _KEEP_MODES:
        raise ValueError(f"keep must be one of {_KEEP_MODES}, got {keep!r}")
    C = [list(map(float, c)) for c in centroids]
    if not C:
        raise ValueError("centroids must be non-empty")
    # normalize once: assignment is spherical (max cosine), and
    # ``_np_assigner`` scores against the centroid matrix as-given —
    # ``ivf_centroids`` output is already unit-norm, but arbitrary
    # caller-provided centroids must behave identically
    import numpy as _np

    _Cm = _np.asarray(C, dtype=_np.float64)
    _n = _np.linalg.norm(_Cm, axis=1)
    _n[_n == 0] = 1.0
    C = (_Cm / _n[:, None]).tolist()

    from .dedup import _barrier

    reps, member_rep = _collapse_identical(df, id_col, vec_col, storage)
    # zero-norm/NULL representatives are exempt from the cluster stage
    active = reps.where(l2_norm(F.col(vec_col)) > 0)
    # barrier: the assigned frame feeds the size-guard job AND the dedup
    # kernel — without it the Arrow assigner would run twice
    assigned = _barrier(
        active.select(
            F.col(id_col).alias("__m_id"),
            F.col(vec_col).alias("__v"),
            F.element_at(_np_assigner(C, nprobe=1)(F.col(vec_col)), 1).alias("__cl"),
        ),
        storage,
    )

    # oversized-cluster guard: sizes via groupBy (k rows — never a window
    # over the cluster key), oversized clusters skipped with a warning
    sizes = assigned.groupBy("__cl").agg(F.count(F.lit(1)).alias("__csz"))
    big = [
        (r["__cl"], r["__csz"])
        for r in sizes.where(F.col("__csz") > max_cluster_size).collect()
    ]
    if big:
        logger.warning(
            "semantic_dedup: skipping %d oversized cluster(s) %s above "
            "max_cluster_size=%d — their members are all KEPT; raise "
            "n_clusters (see ivf_balance_report) to restore dedup there",
            len(big), [c for c, _ in big], max_cluster_size,
        )
    skip = frozenset(c for c, _ in big)

    # loser ids carry the input id type (schema-derived, never assumed)
    out_schema = StructType([StructField("__lost", df.schema[id_col].dataType)])
    losing_reps = assigned.groupBy("__cl").applyInPandas(
        _semdedup_kernel(C, float(threshold), keep, skip),
        schema=out_schema,
    )
    losers = _expand_losers(member_rep, losing_reps, id_col)
    return df.join(losers, id_col, "left_anti")


def semantic_dedup_against_index(
    spark,
    increment: DataFrame,
    index_path: str,
    centroids: Iterable[Iterable[float]],
    threshold: float = 0.8,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "ivf_cluster",
    exclude_inc: str | None = None,
) -> DataFrame:
    """Steady-state SemDeDup admission: drop increment rows whose
    cosine to ANY vector already materialized in the
    ``similarity.build_inverted_file`` table reaches ``threshold`` —
    the semantic twin of ``minhash_index.dedup_against_index`` /
    ``exact_index.dedup_exact_against_index``, completing the
    batch/streaming-shared-state triangle on the embedding axis.

    Scale shape: the increment (driver-small by the same contract as
    kNN query sets and MinHash increments) assigns to its ``nprobe``
    nearest centroids driver-side; the UNION of probed cluster ids is
    pushed as a PARTITION filter on the index scan, and the per-cluster
    query matrices ride the kernel closure — the index is never
    shuffled, never joined: each Arrow batch of the pruned scan is ONE
    (batch × dim) @ (dim × n_inc_c) matmul, and only duplicate
    increment ids leave the executors.
    ``nprobe > 1`` checks neighboring clusters too, catching
    cluster-boundary near-dups the batch operator's single-cluster
    scope misses by contract.

    Survivors should then be admitted with
    ``build_inverted_file(survivors, C, path, mode="append")`` — the
    caller owns that write (same division of labor as the MinHash
    index).  NULL/zero-norm increment vectors are exempt (kept): their
    cosine is NULL."""
    C = [list(map(float, c)) for c in centroids]
    if not C:
        raise ValueError("centroids must be non-empty")

    # the increment is driver-small BY CONTRACT (the kNN-query-set /
    # minhash-increment contract: a broadcast join would collect it to
    # the driver anyway) — collect it once, probe clusters driver-side,
    # and ship per-cluster query matrices in the kernel closure
    Cn = np.asarray(C, dtype=np.float64)
    cn = np.linalg.norm(Cn, axis=1)
    cn[cn == 0] = 1.0
    Cn = Cn / cn[:, None]
    n_probe = min(nprobe, Cn.shape[0])

    per_cluster: dict[int, list] = {}
    for r in increment.select(id_col, vec_col).collect():
        v = r[1]
        if v is None:
            continue
        x = np.asarray(v, dtype=np.float64)
        nrm = np.linalg.norm(x)
        if nrm == 0:
            continue  # exempt: zero-norm cosine is undefined
        sims = (x / nrm) @ Cn.T
        top = (
            np.argpartition(-sims, n_probe - 1)[:n_probe]
            if n_probe > 1
            else [int(np.argmax(sims))]
        )
        for c in top:
            per_cluster.setdefault(int(c), []).append((r[0], x / nrm))
    if not per_cluster:
        return increment
    qmats = {
        c: (
            [i for i, _ in rows],
            np.stack([q for _, q in rows]),
        )
        for c, rows in per_cluster.items()
    }
    probed = sorted(qmats)

    idx = spark.read.parquet(index_path).where(F.col(cluster_col).isin(probed))
    if exclude_inc is not None and "inc" in idx.columns:
        # inc-partitioned index (build_semantic_index): a retried
        # increment must not match its own half-admitted prior write
        idx = idx.where(F.col("inc") != F.lit(exclude_inc))

    # ONE matmul per (Arrow batch × cluster) instead of a per-pair
    # kernel over the joined rows: the join form materialized
    # |increment| × |cluster| candidate pairs (~31M rows / 15 GB at the
    # 500k-index 2k-increment sweep leg); this form streams the pruned
    # index scan through (batch × dim) @ (dim × n_inc_c) products and
    # emits only the duplicate increment ids.
    # NB: no id-inequality guard — an index row with the SAME id as an
    # increment row is (by admission discipline) the increment's own
    # previously-admitted copy, and dropping it is what makes a retried
    # search-then-append converge: the retry drops everything already
    # written and appends nothing, so at-least-once delivery needs no
    # inc= partition machinery here (build_semantic_index adds it for
    # the half-admitted-retry case).
    out_schema = StructType(
        [StructField("__dup", increment.schema[id_col].dataType)]
    )
    thr = float(threshold)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            hits: set = set()
            for c, grp in pdf.groupby(cluster_col):
                ids_q, Q = qmats.get(int(c), (None, None))
                if ids_q is None:
                    continue
                X = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in grp[vec_col]]
                )
                norms = np.linalg.norm(X, axis=1)
                norms[norms == 0] = 1.0  # zero-norm stored: cos 0, no dup
                S = Q @ (X / norms[:, None]).T
                for pos in np.nonzero(S.max(axis=1) >= thr)[0]:
                    hits.add(ids_q[pos])
            if hits:
                yield pd.DataFrame({"__dup": sorted(hits)})

    dups = (
        idx.select(cluster_col, vec_col)
        .mapInPandas(score, out_schema)
        .select(F.col("__dup").alias(id_col))
        .distinct()
    )
    return increment.join(dups, id_col, "left_anti")


def _pairs_kernel(centroids, threshold: float, skip_clusters: frozenset[int],
                  block: int = 1024, max_pairs: int = 10_000_000):
    """Per-cluster duplicate-PAIR emission: (id_a, id_b, cos_sim) for
    every within-cluster pair at/above threshold, id_a < id_b.  Same
    blocked lower-triangular matmul as ``_semdedup_kernel``.

    Output is bounded by the real duplicate mass — EXCEPT on a dense
    NEAR-identical family (exact copies collapse upstream, but a
    boilerplate template with per-page noise does not): a
    mutually-similar family of f rows is f²/2 edges, quadratic output
    from one kernel call.  ``max_pairs`` is the guard: when a cluster's
    pair mass exceeds it, the kernel degrades to HUB edges — every
    dup-involved row links once to the cluster's minimum dup-involved
    id, with ``cos_sim = NULL`` marking the degraded edges.  The
    degradation direction is OVER-merge (the whole dense mass becomes
    one family): safe for leakage-free splits (a too-big family still
    lands in one split — fragmenting would leak) and conservative for
    survivor counting; callers can detect it structurally
    (``cos_sim IS NULL``), no log-scraping needed."""
    C = np.asarray(centroids, dtype=np.float64)

    def pairs_cluster(key, pdf):
        cl = int(key[0])
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=pdf["__m_id"].dtype),
                "id_b": pd.Series([], dtype=pdf["__m_id"].dtype),
                "cos_sim": pd.Series([], dtype="float64"),
            }
        )
        if cl in skip_clusters or len(pdf) < 2:
            return empty
        pdf = pdf.sort_values("__m_id", kind="mergesort").reset_index(drop=True)
        X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0] = 1.0
        Xn = X / norms[:, None]
        ids = pdf["__m_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        P = Xn[order]
        oid = ids[order]
        n = len(P)
        out_a, out_b, out_s = [], [], []
        involved = np.zeros(n, dtype=bool)
        emitted = 0
        capped = False
        for a in range(1, n, block):
            b = min(a + block, n)
            S = P[a:b] @ P[:b].T
            cols = np.arange(b)
            rows = np.arange(a, b)
            S[cols[None, :] >= rows[:, None]] = -np.inf
            hits = S >= threshold
            hit_r, hit_c = np.nonzero(hits)
            involved[hit_c] = True
            involved[np.unique(hit_r) + a] = True
            if not capped:
                emitted += len(hit_r)
                if emitted > max_pairs:
                    capped = True
                    out_a, out_b, out_s = [], [], []  # replaced by hub edges
                else:
                    out_a.extend(oid[hit_c])  # earlier in id order → id_a
                    out_b.extend(oid[hit_r + a])
                    out_s.extend(S[hit_r, hit_c])
        if capped:
            dup_ids = oid[involved]
            hub = dup_ids[0]  # oid ascends: minimum dup-involved id
            return pd.DataFrame(
                {
                    "id_a": np.full(len(dup_ids) - 1, hub),
                    "id_b": dup_ids[1:],
                    "cos_sim": np.full(len(dup_ids) - 1, np.nan),
                }
            ).astype({"cos_sim": "float64"})
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "cos_sim": out_s})

    return pairs_cluster


def semantic_dup_pairs(
    df: DataFrame,
    centroids: Iterable[Iterable[float]],
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int = 1_000_000,
    storage: str = "memory",
    max_pairs_per_cluster: int = 10_000_000,
) -> DataFrame:
    """Within-cluster semantic duplicate pairs: (id_a, id_b, cos_sim)
    with id_a < id_b and cos_sim ≥ threshold — the SemDeDup family's
    edge-list artifact, feeding ``dedup.connected_components`` /
    ``semantic_duplicate_clusters`` exactly as ``cosine_dup_pairs``
    and ``jaccard_pairs`` feed the lexical families.

    Identical vectors collapse first (one rep per distinct vector);
    member→rep identity edges (cos_sim 1.0) are emitted so connected
    components see complete families.  Same cluster scope, guards and
    determinism as ``semantic_dedup`` — plus ``max_pairs_per_cluster``:
    a dense NEAR-identical family (collapse only folds exact copies) is
    quadratic edge mass, and past the cap the cluster degrades to hub
    edges with ``cos_sim`` NULL (over-merge direction — see
    ``_pairs_kernel``; detect with ``cos_sim IS NULL``)."""
    C = [list(map(float, c)) for c in centroids]
    if not C:
        raise ValueError("centroids must be non-empty")
    _Cm = np.asarray(C, dtype=np.float64)
    _n = np.linalg.norm(_Cm, axis=1)
    _n[_n == 0] = 1.0
    C = (_Cm / _n[:, None]).tolist()

    from .dedup import _barrier

    reps, member_rep = _collapse_identical(df, id_col, vec_col, storage)
    active = reps.where(l2_norm(F.col(vec_col)) > 0)
    assigned = _barrier(
        active.select(
            F.col(id_col).alias("__m_id"),
            F.col(vec_col).alias("__v"),
            F.element_at(_np_assigner(C, nprobe=1)(F.col(vec_col)), 1).alias("__cl"),
        ),
        storage,
    )
    sizes = assigned.groupBy("__cl").agg(F.count(F.lit(1)).alias("__csz"))
    big = [
        (r["__cl"], r["__csz"])
        for r in sizes.where(F.col("__csz") > max_cluster_size).collect()
    ]
    if big:
        logger.warning(
            "semantic_dup_pairs: skipping %d oversized cluster(s) %s above "
            "max_cluster_size=%d — no pairs emitted there",
            len(big), [c for c, _ in big], max_cluster_size,
        )
    skip = frozenset(c for c, _ in big)

    id_t = df.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("id_a", id_t),
            StructField("id_b", id_t),
            StructField("cos_sim", DoubleType()),
        ]
    )
    rep_pairs = assigned.groupBy("__cl").applyInPandas(
        _pairs_kernel(C, float(threshold), skip, max_pairs=max_pairs_per_cluster),
        schema=out_schema,
    ).withColumn(
        # degraded hub edges arrive as NaN from the Arrow kernel; surface
        # them as NULL (queryable: `cos_sim IS NULL` = capped cluster)
        "cos_sim", F.nanvl(F.col("cos_sim"), F.lit(None))
    )
    identity_edges = member_rep.where(F.col("__m_id") != F.col("__rep")).select(
        F.col("__rep").alias("id_a"),
        F.col("__m_id").alias("id_b"),
        F.lit(1.0).alias("cos_sim"),
    )
    return rep_pairs.unionByName(identity_edges)


def semantic_duplicate_clusters(
    df: DataFrame,
    centroids: Iterable[Iterable[float]],
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **pair_kwargs,
) -> DataFrame:
    """(id, cluster) for EVERY row: ``cluster`` = min id of the row's
    SEMANTIC duplicate family (its own id when it has none) — the
    ``dedup.duplicate_clusters`` artifact on the embedding axis.  Feeds
    family audits and leakage-free splitting
    (``sampling.assign_split(df, [cluster], ...)`` — a paraphrase of a
    training doc can no longer land in validation)."""
    from .dedup import connected_components

    pairs = semantic_dup_pairs(
        df, centroids, threshold, id_col, vec_col, **pair_kwargs
    )
    comp = connected_components(pairs).select(
        F.col("id").alias("__cid"), F.col("component").alias("cluster")
    )
    base = df.select(F.col(id_col).alias("id"))
    return base.join(comp, base["id"] == F.col("__cid"), "left").select(
        "id", F.coalesce(F.col("cluster"), F.col("id")).alias("cluster")
    )


def combined_duplicate_clusters(
    docs: DataFrame,
    centroids: Iterable[Iterable[float]],
    lexical_threshold: float = 0.8,
    semantic_threshold: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
    embed_dim: int = 256,
    **lexical_kwargs,
) -> DataFrame:
    """(id, cluster) families over BOTH duplicate axes at once: the
    union of the lexical MinHash/Jaccard edge list
    (``dedup.duplicate_clusters``'s pair stage) and the semantic
    within-cluster cosine edge list (``semantic_dup_pairs`` over
    hashed-BoW embeddings), closed under ONE connected-components pass —
    so a verbatim copy of a paraphrase of a training document still
    lands in the same family.  This is the strictest leakage-free-split
    gate the repo offers: feed the labels to
    ``sampling.assign_split(df, [cluster], ...)``.

    Cost = the two pair stages (each already bucketed/cluster-scoped,
    never all-pairs) + one CC over the union edge list (edges ~ real
    duplicate mass)."""
    from .dedup import (
        _maybe_collapse,
        connected_components,
        jaccard_pairs,
        minhash_lsh_candidates,
        shingle_sets,
    )
    from .embed import hashed_embedding

    # lexical edges at representative level + member→rep identity edges
    tagged, reps = _maybe_collapse(docs, text_col, id_col, None)
    sh = shingle_sets(reps, text_col, id_col)
    cand = minhash_lsh_candidates(
        reps, text_col, id_col, sh=sh, **lexical_kwargs
    )
    lex = (
        jaccard_pairs(reps, cand, text_col, id_col, sh=sh)
        .where(F.col("jaccard") >= lexical_threshold)
        .select("id_a", "id_b")
    )
    if tagged is not None:
        lex = lex.unionByName(
            tagged.where(F.col(id_col) != F.col("__rep")).select(
                F.col("__rep").alias("id_a"), F.col(id_col).alias("id_b")
            )
        )

    semb = hashed_embedding(docs, text_col=text_col, out_col="__semb",
                            dim=embed_dim)
    sem = semantic_dup_pairs(
        semb, centroids, semantic_threshold, id_col=id_col, vec_col="__semb"
    ).select("id_a", "id_b")

    comp = connected_components(lex.unionByName(sem)).select(
        F.col("id").alias("__cid"), F.col("component").alias("cluster")
    )
    base = docs.select(F.col(id_col).alias("id"))
    return base.join(comp, base["id"] == F.col("__cid"), "left").select(
        "id", F.coalesce(F.col("cluster"), F.col("id")).alias("cluster")
    )


def build_semantic_index(
    corpus: DataFrame,
    centroids: Iterable[Iterable[float]],
    path: str,
    increment_id: str = "base",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "ivf_cluster",
) -> None:
    """Materialize the ADMISSION-grade semantic index: the corpus
    hive-partitioned by ``(inc, nearest-centroid)``.  Same layout idea
    as ``similarity.build_inverted_file`` plus the ``inc=`` level the
    idempotent-retry discipline needs (``minhash_index`` convention:
    clear-then-replace the increment's directory, exclude it from its
    own search).  One assignment pass; NULL/zero-norm vectors are not
    indexed (they can never be anyone's duplicate).

    Centroids are L2-normalized before assignment — EXACTLY as
    ``semantic_dedup`` / ``semantic_dedup_against_index`` normalize
    their probes — so index partitioning and admission search share one
    spherical geometry.  With raw (non-unit) centroids, e.g. plain
    k-means means, argmax dot-product and argmax cosine disagree, and a
    vector stored under one cluster would be probed in another: the
    admission path would silently miss stored duplicates.

    Writes (any ``increment_id``) fail fast while a compaction lease is
    held, and abort-with-rollback if one lands mid-write (the shared
    ``index_lifecycle`` contract, r12; the lease lives in a SIBLING file
    ``<path>._compacting.json`` because the table is the root itself —
    an in-root lease would ride the compaction renames)."""
    from .index_lifecycle import abort_append_if_leased, check_append_allowed
    from .minhash_index import _INC_ID_RE, _clear_inc_partition

    if not _INC_ID_RE.match(increment_id):
        raise ValueError(
            "increment_id must match [A-Za-z0-9._-]+ (it names a "
            f"partition directory), got {increment_id!r}"
        )
    lease = _semantic_lease_file(path)
    if increment_id == "base":
        # a base build is a FRESH index generation: clear any prior
        # lease/folded-id state instead of guarding against it
        from .index_lifecycle import reset_lifecycle

        reset_lifecycle(corpus.sparkSession, lease)
    else:
        check_append_allowed(
            corpus.sparkSession, lease, "build_semantic_index",
            increment_id=increment_id,
        )
    _Cm = np.asarray([list(map(float, c)) for c in centroids], dtype=np.float64)
    if _Cm.size == 0:
        raise ValueError("centroids must be non-empty")
    _n = np.linalg.norm(_Cm, axis=1)
    _n[_n == 0] = 1.0
    C = (_Cm / _n[:, None]).tolist()
    _clear_inc_partition(corpus.sparkSession, path, increment_id)
    (
        corpus.select(id_col, vec_col)
        .where(l2_norm(F.col(vec_col)) > 0)
        .select(
            "*",
            F.lit(increment_id).alias("inc"),
            _np_assigner(C, nprobe=1)(F.col(vec_col))[0].alias(cluster_col),
        )
        .write.mode("append")
        .partitionBy("inc", cluster_col)
        .parquet(path)
    )
    abort_append_if_leased(
        corpus.sparkSession, lease, increment_id, [path],
        "build_semantic_index",
    )


def _semantic_lease_file(path: str) -> str:
    """Sibling lease file for the single-table semantic index (the table
    IS the root, so ``index_lifecycle.lease_file_at``'s in-root default
    would vanish with the compaction swap)."""
    return path.rstrip("/") + "._compacting.json"


def list_semantic_increments(spark, path: str) -> list[str]:
    """Increment ids present in a ``build_semantic_index`` table (root
    ``inc=`` directory names — metadata only, no data scan)."""
    import os

    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("inc="):
            out.append(name[len("inc="):])
    return sorted(out)


def expire_semantic_increments(spark, path: str, keep) -> list[str]:
    """Retention for the semantic index — the ``minhash_index``
    dedup-horizon policy on the embedding axis: delete every ``inc=``
    partition whose id is NOT kept (``keep`` = predicate or explicit
    list; ``base`` always survives — rebuild to rotate it).
    Metadata-only directory deletes; expired vectors simply become
    semantically admissible again.  Fails fast while a compaction lease
    is held (a mid-fold partition delete would tear the compactor's
    scan, and the fold would resurrect the rows anyway)."""
    from .index_lifecycle import read_lease
    from .minhash_index import _clear_inc_partition

    if read_lease(spark, _semantic_lease_file(path)) is not None:
        raise ValueError(
            "expire_semantic_increments: a compaction lease is held on "
            "this index; retry after the compaction completes"
        )

    kept = (
        (lambda i: i in set(keep)) if isinstance(keep, (list, set, tuple))
        else keep
    )
    expired = [
        i for i in list_semantic_increments(spark, path)
        if i != "base" and not kept(i)
    ]
    for inc in expired:
        _clear_inc_partition(spark, path, inc)
    return expired


def compact_semantic_index(spark, path: str, cluster_col: str = "ivf_cluster") -> int:
    """LSM-style maintenance for the semantic index, completing the
    lifecycle symmetry with ``minhash_index.compact_index`` /
    ``exact_index.compact_index``: fold every ``inc=`` partition into a
    fresh ``base`` — after months of daily increments the table holds
    incs × clusters small files, and the admission scan is
    file-count-bound long before it is byte-bound.  Vectors are
    REWRITTEN, never re-assigned (the cluster column is already stored —
    a metadata-scale job relative to a build).  Driven by the shared
    ``index_lifecycle.compact_index_tables`` (r12): leased against
    concurrent ``build_semantic_index`` writes (sibling lease file —
    the table is the root), folds exactly the post-lease ``inc IN
    snapshot`` rows through the staged-then-rename swap, and the swap
    reconciles (moves, never deletes) increments written after the
    snapshot.  Returns the number of increments folded.  Run after
    ``expire_semantic_increments`` when ``list_semantic_increments``
    grows past a few hundred."""
    from .index_lifecycle import compact_index_tables

    def fold(spark_, table, ids, staged):
        (
            spark_.read.parquet(table)
            .where(F.col("inc").isin(list(ids)))
            .drop("inc")
            .withColumn("inc", F.lit("base"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("inc", cluster_col)
            .parquet(staged)
        )

    return compact_index_tables(
        spark,
        _semantic_lease_file(path),
        [(path.rstrip("/"), fold)],
    )


def incremental_semantic_dedup(
    spark,
    increment: DataFrame,
    index_path: str,
    centroids: Iterable[Iterable[float]],
    threshold: float = 0.8,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "low_centroid_sim",
    append: bool = False,
    increment_id: str | None = None,
) -> DataFrame:
    """One increment of steady-state SemDeDup: self-dedup the increment
    (``semantic_dedup`` — within-batch duplicate groups collapse to one
    member), drop what the ``build_semantic_index`` table already holds
    (``semantic_dedup_against_index``, EXCLUDING the increment's own
    ``inc=`` partition so a half-admitted prior attempt can't match the
    batch against itself), and optionally admit the survivors under
    ``inc=<increment_id>`` (clear-then-replace — replays converge
    byte-for-byte).  The ``minhash_index.incremental_near_dedup``
    protocol, on the embedding axis."""
    if append and increment_id is None:
        raise ValueError("append=True requires increment_id")
    kept = semantic_dedup(
        increment, centroids, threshold=threshold,
        id_col=id_col, vec_col=vec_col, keep=keep,
    )
    kept = semantic_dedup_against_index(
        spark, kept, index_path, centroids, threshold, nprobe,
        id_col=id_col, vec_col=vec_col, exclude_inc=increment_id,
    )
    if append:
        survivors = kept.localCheckpoint(eager=True)
        build_semantic_index(
            survivors.select(id_col, vec_col),
            centroids, index_path, increment_id,
            id_col=id_col, vec_col=vec_col,
        )
        return survivors
    return kept


def centroid_similarity(
    df: DataFrame,
    centroids: Iterable[Iterable[float]],
    vec_col: str = "embedding",
    out_col: str = "centroid_sim",
) -> DataFrame:
    """Append each row's cosine to its nearest centroid (the
    "prototypicality" score of Sorscher et al., NeurIPS 2022).  One
    narrow Arrow pass; NULL/zero-norm vectors score NULL."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    C = np.asarray([list(map(float, c)) for c in centroids], dtype=np.float64)
    nrm = np.linalg.norm(C, axis=1)
    nrm[nrm == 0] = 1.0
    Cn = C / nrm[:, None]

    @pandas_udf(DoubleType())
    def _csim(vec: pd.Series) -> pd.Series:
        if len(vec) == 0:
            return pd.Series([], dtype="float64")
        dim = Cn.shape[1]
        zero = np.zeros(dim)
        X = np.stack(
            [zero if v is None else np.asarray(v, dtype=np.float64) for v in vec]
        )
        norms = np.linalg.norm(X, axis=1)
        bad = norms == 0
        norms[bad] = 1.0
        best = ((X / norms[:, None]) @ Cn.T).max(axis=1)
        best[bad] = np.nan
        return pd.Series(best)

    return df.withColumn(out_col, F.nanvl(_csim(F.col(vec_col)), F.lit(None)))


def prototype_prune(
    df: DataFrame,
    centroids: Iterable[Iterable[float]],
    keep_fraction: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cutoff: float | None = None,
) -> DataFrame:
    """SSL-prototypes diversification (Sorscher et al., "Beyond neural
    scaling laws", NeurIPS 2022 — the second stage of D4): drop the
    most PROTOTYPICAL rows (highest cosine to their nearest centroid),
    keeping ``keep_fraction`` of the corpus — the easy, redundant
    cluster cores go, the informative edges stay.

    Scale shape: one ``percentile_approx`` sketch aggregate to find the
    global prototypicality cutoff, then one narrow filter pass — never a
    global sort.  The realized keep-rate therefore carries the sketch's
    resolution error (±~1% at the default accuracy); pass an explicit
    ``cutoff`` (score threshold, e.g. from a prior calibration run) to
    skip the sizing aggregate entirely — then sizing costs ZERO scans.
    NULL/zero-norm vectors have no prototype and always survive."""
    if not 0 < keep_fraction <= 1:
        raise ValueError(f"keep_fraction must be in (0, 1], got {keep_fraction}")
    scored = centroid_similarity(df, centroids, vec_col, "__proto")
    if cutoff is None:
        if keep_fraction == 1.0:
            return df
        cutoff = scored.agg(
            F.percentile_approx("__proto", keep_fraction, 65536)
        ).first()[0]
        if cutoff is None:  # all vectors NULL/zero-norm — nothing prunable
            return df
    return scored.where(
        F.col("__proto").isNull() | (F.col("__proto") <= F.lit(float(cutoff)))
    ).drop("__proto")


def d4_prune(
    df: DataFrame,
    centroids: Iterable[Iterable[float]],
    threshold: float = 0.8,
    keep_fraction: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **semdedup_kwargs,
) -> DataFrame:
    """D4 (Tirumala et al., arXiv:2308.12284): SemDeDup then
    SSL-prototypes pruning, the published composition — dedup removes
    the duplicate mass, diversification removes the prototypical core,
    both against the same coarse quantizer."""
    deduped = semantic_dedup(
        df, centroids, threshold=threshold,
        id_col=id_col, vec_col=vec_col, **semdedup_kwargs,
    )
    return prototype_prune(
        deduped, centroids, keep_fraction, id_col=id_col, vec_col=vec_col
    )
