"""Similarity search over embedding columns (north-star extension).

Brute-force cosine top-k as the correctness baseline, and an LSH-bucketed
(random hyperplane / sign-LSH) variant as the scale path: at 100 TB the
corpus side is hash-partitioned by bucket id, queries are broadcast, and
each task only scans its bucket — the classic ANN trade of recall for a
bounded per-task candidate set.

Dot products use ``F.zip_with`` + ``F.aggregate`` (JVM expression tree, no
Python).  All math in double precision for cross-engine determinism.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, score every pair, keep k per query via row_number.

    The corpus is never shuffled by pair — only the scored rows shuffle,
    keyed by query id, and AQE's skew handling splits a hot query if needed.
    Ties broken by corpus id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("__qv")
    )
    scored = corpus.join(F.broadcast(q), corpus[id_col] != q[query_id_col]).select(
        query_id_col,
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("__qv"), F.col(vec_col)).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def _knn_out_schema(
    corpus: DataFrame, queries: DataFrame, id_col: str, query_id_col: str
) -> StructType:
    """Output schema for the Arrow kNN forms with id field types DERIVED
    from the input schemas, so non-integral id columns (e.g. string
    vec_ids) survive the drop-in replacement with the same types the
    expression forms would produce."""
    return StructType(
        [
            StructField(query_id_col, queries.schema[id_col].dataType),
            StructField("neighbor_id", corpus.schema[id_col].dataType),
            StructField("cos_sim", DoubleType()),
        ]
    )


def _query_matrix(q_rows, dtype=None):
    """(ids, L2-normalized query matrix) from collected query rows.

    NULL query vectors become all-NaN rows — their sims are NaN against
    everything, so (like zero-norm queries via the ``qn == 0 → NaN``
    path) they simply produce no output rows, instead of crashing
    ``np.stack`` on a 0-d element.  Returns (None, None) when every
    query vector is NULL (callers emit the empty frame)."""
    import numpy as np

    dtype = dtype or np.float64
    vecs = [r[1] for r in q_rows]
    dims = [len(v) for v in vecs if v is not None]
    if not dims:
        return None, None
    dim = max(dims)
    Q = np.stack(
        [
            np.full(dim, np.nan, dtype=dtype)
            if v is None
            else np.asarray(v, dtype=dtype)
            for v in vecs
        ]
    )
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0] = np.nan  # zero-norm query → NaN sims, like cosine()
    return np.array([r[0] for r in q_rows]), Q / qn[:, None]


def knn_bruteforce_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    quantized: bool = False,
) -> DataFrame:
    """Exact cosine top-k, Arrow-matmul scoring: the (broadcast-small by
    contract) query set is collected to one normalized (nq × dim) matrix;
    ONE ``mapInPandas`` pass over the corpus scores each Arrow batch
    against ALL queries as a single numpy matmul and emits only that
    batch's per-query top-k (nq·k rows per batch, not batch·nq pairs), a
    global per-query window then keeps the true top-k.

    Same candidates and tie-break (cos desc, id asc) as
    ``knn_bruteforce``; results can differ only where two cosines are
    within float summation noise (numpy pairwise vs HOF left fold) — use
    this form when the scored-pair volume makes the interpreted HOF the
    bottleneck (the shuffle shrinks from nq·corpus scored rows to
    nq·k·n_batches).

    Known divergence on NULL-cosine rows: the expression form emits
    NULL-``cos_sim`` filler rows (nulls-last) when a query has fewer
    than k finite candidates, and NULL-sim rows for a NULL/zero-norm
    *query* vector.  The Arrow forms OMIT NULL-similarity rows entirely:
    fewer than k finite candidates → fewer than k output rows, and a
    NULL/zero-norm query vector → no rows for that query (pinned by
    ``test_knn_bruteforce_arrow_null_and_zero_vectors``).  Id columns
    pass through with their input types (output schema is derived from
    the input schemas).

    ``quantized=True`` is the int8 SERVING path: point ``vec_col`` at
    the ``quantize_embeddings`` code column (array<tinyint>) on BOTH
    sides and the kernel scores the codes directly — cosine is exactly
    invariant to the per-vector ``q8_scale`` (codes = x/scale·127, and
    cosine divides out any per-vector scalar), so no rescale enters the
    scoring; the scale column is only needed to reconstruct magnitudes
    for dot-product/L2 metrics.  The matmul runs in float32 (half the
    memory bandwidth; int8 values upcast exactly), and at 100 TB the
    real win is the scan: the code column is 8× smaller than the
    float64 arrays, so the one pass this operator makes over the corpus
    reads 8× fewer bytes.  Top-k overlap vs the float path ≥ 0.9
    (8-bit rounding perturbs near-ties; asserted in tests)."""
    import numpy as np

    dtype = np.float32 if quantized else np.float64
    q_rows = queries.select(id_col, vec_col).collect()
    out_schema = _knn_out_schema(corpus, queries, id_col, query_id_col)
    q_ids, Qn = _query_matrix(q_rows, dtype)
    if q_ids is None:
        return corpus.sparkSession.createDataFrame([], out_schema)
    dim = Qn.shape[1]
    bq = corpus.sparkSession.sparkContext.broadcast((q_ids, Qn, dtype))

    def score(batches):
        import numpy as np

        ids_b, Qn_b, dt = bq.value
        nq = len(ids_b)
        zero = np.zeros(dim, dtype=dt)
        for pdf in batches:
            if not len(pdf):
                continue
            cids = pdf[id_col].to_numpy()
            X = np.stack(
                [
                    zero if v is None else np.asarray(v, dtype=dt)
                    for v in pdf[vec_col]
                ]
            )
            nrm = np.linalg.norm(X, axis=1)
            nrm[nrm == 0] = np.nan
            sims = (X / nrm[:, None]) @ Qn_b.T  # (batch, nq); NaN = NULL
            rows = []
            kk = min(k, len(cids))
            for j in range(nq):
                col = sims[:, j]
                # self-match excluded; NaNs (NULL cosine) are dropped —
                # a query with fewer than k finite candidates returns
                # fewer than k rows (the expression form would fill the
                # trailing slots with NULL-sim rows; see docstring)
                mask = cids != ids_b[j]
                cand = np.where(mask & ~np.isnan(col))[0]
                if len(cand) == 0:
                    continue
                # tie-safe pre-truncation: same (sim desc, id asc) total
                # order as the final window (identical vectors tie
                # exactly; argpartition alone let batch row order
                # pick the survivors — r7 fix)
                top = cand[np.lexsort((cids[cand], -col[cand]))[:kk]]
                for i in top:
                    rows.append((ids_b[j], cids[i], float(col[i])))
            if rows:
                yield pd.DataFrame(
                    rows, columns=[query_id_col, "neighbor_id", "cos_sim"]
                )

    scored = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def knn_ivf_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    quantized: bool = False,
) -> DataFrame:
    """IVF top-k as ONE fused Arrow scan — the form for a corpus that is
    NOT pre-partitioned by cluster (e.g. ad-hoc search over a flat
    table).  Each batch assigns its rows to their nearest centroid and
    scores them against all queries in the same numpy matmul pass;
    rows outside a query's ``nprobe`` probed clusters are masked out, so
    only nq·k rows per batch reach the shuffle.  No join, no second scan.

    Semantics match ``knn_ivf`` (same probe sets, same candidates, same
    tie-break), with the Arrow-form NULL divergence documented on
    ``knn_bruteforce_arrow``: NULL-similarity rows are omitted rather
    than emitted as NULL-sim filler, and NULL query vectors produce no
    rows.  Id types are derived from the input schemas.  Choose between
    the forms by layout: with a materialized inverted file (corpus
    written partitioned by cluster id — the 100 TB path) ``knn_ivf``'s
    join prunes entire partitions and reads only ~nprobe/n_clusters of
    the data, which a full-scan form cannot.

    ``quantized=True``: int8 serving on ``quantize_embeddings`` codes
    (see ``knn_bruteforce_arrow``) — pass the code column as ``vec_col``
    on both sides; float centroids (trained on the float corpus or on
    dequantized codes) remain valid because normalized codes track
    normalized floats to 8-bit rounding, and the cluster assignment
    happens on the normalized rows."""
    import numpy as np

    dtype = np.float32 if quantized else np.float64
    q_rows = queries.select(id_col, vec_col).collect()
    out_schema = _knn_out_schema(corpus, queries, id_col, query_id_col)
    q_ids, Qn = _query_matrix(q_rows, dtype)
    if q_ids is None:
        return corpus.sparkSession.createDataFrame([], out_schema)
    C = np.asarray(centroids, dtype=dtype)
    n = min(nprobe, C.shape[0])
    # per-query probed clusters, then a (nq × n_clusters) allow mask.
    # NaN query rows (NULL vectors) get an arbitrary probe set — their
    # sims are NaN anyway, so they emit nothing.
    probes = np.argpartition(
        -np.nan_to_num(Qn @ C.T, nan=-np.inf), n - 1, axis=1
    )[:, :n]
    allow = np.zeros((len(q_ids), C.shape[0]), dtype=bool)
    for j in range(len(q_ids)):
        allow[j, probes[j]] = True
    dim = Qn.shape[1]
    bq = corpus.sparkSession.sparkContext.broadcast((q_ids, Qn, C, allow, dtype))

    def score(batches):
        import numpy as np

        ids_b, Qn_b, C_b, allow_b, dt = bq.value
        nq = len(ids_b)
        zero = np.zeros(dim, dtype=dt)
        for pdf in batches:
            if not len(pdf):
                continue
            cids = pdf[id_col].to_numpy()
            X = np.stack(
                [
                    zero if v is None else np.asarray(v, dtype=dt)
                    for v in pdf[vec_col]
                ]
            )
            nrm = np.linalg.norm(X, axis=1)
            nrm[nrm == 0] = np.nan
            Xn = X / nrm[:, None]
            clusters = np.nanargmax(
                np.where(np.isnan(Xn[:, :1]), -np.inf, Xn @ C_b.T), axis=1
            )
            sims = Xn @ Qn_b.T  # (batch, nq)
            sims[~allow_b[:, clusters].T] = np.nan  # outside probe set
            rows = []
            kk = min(k, len(cids))
            for j in range(nq):
                col = sims[:, j]
                mask = cids != ids_b[j]
                cand = np.where(mask & ~np.isnan(col))[0]
                if len(cand) == 0:
                    continue
                # tie-safe pre-truncation: same (sim desc, id asc) total
                # order as the final window (identical vectors tie
                # exactly; argpartition alone let batch row order
                # pick the survivors — r7 fix)
                top = cand[np.lexsort((cids[cand], -col[cand]))[:kk]]
                for i in top:
                    rows.append((ids_b[j], cids[i], float(col[i])))
            if rows:
                yield pd.DataFrame(
                    rows, columns=[query_id_col, "neighbor_id", "cos_sim"]
                )

    scored = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def _pairwise_cosine_udf():
    """Arrow pandas_udf: rowwise cosine of two array columns — one
    einsum per batch instead of an interpreted HOF expression per row.
    Zero-norm / NULL inputs yield NaN; callers MUST wrap with
    ``F.nanvl(col, F.lit(None))`` before comparisons, because Spark
    orders NaN above every double (a bare ``NaN >= threshold`` is TRUE),
    while the HOF ``cosine()`` yields NULL for those rows."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(DoubleType())
    def cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        if not len(va):
            return pd.Series([], dtype=np.float64)
        # the nan filler's dim must come from EITHER column: an Arrow
        # batch can arrive with one side all-NULL (batch boundaries are
        # partitioning-dependent, which made this an ordering flake),
        # and a wrong-shaped filler breaks np.stack against the other
        # side's real vectors
        dims = [len(v) for v in va if v is not None] + [
            len(v) for v in vb if v is not None
        ]
        dim = dims[0] if dims else 1
        nanrow = np.full(dim, np.nan)
        A = np.stack([nanrow if v is None else np.asarray(v, dtype=np.float64) for v in va])
        B = np.stack([nanrow if v is None else np.asarray(v, dtype=np.float64) for v in vb])
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        den[den == 0] = np.nan
        return pd.Series(num / den)

    return cos


def signlsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: sign of the dot product against each fixed
    hyperplane becomes one bit.  ``planes`` are literal (seeded, driver-
    generated) so the expression folds to pure column math.

    Expression form — one interpreted HOF ``dot`` per plane.  The
    production paths use ``_signlsh_assigner`` (below), which computes
    all planes of all tables in one Arrow matmul per batch."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def _signlsh_assigner(tables: list[list[list[float]]]):
    """Arrow pandas_udf: ALL L table bucket ids per vector in one numpy
    matmul — the planes of every table stack into one (Σ bits, dim)
    matrix, so a batch of n vectors costs one (n × dim) @ (dim × Σbits)
    product instead of n·Σbits interpreted HOF dot products (~30× fewer
    JVM expression evaluations for the 4×8 default).  Bit k of table t is
    ``sign(dot(v, P[t][k])) >= 0``, identical to ``signlsh_bucket`` up to
    float summation order (a sign can differ only when |dot| is at
    rounding noise — harmless: buckets are candidate filters and every
    candidate is verified with the exact cosine).

    NULL vectors map to the zero vector (all-zero dots → the all-ones
    bucket), matching the graceful degradation of the expression form:
    the candidate pair is later rejected by the exact cosine verify
    (zero-norm → sim 0), never a pipeline crash."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    P = np.asarray([p for tbl in tables for p in tbl], dtype=np.float64)
    sizes = [len(tbl) for tbl in tables]
    offs = np.concatenate([[0], np.cumsum(sizes)])
    L = len(tables)
    dim = P.shape[1]

    @pandas_udf(ArrayType(LongType()))
    def buckets(vec_col: pd.Series) -> pd.Series:
        import numpy as np

        if len(vec_col) == 0:
            return pd.Series([], dtype=object)
        zero = np.zeros(dim, dtype=np.float64)
        X = np.stack(
            [
                zero if v is None else np.asarray(v, dtype=np.float64)
                for v in vec_col
            ]
        )
        S = (X @ P.T) >= 0.0
        out = np.zeros((len(X), L), dtype=np.int64)
        for t in range(L):
            bits = S[:, offs[t] : offs[t + 1]].astype(np.int64)
            w = np.left_shift(1, np.arange(sizes[t], dtype=np.int64))
            out[:, t] = bits @ w
        return pd.Series(list(out))

    return buckets


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]] | list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH: candidates are corpus
    vectors sharing a bucket with the query in ANY of the L independent
    hash tables (union), then scored exactly and ranked.

    ``planes`` is either one table (list of hyperplanes) or a list of
    tables.  Recall ≈ 1-(1-p^b)^L for per-plane agreement p, bucket bits
    b, tables L — tune tables up for recall, planes up for smaller
    buckets.  The join key is (table, bucket) → hash-partitioned and
    bounded per bucket; candidate pairs are deduped before the (exact)
    scoring, so each survivor is scored once.
    """
    tables: list[list[list[float]]] = (
        [planes] if planes and isinstance(planes[0][0], (int, float)) else planes  # type: ignore[index]
    )
    assigner = _signlsh_assigner(tables)
    cb = corpus.select(
        F.col(id_col), F.col(vec_col),
        F.posexplode(assigner(F.col(vec_col))).alias("t", "b"),
    )
    qb = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("__qv"),
        F.posexplode(assigner(F.col(vec_col))).alias("t", "b"),
    )
    cand = (
        cb.join(F.broadcast(qb), ["t", "b"])
        .where(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, F.col(id_col).alias("neighbor_id"), "__qv", vec_col)
        .dropDuplicates([query_id_col, "neighbor_id"])
    )
    scored = cand.select(
        query_id_col,
        "neighbor_id",
        cosine(F.col("__qv"), F.col(vec_col)).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def cosine_dup_pairs(
    df: DataFrame,
    planes: list[list[float]] | list[list[list[float]]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
    storage: str = "memory",
) -> DataFrame:
    """Embedding near-duplicate candidate pairs: vectors sharing a
    sign-LSH bucket in ANY of the L tables are candidates (bucket-keyed
    self-join — never all-pairs), then every candidate is verified with
    the exact cosine.  Returns (id_a, id_b, cos_sim) with id_a < id_b and
    cos_sim ≥ threshold.

    Recall: two vectors at angle θ agree on one hyperplane with
    p = 1 - θ/π; for cosine ≥ 0.95 (θ ≤ 18°), p ≥ 0.9 — with 8-bit
    buckets and 4 tables the miss probability is (1-p⁸)⁴ ≈ 3e-3, and
    near-identical vectors (the dedup target, cos ≥ 0.99) are ≈ 1e-5.
    Verification makes precision exact regardless.

    ``max_bucket_size`` drops (table, bucket) groups above the cap before
    the pair join — the same degenerate-bucket hardening as
    ``dedup.minhash_lsh_candidates`` — with a logged count, never silent.
    NB: *identical* vectors land in the same bucket in EVERY table, so a
    cap cannot save a replica-heavy corpus; ``near_dedup_cosine`` removes
    that case structurally by pairing distinct vectors only.

    The banded (id, v, t, b) frame comes from ONE Arrow matmul over all
    tables' planes (``_signlsh_assigner``) and sits behind a ``storage``
    lineage barrier (default ``persist(MEMORY_AND_DISK)``, see
    ``dedup._barrier``): it feeds both sides of the self-join, which
    without the barrier would re-run the bucketing — and with the
    interpreted per-plane expression form this stage dominated the whole
    pipeline (q54 was 4.5 s at sf0.1, ~all of it fixed bucketing
    overhead)."""
    from .dedup import _barrier

    tables: list[list[list[float]]] = (
        [planes] if planes and isinstance(planes[0][0], (int, float)) else planes  # type: ignore[index]
    )
    banded = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        F.posexplode(_signlsh_assigner(tables)(F.col(vec_col))).alias("t", "b"),
    )
    banded = _barrier(banded, storage)
    if max_bucket_size is not None:
        # bucket sizing via groupBy + anti join, never a window over the
        # bucket key (the ``dedup.minhash_lsh_candidates`` shape): the
        # oversized bucket is BY DEFINITION the hot key, and a
        # count-over-window would shuffle the banded frame — WIDE vector
        # rows included — by (t, b), funneling every row of the
        # degenerate bucket into one unsplittable partition.  Partial
        # aggregation absorbs the count; the few oversized keys feed an
        # AQE-broadcastable anti join against the barriered frame.
        big = (
            banded.groupBy("t", "b")
            .agg(F.count(F.lit(1)).alias("__bsz"))
            .where(F.col("__bsz") > max_bucket_size)
        )
        dropped = big.agg(
            F.count(F.lit(1)).alias("buckets"), F.sum("__bsz").alias("rows")
        ).first()
        if dropped["buckets"]:
            import logging

            logging.getLogger(__name__).warning(
                "cosine_dup_pairs: dropping %d oversized LSH bucket(s) "
                "(%d banded rows) above max_bucket_size=%d",
                dropped["buckets"], dropped["rows"], max_bucket_size,
            )
            banded = banded.join(big.select("t", "b"), ["t", "b"], "left_anti")
    a, b = banded.alias("a"), banded.alias("b")
    cand = a.join(
        b,
        (F.col("a.t") == F.col("b.t"))
        & (F.col("a.b") == F.col("b.b"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
        F.col("a.v").alias("va"), F.col("b.v").alias("vb"),
    )
    # Score FIRST (Arrow einsum kernel — the interpreted HOF cosine was
    # the 500k-corpus hotspot), dedup AFTER the threshold: a pair seen
    # in several tables scores identically (deterministic kernel on
    # identical inputs), so dropDuplicates on the narrow surviving
    # (id_a, id_b, cos_sim) rows replaces the old pre-score dedup that
    # shuffled every candidate pair WITH both vectors (~1 KB/row —
    # ~11 GB at 500k docs vs ~tens of MB of survivors).  NaN (zero-norm)
    # must become NULL before the comparison: Spark orders NaN above
    # every double, so a bare `NaN >= threshold` would be TRUE.
    cos_k = _pairwise_cosine_udf()
    scored = cand.select(
        "id_a", "id_b",
        F.nanvl(cos_k(F.col("va"), F.col("vb")), F.lit(None)).alias("cos_sim"),
    )
    return scored.where(F.col("cos_sim") >= threshold).dropDuplicates(
        ["id_a", "id_b"]
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + probed-cluster search
# --------------------------------------------------------------------------

def _np_assigner(centroids, nprobe: int = 1):
    """Arrow pandas_udf: nearest-``nprobe`` centroid ids for each vector
    (one numpy matmul per batch; centroids broadcast via closure).
    Vectors are L2-normalized before scoring (spherical k-means ⇒ max dot
    == min angle == max cosine)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    C = np.asarray(centroids, dtype=np.float64)
    dim = C.shape[1]

    @pandas_udf(ArrayType(IntegerType()))
    def assign(vec_col: pd.Series) -> pd.Series:
        if len(vec_col) == 0:
            return pd.Series([], dtype=object)
        # NULL vectors → zero vector → cluster 0 via the zero-norm path
        # (same graceful degradation as _signlsh_assigner: their cosine
        # against anything is NULL downstream, so they never rank)
        zero = np.zeros(dim, dtype=np.float64)
        X = np.stack(
            [
                zero if v is None else np.asarray(v, dtype=np.float64)
                for v in vec_col
            ]
        )
        norms = np.linalg.norm(X, axis=1)
        norms[norms == 0] = 1.0
        sims = (X / norms[:, None]) @ C.T
        if nprobe == 1:
            top = np.argmax(sims, axis=1)[:, None]
        else:
            n = min(nprobe, C.shape[0])
            top = np.argpartition(-sims, n - 1, axis=1)[:, :n]
        return pd.Series([row.astype("int32") for row in top])

    return assign


def ivf_centroids(
    corpus: DataFrame,
    n_clusters: int = 16,
    max_iter: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_salt: str = "ivf",
    fold_partials: bool | None = None,
) -> list[list[float]]:
    """Spherical-k-means coarse quantizer, Spark-first:

    - init: the ``n_clusters`` vectors with the smallest md5(salt|id) — a
      deterministic, partitioning-independent pseudo-random pick (same
      gate as ``sampling.deterministic_sample``).
    - per Lloyd round: ONE fused ``mapInPandas`` pass that assigns each
      Arrow batch to its nearest centroid AND accumulates the per-cluster
      sums of the normalized vectors in the same numpy kernel, emitting
      ≤ k partial-sum rows per PARTITION (the map-side combine, done in
      the kernel).  When the direct collect would be
      material (``fold_partials``; None = auto — on past 256 partitions
      or ~64 MB of estimated partitions×k×dim driver traffic) a
      ``groupBy(c)`` pid-ordered fold
      pre-reduces executor-side (the ``pca.py`` discipline) so the
      DRIVER receives ≤ k rows of (dim+2) doubles regardless of task
      count — at k=1024/dim=768 a 10⁶-task corpus ships ~6 MB to the
      driver, not ~6 TB.  On narrow scans the fold's extra shuffle +
      Python stage per round is pure overhead (measured +0.4 s on the
      sf0.1 q55 bench entry), so the driver folds the ≤ 64·k rows
      itself — BOTH paths add each cluster's partition rows in pid
      order, so they are bit-equal (pinned in tests) and a retry of the
      same partitioning reproduces the centroids exactly.
      (The previous formulation aggregated ``dim`` separate JVM
      ``sum(vec[i]/norm)`` columns, which forced Catalyst to compile a
      dim-wide aggregate plan per round — pure codegen overhead at small
      dim·k, and the kernel fusion is strictly less shuffled data.)
    - empty clusters keep their previous centroid; early-stops when
      centroids converge.

    At 100 TB the per-round cost is one scan + one k-row collect (the
    k·n_partitions partial rows fold on the executors), and ``max_iter``
    bounds the rounds; train on a deterministic sample
    (``sampling.deterministic_sample``) when even that is too much.
    """
    import numpy as np

    init_rows = (
        corpus.select(id_col, vec_col)
        .withColumn(
            "__g",
            F.md5(F.concat_ws("|", F.lit(init_salt), F.col(id_col).cast("string"))),
        )
        .orderBy("__g")
        .limit(n_clusters)
        .collect()
    )
    if not init_rows:
        raise ValueError("empty corpus")
    C = np.stack([np.asarray(r[1], dtype=np.float64) for r in init_rows])
    norms = np.linalg.norm(C, axis=1)
    norms[norms == 0] = 1.0
    C = C / norms[:, None]
    dim = C.shape[1]

    from pyspark.sql.types import ArrayType, IntegerType, LongType

    part_schema = StructType(
        [
            StructField("pid", IntegerType()),
            StructField("c", IntegerType()),
            StructField("cnt", LongType()),
            StructField("s", ArrayType(DoubleType())),
        ]
    )
    fold_schema = StructType(
        [
            StructField("c", IntegerType()),
            StructField("cnt", LongType()),
            StructField("s", ArrayType(DoubleType())),
        ]
    )
    vecs_only = corpus.select(vec_col)
    if fold_partials is None:
        # auto: fold when the DIRECT collect's worst-case driver traffic
        # (partitions × k rows of dim+2 doubles) would be material — the
        # decision is driver-bytes-based, not partition-count-based, so
        # a narrow-but-huge (k=1024, dim=768) training job folds even at
        # 32 partitions while the bench-scale (k=8, dim=64) job never
        # pays the fold's extra shuffle+Python stage per round
        n_parts = vecs_only.rdd.getNumPartitions()
        est_bytes = n_parts * n_clusters * (dim + 2) * 8
        fold_partials = n_parts > 256 or est_bytes > (64 << 20)

    def fold_cluster(key, pdf):
        # executor-side pre-reduce (the pca.py pid-bucket discipline):
        # fold each cluster's per-partition rows in pid order, so the
        # driver receives ≤ k rows total regardless of task count AND
        # the float summation order matches the driver fold (partition
        # order) bit-for-bit
        pdf = pdf.sort_values("pid", kind="mergesort")
        s = np.zeros(dim, dtype=np.float64)
        for sv in pdf["s"]:
            s += np.asarray(sv, dtype=np.float64)
        return pd.DataFrame(
            {"c": [int(key[0])], "cnt": [int(pdf["cnt"].sum())], "s": [s]}
        )

    for _ in range(max_iter):
        C_round = C.copy()

        def partial_sums(batches):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            k = C_round.shape[0]
            zero = np.zeros(dim, dtype=np.float64)
            sums = np.zeros((k, dim), dtype=np.float64)
            cnt = np.zeros(k, dtype=np.int64)
            any_rows = False
            for pdf in batches:
                if not len(pdf):
                    continue
                any_rows = True
                X = np.stack(
                    [
                        zero if v is None else np.asarray(v, dtype=np.float64)
                        for v in pdf[vec_col]
                    ]
                )
                n = np.linalg.norm(X, axis=1)
                n[n == 0] = 1.0
                Xn = X / n[:, None]
                a = np.argmax(Xn @ C_round.T, axis=1)
                # NULL vectors count toward their cluster but add a zero
                # sum — identical to the old JVM sum's NULL-skip
                isnull = np.fromiter(
                    (v is None for v in pdf[vec_col]), bool, len(pdf)
                )
                np.add.at(sums, a[~isnull], Xn[~isnull])
                cnt += np.bincount(a, minlength=k)
            if any_rows:
                # ONE row per live cluster per partition: (pid, c) is
                # unique, so the grouped fold's pid sort totally orders
                # every cluster's contributions
                live = cnt > 0
                yield pd.DataFrame(
                    {
                        "pid": np.full(int(live.sum()), pid, dtype="int32"),
                        "c": np.nonzero(live)[0].astype("int32"),
                        "cnt": cnt[live],
                        "s": list(sums[live]),
                    }
                )

        partials_df = vecs_only.mapInPandas(partial_sums, part_schema)
        if fold_partials:
            parts = (
                partials_df.groupBy("c")
                .applyInPandas(fold_cluster, fold_schema)
                .collect()
            )
        else:
            # narrow scan: ≤ 64·k tiny rows — fold on the driver in the
            # same (pid within cluster) order the grouped fold uses, so
            # the two paths are bit-equal
            parts = sorted(
                partials_df.collect(), key=lambda r: (r["c"], r["pid"])
            )
        newC = C.copy()
        total = np.zeros((C.shape[0], dim), dtype=np.float64)
        seen = np.zeros(C.shape[0], dtype=bool)
        for r in parts:
            total[r["c"]] += np.asarray(r["s"], dtype=np.float64)
            seen[r["c"]] = True
        for c in np.nonzero(seen)[0]:
            nrm = np.linalg.norm(total[c])
            if nrm > 0:
                newC[c] = total[c] / nrm
        if np.allclose(newC, C, atol=1e-12):
            C = newC
            break
        C = newC
    return C.tolist()


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: corpus rows are assigned to their nearest
    centroid (the inverted file — at scale, write the corpus partitioned
    by ``__c`` once and reuse it); each query probes its ``nprobe``
    nearest clusters and scores only those rows exactly.

    Join key is the cluster id → hash-partitioned, candidates bounded by
    the probed clusters' sizes (≈ nprobe/n_clusters of the corpus per
    query).  Each corpus row has exactly one cluster and probe lists are
    distinct, so a (query, neighbor) pair can't duplicate — no dedup
    stage needed (unlike multi-table LSH)."""
    cb = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        _np_assigner(centroids, nprobe=1)(F.col(vec_col))[0].alias("__c"),
    )
    qb = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("__qv"),
        F.explode(_np_assigner(centroids, nprobe=nprobe)(F.col(vec_col))).alias("__c"),
    )
    scored = (
        cb.join(F.broadcast(qb), "__c")
        .where(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            F.col(id_col).alias("neighbor_id"),
            cosine(F.col("__qv"), F.col(vec_col)).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def build_inverted_file(
    corpus: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "ivf_cluster",
    mode: str = "overwrite",
) -> None:
    """Materialize the IVF inverted file: ONE assignment pass writes the
    corpus hive-partitioned by nearest-centroid id.

    This is the 100 TB layout ``knn_ivf``'s docstring promises: pay the
    assignment scan once at ingest, and every subsequent search reads
    only the probed clusters' directories (partition pruning) instead of
    scanning the flat corpus per query batch.  Pair with
    ``knn_ivf_materialized`` — its plan shows ``PartitionFilters`` on
    ``cluster_col`` (asserted in ``test_similarity.py``)."""
    assigned = corpus.select(
        "*",
        _np_assigner(centroids, nprobe=1)(F.col(vec_col))[0].alias(cluster_col),
    )
    (
        assigned.write.mode(mode)
        .partitionBy(cluster_col)
        .option("compression", "snappy")
        .parquet(path)
    )


def knn_ivf_materialized(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    cluster_col: str = "ivf_cluster",
) -> DataFrame:
    """IVF top-k over a ``build_inverted_file`` table, partition-pruned:
    probe sets are computed driver-side from the (broadcast-small by
    contract, same as the Arrow forms) query set, and the UNION of
    probed cluster ids is pushed as a partition filter — the scan lists
    and reads only ~nprobe/n_clusters of the table's directories, which
    no flat-corpus form can do.

    Candidates and tie-break (cos desc, id asc) match ``knn_ivf``
    exactly: the driver-side probe math is the same float64 normalize +
    matmul + ``argpartition`` the Arrow assigner runs, so the probe
    sets are bit-identical; per-query masking uses the row's STORED
    cluster (the materialized assignment is authoritative — no
    re-assignment pass).

    Scoring is the ``knn_bruteforce_arrow`` matmul kernel over the
    pruned scan (r12): the first form HOF-scored every (query ×
    pruned-candidate) pair with the interpreted ``cosine()`` expression
    — the exact per-row-cosine trap hybrid_topk's first cut measured
    5-7× slow (SCALING r11) — and it surfaced again as
    ``hybrid_topk_indexed`` losing to the scan form (2.55 vs 1.83 s at
    sf0.1).  The kernel also restores the scan kernels' numpy
    self-match semantics (``cids != qid`` never matches across id type
    domains — the ADVICE r11 string-qid case — and never NULLs out).
    Arrow-form NULL convention applies: NULL/zero-norm corpus rows and
    NULL query vectors produce NO rows (the ``knn_bruteforce_arrow``
    divergence note), where the old expression form emitted
    NULL-``cos_sim`` filler rows."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    n = min(nprobe, C.shape[0])

    q_rows = queries.select(id_col, vec_col).collect()
    cb_all = spark.read.parquet(path)
    out_schema = StructType(
        [
            StructField(query_id_col, queries.schema[id_col].dataType),
            StructField("neighbor_id", cb_all.schema[id_col].dataType),
            StructField("cos_sim", DoubleType()),
        ]
    )
    q_ids, Qn = _query_matrix(q_rows, np.float64)
    if q_ids is None:
        return spark.createDataFrame([], out_schema)
    # probe math unchanged from the expression form (bit-identical sets)
    probes = []
    for r in q_rows:
        v = r[1]
        x = (
            np.zeros(C.shape[1], dtype=np.float64)
            if v is None
            else np.asarray(v, dtype=np.float64)
        )
        nrm = np.linalg.norm(x)
        sims = (x / (nrm if nrm else 1.0)) @ C.T
        top = np.argpartition(-sims, n - 1)[:n] if n > 1 else [int(np.argmax(sims))]
        probes.append([int(c) for c in top])
    allow = np.zeros((len(q_ids), C.shape[0]), dtype=bool)
    for j, ps in enumerate(probes):
        allow[j, ps] = True
    probed = sorted({c for ps in probes for c in ps})

    cb = cb_all.where(F.col(cluster_col).isin(probed))
    dim = Qn.shape[1]
    bq = spark.sparkContext.broadcast((q_ids, Qn, allow))

    def score(batches):
        import numpy as np

        ids_b, Qn_b, allow_b = bq.value
        nq = len(ids_b)
        zero = np.zeros(dim, dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            cids = pdf[id_col].to_numpy()
            clusters = pdf[cluster_col].to_numpy(dtype=np.int64)
            X = np.stack(
                [
                    zero if v is None else np.asarray(v, dtype=np.float64)
                    for v in pdf[vec_col]
                ]
            )
            nrm = np.linalg.norm(X, axis=1)
            nrm[nrm == 0] = np.nan
            Xn = X / nrm[:, None]
            sims = Xn @ Qn_b.T  # (batch, nq)
            sims[~allow_b[:, clusters].T] = np.nan  # outside probe set
            rows = []
            kk = min(k, len(cids))
            for j in range(nq):
                col = sims[:, j]
                mask = cids != ids_b[j]
                cand = np.where(mask & ~np.isnan(col))[0]
                if len(cand) == 0:
                    continue
                # tie-safe pre-truncation: same (sim desc, id asc) total
                # order as the final window (the r7 heavy-ties fix)
                top = cand[np.lexsort((cids[cand], -col[cand]))[:kk]]
                for i in top:
                    rows.append((ids_b[j], cids[i], float(col[i])))
            if rows:
                yield pd.DataFrame(
                    rows, columns=[query_id_col, "neighbor_id", "cos_sim"]
                )

    scored = cb.select(id_col, vec_col, cluster_col).mapInPandas(
        score, out_schema
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def _collapse_identical(
    df: DataFrame, id_col: str, vec_col: str, storage: str
) -> tuple[DataFrame, DataFrame]:
    """Collapse exactly-identical vectors to one min-id representative
    before any pairwise stage (the replica-corpus hardening shared by
    ``near_dedup_cosine`` and ``semdedup.semantic_dedup``).

    Returns ``(reps, member_rep)``: ``reps`` holds one (id_col, vec_col)
    row per distinct non-zero vector (plus every zero-norm/NULL vector,
    each its own representative — their cosine is NULL downstream, so
    they can never be dups), and ``member_rep`` maps every input id
    (``__m_id``) to its representative id (``__rep``).

    Representative selection is a ``groupBy(vector-key)`` aggregate —
    NOT a group-min window: a replica-heavy corpus (the case this
    collapse exists for) would land every copy of one vector in a
    single unsplittable window partition, with the WIDE vector rows in
    tow.  The member→rep mapping joins only narrow (id, key) rows back
    on the key (AQE-splittable), and the representative rows come from
    a skew-free semi join on the uniform id key (the
    ``dedup.exact_dedup`` shape)."""
    from .dedup import _barrier

    nrm = l2_norm(F.col("__m_v"))
    tagged = _barrier(
        df.select(
            F.col(id_col).alias("__m_id"), F.col(vec_col).alias("__m_v")
        ).withColumn(
            "__vk",
            F.when(
                nrm > 0, F.md5(F.to_json(F.struct(F.col("__m_v"))))
            ).otherwise(F.concat(F.lit("zero:"), F.col("__m_id").cast("string"))),
        ),
        storage,
    )
    reps_tbl = tagged.groupBy("__vk").agg(F.min("__m_id").alias("__rep"))
    member_rep = _barrier(
        tagged.select("__m_id", "__vk").join(reps_tbl, "__vk").select(
            "__m_id", "__rep"
        ),
        storage,
    )
    reps = tagged.join(
        reps_tbl.select(F.col("__rep").alias("__m_id")), "__m_id", "left_semi"
    ).select(F.col("__m_id").alias(id_col), F.col("__m_v").alias(vec_col))
    return reps, member_rep


def _expand_losers(member_rep: DataFrame, losing_reps: DataFrame, id_col: str) -> DataFrame:
    """Losers of a representative-level dedup, expanded to member ids:
    every non-representative member, plus all members (including the
    representative itself) of a group whose representative lost.
    ``losing_reps`` must have a single ``__lost`` column."""
    lost_members = member_rep.join(
        losing_reps, member_rep["__rep"] == losing_reps["__lost"], "left_semi"
    ).select(F.col("__m_id").alias(id_col))
    non_reps = member_rep.where(F.col("__m_id") != F.col("__rep")).select(
        F.col("__m_id").alias(id_col)
    )
    return lost_members.unionByName(non_reps).distinct()


def near_dedup_cosine(
    df: DataFrame,
    planes: list[list[float]] | list[list[list[float]]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
    storage: str = "memory",
) -> DataFrame:
    """Embedding-cosine near-dedup (north-star): sign-LSH candidates →
    exact cosine verify → greedy keep-lowest-id, mirroring
    ``dedup.near_dedup_minhash`` on the embedding axis.

    Identical vectors are collapsed to one representative (min id per
    content hash — ONE linear shuffle) before the LSH pair join, then
    non-representative members and every member of a losing
    representative's group are dropped.  This is semantics-preserving
    (identical non-zero vectors have cosine 1.0 ≥ any threshold, and a
    near-dup of a representative is a near-dup of its whole group) and it
    removes the replica-corpus blowup a bucket cap can't: 10 exact copies
    of every vector made the uncapped pair join OOM at 50k vectors, while
    the grouped path's pair stage only ever sees distinct vectors.
    Zero-norm vectors are exempt (their cosine is NULL ⇒ never a dup).

    Representative selection and loser expansion are the shared
    ``_collapse_identical`` / ``_expand_losers`` helpers (skew-free
    groupBy + semi-join shapes — see their docstrings); ``storage``
    barriers the keyed frame and the mapping between their multiple
    consumers."""
    reps, member_rep = _collapse_identical(df, id_col, vec_col, storage)
    losing_reps = (
        cosine_dup_pairs(
            reps, planes, threshold, id_col, vec_col, max_bucket_size, storage
        )
        .select(F.col("id_b").alias("__lost"))
        .distinct()
    )
    losers = _expand_losers(member_rep, losing_reps, id_col)
    return df.join(losers, id_col, "left_anti")


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    code_col: str = "embedding_q8",
    scale_col: str = "q8_scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: codes = round(x/scale·127)
    with scale = max|x| — 4× smaller at rest than float32 (8× vs the
    float64 arrays Spark holds), the standard storage form for
    billion-vector corpora.  Pure JVM higher-order expressions, no
    Python; zero vectors get scale 0 and all-zero codes.  Cosine is
    exactly invariant to the per-vector scale, so quantization error
    comes only from the 8-bit rounding (~0.3% on random vectors —
    asserted in tests)."""
    x = F.col(vec_col)
    scale = F.array_max(F.transform(x, lambda v: F.abs(v))).cast("double")
    codes = F.when(
        scale > 0,
        F.transform(
            x,
            lambda v: F.round(v.cast("double") / scale * 127.0).cast("tinyint"),
        ),
    ).otherwise(F.transform(x, lambda v: F.lit(0).cast("tinyint")))
    return df.withColumn(scale_col, scale).withColumn(code_col, codes)


def dequantize_embeddings(
    df: DataFrame,
    code_col: str = "embedding_q8",
    scale_col: str = "q8_scale",
    vec_col: str = "embedding",
) -> DataFrame:
    """Inverse of ``quantize_embeddings``: x ≈ codes/127·scale."""
    return df.withColumn(
        vec_col,
        F.transform(
            F.col(code_col),
            lambda c: c.cast("double") / 127.0 * F.col(scale_col),
        ),
    )


def ivf_balance_report(
    spark,
    path: str,
    cluster_col: str = "ivf_cluster",
) -> DataFrame:
    """(cluster, n_vectors) for a materialized inverted file — the
    serving-ops capacity gauge.  IVF search cost is proportional to the
    PROBED clusters' sizes, so a skewed file (one hot cluster holding
    most vectors) silently degrades every query that probes it; the
    published remedy is re-training the coarse quantizer when
    max/mean cluster size drifts (≈ >8-10× is the usual re-cluster
    trigger).

    Cost: effectively metadata-only — ``cluster_col`` is a HIVE
    PARTITION column, so the pruned scan reads directory names and
    parquet footers (row counts), never vector data pages.  Feeds
    ``sinks.write_html_report``; compute the trigger ratio with one
    driver-side agg over the (n_clusters)-row result."""
    return (
        spark.read.parquet(path)
        .groupBy(F.col(cluster_col).alias("cluster"))
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .orderBy(F.col("n_vectors").desc(), F.col("cluster").asc())
    )


def embedding_health_report(
    df: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Vector-table triage in ONE aggregate scan — the data-quality
    check that runs before building any index: tidy ``(key, value)``
    rows for

    - ``n_rows`` / ``n_null`` / ``n_zero_norm`` / ``n_nan`` (vectors
      containing any NaN — these poison matmuls silently),
    - ``n_dim_mismatch`` (length differs from the majority dimension
      ``dim_mode`` — ragged tables break every kernel),
    - ``norm_p01/p50/p99`` (a collapsed-norm distribution is the
      classic symptom of an upstream encoder bug).

    Pure JVM expressions (higher-order aggregate for the norm, exists
    for NaN); the dim mode comes from a tiny length-histogram
    aggregate, not a scan of vector data twice — two jobs total, both
    column-pruned to ``vec_col``."""
    x = F.col(vec_col)
    dim_mode_row = (
        df.where(x.isNotNull())
        .groupBy(F.size(x).alias("__d"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("__d").asc())
        .limit(1)
        .collect()
    )
    dim_mode = int(dim_mode_row[0]["__d"]) if dim_mode_row else 0
    sq = F.aggregate(
        x, F.lit(0.0), lambda a, v: a + v.cast("double") * v.cast("double")
    )
    nrm = F.when(x.isNotNull(), F.sqrt(sq))
    has_nan = F.exists(x, lambda v: F.isnan(v.cast("double")))
    agg = df.agg(
        F.count(F.lit(1)).cast("double").alias("n_rows"),
        F.sum(x.isNull().cast("long")).cast("double").alias("n_null"),
        F.sum(
            (x.isNotNull() & ~has_nan & (sq == 0)).cast("long")
        ).cast("double").alias("n_zero_norm"),
        F.sum((x.isNotNull() & has_nan).cast("long")).cast("double").alias(
            "n_nan"
        ),
        F.sum(
            (x.isNotNull() & (F.size(x) != F.lit(dim_mode))).cast("long")
        ).cast("double").alias("n_dim_mismatch"),
        F.percentile_approx(
            F.when(~F.coalesce(has_nan, F.lit(False)), nrm),
            F.array(F.lit(0.01), F.lit(0.5), F.lit(0.99)),
        ).alias("_q"),
    ).first()
    spark = df.sparkSession
    q = agg["_q"] or [None, None, None]
    rows = [
        ("n_rows", agg["n_rows"]),
        ("n_null", agg["n_null"]),
        ("n_zero_norm", agg["n_zero_norm"]),
        ("n_nan", agg["n_nan"]),
        ("n_dim_mismatch", agg["n_dim_mismatch"]),
        ("dim_mode", float(dim_mode)),
        ("norm_p01", q[0]),
        ("norm_p50", q[1]),
        ("norm_p99", q[2]),
    ]
    return spark.createDataFrame(rows, "key string, value double")
