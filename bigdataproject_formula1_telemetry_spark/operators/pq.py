"""Product quantization (PQ) for embedding columns: 16-64× vector
compression with lookup-table (ADC) approximate search.

Public method: Jégou, Douze, Schmid — "Product Quantization for Nearest
Neighbor Search", TPAMI 2011.  The embedding space is split into ``m``
contiguous subspaces; each subspace gets its own 256-entry k-means
codebook; a vector is stored as ``m`` one-byte codes.  Search uses
asymmetric distance computation (ADC): per query, one ``m × 256`` table
of exact subspace distances, then every corpus vector's approximate
distance is just ``m`` table lookups + adds — no floats touched.

This is the storage/serving tier BELOW ``similarity.quantize_embeddings``
(int8: 4-8×, near-exact) — PQ trades more recall for 16-64×, the
standard billion-vector regime.  Composes with the IVF router
(``similarity.ivf_centroids``): route with IVF, score with ADC.

Spark-first shapes (the ``ivf_centroids`` idioms):

- **Training** is distributed Lloyd, ALL subspaces fused into ONE
  ``mapInPandas`` kernel per round: each Arrow batch assigns every
  subvector to its nearest code and emits per-(subspace, code) partial
  sums — ≤ m·256 tiny rows per partition reach the driver, never
  vectors.  Init is the deterministic smallest-md5 pick.
- **Encoding** is one narrow Arrow pass (no shuffle).
- **ADC search** broadcasts the query LUTs in the kernel closure and
  emits only per-batch top-k candidates; a final per-query top-k
  reduces them.  The corpus side is a column-pruned scan of m-byte
  codes — at 100 TB the scan reads 1/16th-1/64th of the float bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    ShortType,
    StructField,
    StructType,
)

__all__ = [
    "pq_train",
    "pq_encode",
    "pq_reconstruct",
    "knn_pq_adc",
    "build_inverted_file_pq",
    "knn_ivfpq_materialized",
    "rotate_embeddings",
    "opq_train",
    "opq_encode",
]


def _split(dim: int, m: int) -> list[tuple[int, int]]:
    """[start, end) bounds of the m near-equal subspaces."""
    if m <= 0 or m > dim:
        raise ValueError(f"m must be in [1, dim], got m={m} dim={dim}")
    widths = [dim // m + (1 if i < dim % m else 0) for i in range(m)]
    offs = [sum(widths[:i]) for i in range(m)]
    return [(offs[i], offs[i] + widths[i]) for i in range(m)]


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 256,
    max_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_salt: str = "pq",
    fold_partials: bool | None = None,
) -> list[list[list[float]]]:
    """Train the m sub-quantizer codebooks (plain L2 k-means per
    subspace, all subspaces in one fused kernel pass per Lloyd round).
    Returns ``m`` codebooks of ``<= n_codes`` centroids each (fewer when
    the init sample is smaller than ``n_codes``).  Train on a
    deterministic sample at corpus scale (``sampling.deterministic_sample``)
    — the same recipe the IVF quantizer practices.

    ``fold_partials`` (None = auto — on past 256 partitions or ~64 MB
    of estimated direct driver traffic): pre-reduce
    the per-partition (subspace, code) gradient rows executor-side with
    a ``groupBy(m, c)`` pid-ordered fold, bounding driver traffic at
    m·n_codes rows for any task count; on narrow scans the driver folds
    the rows itself in the identical (pid within key) order — the two
    paths are bit-equal (pinned in tests)."""
    init_rows = (
        corpus.select(id_col, vec_col)
        .where(F.col(vec_col).isNotNull())
        .withColumn(
            "__g",
            F.md5(F.concat_ws("|", F.lit(init_salt), F.col(id_col).cast("string"))),
        )
        .orderBy("__g")
        .limit(n_codes)
        .collect()
    )
    if not init_rows:
        raise ValueError("empty corpus")
    X0 = np.stack([np.asarray(r[1], dtype=np.float64) for r in init_rows])
    dim = X0.shape[1]
    bounds = _split(dim, m)
    # init: the sampled vectors' own subvectors (distinct rows per
    # subspace; duplicates collapse → codebook may hold < n_codes codes)
    books = [np.unique(X0[:, s:e], axis=0) for s, e in bounds]

    part_schema = StructType(
        [
            StructField("pid", IntegerType()),
            StructField("m", IntegerType()),
            StructField("c", IntegerType()),
            StructField("cnt", LongType()),
            StructField("s", ArrayType(DoubleType())),
        ]
    )
    fold_schema = StructType(
        [
            StructField("m", IntegerType()),
            StructField("c", IntegerType()),
            StructField("cnt", LongType()),
            StructField("s", ArrayType(DoubleType())),
        ]
    )
    vecs_only = corpus.select(vec_col).where(F.col(vec_col).isNotNull())
    if fold_partials is None:
        # auto by worst-case DIRECT driver traffic: Σ_m n_codes rows of
        # (subdim+2) doubles per partition = n_codes·(dim+2m)·8 bytes —
        # fold when that times the partition count is material (see
        # ivf_centroids for the rationale)
        n_parts = vecs_only.rdd.getNumPartitions()
        est_bytes = n_parts * n_codes * (dim + 2 * m) * 8
        fold_partials = n_parts > 256 or est_bytes > (64 << 20)

    def fold_code(key, pdf):
        # executor-side pre-reduce: fold each (subspace, code)'s
        # per-partition rows in pid order, so the driver receives at
        # most m·n_codes rows regardless of task count (the pca.py
        # pid-fold discipline), deterministically
        pdf = pdf.sort_values("pid", kind="mergesort")
        s = np.zeros(len(pdf["s"].iloc[0]), dtype=np.float64)
        for sv in pdf["s"]:
            s += np.asarray(sv, dtype=np.float64)
        return pd.DataFrame(
            {
                "m": [int(key[0])],
                "c": [int(key[1])],
                "cnt": [int(pdf["cnt"].sum())],
                "s": [s],
            }
        )

    for _ in range(max_iter):
        books_round = [b.copy() for b in books]

        def partial_sums(batches):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            sums = [np.zeros_like(b) for b in books_round]
            cnts = [
                np.zeros(b.shape[0], dtype=np.int64) for b in books_round
            ]
            any_rows = False
            for pdf in batches:
                if not len(pdf):
                    continue
                any_rows = True
                X = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                for mi, (s0, e0) in enumerate(bounds):
                    Xm = X[:, s0:e0]
                    B = books_round[mi]
                    # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin drops ||x||²
                    d = -2.0 * (Xm @ B.T) + (B * B).sum(axis=1)[None, :]
                    a = np.argmin(d, axis=1)
                    np.add.at(sums[mi], a, Xm)
                    cnts[mi] += np.bincount(a, minlength=B.shape[0])
            if not any_rows:
                return
            # ONE row per live (subspace, code) per partition — the
            # (pid, m, c) key is unique, so the grouped fold's pid sort
            # totally orders every code's contributions
            out_m, out_c, out_cnt, out_s = [], [], [], []
            for mi in range(len(books_round)):
                live = np.nonzero(cnts[mi] > 0)[0]
                out_m.extend([mi] * len(live))
                out_c.extend(live.tolist())
                out_cnt.extend(cnts[mi][live].tolist())
                out_s.extend(list(sums[mi][live]))
            yield pd.DataFrame(
                {
                    "pid": np.full(len(out_m), pid, dtype="int32"),
                    "m": np.asarray(out_m, dtype="int32"),
                    "c": np.asarray(out_c, dtype="int32"),
                    "cnt": np.asarray(out_cnt, dtype="int64"),
                    "s": out_s,
                }
            )

        partials_df = vecs_only.mapInPandas(partial_sums, part_schema)
        if fold_partials:
            parts = (
                partials_df.groupBy("m", "c")
                .applyInPandas(fold_code, fold_schema)
                .collect()
            )
        else:
            # narrow scan: fold on the driver in the same (pid within
            # (m, c)) order the grouped fold uses — bit-equal paths
            parts = sorted(
                partials_df.collect(),
                key=lambda r: (r["m"], r["c"], r["pid"]),
            )
        new_books = [b.copy() for b in books]
        sums = [np.zeros_like(b) for b in books]
        cnts = [np.zeros(b.shape[0], dtype=np.int64) for b in books]
        for r in parts:
            sums[r["m"]][r["c"]] += np.asarray(r["s"], dtype=np.float64)
            cnts[r["m"]][r["c"]] += r["cnt"]
        converged = True
        for mi in range(m):
            live = cnts[mi] > 0
            new_books[mi][live] = sums[mi][live] / cnts[mi][live, None]
            if not np.allclose(new_books[mi], books[mi], atol=1e-12):
                converged = False
        books = new_books
        if converged:
            break
    return [b.tolist() for b in books]


def _assign_codes(X: np.ndarray, books: list[np.ndarray], bounds) -> np.ndarray:
    codes = np.empty((X.shape[0], len(books)), dtype=np.int64)
    for mi, (s0, e0) in enumerate(bounds):
        B = books[mi]
        d = -2.0 * (X[:, s0:e0] @ B.T) + (B * B).sum(axis=1)[None, :]
        codes[:, mi] = np.argmin(d, axis=1)
    return codes


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
) -> DataFrame:
    """(id, pq_codes): one narrow Arrow pass, no shuffle.  NULL vectors
    encode as the zero vector's codes (the suite's standard degradation
    path — they quantize like any far-from-everything point)."""
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    dim = sum(b.shape[1] for b in books)
    bounds = _split(dim, len(books))
    id_field = corpus.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField(code_col, ArrayType(ShortType()), False),
        ]
    )

    def encode(batches):
        zero = np.zeros(dim, dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(
                [
                    zero if v is None else np.asarray(v, dtype=np.float64)
                    for v in pdf[vec_col]
                ]
            )
            codes = _assign_codes(X, books, bounds).astype("int16")
            yield pd.DataFrame({id_col: pdf[id_col], code_col: list(codes)})

    return corpus.select(id_col, vec_col).mapInPandas(encode, out_schema)


def pq_reconstruct(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    code_col: str = "pq_codes",
    vec_col: str = "embedding",
) -> DataFrame:
    """Decode codes back to the centroid-concatenation approximation —
    the reconstruction whose error the tests bound."""
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    id_field = codes.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField(vec_col, ArrayType(DoubleType()), False),
        ]
    )

    def decode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack([np.asarray(c, dtype=np.int64) for c in pdf[code_col]])
            X = np.concatenate(
                [books[mi][C[:, mi]] for mi in range(len(books))], axis=1
            )
            yield pd.DataFrame({id_col: pdf[id_col], vec_col: list(X)})

    return codes.select(id_col, code_col).mapInPandas(decode, out_schema)


def knn_pq_adc(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_codes",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """Top-``k`` by ADC distance: ``(query_id, neighbor_id, adc_dist)``,
    smallest (approximate squared L2) first per query, neighbor id as
    the deterministic tiebreak.  The query set is collected and its
    ``m × 256`` LUTs ride in the kernel closure (broadcast-small by the
    kNN-query contract); the corpus side scans only the m-byte codes.
    Self-matches (same id value) are excluded.  NULL query vectors
    yield no rows (NaN LUT — never ranks)."""
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    dim = sum(b.shape[1] for b in books)
    bounds = _split(dim, len(books))
    q_rows = queries.select(query_id_col, query_vec_col).collect()
    if not q_rows:
        raise ValueError("empty query set")
    q_ids = [r[0] for r in q_rows]
    luts = []
    for r in q_rows:
        if r[1] is None:
            luts.append(np.full((len(books), max(b.shape[0] for b in books)), np.nan))
            continue
        q = np.asarray(r[1], dtype=np.float64)
        if rotation is not None:
            # OPQ: codes live in the rotated space — rotate the query
            # into it before building its LUT (see opq_train)
            q = q @ np.asarray(rotation, dtype=np.float64).T
        lut = np.full((len(books), max(b.shape[0] for b in books)), np.inf)
        for mi, (s0, e0) in enumerate(bounds):
            B = books[mi]
            diff = B - q[s0:e0][None, :]
            lut[mi, : B.shape[0]] = (diff * diff).sum(axis=1)
        luts.append(lut)
    LUT = np.stack(luts)  # (nq, m, maxcodes)

    qid_field = queries.schema[query_id_col]
    nid_field = corpus_codes.schema[id_col]
    out_schema = StructType(
        [
            StructField("query_id", qid_field.dataType, qid_field.nullable),
            StructField("neighbor_id", nid_field.dataType, nid_field.nullable),
            StructField("adc_dist", DoubleType(), True),
        ]
    )
    nq, M = LUT.shape[0], len(books)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack([np.asarray(c, dtype=np.int64) for c in pdf[code_col]])
            acc = np.zeros((nq, C.shape[0]), dtype=np.float64)
            for mi in range(M):
                acc += LUT[:, mi, :][:, C[:, mi]]
            ids = pdf[id_col].to_numpy()
            top = min(k + 1, C.shape[0])  # +1 absorbs a self-match
            frames = []
            for qi in range(nq):
                d = acc[qi]
                finite = np.isfinite(d)
                if not finite.any():
                    continue
                idx = np.nonzero(finite)[0]
                # per-batch pre-truncation MUST use the same total
                # order as the final window — (dist, neighbor_id) —
                # or heavy ADC ties (PQ collapses near-identical
                # vectors to identical codes) let batch ROW order
                # decide which tied candidates survive to the
                # global top-k (r7 bug, caught by the 500k sweep's
                # exact search twin)
                sel = idx[np.lexsort((ids[idx], d[idx]))[:top]]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids[qi],
                            "neighbor_id": ids[sel],
                            "adc_dist": d[sel],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    cand = corpus_codes.select(id_col, code_col).mapInPandas(score, out_schema)
    cand = cand.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def build_inverted_file_pq(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "ivf_cluster",
    code_col: str = "pq_codes",
    mode: str = "overwrite",
    rotation: list[list[float]] | None = None,
) -> None:
    """The billion-vector serving layout: ONE pass assigns each vector
    to its nearest coarse centroid AND encodes its PQ codes, writing
    ``(id, pq_codes)`` hive-partitioned by cluster — NO float vectors in
    the table at all.  A search then reads ~nprobe/n_clusters of the
    directories (partition pruning) and only m bytes per row inside
    them: the two prunings compose (cf. ``similarity.build_inverted_file``,
    which stores floats, and ``pq_encode``, which doesn't route)."""
    from bigdataproject_formula1_telemetry_spark.operators.similarity import (
        _np_assigner,
    )

    if rotation is not None:
        # OPQ: centroids and codebooks live in the rotated space — both
        # trained on the rotated corpus, queries rotated at LUT time
        corpus = rotate_embeddings(
            corpus.select(id_col, vec_col), rotation, vec_col
        )
    assigned = corpus.select(
        id_col,
        vec_col,
        _np_assigner(centroids, nprobe=1)(F.col(vec_col))[0].alias(cluster_col),
    )
    coded = pq_encode(
        assigned.select(id_col, vec_col), codebooks, id_col, vec_col, code_col
    )
    (
        assigned.select(id_col, cluster_col)
        .join(coded, id_col)
        .write.mode(mode)
        .partitionBy(cluster_col)
        .option("compression", "snappy")
        .parquet(path)
    )


def knn_ivfpq_materialized(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    code_col: str = "pq_codes",
    cluster_col: str = "ivf_cluster",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-routed ADC search over a ``build_inverted_file_pq`` table:
    probe sets computed driver-side (same float64 math as the Arrow
    assigner — bit-identical routing to ``knn_ivf_materialized``), the
    probed-cluster UNION pushed as a partition filter, and ONE Arrow
    kernel scoring every candidate row against every query's LUT with a
    per-query cluster mask.  Returns (query_id, neighbor_id, adc_dist),
    ascending per query.  The scanned bytes are ~nprobe/n_clusters of
    the corpus × m bytes/vector — both prunings at once."""
    C = np.asarray(centroids, dtype=np.float64)
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    dim = sum(b.shape[1] for b in books)
    bounds = _split(dim, len(books))
    n = min(nprobe, C.shape[0])

    q_rows = queries.select(query_id_col, query_vec_col).collect()
    if not q_rows:
        raise ValueError("empty query set")
    q_ids, luts, probes = [], [], []
    maxcodes = max(b.shape[0] for b in books)
    for r in q_rows:
        q_ids.append(r[0])
        v = r[1]
        x = (
            np.zeros(dim, dtype=np.float64)
            if v is None
            else np.asarray(v, dtype=np.float64)
        )
        if rotation is not None and v is not None:
            # rotate into the index's (OPQ) space before routing/LUTs
            x = x @ np.asarray(rotation, dtype=np.float64).T
        nrm = np.linalg.norm(x)
        sims = (x / (nrm if nrm else 1.0)) @ C.T
        top = (
            np.argpartition(-sims, n - 1)[:n]
            if n > 1
            else np.asarray([int(np.argmax(sims))])
        )
        probes.append(np.sort(top.astype(np.int64)))
        if v is None:
            luts.append(np.full((len(books), maxcodes), np.nan))
            continue
        lut = np.full((len(books), maxcodes), np.inf)
        for mi, (s0, e0) in enumerate(bounds):
            B = books[mi]
            diff = B - x[s0:e0][None, :]
            lut[mi, : B.shape[0]] = (diff * diff).sum(axis=1)
        luts.append(lut)
    LUT = np.stack(luts)
    nq, M = LUT.shape[0], len(books)

    probed_union = sorted({int(c) for p in probes for c in p})
    scan = spark.read.parquet(path).where(
        F.col(cluster_col).isin(probed_union)
    )

    nid_field = scan.schema[id_col]
    qid_field = queries.schema[query_id_col]
    out_schema = StructType(
        [
            StructField("query_id", qid_field.dataType, qid_field.nullable),
            StructField("neighbor_id", nid_field.dataType, nid_field.nullable),
            StructField("adc_dist", DoubleType(), True),
        ]
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            Cd = np.stack([np.asarray(c, dtype=np.int64) for c in pdf[code_col]])
            clusters = pdf[cluster_col].to_numpy()
            ids = pdf[id_col].to_numpy()
            acc = np.zeros((nq, Cd.shape[0]), dtype=np.float64)
            for mi in range(M):
                acc += LUT[:, mi, :][:, Cd[:, mi]]
            top = min(k + 1, Cd.shape[0])
            frames = []
            for qi in range(nq):
                d = acc[qi].copy()
                d[~np.isin(clusters, probes[qi])] = np.inf  # per-query routing
                finite = np.isfinite(d)
                if not finite.any():
                    continue
                idx = np.nonzero(finite)[0]
                # per-batch pre-truncation MUST use the same total
                # order as the final window — (dist, neighbor_id) —
                # or heavy ADC ties (PQ collapses near-identical
                # vectors to identical codes) let batch ROW order
                # decide which tied candidates survive to the
                # global top-k (r7 bug, caught by the 500k sweep's
                # exact search twin)
                sel = idx[np.lexsort((ids[idx], d[idx]))[:top]]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids[qi],
                            "neighbor_id": ids[sel],
                            "adc_dist": d[sel],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    cand = scan.select(id_col, code_col, cluster_col).mapInPandas(
        score, out_schema
    )
    cand = cand.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def rotate_embeddings(
    df: DataFrame,
    rotation: list[list[float]],
    vec_col: str = "embedding",
    out_col: str | None = None,
) -> DataFrame:
    """Apply a fixed orthogonal rotation to the embedding column — one
    narrow Arrow matmul per batch (NULL vectors stay NULL)."""
    R = np.asarray(rotation, dtype=np.float64)
    out_col = out_col or vec_col
    import pyspark.sql.types as SQT

    fields = [
        f if f.name != out_col else SQT.StructField(out_col, SQT.ArrayType(SQT.DoubleType()), True)
        for f in df.schema.fields
    ]
    if out_col not in df.columns:
        fields.append(SQT.StructField(out_col, SQT.ArrayType(SQT.DoubleType()), True))
    out_schema = SQT.StructType(fields)
    cols = [f.name for f in fields if f.name != out_col] + [out_col]

    def rot(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vals = []
            for v in pdf[vec_col]:
                if v is None:
                    vals.append(None)
                else:
                    vals.append((np.asarray(v, dtype=np.float64) @ R.T))
            out = pdf.copy()
            out[out_col] = vals
            yield out[[f.name for f in fields]]

    return df.mapInPandas(rot, out_schema)


def opq_train(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 256,
    n_rot_iters: int = 3,
    pq_max_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init_salt: str = "opq",
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Optimized Product Quantization (public method: Ge, He, Ke, Sun —
    "Optimized Product Quantization", CVPR 2013, the non-parametric
    alternation): learn an orthogonal rotation R so the subspace split
    matches the data's correlation structure, alternating

      1. PQ codebooks on the rotated corpus (``pq_train``), and
      2. the Procrustes rotation update: with x̂ the PQ reconstruction
         of R·x, the optimal R maximizes tr(R·G) for the cross-
         covariance G = Σ x·x̂ᵀ — solved in closed form by the SVD
         G = U S Vᵀ → R = V·Uᵀ.

    Spark shapes: step 1 is the fused-subspace Lloyd job; step 2 is ONE
    ``mapInPandas`` pass emitting one d×d partial cross-covariance per
    partition, pre-reduced executor-side into ``fold_buckets`` pid-bucket
    rows (the ``pca.py`` discipline — the driver receives B·d² doubles
    whether the scan ran 10 tasks or 10⁶), then a d×d SVD on the driver.
    Nothing but d×d matrices ever leaves the executors.
    Returns ``(rotation, codebooks)`` for ``opq_encode`` /
    ``knn_pq_adc(..., rotation=)``.  On isotropic data R converges near
    a permutation (no gain to find — asserted in tests the other way:
    on ANISOTROPIC data OPQ's reconstruction error beats plain PQ)."""
    probe = corpus.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    if probe is None:
        raise ValueError("empty corpus")
    dim = len(probe[0])
    R = np.eye(dim)
    books: list[list[list[float]]] = []
    vecs_only = corpus.select(id_col, vec_col).where(F.col(vec_col).isNotNull())

    gschema = StructType(
        [
            StructField("pid", IntegerType()),
            StructField("g", ArrayType(DoubleType())),
        ]
    )
    gfold_schema = StructType(
        [
            StructField("b", IntegerType()),
            StructField("g", ArrayType(DoubleType())),
        ]
    )
    fold_buckets = 64

    def fold_g(key, pdf):
        # executor-side pre-reduce of the d×d cross-covariance partials
        # (pca.py pid-bucket discipline): the driver receives exactly
        # ``fold_buckets`` rows of d² doubles regardless of task count,
        # and both fold levels are ordered (pid within bucket, bucket id
        # on the driver) so retries reproduce the rotation exactly
        pdf = pdf.sort_values("pid", kind="mergesort")
        g = np.zeros(len(pdf["g"].iloc[0]), dtype=np.float64)
        for gv in pdf["g"]:
            g += np.asarray(gv, dtype=np.float64)
        return pd.DataFrame({"b": [int(key[0])], "g": [g]})

    for _ in range(n_rot_iters):
        rotated = rotate_embeddings(vecs_only, R.tolist(), vec_col)
        books = pq_train(
            rotated, m=m, n_codes=n_codes, max_iter=pq_max_iter,
            id_col=id_col, vec_col=vec_col, init_salt=init_salt,
        )
        books_np = [np.asarray(b, dtype=np.float64) for b in books]
        bounds = _split(dim, m)
        R_round = R.copy()

        def cross_cov(batches):
            from pyspark import TaskContext

            G = np.zeros((dim, dim), dtype=np.float64)
            any_rows = False
            for pdf in batches:
                if not len(pdf):
                    continue
                any_rows = True
                X = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                Y = X @ R_round.T
                codes = _assign_codes(Y, books_np, bounds)
                Xhat = np.concatenate(
                    [books_np[mi][codes[:, mi]] for mi in range(m)], axis=1
                )
                G += X.T @ Xhat
            if any_rows:
                pid = TaskContext.get().partitionId()
                yield pd.DataFrame({"pid": [pid], "g": [G.ravel()]})

        parts = sorted(
            vecs_only.select(vec_col)
            .mapInPandas(cross_cov, gschema)
            .withColumn("b", (F.col("pid") % F.lit(fold_buckets)).cast("int"))
            .groupBy("b")
            .applyInPandas(fold_g, gfold_schema)
            .collect(),
            key=lambda r: r["b"],
        )
        G = np.zeros((dim, dim), dtype=np.float64)
        for r in parts:
            G += np.asarray(r["g"], dtype=np.float64).reshape(dim, dim)
        U, _s, Vt = np.linalg.svd(G)
        R = Vt.T @ U.T
    return R.tolist(), books


def opq_encode(
    corpus: DataFrame,
    rotation: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
) -> DataFrame:
    """Rotate then PQ-encode — same narrow single-pass shape."""
    rotated = rotate_embeddings(
        corpus.select(id_col, vec_col), rotation, vec_col
    )
    return pq_encode(rotated, codebooks, id_col, vec_col, code_col)


def knn_pq_adc_rerank(
    corpus_codes: DataFrame,
    corpus_float: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    code_col: str = "pq_codes",
    vec_col: str = "embedding",
    rotation: list[list[float]] | None = None,
) -> DataFrame:
    """Two-stage serving — the standard production ANN topology (Jégou
    et al.: quantized first pass, exact re-rank of the short-list):
    ADC retrieves ``k · rerank_factor`` candidates per query from the
    CODE-ONLY table, then only those candidates' float vectors are
    fetched and re-scored with exact cosine; output is the exact-cosine
    top-``k`` (``query_id, neighbor_id, cos_sim``).

    Why this shape at scale: the corpus-wide pass reads m-byte codes
    (16-64× less than floats); the float table is touched ONLY for
    nq·k·factor candidate rows, which ride in a BROADCAST against the
    float scan (one column-pruned pass, no shuffle of the corpus) —
    recall approaches exact as ``rerank_factor`` grows while the
    float-byte traffic stays proportional to the short-list, not the
    corpus.  With a candidate set covering the whole corpus this is
    EXACTLY ``knn_bruteforce``'s answer (pinned in tests)."""
    if rerank_factor < 1:
        raise ValueError(f"rerank_factor must be >= 1, got {rerank_factor}")
    cand = knn_pq_adc(
        corpus_codes, queries, codebooks, k=k * rerank_factor,
        id_col=id_col, code_col=code_col, query_id_col=id_col,
        query_vec_col=vec_col, rotation=rotation,
    ).select("query_id", "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    pairs = cand.join(F.broadcast(q), "query_id")
    nf = corpus_float.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv")
    )
    from bigdataproject_formula1_telemetry_spark.operators.similarity import (
        cosine,
    )

    scored = nf.join(F.broadcast(pairs), "neighbor_id").select(
        "query_id",
        "neighbor_id",
        cosine(F.col("__qv"), F.col("__nv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
