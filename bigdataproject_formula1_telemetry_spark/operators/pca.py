"""PCA embedding compression: distributed covariance, driver-side
eigendecomposition, narrow matmul transform.

Public method (Pearson 1901 / Hotelling 1933; the standard pre-ANN
dimensionality reduction — e.g. IVFPQ pipelines routinely PCA 768-dim
text embeddings to 64-256 dims before quantization).  Complements this
repo's OPQ rotation (``pq.opq_train``): OPQ learns an orthogonal
rotation for a FIXED dimension's subspace split; PCA REDUCES the
dimension, trading recall for a k/d scan-and-memory factor on every
downstream operator (kNN, IVF, PQ, SemDeDup all read the compressed
column unchanged).

Spark shapes (100 TB):

- ``pca_train`` is ONE ``mapInPandas`` pass whose batches emit
  (count, Σx, Σx·xᵀ) partials — d + d² doubles per PARTITION, never a
  vector row — pre-reduced executor-side into ``pid % B`` buckets
  (in-bucket fold in pid order, driver folds the B bucket rows in
  bucket order: both levels ordered, so a retry reproduces the model
  bit-for-bit), then a d×d ``eigh``.  The driver receives exactly
  B·(d + d²) doubles regardless of task count — a 10⁶-task 100 TB scan
  ships the same few MB as a 10-task toy.  Train on a deterministic
  sample (``sampling.deterministic_sample``) when even one pass is too
  much.
- ``pca_transform`` is one narrow Arrow pass: (x - mean) @ Wᵀ per
  batch, nothing leaves the executors but the k-dim output column.
- Determinism: eigenvector signs are canonicalized (largest-|coef|
  entry positive), eigenvalues sorted descending with index tiebreak,
  and the partial fold is partition-id-ordered — the model is
  partitioning- and retry-invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def pca_train(
    corpus: DataFrame,
    k: int,
    vec_col: str = "embedding",
    fold_buckets: int = 64,
) -> dict:
    """Fit a k-component PCA on ``corpus[vec_col]`` (NULL vectors
    skipped).  Returns ``{"mean": [d], "components": [k][d],
    "explained_variance": [k], "total_variance": float}`` — plain
    lists, broadcastable in any kernel closure and JSON-serializable
    for model sinks.

    The moment partials are pre-reduced EXECUTOR-side before any driver
    traffic (r6 verdict): each partition's (n, Σx, Σx·xᵀ) row is
    bucketed by ``pid % fold_buckets`` and folded within its bucket in
    pid order, so the driver receives exactly ``fold_buckets`` rows of
    (d + d²) doubles regardless of task count — a 10⁶-task corpus ships
    ~B·d²·8 bytes, not terabytes of per-partition rows.  Determinism is
    preserved: both fold levels are ordered (pid within bucket, bucket
    id on the driver), so a retry of the same partitioning reproduces
    the model bit-for-bit."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if fold_buckets < 1:
        raise ValueError(f"fold_buckets must be >= 1, got {fold_buckets}")
    vecs = corpus.select(vec_col).where(F.col(vec_col).isNotNull())

    part_schema = StructType(
        [
            StructField("pid", IntegerType()),
            StructField("n", LongType()),
            StructField("s", ArrayType(DoubleType())),
            StructField("o", ArrayType(DoubleType())),
        ]
    )

    def partials(batches):
        from pyspark import TaskContext

        n = 0
        s = None
        o = None
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if s is None:
                d = X.shape[1]
                s = np.zeros(d)
                o = np.zeros((d, d))
            n += len(X)
            s += X.sum(axis=0)
            o += X.T @ X
        if n:
            pid = TaskContext.get().partitionId()
            yield pd.DataFrame(
                {"pid": [pid], "n": [n], "s": [s], "o": [o.ravel()]}
            )

    bucket_schema = StructType(
        [
            StructField("b", IntegerType()),
            StructField("n", LongType()),
            StructField("s", ArrayType(DoubleType())),
            StructField("o", ArrayType(DoubleType())),
        ]
    )

    def fold_bucket(key, pdf):
        pdf = pdf.sort_values("pid", kind="mergesort")
        d = len(pdf["s"].iloc[0])
        s = np.zeros(d)
        o = np.zeros(d * d)
        for sv, ov in zip(pdf["s"], pdf["o"]):
            s += np.asarray(sv, dtype=np.float64)
            o += np.asarray(ov, dtype=np.float64)
        return pd.DataFrame(
            {"b": [int(key[0])], "n": [int(pdf["n"].sum())], "s": [s], "o": [o]}
        )

    parts = sorted(
        vecs.mapInPandas(partials, part_schema)
        .withColumn("b", (F.col("pid") % F.lit(fold_buckets)).cast("int"))
        .groupBy("b")
        .applyInPandas(fold_bucket, bucket_schema)
        .collect(),
        key=lambda r: r["b"],
    )
    if not parts:
        raise ValueError("empty corpus")
    n = sum(r["n"] for r in parts)
    d = len(parts[0]["s"])
    if k > d:
        raise ValueError(f"k={k} exceeds embedding dim {d}")
    S = np.zeros(d)
    O = np.zeros((d, d))
    for r in parts:
        S += np.asarray(r["s"], dtype=np.float64)
        O += np.asarray(r["o"], dtype=np.float64).reshape(d, d)
    mean = S / n
    # covariance from the raw moments; symmetrize against float drift
    cov = (O - n * np.outer(mean, mean)) / max(n - 1, 1)
    cov = (cov + cov.T) / 2.0
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(-evals, kind="stable")[:k]
    W = evecs[:, order].T  # k × d
    # canonical signs: largest-|coef| entry of each component positive
    for i in range(W.shape[0]):
        j = int(np.argmax(np.abs(W[i])))
        if W[i, j] < 0:
            W[i] = -W[i]
    ev = np.maximum(evals[order], 0.0)
    return {
        "mean": mean.tolist(),
        "components": W.tolist(),
        "explained_variance": ev.tolist(),
        "total_variance": float(np.maximum(evals, 0.0).sum()),
    }


def pca_transform(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "embedding_pca",
) -> DataFrame:
    """Append the k-dim projection ``(x - mean) @ Wᵀ`` (float32 — the
    at-rest/serving form).  NULL vectors project to NULL.  One narrow
    Arrow pass, model in the kernel closure."""
    from pyspark.sql.functions import pandas_udf

    mean = np.asarray(model["mean"], dtype=np.float64)
    W = np.asarray(model["components"], dtype=np.float64)

    @pandas_udf(ArrayType(FloatType()))
    def _project(vec: pd.Series) -> pd.Series:
        out = []
        mask = []
        rows = []
        for v in vec:
            if v is None:
                mask.append(False)
                rows.append(mean)  # placeholder
            else:
                mask.append(True)
                rows.append(np.asarray(v, dtype=np.float64))
        if not rows:
            return pd.Series([], dtype=object)
        Y = (np.stack(rows) - mean) @ W.T
        for ok, y in zip(mask, Y):
            out.append(y.astype(np.float32) if ok else None)
        return pd.Series(out)

    return df.withColumn(out_col, _project(F.col(vec_col)))


def pca_inverse_transform(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding_pca",
    out_col: str = "embedding_approx",
) -> DataFrame:
    """Reconstruct ``y @ W + mean`` — the rank-k approximation of the
    original vector (test/audit surface for the recall-vs-compression
    trade)."""
    from pyspark.sql.functions import pandas_udf

    mean = np.asarray(model["mean"], dtype=np.float64)
    W = np.asarray(model["components"], dtype=np.float64)

    @pandas_udf(ArrayType(FloatType()))
    def _inv(vec: pd.Series) -> pd.Series:
        out = []
        for v in vec:
            if v is None:
                out.append(None)
            else:
                y = np.asarray(v, dtype=np.float64)
                out.append((y @ W + mean).astype(np.float32))
        return pd.Series(out)

    return df.withColumn(out_col, _inv(F.col(vec_col)))
