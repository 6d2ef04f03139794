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
  vector row — folded on the driver (sorted by partition id so the
  float fold is deterministic under re-partitioning), then a d×d
  ``eigh``.  d is bounded by the embedding width (≤ a few thousand), so
  the d² driver fold is KBs-to-MBs; train on a deterministic sample
  (``sampling.deterministic_sample``) when even one pass is too much.
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
) -> dict:
    """Fit a k-component PCA on ``corpus[vec_col]`` (NULL vectors
    skipped).  Returns ``{"mean": [d], "components": [k][d],
    "explained_variance": [k], "total_variance": float}`` — plain
    lists, broadcastable in any kernel closure and JSON-serializable
    for model sinks."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
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

    parts = sorted(
        vecs.mapInPandas(partials, part_schema).collect(),
        key=lambda r: r["pid"],
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
