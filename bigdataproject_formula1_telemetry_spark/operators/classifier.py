"""Trained text-quality classifier over hashed bag-of-words features —
the learned quality gate of the published curation recipes (FineWeb-Edu
and DCLM both gate on a lightweight classifier score; the classic shape
is fastText-style linear-over-hashed-features, Joulin et al. 2016).
The heuristic ``text.quality_score`` ranks by surface statistics; this
learns the ranking from a small labeled seed set and scores the corpus
with it.

Spark-first split:

- **Features**: the deterministic hashing-trick embedding
  (``embed.token_bucket_sign`` / ``_embed_matrix``, Weinberger et al.
  2009) — no vocabulary artifact, engine-portable, one narrow Arrow
  pass.  L2-normalized rows, so the learning rate is scale-free.
- **Training** (``train_text_classifier``): full-batch logistic
  regression.  Each epoch is ONE distributed pass: every Arrow batch
  emits its EXACT partial gradient as (index, value) rows, a map-side
  combinable ``groupBy(i).sum`` reduces them (the treeAggregate shape —
  dim+2 rows reach the driver, never features), and the driver applies
  the update.  The model is a (dim+1)-float vector — trivially
  broadcastable.  Train on a labeled SAMPLE (thousands of docs, the
  published practice); epochs × sample-scans is the whole training
  bill, independent of corpus size.
- **Scoring** (``score_text_classifier``): weights in the kernel
  closure, one narrow schema-preserving pass, zero shuffle (plan
  asserted in tests) — the same serving shape as
  ``lm.doc_perplexity_arrow``.

Floating-point note: partial sums reduce in partition order, so
retrained weights agree to ~1e-9 (float64 associativity), not
bit-exactly; tests pin repartition-invariance at that tolerance and
exact gradient parity against a single-process numpy reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from bigdataproject_formula1_telemetry_spark.operators.embed import _embed_matrix

__all__ = [
    "train_text_classifier",
    "score_text_classifier",
    "with_quality_probability",
    "train_text_multiclass",
    "score_text_multiclass",
]

_GRAD_SCHEMA = StructType(
    [StructField("i", IntegerType()), StructField("g", DoubleType())]
)


def _sigmoid(z: np.ndarray) -> np.ndarray:
    # numerically safe in both tails
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def _gradient(
    labeled: DataFrame,
    w: np.ndarray,
    text_col: str,
    label_col: str,
    dim: int,
    salt: str,
) -> tuple[np.ndarray, float, int]:
    """One exact full-batch pass: returns (∂loss/∂[w, b] summed over all
    rows, Σ log-loss, n_rows).  Index layout of the emitted rows:
    0..dim-1 = weight gradient, dim = bias gradient, dim+1 = loss,
    dim+2 = row count."""
    wv, b = w[:-1].copy(), float(w[-1])

    def kernel(batches):
        memo: dict = {}
        for pdf in batches:
            y = pdf[label_col].to_numpy(dtype=np.float64)
            X = _embed_matrix(pdf[text_col].fillna("").tolist(), dim, salt, memo)
            p = _sigmoid(X @ wv + b)
            r = p - y
            g = X.T @ r
            eps = 1e-12
            loss = -float(
                np.sum(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
            )
            idx = np.arange(dim + 3, dtype=np.int32)
            val = np.concatenate(
                [g, [float(r.sum()), loss, float(len(y))]]
            )
            yield pd.DataFrame({"i": idx, "g": val})

    rows = (
        labeled.select(text_col, label_col)
        .mapInPandas(kernel, _GRAD_SCHEMA)
        .groupBy("i")
        .agg(F.sum("g").alias("g"))
        .collect()
    )
    acc = np.zeros(dim + 3, dtype=np.float64)
    for r in rows:
        acc[r["i"]] = r["g"]
    return acc[: dim + 1], float(acc[dim + 1]), int(acc[dim + 2])


def train_text_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    dim: int = 1024,
    epochs: int = 30,
    lr: float = 2.0,
    l2: float = 1e-4,
    salt: str = "quality-clf",
) -> np.ndarray:
    """Full-batch logistic regression on hashed bag-of-words features.
    Returns the model as a float64 vector of length ``dim + 1`` (bias
    last) — feed it to ``score_text_classifier``.  ``label_col`` is
    0/1 (castable); rows with NULL labels are excluded.  Deterministic
    up to float64 partition-sum associativity (~1e-9)."""
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    src = labeled.where(F.col(label_col).isNotNull()).select(
        F.col(text_col).alias(text_col),
        F.col(label_col).cast("double").alias(label_col),
    )
    w = np.zeros(dim + 1, dtype=np.float64)
    for _ in range(epochs):
        grad, _loss, n = _gradient(src, w, text_col, label_col, dim, salt)
        if n == 0:
            raise ValueError("no labeled rows to train on")
        step = grad / n
        step[:-1] += l2 * w[:-1]  # L2 on weights, never the bias
        w -= lr * step
    return w


def score_text_classifier(
    df: DataFrame,
    weights: np.ndarray,
    text_col: str = "text",
    out_col: str = "quality_prob",
    salt: str = "quality-clf",
) -> DataFrame:
    """All input columns + ``out_col`` = P(label=1 | text) under the
    trained model — ONE narrow Arrow pass, weights in the closure, no
    shuffle/join (the serving path a 100 TB gate actually pays).
    NULL/token-less docs score ``sigmoid(bias)`` (the model's prior)."""
    w = np.asarray(weights, dtype=np.float64)
    dim = len(w) - 1
    wv, b = w[:-1], float(w[-1])
    fields = [f for f in df.schema.fields if f.name != out_col]
    schema = StructType(fields + [StructField(out_col, DoubleType())])
    names = [f.name for f in fields]

    def kernel(batches):
        memo: dict = {}
        for pdf in batches:
            X = _embed_matrix(pdf[text_col].fillna("").tolist(), dim, salt, memo)
            out = pdf[names].copy()
            out[out_col] = _sigmoid(X @ wv + b)
            yield out

    return df.select(names).mapInPandas(kernel, schema)


def with_quality_probability(
    df: DataFrame,
    weights: np.ndarray,
    min_prob: float | None = None,
    text_col: str = "text",
    out_col: str = "quality_prob",
    salt: str = "quality-clf",
) -> DataFrame:
    """Score + (optionally) hard-gate in one step: rows below
    ``min_prob`` are dropped.  For the published soft alternative,
    score with ``score_text_classifier`` and feed ``out_col`` to
    ``sampling.score_weighted_sample`` — composed that way by
    ``pipelines.curate_documents(quality_classifier=...)``."""
    scored = score_text_classifier(df, weights, text_col, out_col, salt)
    if min_prob is not None:
        scored = scored.where(F.col(out_col) >= F.lit(float(min_prob)))
    return scored


# --------------------------------------------------------------- multiclass


def _softmax(Z: np.ndarray) -> np.ndarray:
    Z = Z - Z.max(axis=1, keepdims=True)
    E = np.exp(Z)
    return E / E.sum(axis=1, keepdims=True)


def _gradient_multi(
    labeled: DataFrame,
    W: np.ndarray,
    classes: list[str],
    text_col: str,
    label_col: str,
    dim: int,
    salt: str,
) -> tuple[np.ndarray, float, int]:
    """One exact full-batch softmax-CE pass.  ``W`` is (K, dim+1), bias
    last per class.  Emitted index layout: k·(dim+1)+j for ∂W[k, j],
    then K·(dim+1) = loss, +1 = row count — the same
    partials → ``groupBy(i).sum`` → driver shape as the binary path,
    just K× the (still tiny) reduced row count."""
    K = len(classes)
    Wv, b = W[:, :-1].copy(), W[:, -1].copy()
    cls_idx = {c: k for k, c in enumerate(classes)}

    def kernel(batches):
        memo: dict = {}
        for pdf in batches:
            y = np.array(
                [cls_idx[v] for v in pdf[label_col]], dtype=np.int64
            )
            X = _embed_matrix(pdf[text_col].fillna("").tolist(), dim, salt, memo)
            P = _softmax(X @ Wv.T + b[None, :])
            Y = np.zeros_like(P)
            Y[np.arange(len(y)), y] = 1.0
            R = P - Y  # (n, K)
            G = R.T @ X  # (K, dim)
            eps = 1e-12
            loss = -float(np.log(P[np.arange(len(y)), y] + eps).sum())
            flat = np.concatenate(
                [np.concatenate([G, R.sum(axis=0)[:, None]], axis=1).ravel(),
                 [loss, float(len(y))]]
            )
            idx = np.arange(K * (dim + 1) + 2, dtype=np.int32)
            yield pd.DataFrame({"i": idx, "g": flat})

    rows = (
        labeled.select(text_col, label_col)
        .mapInPandas(kernel, _GRAD_SCHEMA)
        .groupBy("i")
        .agg(F.sum("g").alias("g"))
        .collect()
    )
    acc = np.zeros(K * (dim + 1) + 2, dtype=np.float64)
    for r in rows:
        acc[r["i"]] = r["g"]
    G = acc[: K * (dim + 1)].reshape(K, dim + 1)
    return G, float(acc[-2]), int(acc[-1])


def train_text_multiclass(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    dim: int = 1024,
    epochs: int = 30,
    lr: float = 2.0,
    l2: float = 1e-4,
    salt: str = "domain-clf",
) -> tuple[list[str], np.ndarray]:
    """Multiclass softmax regression over hashed bag-of-words — the
    trained language-ID / domain-tagger stage (fastText's supervised
    mode, Joulin et al. 2016, is exactly linear-softmax over hashed
    features; `text.lang_id` is the zero-shot heuristic, this learns
    from labels).  Returns ``(classes, W)`` with ``classes`` sorted
    (the deterministic class-index contract) and ``W`` of shape
    (K, dim+1), bias last.

    Scale shape: identical to the binary trainer — each epoch is ONE
    distributed pass emitting exact partial gradients, reduced by a
    map-side-combinable ``groupBy(i).sum``; K·(dim+1)+2 floats reach
    the driver per epoch, never a feature row.  Label discovery is one
    #classes-row distinct aggregate."""
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    src = labeled.where(
        F.col(label_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(
        F.col(text_col).alias(text_col),
        F.col(label_col).cast("string").alias(label_col),
    )
    classes = sorted(
        r["c"] for r in src.select(F.col(label_col).alias("c")).distinct().collect()
    )
    if len(classes) < 2:
        raise ValueError(f"need >= 2 classes, got {classes}")
    K = len(classes)
    W = np.zeros((K, dim + 1), dtype=np.float64)
    for _ in range(epochs):
        G, _loss, n = _gradient_multi(
            src, W, classes, text_col, label_col, dim, salt
        )
        if n == 0:
            raise ValueError("no labeled rows to train on")
        step = G / n
        step[:, :-1] += l2 * W[:, :-1]
        W -= lr * step
    return classes, W


def score_text_multiclass(
    df: DataFrame,
    model: tuple[list[str], np.ndarray],
    text_col: str = "text",
    pred_col: str = "label_pred",
    prob_col: str = "label_prob",
    salt: str = "domain-clf",
) -> DataFrame:
    """All input columns + argmax class and its softmax probability —
    one narrow Arrow pass, model in the closure, zero shuffle (the
    corpus-tagging serving path).  Ties break to the lowest class
    index = lexicographically smallest class (``classes`` is sorted by
    the training contract).  NULL docs get the empty-text prediction
    (the model's learned prior direction), never a crash."""
    classes, W = model
    W = np.asarray(W, dtype=np.float64)
    dim = W.shape[1] - 1
    Wv, b = W[:, :-1], W[:, -1]
    cls_arr = np.asarray(classes, dtype=object)
    fields = [
        f for f in df.schema.fields if f.name not in (pred_col, prob_col)
    ]
    from pyspark.sql.types import StringType as _S

    schema = StructType(
        fields
        + [StructField(pred_col, _S()), StructField(prob_col, DoubleType())]
    )
    names = [f.name for f in fields]

    def kernel(batches):
        memo: dict = {}
        for pdf in batches:
            X = _embed_matrix(pdf[text_col].fillna("").tolist(), dim, salt, memo)
            P = _softmax(X @ Wv.T + b[None, :])
            k = P.argmax(axis=1)
            out = pdf[names].copy()
            out[pred_col] = cls_arr[k]
            out[prob_col] = P[np.arange(len(k)), k]
            yield out

    return df.select(names).mapInPandas(kernel, schema)
