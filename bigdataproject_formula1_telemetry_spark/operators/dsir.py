"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023; public method): select raw-corpus documents whose hashed
n-gram distribution looks like a TARGET corpus (e.g. Wikipedia+books),
by importance weights under two bag-of-ngrams models and Gumbel-top-k
resampling.  This is the published pre-training data-selection recipe
between "heuristic gates" (``text.gopher_filter``) and "trained
classifier" (``classifier.train_text_classifier``): it needs no labels,
only a target corpus to imitate.

Method (paper §3, hashed n-gram variant the paper ships):

1. Features: unigrams + bigrams hashed into ``dim`` buckets (the paper
   uses 10k) — the same md5 bucket mapping as ``embed.token_bucket_sign``
   so any engine can recompute it.
2. Fit two multinomial bucket models: ``p`` on the target corpus, ``q``
   on the raw corpus (Laplace-smoothed).
3. Per-doc importance weight ``log w = Σ_b c_b · (log p_b − log q_b)``
   (counts, not presence).
4. Resample without replacement ∝ w via Gumbel-top-k: key =
   ``log w + Gumbel(0,1)``, take the top k (Vieira 2014's trick — an
   exact sample from the softmax without normalizing).

Spark shapes (100 TB):

- **Fit** is one explode → ``groupBy(bucket).count`` per corpus —
  map-side combinable, ≤ ``dim`` rows out, model broadcasts by
  construction (``dim`` floats).  Fit ``q`` on a deterministic sample
  when one full pass is too much (the estimate only needs ~1e6 docs).
- **Weights** stay JVM end-to-end: ngram explode → md5 bucket
  expression → broadcast-join the ``dim``-row log-ratio table →
  ``groupBy(id).sum`` — map-side combined to one row per doc before the
  shuffle, and the group key is the uniform doc id, never content (the
  hot-key audit rule).  No Python in the hot path.
- **Selection** is ``orderBy(key desc).limit(k)`` — distributed
  TakeOrdered, never a global window — with the Gumbel noise derived
  from ``xxhash64(id, seed)``: deterministic, partitioning-invariant,
  and reproducible across retries (same reason ``sampling.
  deterministic_sample`` keys on content hashes, not ``rand()``).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "fit_hashed_ngram_model",
    "dsir_log_weights",
    "dsir_select",
]

_LOG2_E64 = 64 * np.log(2.0)


def _ngrams(text_col: str, use_bigrams: bool = True):
    """Array of lowercased unigram + bigram strings (bigrams joined by
    one space) — whitespace tokenization, matching ``text.tokens``."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    if not use_bigrams:
        return toks
    n = F.size(toks) - F.lit(1)
    pairs = F.arrays_zip(
        F.slice(toks, 1, F.greatest(n, F.lit(0))),
        F.slice(toks, 2, F.greatest(n, F.lit(0))),
    )
    bigrams = F.transform(
        pairs, lambda p: F.concat_ws(" ", p["0"], p["1"])
    )
    return F.concat(toks, bigrams)


def _bucket(ng, dim: int, salt: str):
    """md5-derived bucket of one ngram — the ``embed.token_bucket_sign``
    mapping (first 8 hex digits mod dim), as a pure JVM expression."""
    h = F.md5(F.concat(F.lit(f"{salt}|"), ng))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % F.lit(dim)
    ).cast("int")


def np_bucket(ng: str, dim: int, salt: str) -> int:
    """The same bucket mapping in pure Python — exposed so tests and
    any external oracle can recompute weights from scratch."""
    import hashlib

    return int(hashlib.md5(f"{salt}|{ng}".encode()).hexdigest()[:8], 16) % dim


def _gumbel_u(hash_col):
    """Uniform in (0, 1) exclusive from a 64-bit hash column, for the
    Gumbel-top-k key ``log_w − log(−log(u))``.  The 64-bit long is
    shifted into [0, 1) then clamped on BOTH sides:

    - lower: the single hash value −2⁶³ would land exactly on 0 and
      ``log(0)`` the inner log to −inf;
    - upper: hashes within 1024 of +2⁶³ round to 2⁶³ when cast to
      double, making ``u`` exactly 1.0, so ``−log(u)`` = 0 and the
      OUTER ``log(0)`` NULLs the row's sort key — the row silently
      sorts last regardless of weight.  ``1 − 2⁻⁵³`` is the largest
      double below 1.0.
    """
    u = hash_col.cast("double") / F.lit(float(2**64)) + F.lit(0.5)
    return F.least(F.greatest(u, F.lit(2.0**-64)), F.lit(1.0 - 2.0**-53))


def _bucket_counts(
    docs: DataFrame, text_col: str, dim: int, salt: str, use_bigrams: bool
) -> DataFrame:
    """The fit's distributed half: explode → bucket → map-side-combined
    count; ≤ ``dim`` rows out."""
    return (
        docs.select(F.explode(_ngrams(text_col, use_bigrams)).alias("ng"))
        .select(_bucket(F.col("ng"), dim, salt).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _model_from_counts(pairs, dim: int, alpha: float) -> np.ndarray:
    counts = np.zeros(dim, dtype=np.float64)
    for b, c in pairs:
        counts[int(b)] = float(c)
    total = counts.sum()
    return np.log((counts + alpha) / (total + alpha * dim))


def fit_hashed_ngram_model(
    docs: DataFrame,
    text_col: str = "text",
    dim: int = 10_000,
    salt: str = "dsir",
    use_bigrams: bool = True,
    alpha: float = 1.0,
) -> np.ndarray:
    """Laplace-smoothed multinomial over hashed ngram buckets:
    ``log((c_b + α) / (N + α·dim))`` as a ``dim`` float64 array
    (broadcast-small for any ``dim`` worth hashing into).  One explode +
    one map-side-combinable count aggregate; ≤ ``dim`` rows leave the
    executors."""
    if dim < 2:
        raise ValueError(f"dim must be >= 2, got {dim}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0 (unseen buckets), got {alpha}")
    rows = _bucket_counts(docs, text_col, dim, salt, use_bigrams).collect()
    return _model_from_counts(
        ((r["b"], r["c"]) for r in rows), dim, alpha
    )


def dsir_log_weights(
    docs: DataFrame,
    target_logp: np.ndarray,
    raw_logp: np.ndarray,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
    use_bigrams: bool = True,
) -> DataFrame:
    """(id, log_w) with ``log_w = Σ_b c_b·(log p_b − log q_b)`` — the
    DSIR importance logit.  Docs with NO features (empty/NULL text)
    score 0.0 (their distributions are uninformative either way).

    Plan: explode → bucket expression → broadcast join against the
    ``dim``-row log-ratio table → ``groupBy(id).sum`` (uniform key,
    map-side combined).  The models never ship in a closure — they ride
    as a broadcast relation, so the same plan serves any ``dim``."""
    if target_logp.shape != raw_logp.shape:
        raise ValueError(
            f"model shapes disagree: {target_logp.shape} vs {raw_logp.shape}"
        )
    dim = len(target_logp)
    spark = docs.sparkSession
    lam = spark.createDataFrame(
        [(int(b), float(target_logp[b] - raw_logp[b])) for b in range(dim)],
        "b int, lam double",
    )
    scored = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode_outer(_ngrams(text_col, use_bigrams)).alias("ng"),
        )
        .select("id", _bucket(F.col("ng"), dim, salt).alias("b"))
        .join(F.broadcast(lam), "b", "left")
        .groupBy("id")
        .agg(F.sum(F.coalesce(F.col("lam"), F.lit(0.0))).alias("log_w"))
    )
    return scored.select(F.col("id").alias(id_col), "log_w")


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 10_000,
    salt: str = "dsir",
    seed: int = 0,
    use_bigrams: bool = True,
    raw_model_docs: DataFrame | None = None,
) -> DataFrame:
    """Select ``k`` raw docs by DSIR: fit target/raw models, weight,
    Gumbel-top-k.  Returns the selected rows of ``raw`` (full schema)
    plus ``log_w`` — deterministic in ``(salt, seed)`` and invariant to
    partitioning.  ``raw_model_docs`` substitutes a (deterministic)
    sample for the raw-model fit when the full corpus is too large for
    a second fitting pass."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if dim < 2:
        raise ValueError(f"dim must be >= 2, got {dim}")
    # BOTH model fits in ONE action (r14 optimization round): the
    # target and raw count passes are independent, so unioning them
    # under a model tag lets their scans schedule concurrently and pays
    # one driver round trip instead of two sequential ones (guide §2.6
    # — overlap independent jobs).  The resulting arrays are identical
    # to two fit_hashed_ngram_model calls.
    both = (
        _bucket_counts(target, text_col, dim, salt, use_bigrams)
        .select(F.lit(0).alias("__m"), "b", "c")
        .unionByName(
            _bucket_counts(
                raw if raw_model_docs is None else raw_model_docs,
                text_col, dim, salt, use_bigrams,
            ).select(F.lit(1).alias("__m"), "b", "c")
        )
        .collect()
    )
    p = _model_from_counts(
        ((r["b"], r["c"]) for r in both if r["__m"] == 0), dim, 1.0
    )
    q = _model_from_counts(
        ((r["b"], r["c"]) for r in both if r["__m"] == 1), dim, 1.0
    )
    w = dsir_log_weights(
        raw, p, q, text_col=text_col, id_col=id_col, salt=salt,
        use_bigrams=use_bigrams,
    )
    u = _gumbel_u(
        F.xxhash64(F.col(id_col).cast("string"), F.lit(seed))
    )
    keyed = w.withColumn("__key", F.col("log_w") - F.log(-F.log(u)))
    picked = keyed.orderBy(
        F.col("__key").desc(), F.col(id_col).asc()
    ).limit(k).select(id_col, "log_w")
    return raw.join(picked, id_col, "inner")
