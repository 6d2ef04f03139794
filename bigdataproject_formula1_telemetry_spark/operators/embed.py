"""Deterministic text embeddings by feature hashing, and the semantic
decontamination they enable.

``hashed_embedding`` maps a document to a dense unit vector with the
hashing trick (public method: Weinberger et al., "Feature Hashing for
Large Scale Multitask Learning", ICML 2009): every token is hashed to a
bucket ``h(tok) mod dim`` with a pseudo-random sign ``s(tok) ∈ {±1}``,
token counts accumulate signed into the bucket, and the vector is
L2-normalized.  No external model artifact, no randomness — md5-derived
bucket/sign make the embedding identical on any engine, partitioning or
retry, so everything downstream (ANN, near-dedup, quantization, IVF) is
reproducible.  Sparse in nature, dense in storage: a drop-in producer
for this repo's `embedding`-column operators when no learned model is
available.

``semantic_decontaminate`` is the use case that motivates it: 8-gram
decontamination (``dedup.decontaminate``) only catches *verbatim*
benchmark overlap — reordering a sentence or shuffling words defeats
it, while bag-of-words cosine is order-invariant.  Scoring the corpus
against the benchmark's embedding matrix catches those rewordings.

Scale design (100 TB):

- ``hashed_embedding`` is ONE narrow ``mapInPandas`` pass (no explode,
  no shuffle); per-token md5 costs are amortized by an in-kernel
  token→(bucket, sign) memo dict that persists across Arrow batches of
  the same task (Zipf's law makes the hit rate high).
- ``semantic_decontaminate`` embeds the benchmark (small by the same
  contract as kNN query sets), ships the matrix in the kernel closure,
  and filters the corpus in ONE narrow pass — a per-batch numpy matmul
  against the benchmark matrix, rows kept only when max cosine stays
  under the threshold.  No join, no shuffle, nothing collected but the
  benchmark.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.operators.lm import _JAVA_WS

__all__ = [
    "token_bucket_sign",
    "hashed_embedding",
    "semantic_decontaminate",
    "semantic_contamination_pairs",
]


def token_bucket_sign(tok: str, dim: int, salt: str) -> tuple[int, float]:
    """(bucket, sign) for one token — md5-derived, engine-portable.

    Bucket: first 8 md5 hex digits of ``salt|tok`` mod ``dim``; sign:
    the 9th hex digit's low bit.  Exposed so tests (and any SQL oracle)
    can recompute the embedding from scratch."""
    h = hashlib.md5(f"{salt}|{tok}".encode()).hexdigest()
    return int(h[:8], 16) % dim, 1.0 if int(h[8], 16) % 2 == 0 else -1.0


def _embed_matrix(
    texts: Sequence[str], dim: int, salt: str, memo: dict
) -> np.ndarray:
    """Embed a batch of texts into a (n, dim) float64 matrix (rows of
    all-zero stay all-zero; normalization happens here)."""
    M = np.zeros((len(texts), dim), dtype=np.float64)
    for i, s in enumerate(texts):
        if not s:
            continue
        stripped = s.strip().lower()
        if not stripped:
            continue
        for tok in _JAVA_WS.split(stripped):
            bs = memo.get(tok)
            if bs is None:
                bs = memo[tok] = token_bucket_sign(tok, dim, salt)
            M[i, bs[0]] += bs[1]
    nrm = np.linalg.norm(M, axis=1)
    nz = nrm > 0
    M[nz] /= nrm[nz, None]
    return M


def hashed_embedding(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = 256,
    salt: str = "hashemb",
) -> DataFrame:
    """Append a deterministic hashed bag-of-words unit vector.

    Token-less documents get the zero vector — the NULL/zero-norm
    degradation path every consumer in ``similarity.py`` already
    handles (cosine NULL, cluster 0).  One narrow Arrow pass; plan has
    no Exchange (asserted in tests)."""
    import pyspark.sql.types as SQT

    out_schema = SQT.StructType(
        [*df.schema.fields, SQT.StructField(out_col, SQT.ArrayType(SQT.DoubleType()), False)]
    )
    cols = df.columns

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        memo: dict = {}
        for pdf in batches:
            M = _embed_matrix(pdf[text_col].fillna("").tolist(), dim, salt, memo)
            out = pdf[cols].copy()
            out[out_col] = list(M)
            yield out

    return df.mapInPandas(kernel, schema=out_schema)


def _benchmark_matrix(
    benchmark: DataFrame,
    text_col: str,
    dim: int,
    salt: str,
    id_col: str | None = None,
) -> tuple[np.ndarray, list]:
    """Embed the benchmark driver-side (small by contract — same class
    as kNN query sets) into a row-normalized (m, dim) matrix, zero rows
    dropped (they can never certify contamination).  Returns
    ``(matrix, ids)`` — ids empty when ``id_col`` is None."""
    cols = [text_col] if id_col is None else [id_col, text_col]
    rows = benchmark.select(*cols).collect()
    B = _embed_matrix([r[text_col] for r in rows], dim, salt, {})
    keep = np.linalg.norm(B, axis=1) > 0
    ids = [r[id_col] for r, k in zip(rows, keep) if k] if id_col else []
    return B[keep], ids


def semantic_decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.9,
    text_col: str = "text",
    dim: int = 256,
    salt: str = "hashemb",
) -> DataFrame:
    """Drop every corpus doc whose hashed-BoW cosine against ANY
    benchmark doc reaches ``threshold`` — the order-invariant complement
    to 8-gram ``dedup.decontaminate`` (catches shuffled/reworded
    benchmark text).  ONE narrow pass: embed batch + matmul against the
    benchmark matrix + boolean row filter, all in the kernel.  Schema is
    preserved; zero-norm (token-less) docs always survive."""
    B, _ = _benchmark_matrix(benchmark, text_col, dim, salt)
    cols = df.columns

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        memo: dict = {}
        for pdf in batches:
            if len(B) == 0:
                yield pdf[cols]
                continue
            M = _embed_matrix(pdf[text_col].fillna("").tolist(), dim, salt, memo)
            contaminated = (M @ B.T).max(axis=1) >= threshold
            yield pdf[cols][~contaminated]

    return df.mapInPandas(kernel, schema=df.schema)


def semantic_contamination_pairs(
    df: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "doc_id",
    dim: int = 256,
    salt: str = "hashemb",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Audit form: ``(doc_id, bench_id, cos_sim)`` for every
    corpus×benchmark pair at/above threshold (which benchmark item each
    dropped doc matched, and how strongly).  Same one-pass kernel as
    :func:`semantic_decontaminate`, emitting pairs instead of filtering.
    ``bench_id`` keeps the benchmark id column's own type;
    ``bench_text_col`` (default = ``text_col``) names the benchmark's
    text column when it differs from the corpus's."""
    import pyspark.sql.types as SQT

    B, bench_ids = _benchmark_matrix(
        benchmark, bench_text_col or text_col, dim, salt, id_col=bench_id_col
    )
    bench_ids = np.asarray(bench_ids)
    id_field = df.schema[id_col]
    bid_field = benchmark.schema[bench_id_col]
    out_schema = SQT.StructType(
        [
            SQT.StructField(id_col, id_field.dataType, id_field.nullable),
            SQT.StructField("bench_id", bid_field.dataType, bid_field.nullable),
            SQT.StructField("cos_sim", SQT.DoubleType(), False),
        ]
    )

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        memo: dict = {}
        for pdf in batches:
            if len(B) == 0 or len(pdf) == 0:
                continue
            M = _embed_matrix(pdf[text_col].fillna("").tolist(), dim, salt, memo)
            S = M @ B.T
            ri, ci = np.nonzero(S >= threshold)
            if len(ri) == 0:
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[ri],
                    "bench_id": bench_ids[ci],
                    "cos_sim": S[ri, ci],
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, schema=out_schema)
