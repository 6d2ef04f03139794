"""Training-data mixture control: temperature sampling over domains.

The standard rebalance step in multilingual / multi-domain pretraining
corpora (public method: exponentially-smoothed sampling, Lample & Conneau
2019 §3.1 / XLM-R): with per-domain sizes ``n_c``, sample domain ``c``
with probability

    p_c = n_c^tau / sum_j n_j^tau

``tau = 1`` keeps natural proportions, ``tau = 0`` allocates equally,
``0 < tau < 1`` up-weights the tail.  Realized as per-domain keep
fractions ``f_c = min(1, target_rows * p_c / n_c)`` applied through the
deterministic content-hash gate (``sampling.stratified_sample``) — so
the mixture is reproducible under retries/repartitioning and
oracle-expressible, unlike ``df.sample``.

Domains can be an existing column (``lang``, ``source``) or latent:
``cluster_assign`` tags each row with its nearest spherical-k-means
centroid (``similarity.ivf_centroids`` quantizer, one Arrow matmul per
batch, no shuffle) and the same mixture math applies to the clusters —
topic-balanced sampling over an unlabeled corpus.

Scale (100 TB): sizing is ONE tiny groupBy (rows = #domains, collected —
bounded by contract: domains are languages/sources/clusters, not ids);
the gate itself is a pure column expression on the main scan — no
shuffle, no second pass over the corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.operators import sampling

__all__ = [
    "cluster_assign",
    "temperature_fractions",
    "mixture_sample",
    "cluster_mixture_sample",
]


def cluster_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Tag each row with its nearest centroid id (int) — the latent
    domain label.  One Arrow matmul per batch via the shared IVF
    assigner; NULL/zero vectors land in cluster 0 by that kernel's
    documented degradation."""
    from bigdataproject_formula1_telemetry_spark.operators.similarity import (
        _np_assigner,
    )

    assign = _np_assigner(centroids, nprobe=1)
    return df.withColumn(out_col, assign(F.col(vec_col))[0])


def temperature_fractions(
    df: DataFrame,
    strata_col: str,
    temperature: float,
    target_rows: int,
) -> dict[object, float]:
    """Per-domain keep fractions realizing the temperature mixture.

    Runs the sizing job (one groupBy-count, #domains rows collected).
    ``f_c = min(1, target_rows * p_c / n_c)`` — a domain too small to
    fill its allocation is kept whole (fraction capped at 1; the
    realized total then undershoots ``target_rows``, which is the
    standard behavior — oversampling/duplication is a separate, explicit
    decision, never implicit)."""
    if temperature < 0:
        raise ValueError(f"temperature must be >= 0, got {temperature}")
    if target_rows <= 0:
        raise ValueError(f"target_rows must be positive, got {target_rows}")
    counts = {
        r["k"]: r["n"]
        for r in df.groupBy(F.col(strata_col).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    z = sum(n**temperature for n in counts.values())
    return {
        k: min(1.0, target_rows * (n**temperature / z) / n)
        for k, n in counts.items()
    }


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    id_cols: Sequence[str],
    temperature: float = 0.7,
    target_rows: int | None = None,
    fractions: dict[object, float] | None = None,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-mixture sample over an explicit domain column.

    Pass precomputed ``fractions`` to skip the sizing job (the
    production shape when the same mixture is applied to many shards);
    otherwise ``temperature`` + ``target_rows`` size it here.  Unseen
    domain values keep fraction 0 — a fractions dict computed on one
    corpus snapshot drops rows of brand-new domains rather than
    admitting them unweighted."""
    if fractions is None:
        if target_rows is None:
            raise ValueError("pass either fractions= or target_rows=")
        fractions = temperature_fractions(df, strata_col, temperature, target_rows)
    return sampling.stratified_sample(
        df,
        strata_col,
        {k: float(v) for k, v in fractions.items()},
        id_cols,
        default_fraction=0.0,
        salt=salt,
    )


def cluster_mixture_sample(
    df: DataFrame,
    centroids: list[list[float]],
    id_cols: Sequence[str],
    vec_col: str = "embedding",
    temperature: float = 0.7,
    target_rows: int | None = None,
    salt: str = "mix",
) -> DataFrame:
    """Topic-balanced sampling over an unlabeled corpus: assign latent
    clusters, then temperature-mix over them.  Output keeps the
    ``cluster`` tag (an audit column — drop it downstream if unwanted)."""
    tagged = cluster_assign(df, centroids, vec_col=vec_col)
    return mixture_sample(
        tagged,
        "cluster",
        id_cols,
        temperature=temperature,
        target_rows=target_rows,
        salt=salt,
    )
