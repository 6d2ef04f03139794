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
    "unimax_budgets",
    "unimax_sample",
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
    # sum in sorted-key order: collect() returns partition order, and a
    # float sum over dict order would make the fractions wobble at
    # 1e-16 BETWEEN RUNS — sorted order keeps them bit-reproducible
    z = sum(
        n**temperature
        for _, n in sorted(counts.items(), key=lambda kv: str(kv[0]))
    )
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


def unimax_budgets(
    df: DataFrame,
    strata_col: str,
    token_budget: float,
    max_epochs: float = 4.0,
    n_tokens_col: str = "n_tokens",
) -> dict[object, float]:
    """UniMax allocation (Chung et al. 2023, ICLR — public method):
    spread a total token budget as UNIFORMLY as possible across
    languages/domains, capping each domain at ``max_epochs`` passes over
    its data.  Temperature sampling picks one exponent for head and
    tail at once; UniMax instead gives every domain the same byte
    budget unless its epoch cap binds — the paper's fairness argument
    for multilingual pretraining.

    Exact waterfill (the paper's Algorithm 1 shape): visit domains in
    ascending capacity ``cap_c = max_epochs * n_c``; each takes
    ``min(cap_c, remaining / domains_left)``.  A domain below the
    current fair share binds at its cap and the slack re-spreads over
    the rest — the unique allocation that is uniform wherever no cap
    binds.  Ties on capacity are visited in key order: deterministic.

    Sizing is ONE ``groupBy(domain).sum(tokens)`` aggregate (#domains
    rows to the driver — bounded by contract, domains are languages or
    sources, never ids); the waterfill itself is O(L log L) driver
    arithmetic.  Returns {domain: allocated_tokens} — realized
    downstream by ``unimax_sample``.  When ``token_budget`` exceeds
    Σ cap_c every domain saturates at its cap and the realized total
    honestly undershoots (the report column of ``unimax_sample`` shows
    it) — silently raising epochs would repeat tail data past the
    cap the caller chose."""
    if token_budget <= 0:
        raise ValueError(f"token_budget must be > 0, got {token_budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    counts = _domain_token_counts(df, strata_col, n_tokens_col)
    return _waterfill(counts, token_budget, max_epochs)


def _domain_token_counts(
    df: DataFrame, strata_col: str, n_tokens_col: str
) -> dict[object, float]:
    """ONE map-side-combinable sum aggregate; #domains rows collected
    (bounded by contract: domains are languages/sources, never ids)."""
    return {
        r["k"]: float(r["t"] or 0.0)
        for r in df.groupBy(F.col(strata_col).alias("k"))
        .agg(F.sum(n_tokens_col).alias("t"))
        .collect()
    }


def _waterfill(
    counts: dict[object, float], token_budget: float, max_epochs: float
) -> dict[object, float]:
    order = sorted(counts.items(), key=lambda kv: (max_epochs * kv[1], str(kv[0])))
    out: dict[object, float] = {}
    remaining = float(token_budget)
    left = len(order)
    for k, n in order:
        share = remaining / left if left else 0.0
        alloc = min(max_epochs * n, share)
        out[k] = alloc
        remaining -= alloc
        left -= 1
    return out


def unimax_sample(
    df: DataFrame,
    strata_col: str,
    id_cols: Sequence[str],
    token_budget: float,
    max_epochs: float = 4.0,
    n_tokens_col: str = "n_tokens",
    salt: str = "unimax",
) -> tuple[DataFrame, DataFrame]:
    """Realize a UniMax allocation: returns ``(sampled_df, report_df)``.

    A domain whose allocation exceeds one pass is EXPLICITLY repeated:
    ``floor(b_c / n_c)`` full epochs (every row, tagged ``epoch``
    0..e-1) plus the fractional remainder as one deterministic
    hash-gated subset (tagged with the final epoch id) — repetition is
    a visible, audited decision (the ``epoch`` column), never an
    implicit weight.  Expected realized tokens per domain = its
    allocation; the report (domain, n_tokens, allocated_tokens,
    epochs, fraction_last_epoch) is the mixture ledger.

    Scale shape: sizing reuses ``unimax_budgets``'s single aggregate;
    realization is a pure column pipeline — an ``explode(sequence(...))``
    over the per-domain epoch count (row multiplication on executors,
    no shuffle) and the same md5 gate as every sampler here, salted per
    domain so fractional subsets are independent across domains."""
    # ONE sizing aggregate feeds both the waterfill and the report
    counts = _domain_token_counts(df, strata_col, n_tokens_col)
    budgets = _waterfill(counts, token_budget, max_epochs)
    report_rows = []
    for k, b in sorted(budgets.items(), key=lambda kv: str(kv[0])):
        n = counts.get(k, 0.0)
        rate = 0.0 if n <= 0 else b / n
        full = int(rate)
        frac = rate - full
        report_rows.append(
            (str(k), n, b, full, frac, sampling._threshold_hex(frac))
        )
    spark = df.sparkSession
    report_full = spark.createDataFrame(
        report_rows,
        "domain string, n_tokens double, allocated_tokens double, "
        "epochs int, fraction_last_epoch double, __hex string",
    )
    report = report_full.drop("__hex")
    # per-domain plan constants ride as a BROADCAST relation, not a
    # chained CASE WHEN — a 10k-domain mixture would otherwise build a
    # 10k-deep expression tree (plan-size blowup); the join key is the
    # domain, the broadcast is #domains rows by contract
    tagged = df.withColumn("__dom", F.col(strata_col).cast("string")).join(
        F.broadcast(
            report_full.select(
                F.col("domain").alias("__dom"),
                F.col("epochs").alias("__full"),
                F.col("fraction_last_epoch").alias("__frac"),
                "__hex",
            )
        ),
        "__dom",
        "inner",
    )
    # epoch ids 0..__full-1 are whole passes; epoch __full is the
    # fractional one, present only where the per-domain gate admits the
    # row.  sequence(0, __full) is empty-safe: __full = 0 and __frac = 0
    # yields only the (rejected) fractional epoch.
    gate = sampling._gate([*id_cols, strata_col], salt)
    exploded = tagged.withColumn(
        "epoch", F.explode(F.sequence(F.lit(0), F.col("__full")))
    )
    kept = exploded.where(
        (F.col("epoch") < F.col("__full"))
        | ((F.col("__frac") > 0) & (gate < F.col("__hex")))
    ).drop("__dom", "__full", "__frac", "__hex")
    return kept, report
