"""Deterministic sampling for training-data pipelines (north-star).

``df.sample()`` / ``rand()`` are nondeterministic under task retries and
repartitioning — a reproducibility hazard in dataset curation.  These
samplers gate on a content hash of the row identity, so the same row
makes the same decision on any engine, any partitioning, any retry:

- ``deterministic_sample`` — keep rows where the first 8 hex digits of
  md5(salt|id) fall under the fraction threshold (md5 is identical in
  every engine → the sample is portable and oracle-checkable).
- ``stratified_sample`` — per-stratum fractions (e.g. downsample the
  dominant language, keep the rare ones) via the same gate.
- ``sample_by_key`` — all-or-nothing at the group level (keep whole
  documents/laps, never fractions of one).

Scale: pure column expressions, no shuffle, fully pushdown-friendly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hex digits of precision for the threshold gate (16^8 ≈ 4.3e9 buckets)
_HEX_DIGITS = 8


def _threshold_hex(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    t = int(fraction * (16**_HEX_DIGITS))
    if t >= 16**_HEX_DIGITS:
        # fraction == 1.0 must keep EVERY row: 'g' sorts after every hex
        # digit, so the strict-< gate passes all md5 prefixes (clamping to
        # 'ffffffff' would drop rows whose prefix is exactly ffffffff)
        return "g"
    return format(t, f"0{_HEX_DIGITS}x")


def _gate(id_cols: Sequence[str | Column], salt: str) -> Column:
    # NULL id components are coalesced to a sentinel: concat_ws would
    # otherwise silently skip them, collapsing every null-id row onto one
    # shared gate value (an all-or-nothing decision for the whole class).
    parts = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"),
            F.lit("\x00<null>"),
        )
        for c in id_cols
    ]
    ident = F.concat_ws("|", F.lit(salt), *parts)
    return F.substring(F.md5(ident), 1, _HEX_DIGITS)


def deterministic_sample(
    df: DataFrame,
    id_cols: Sequence[str],
    fraction: float,
    salt: str = "seed",
) -> DataFrame:
    """Reproducible ~``fraction`` sample keyed by row identity.  The hex
    prefix of md5 is uniform, so the realized rate concentrates tightly
    around ``fraction`` for any non-adversarial id distribution."""
    return df.where(_gate(id_cols, salt) < F.lit(_threshold_hex(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_cols: Sequence[str],
    default_fraction: float = 0.0,
    salt: str = "seed",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value gets its own
    threshold (rebalancing skewed corpora — the canonical language/domain
    rebalance step)."""
    thresh = F.lit(_threshold_hex(default_fraction))
    for value, frac in fractions.items():
        thresh = F.when(
            F.col(strata_col) == value, F.lit(_threshold_hex(frac))
        ).otherwise(thresh)
    return df.where(_gate(id_cols, salt) < thresh)


def sample_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    fraction: float,
    salt: str = "seed",
) -> DataFrame:
    """Group-level all-or-nothing sampling: every row of a kept key
    survives (whole laps / whole documents), so downstream per-group
    operators see complete groups."""
    return deterministic_sample(df, key_cols, fraction, salt)


def deterministic_shuffle(
    df: DataFrame,
    id_cols: Sequence[str],
    salt: str = "seed",
) -> DataFrame:
    """Reproducible global shuffle: order rows by md5(salt | identity) —
    the training-data step between packing and writing (decorrelates
    document order without RNG state, re-runs identically, and a new
    salt is a fresh epoch permutation).  The sort is a range-partitioned
    exchange like any global orderBy; at scale prefer writing the
    shuffled order once (sortWithinPartitions on the same gate keeps it
    shuffle-local when per-file order is enough).

    Pass the row's FULL identity as ``id_cols``: the gate is
    md5(salt | id_cols), so with few distinct id values many rows share
    one gate value and the range partitioner skews (and the ``*id_cols``
    tie-break can't discriminate further).  Unique keys like
    ``(doc_id, chunk_idx)`` or ``seq_id`` give a uniform gate and
    balanced ranges."""
    return df.orderBy(_gate(id_cols, salt), *id_cols)


#: quantile-sketch resolution for score_weighted_sample sizing; the
#: sizing error from the midpoint rule is O(n_pos / _SKETCH_Q) rows,
#: well inside the binomial noise of the gate itself at any corpus size
_SKETCH_Q = 512


def score_weighted_sample(
    df: DataFrame,
    score_col: str,
    id_cols: Sequence[str],
    target_fraction: float,
    gamma: float = 1.0,
    salt: str = "soft",
) -> DataFrame:
    """Soft quality sampling: keep each row with probability
    ``min(1, c * score^gamma)``, with ``c`` solved so the expected
    keep-rate is ``target_fraction`` — the published alternative to a
    hard quality cutoff (high-scoring documents survive almost surely,
    low-scoring ones are thinned, none are categorically banned).
    ``gamma`` sharpens (>1) or flattens (<1) the preference.

    Deterministic: the acceptance draw is the md5 hash gate (same
    engine-portable uniform as ``deterministic_sample``), so the sample
    is stable under retries/repartitioning.

    Sizing ``c`` costs exactly ONE corpus scan: a single aggregate
    computes row counts, the minimum positive weight, and a
    ``percentile_approx`` sketch of the positive score^gamma
    distribution at ``_SKETCH_Q`` midpoint quantiles; the bisection for
    ``c`` then runs driver-side against the sketch (the earlier
    revision re-aggregated the corpus per bisection round — up to 21
    full scans, a real bill when this gates a 100 TB pre-dedup pass).
    The bracket is exact by construction: at ``hi = 1/min_positive``
    every positive row is capped (kept = n_pos, the supremum), so
    heavy-tailed score distributions cannot push the solution past the
    upper bound (the old ``10·n/Σs`` bound silently under-kept on
    them).  Sizing error is bounded by the sketch resolution
    (≈ n_pos/_SKETCH_Q rows), inside the gate's own binomial noise.
    If the target exceeds the positive-score mass (n_pos ≤ target),
    every positive row is kept — non-positive/NULL scores always keep
    probability 0.
    """
    if not 0.0 < target_fraction <= 1.0:
        raise ValueError(f"target_fraction must be in (0,1], got {target_fraction}")
    s = F.when(
        F.col(score_col).isNotNull() & (F.col(score_col) > 0),
        F.pow(F.col(score_col).cast("double"), F.lit(float(gamma))),
    ).otherwise(F.lit(0.0))
    s_pos = F.when(s > 0, s)  # NULL where non-positive: excluded from sketch
    probs = F.array(
        *[F.lit((j + 0.5) / _SKETCH_Q) for j in range(_SKETCH_Q)]
    )
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(s_pos).alias("n_pos"),
        F.min(s_pos).alias("mn"),
        F.percentile_approx(s_pos, probs, 10_000).alias("qs"),
    ).first()
    n, n_pos = row["n"], row["n_pos"]
    if n == 0 or n_pos == 0:
        return df.where(F.lit(False))
    min_pos, qs = float(row["mn"]), [float(v) for v in row["qs"]]
    target = target_fraction * n

    def kept_est(c: float) -> float:
        return (n_pos / len(qs)) * sum(min(1.0, c * q) for q in qs)

    if n_pos <= target:
        # supremum: cap every positive row (reachable, so this IS the solve)
        c = 1.0 / min_pos
    else:
        lo, hi = 0.0, 1.0 / min_pos  # kept_est(hi) = n_pos ≥ target: bracketed
        for _ in range(80):
            c = (lo + hi) / 2.0
            if kept_est(c) < target:
                lo = c
            else:
                hi = c
        c = (lo + hi) / 2.0
    p = F.least(F.lit(1.0), F.lit(c) * s)
    # uniform in [0,1) from the hash gate's 8 hex digits
    u = F.conv(F.substring(_gate(id_cols, salt), 1, _HEX_DIGITS), 16, 10).cast(
        "double"
    ) / F.lit(float(16**_HEX_DIGITS))
    return df.where(u < p)


def assign_split(
    df: DataFrame,
    id_cols: Sequence[str | Column],
    fractions: dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic dataset splitting: adds ``out_col`` ∈
    ``fractions.keys()`` chosen by the md5 hash gate on the row
    identity — reproducible on any engine/partitioning/retry, sizes
    within binomial noise of the fractions (which must sum to 1).  The
    LAST split listed absorbs the hash-quantization tail, so order the
    dict with the largest split last (train) and the small eval splits
    first.  Pure column expression: no shuffle, no sampling state."""
    if not fractions:
        raise ValueError("fractions must name at least one split")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    names = list(fractions)
    g = _gate(id_cols, salt)
    result = None
    cum = 0.0
    for name in names[:-1]:
        cum += fractions[name]
        clause = g < F.lit(_threshold_hex(min(cum, 1.0)))
        result = (
            F.when(clause, F.lit(name))
            if result is None
            else result.when(clause, F.lit(name))
        )
    last = F.lit(names[-1])
    out = last if result is None else result.otherwise(last)
    return df.withColumn(out_col, out)


def leakage_free_split(
    docs: DataFrame,
    fractions: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    salt: str = "split",
    out_col: str = "split",
    **dedup_kwargs,
) -> DataFrame:
    """Dataset splitting that cannot leak near-duplicates across the
    train/eval boundary: the hash gate keys on the document's
    near-duplicate CLUSTER label (``dedup.duplicate_clusters`` — the
    min-id of its connected component), so every member of a duplicate
    family lands in the SAME split.  Splitting by doc id instead puts a
    near-copy of a training document into validation with probability
    (1 − train_fraction) per dup pair — the classic leakage that
    inflates eval scores.

    Cost at scale = one ``duplicate_clusters`` pass (the same bucketed
    LSH plan as ``near_dedup_clustered``) + one join of the label onto
    the corpus + the pure-expression gate.  If the corpus was already
    clustered (curation ran), pass nothing and reuse: join your stored
    cluster table and call ``assign_split(df, ["cluster"], ...)``
    directly — this wrapper exists for the one-shot form."""
    from bigdataproject_formula1_telemetry_spark.operators.dedup import (
        duplicate_clusters,
    )

    clusters = duplicate_clusters(
        docs, text_col=text_col, id_col=id_col, threshold=threshold,
        **dedup_kwargs,
    ).withColumnRenamed("id", "__split_id")
    joined = docs.join(
        clusters, docs[id_col] == F.col("__split_id"), "left"
    ).drop("__split_id")
    out = assign_split(joined, [F.col("cluster")], fractions, salt, out_col)
    return out.drop("cluster")


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    token_budget: float,
    n_tokens_col: str = "n_tokens",
    id_cols: Sequence[str] = ("doc_id",),
    salt: str = "mixture",
) -> tuple[DataFrame, DataFrame]:
    """Compose a training mixture to a token budget: sample each domain
    at the rate that makes its EXPECTED token mass equal
    ``token_budget × weight`` (the Pile/GPT-3-style fixed-weight domain
    mixing — Gao et al. 2020, Brown et al. 2020; weight SEARCH à la
    DoReMi is out of scope, this executes a given mixture).

    Returns ``(sampled_df, report_df)``.  The report — one row per
    requested domain: ``(domain, weight, target_tokens,
    available_tokens, fraction, shortfall_tokens)`` — is the honest
    ledger: a domain with less data than its target samples at 1.0 and
    shows the shortfall (silently re-normalizing onto other domains
    would change the mixture the caller asked for).  Domains absent from
    ``weights`` are dropped (fraction 0).

    Scale shape: ONE ``groupBy(domain).sum(tokens)`` aggregate (k rows
    to the driver), then a pure stratified hash-gate filter — no second
    scan, no shuffle of the corpus, same determinism contract as every
    sampler here.  Expected-mass sampling (not exact-mass): exact
    token-budget packing needs a per-domain running sum — a global sort
    funnel this module's whole design avoids; realized mass
    concentrates tightly for any corpus where no single document
    dominates its domain."""
    if token_budget <= 0:
        raise ValueError(f"token_budget must be > 0, got {token_budget}")
    if not weights:
        raise ValueError("weights must be non-empty")
    for d, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for domain {d!r}: {w}")
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to > 0")

    avail = {
        r["d"]: float(r["t"] or 0.0)
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.sum(n_tokens_col).alias("t"))
        .collect()
    }
    report_rows = []
    fractions: dict[str, float] = {}
    for d, w in sorted(weights.items()):
        target = token_budget * (w / total_w)
        a = avail.get(d, 0.0)
        frac = 0.0 if a <= 0 else min(1.0, target / a)
        fractions[d] = frac
        report_rows.append(
            (d, w / total_w, target, a, frac, max(0.0, target - a))
        )
    report = df.sparkSession.createDataFrame(
        report_rows,
        "domain string, weight double, target_tokens double, "
        "available_tokens double, fraction double, shortfall_tokens double",
    )
    sampled = stratified_sample(
        df, domain_col, fractions, list(id_cols), default_fraction=0.0,
        salt=salt,
    )
    return sampled, report
