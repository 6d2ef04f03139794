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
    is stable under retries/repartitioning.  Sizing ``c`` needs one
    aggregate over the score distribution; the per-row gate is then a
    pure column expression on the main scan.  Solved iteratively
    because of the ``min(1, ·)`` cap (rows already kept with certainty
    can't absorb more mass): a few driver-side bisection rounds over a
    second tiny aggregate.  Negative/NULL scores keep probability 0.
    """
    if not 0.0 < target_fraction <= 1.0:
        raise ValueError(f"target_fraction must be in (0,1], got {target_fraction}")
    s = F.when(
        F.col(score_col).isNotNull() & (F.col(score_col) > 0),
        F.pow(F.col(score_col).cast("double"), F.lit(float(gamma))),
    ).otherwise(F.lit(0.0))
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.sum(s).alias("sw"), F.max(s).alias("mx")
    ).first()
    n, sw, mx = row["n"], float(row["sw"] or 0.0), float(row["mx"] or 0.0)
    if n == 0 or sw <= 0:
        return df.where(F.lit(False))
    target = target_fraction * n
    # bisection on c: E[kept](c) = Σ min(1, c·s_i) is monotone in c
    lo, hi = 0.0, (n / sw) * 10.0 if mx > 0 else 1.0
    for _ in range(20):
        c = (lo + hi) / 2.0
        kept = df.agg(
            F.sum(F.least(F.lit(1.0), F.lit(c) * s)).alias("k")
        ).first()["k"]
        if kept is None:
            break
        if kept < target:
            lo = c
        else:
            hi = c
        if abs(kept - target) <= max(1.0, 0.001 * target):
            break
    c = (lo + hi) / 2.0
    p = F.least(F.lit(1.0), F.lit(c) * s)
    # uniform in [0,1) from the hash gate's 8 hex digits
    u = F.conv(F.substring(_gate(id_cols, salt), 1, _HEX_DIGITS), 16, 10).cast(
        "double"
    ) / F.lit(float(16**_HEX_DIGITS))
    return df.where(u < p)
