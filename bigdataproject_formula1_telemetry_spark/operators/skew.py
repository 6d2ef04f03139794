"""Skew-mitigation utilities (SURVEY §7 hard part (d)).

AQE's skew-join splitting handles sort-merge joins at runtime; these
cover the cases AQE doesn't: skewed *aggregation* keys (one circuit with
100× the rows) and skewed *broadcast-side* joins where one hot key floods
a single task.

- ``salted_agg`` — two-phase aggregation: group on (key, salt) first
  (spreads a hot key over N tasks), then re-aggregate the partials.
  Caller declares the per-phase aggregates (partial → final), the classic
  combiner decomposition: sum→sum, count→sum, min→min, max→max;
  avg = salted sum / salted count.
- ``salted_join`` — replicate the small side N× with a salt column and
  salt the big side randomly-but-deterministically (hash of row identity
  % N), so one hot join key spreads over N partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, id_cols: Sequence[str]) -> DataFrame:
    """Deterministic salt in [0, n_salts): hash of row identity — stable
    across retries (no rand(), which breaks task re-execution)."""
    return df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in id_cols]), F.lit(n_salts)).cast("int"),
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    n_salts: int = 16,
    id_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs``: name → agg expr over raw rows (phase 1, grouped by
    keys+salt).  ``final_aggs``: name → agg expr over the phase-1 columns
    (grouped by keys).  Example (count + sum + avg)::

        salted_agg(df, ["k"],
                   {"cnt": F.count(F.lit(1)), "s": F.sum("v")},
                   {"cnt": F.sum("cnt"), "s": F.sum("s"),
                    "avg": F.sum("s") / F.sum("cnt")})
    """
    keys = list(keys)
    salted = with_salt(df, n_salts, list(id_cols) if id_cols else df.columns)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[v.alias(k) for k, v in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(*[v.alias(k) for k, v in final_aggs.items()])


#: join types for which the salted decomposition is equivalent to the
#: plain join: the big (salted-once) side drives the output row
#: multiplicity.  right/full outer would emit ``n_salts`` null-extended
#: duplicates for every unmatched small-side key (the small side is
#: exploded n_salts×), so they are rejected.
_SALTED_JOIN_TYPES = frozenset({"inner", "left", "left_outer", "left_semi", "left_anti"})

#: Spark accepts underscore-free and prefix-free aliases for every join
#: type (``JoinType.apply``); normalize the same way so e.g. "leftsemi",
#: "semi", "anti", "leftouter" are accepted, not spuriously rejected.
_JOIN_ALIASES = {
    "leftouter": "left_outer",
    "leftsemi": "left_semi",
    "semi": "left_semi",
    "leftanti": "left_anti",
    "anti": "left_anti",
    "cross": "cross",
    "rightouter": "right_outer",
    "right": "right_outer",
    "fullouter": "full_outer",
    "full": "full_outer",
    "outer": "full_outer",
}


def _normalize_join_type(how: str) -> str:
    flat = how.strip().lower().replace("_", "")
    return _JOIN_ALIASES.get(flat, how.strip().lower())


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side by row hash, explode the
    small side across all salts, join on keys+salt.  Output equals the
    plain join for ``how`` in inner/left/left_semi/left_anti (the salted
    big side keeps one row per input row); other join types are rejected —
    see ``_SALTED_JOIN_TYPES``.  The hot key's rows land in ``n_salts``
    tasks instead of one."""
    how_norm = _normalize_join_type(how)
    if how_norm not in _SALTED_JOIN_TYPES:
        raise ValueError(
            f"salted_join supports {sorted(_SALTED_JOIN_TYPES)} joins only "
            f"(got {how!r}): right/full would duplicate unmatched "
            "small-side keys n_salts times"
        )
    how = how_norm
    on = list(on)
    big_s = with_salt(big, n_salts, big.columns)
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, on + ["__salt"], how).drop("__salt")
