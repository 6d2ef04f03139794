"""Scalar column-expression helpers (SURVEY §2.8 F1-F12).

The reference does these with pandas/sklearn (notably ``MinMaxScaler`` fit
on *literal* physics bounds — F1_web_dashboard_app.py:451-453); here they
are pure column arithmetic that Catalyst constant-folds, so they cost
nothing beyond the projection.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Compound → encoded value map (F1_Data_PreProcessing.ipynb:336-341).
COMPOUND_CODES: dict[str, int] = {
    "SOFT": 1,
    "MEDIUM": 2,
    "HARD": 3,
    "INTERMEDIATE": 4,
    "WET": 5,
}


def minmax_scale(col: Column, lo: float, hi: float) -> Column:
    """F11 — fixed-bounds min-max scaling: ``(x - lo) / (hi - lo)``."""
    return (col - F.lit(float(lo))) / F.lit(float(hi) - float(lo))


def minmax_unscale(col: Column, lo: float, hi: float) -> Column:
    """F11 inverse: ``x * (hi - lo) + lo`` (reference's dummy-row
    inverse_transform, P2-...ipynb:160-164)."""
    return col * F.lit(float(hi) - float(lo)) + F.lit(float(lo))


def encode_compound(col: Column) -> Column:
    """F4 — ``Compound.str.upper().map({...}).fillna(0)``."""
    expr = F.lit(0)
    up = F.upper(col.cast("string"))
    for name, code in COMPOUND_CODES.items():
        expr = F.when(up == name, F.lit(code)).otherwise(expr)
    return expr.cast("long")


def map_lookup(col: Column, mapping: dict, default=None) -> Column:
    """J4 — dict/broadcast lookup as a literal map expression."""
    pairs = []
    for k, v in mapping.items():
        pairs += [F.lit(k), F.lit(v)]
    m = F.create_map(*pairs)
    out = m[col]
    if default is not None:
        out = F.coalesce(out, F.lit(default))
    return out


def threshold_ladder(col: Column, rules: Sequence[tuple[float, str]], default: str) -> Column:
    """F12 — descending threshold → label ladder (coaching advice rules,
    P3-...ipynb:180-185): first matching ``col > threshold`` wins."""
    expr = F.lit(default)
    for threshold, label in reversed(list(rules)):
        expr = F.when(col > F.lit(float(threshold)), F.lit(label)).otherwise(expr)
    return expr
