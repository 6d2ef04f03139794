"""Text analysis for training-data pipelines (north-star extension):
token counting, quality scoring, language-ID heuristic, fingerprinting.

Everything is JVM-side column expressions (regex + string intrinsics) so
these run inside whole-stage codegen over arbitrarily large corpora; no
Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword marker sets for the n-gram/stopword heuristic
#: language-ID (public common-word lists).
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "est"],
    "de": ["der", "die", "das", "und", "ist"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization → non-empty tokens."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish sub-token estimate: count word chunks, digits runs, and
    punctuation marks separately (a cheap public proxy for tokenizer
    counts — one regex pass, no vocab)."""
    pieces = F.filter(
        F.split(F.lower(text), r"([^a-z0-9]+)"), lambda t: t != F.lit("")
    )
    # ~4 chars per sub-token within a word chunk, at least 1 per chunk.
    return F.aggregate(
        pieces,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.greatest(F.lit(1).cast("long"), F.ceil(F.length(w) / 4).cast("long")),
    )


#: punctuation class kept deliberately simple & regex-dialect-portable
PUNCT_CLASS = "[^.,!?;:]"


def punct_ratio(text: Column) -> Column:
    """Punctuation density: punctuation chars / total chars."""
    n = F.length(text)
    p = F.length(F.regexp_replace(text, PUNCT_CLASS, ""))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = F.transform(tokens(F.lower(text)), lambda t: t)
    markers = F.array(*[F.lit(m) for m in _LANG_MARKERS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
    total = F.size(toks)
    return F.when(total > 0, hits.cast("double") / total.cast("double")).otherwise(
        F.lit(0.0)
    )


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: length band + low punctuation
    density + stopword presence (the usual cheap pre-filter before
    model-based quality scoring)."""
    n_tok = token_count(text).cast("double")
    len_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    stop_score = F.least(stopword_ratio(text) * 10.0, F.lit(1.0))
    return (len_score + punct_score + stop_score) / F.lit(3.0)


def lang_id(text: Column) -> Column:
    """Stopword-marker language ID: score each candidate language by marker
    hits per token; highest wins, 'und' (undetermined) when no marker hits.
    Deterministic tie-break by language code order."""
    toks = tokens(F.lower(text))
    scores = []
    for code in sorted(_LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in _LANG_MARKERS[code]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
        scores.append(F.struct(hits.alias("hits"), F.lit(code).alias("code")))
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    s["hits"].alias("hits"),
                    # invert code ordering so max prefers the alphabetically
                    # first code on tied hits
                    F.lit(-i).alias("prio"),
                    s["code"].alias("code"),
                )
                for i, s in enumerate(scores)
            ]
        )
    )
    return F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: xxhash64 of the normalized token stream
    (lowercase, punctuation stripped, single-space joined) — the cheap
    rolling-hash-style identity for near-exact matching."""
    norm = F.array_join(
        F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != F.lit("")),
        " ",
    )
    return F.xxhash64(norm)
