"""Unigram language-model training and per-document perplexity scoring.

CCNet-style corpus quality filtering (Wenzek et al., "CCNet: Extracting
High Quality Monolingual Datasets from Web Crawl Data", LREC 2020 —
public method): train a language model over the corpus (there KenLM
5-gram; here an add-alpha-smoothed unigram model, derivable without any
external model artifact), score every document's perplexity under it,
and drop the high-perplexity tail.  The reference repo has no LM
component — this is part of the training-data extension suite.

Scale design (100 TB):

- **Training** is one word-count — explode + hash-agg with map-side
  combine, the canonical linearly-scaling Spark job.  ``vocab_size``
  caps the model with a deterministic sorted-limit (count desc, token
  asc) so the trained artifact is broadcast-small *by construction*;
  out-of-vocab tokens take the smoothed unknown mass.
- **Scoring** has two A/B-equivalent forms (same pattern as the minhash
  and kNN kernels):

  * ``doc_perplexity`` — pure-expression form: explode tokens, LEFT
    broadcast-join the LM (never a shuffle of the corpus side), partial
    hash-agg back to one row per document — the shuffle carries
    ~n_docs rows, not n_tokens.  Fully DuckDB-twinnable (the q26 ppl
    column's oracle recomputes the whole model in SQL).
  * ``doc_perplexity_arrow`` — zero-shuffle serving form: the collected
    LM dict (bounded by ``vocab_size`` contract) is closed over a
    ``mapInPandas`` kernel; one narrow Arrow pass, no explode, no join.
"""

from __future__ import annotations

import math
import re
from collections.abc import Iterable, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.operators.text import tokens

__all__ = [
    "lm_tokens",
    "token_counts",
    "unigram_lm",
    "collect_lm",
    "doc_perplexity",
    "doc_perplexity_arrow",
    "bigram_lm",
    "collect_bigram_lm",
    "doc_order_perplexity_arrow",
    "ppl_buckets",
]


#: Java regex \s — ASCII whitespace only (Python's \s is wider).
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def lm_tokens(text: Column) -> Column:
    """LM tokenization: lowercase + whitespace split (matches the
    lang-ID tokenizer so one token stream serves both)."""
    return tokens(F.lower(text))


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus token frequencies ``(tok, c)`` — one explode + hash agg."""
    return (
        docs.select(F.explode(lm_tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def unigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    alpha: float = 1.0,
    vocab_size: int | None = None,
) -> DataFrame:
    """Train an add-``alpha``-smoothed unigram LM over ``docs``.

    Returns ``(tok, logp, unk_logp)`` with ``unk_logp`` (the smoothed
    mass for any out-of-vocab token) repeated on every row so the model
    frame is self-contained:

    - ``logp(tok) = ln((c + alpha) / (N + alpha * (V + 1)))``
    - ``unk_logp  = ln(alpha / (N + alpha * (V + 1)))``

    where ``N`` / ``V`` are total count and distinct-token count of the
    *kept* vocabulary.  ``vocab_size`` keeps the top-``V`` tokens by
    count (ties broken by token string — deterministic); at corpus scale
    always set it, so the model stays broadcast-small and the long tail
    flows through the unknown mass.
    """
    counts = token_counts(docs, text_col)
    if vocab_size is not None:
        # distributed TakeOrdered (same fix as bigram_lm's cap): a
        # row_number over a global Window funnels the whole distinct
        # vocabulary through one sort task
        counts = counts.orderBy(
            F.col("c").desc(), F.col("tok").asc()
        ).limit(vocab_size)
    tot = counts.agg(
        F.sum("c").cast("double").alias("_n"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    )
    denom = F.col("_n") + F.lit(alpha) * (F.col("_v") + F.lit(1.0))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "tok",
            F.log((F.col("c").cast("double") + F.lit(alpha)) / denom).alias("logp"),
            F.log(F.lit(alpha) / denom).alias("unk_logp"),
        )
    )


def collect_lm(lm: DataFrame) -> tuple[dict[str, float], float]:
    """Materialize a trained LM for the Arrow serving form.

    Bounded by the ``vocab_size`` training contract — the model is
    broadcast-small by construction (same contract class as the kNN
    query-set collects, ``similarity.py``)."""
    rows = lm.collect()
    if not rows:
        return {}, 0.0
    return {r["tok"]: r["logp"] for r in rows}, rows[0]["unk_logp"]


def doc_perplexity(
    docs: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Per-document perplexity under ``lm`` — expression form.

    ``ppl = exp(-mean(logp(tok)))`` over the document's tokens.
    Token-less documents yield NO output row (explode drops them) — both
    forms share this contract; left-join the result back onto the corpus
    when empty docs must be retained.
    Plan: explode → LEFT **broadcast** join on the
    LM (corpus side never shuffles for the join) → hash agg back to one
    row per document (partial aggregation means the exchange carries
    ~n_docs rows).  Output: ``id_cols + [n_tokens, ppl]``.
    """
    ids = [F.col(c) for c in id_cols]
    toks = docs.select(*ids, F.explode(lm_tokens(F.col(text_col))).alias("tok"))
    # the unknown mass must ride as a SCALAR (1-row broadcast aggregate):
    # on a left-join miss every lm-side column is NULL, so coalescing
    # with lm.unk_logp directly would silently drop OOV tokens from the
    # sum (pinned by test_vocab_cap_and_oov_mass)
    unk = F.broadcast(lm.agg(F.min("unk_logp").alias("_unk_logp")))
    scored = (
        toks.join(F.broadcast(lm.select("tok", "logp")), "tok", "left")
        .crossJoin(unk)
        .select(*ids, F.coalesce(F.col("logp"), F.col("_unk_logp")).alias("lp"))
    )
    return (
        scored.groupBy(*ids)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lp").alias("_lp"),
        )
        .select(
            *ids,
            "n_tokens",
            F.exp(-F.col("_lp") / F.col("n_tokens")).alias("ppl"),
        )
    )


def doc_perplexity_arrow(
    docs: DataFrame,
    logp: dict[str, float],
    unk_logp: float,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Per-document perplexity — zero-shuffle Arrow serving form.

    Same semantics as :func:`doc_perplexity` (A/B-asserted in
    ``tests/test_lm.py``): the collected LM dict is closed over a
    ``mapInPandas`` kernel, so the whole score is ONE narrow map stage —
    no explode, no join, no exchange.  This is the 100 TB scoring path:
    the model rides to executors once per task via the closure
    (``vocab_size``-bounded by contract) and each Arrow batch is scored
    with a vectorized dict lookup.  Output schema matches the expression
    form; ``id_cols`` must be string/integral columns (passed through
    verbatim)."""
    import pyspark.sql.types as SQT

    id_fields = [docs.schema[c] for c in id_cols]
    out_schema = SQT.StructType(
        [
            *id_fields,
            SQT.StructField("n_tokens", SQT.LongType(), False),
            SQT.StructField("ppl", SQT.DoubleType(), True),
        ]
    )
    id_list = list(id_cols)

    def score(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            # Java-regex-faithful split: \s in Spark's split() is ASCII
            # [ \t\n\x0B\f\r], while Python str.split() also breaks on
            # Unicode whitespace — use the exact Java class so both
            # forms tokenize identically on any corpus.
            toks_per_doc = [
                [t for t in _JAVA_WS.split(s.strip())] if s.strip() else []
                for s in pdf[text_col].fillna("").str.lower().tolist()
            ]
            keep, n_tokens, ppl = [], [], []
            for i, ts in enumerate(toks_per_doc):
                n = len(ts)
                if n == 0:  # token-less docs: no row (matches explode)
                    continue
                lp = 0.0
                for t in ts:
                    lp += logp.get(t, unk_logp)
                keep.append(i)
                n_tokens.append(n)
                ppl.append(math.exp(-lp / n))
            out = pdf[id_list].iloc[keep].copy()
            out["n_tokens"] = pd.array(n_tokens, dtype="int64")
            out["ppl"] = pd.array(ppl, dtype="float64")
            yield out

    cols = list(dict.fromkeys([*id_list, text_col]))
    return docs.select(*cols).mapInPandas(score, schema=out_schema)


def bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    max_bigrams: int | None = None,
) -> DataFrame:
    """Train a stupid-backoff bigram model (Brants et al., "Large
    Language Models in Machine Translation", EMNLP 2007 — the published
    web-scale n-gram recipe: unnormalized scores, count ratios for seen
    n-grams, a fixed-penalty backoff for unseen ones — chosen exactly
    because it needs NO discount normalization pass over the corpus).

    Returns ``(v, w, log_cond)`` with ``log_cond = ln(c(v,w) / c(v·))``
    — the conditional score of ``w`` following ``v``; unseen pairs back
    off to ``backoff · p_unigram(w)`` at scoring time
    (:func:`doc_order_perplexity_arrow`).  The unigram backoff is what
    makes the ORDER signal usable as a quality gate: a document's
    token BAG fixes its unigram perplexity, but scrambling the words
    destroys the seen-bigram hits — an order-sensitivity the unigram
    gate provably cannot express (pinned in tests).

    Plan: pairs from ``arrays_zip`` of two shifted slices (the
    ``shingles`` pattern — no per-index O(n²) slicing), one hash agg to
    ``c(v,w)``, one to the EXACT pre-cap context totals ``c(v·)``, then
    an optional deterministic sorted-limit cap (count desc, pair asc) so
    the model is broadcast-small by construction — the long bigram tail
    flows through the backoff, same shape as ``vocab_size`` above."""
    toks = lm_tokens(F.col(text_col))
    cnt = F.size(toks) - F.lit(1)
    pair = F.arrays_zip(
        F.slice(toks, 1, F.greatest(cnt, F.lit(0))),
        F.slice(toks, 2, F.greatest(cnt, F.lit(0))),
    )
    pairs = docs.select(F.explode(pair).alias("p")).select(
        F.col("p")["0"].alias("v"), F.col("p")["1"].alias("w")
    )
    big = pairs.groupBy("v", "w").agg(F.count(F.lit(1)).alias("c_vw"))
    ctx = big.groupBy("v").agg(F.sum("c_vw").alias("c_v"))
    if max_bigrams is not None:
        # distributed TakeOrdered, NOT row_number over a global Window:
        # the windowed form funnels the ENTIRE distinct-bigram table
        # into one unsplittable sort task — exactly the web-scale input
        # this recipe targets.  orderBy().limit() plans as per-partition
        # top-k + a driver merge of k-sized heads, same deterministic
        # result (count desc, pair asc tiebreak).
        big = big.orderBy(
            F.col("c_vw").desc(), F.col("v").asc(), F.col("w").asc()
        ).limit(max_bigrams)
    # join direction: ctx is vocab-sized (unbounded at corpus scale);
    # the CAPPED bigram side is the broadcast-small one
    joined = (
        ctx.join(F.broadcast(big), "v")
        if max_bigrams is not None
        else big.join(ctx, "v")
    )
    return joined.select(
        "v",
        "w",
        F.log(F.col("c_vw").cast("double") / F.col("c_v")).alias("log_cond"),
    )


def collect_bigram_lm(model: DataFrame) -> dict[tuple[str, str], float]:
    """Materialize a trained bigram model for the Arrow serving form —
    bounded by the ``max_bigrams`` training contract (same
    broadcast-small class as :func:`collect_lm`)."""
    return {(r["v"], r["w"]): r["log_cond"] for r in model.collect()}


def doc_order_perplexity_arrow(
    docs: DataFrame,
    bigram_logp: dict[tuple[str, str], float],
    logp: dict[str, float],
    unk_logp: float,
    backoff: float = 0.4,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Per-document ORDER-sensitive perplexity under the stupid-backoff
    bigram model — zero-shuffle Arrow serving form (the only form: the
    per-position backoff branch is data-dependent, not a join).

    ``ppl = exp(-mean(score))`` where the first token scores by the
    unigram and token ``w`` after ``v`` scores ``log_cond(v, w)`` when
    the pair is in the model, else ``ln(backoff) + logp_unigram(w)``
    (Brants et al.'s fixed 0.4 penalty).  Scores are unnormalized by
    design, so compare ppl values only under the SAME model.  Output
    schema and empty-doc contract match :func:`doc_perplexity_arrow`."""
    import pyspark.sql.types as SQT

    id_fields = [docs.schema[c] for c in id_cols]
    out_schema = SQT.StructType(
        [
            *id_fields,
            SQT.StructField("n_tokens", SQT.LongType(), False),
            SQT.StructField("ppl", SQT.DoubleType(), True),
        ]
    )
    id_list = list(id_cols)
    log_backoff = math.log(backoff)

    def score(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            toks_per_doc = [
                [t for t in _JAVA_WS.split(s.strip())] if s.strip() else []
                for s in pdf[text_col].fillna("").str.lower().tolist()
            ]
            keep, n_tokens, ppl = [], [], []
            for i, ts in enumerate(toks_per_doc):
                n = len(ts)
                if n == 0:
                    continue
                lp = logp.get(ts[0], unk_logp)
                for v, w in zip(ts, ts[1:]):
                    cond = bigram_logp.get((v, w))
                    if cond is not None:
                        lp += cond
                    else:
                        lp += log_backoff + logp.get(w, unk_logp)
                keep.append(i)
                n_tokens.append(n)
                ppl.append(math.exp(-lp / n))
            out = pdf[id_list].iloc[keep].copy()
            out["n_tokens"] = pd.array(n_tokens, dtype="int64")
            out["ppl"] = pd.array(ppl, dtype="float64")
            yield out

    cols = list(dict.fromkeys([*id_list, text_col]))
    return docs.select(*cols).mapInPandas(score, schema=out_schema)


def ppl_buckets(
    scored: DataFrame,
    ppl_col: str = "ppl",
    lang_col: str | None = "lang",
    out_col: str = "ppl_bucket",
    accuracy: int = 10_000,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, §4.4 —
    public recipe): split each language's documents into ``head`` /
    ``middle`` / ``tail`` thirds by LM perplexity, head = LOWEST ppl
    (closest to the reference model).  CCNet releases these buckets
    instead of hard-dropping — downstream consumers pick their own
    quality/recall trade-off, which is why this is a COLUMN, not a
    filter (compose ``where(ppl_bucket != 'tail')`` for the common
    gate).

    Scale shape: per-language tercile thresholds come from ONE
    ``percentile_approx`` sketch aggregate (k language rows out — never
    a sort, never a window over the corpus), broadcast-joined back, and
    the bucket label is a pure CASE expression.  ``lang_col=None``
    buckets the whole corpus as one population.  NULL perplexities
    (token-less docs) and languages with no threshold row get a NULL
    bucket — absent, not misfiled."""
    spark_cols = scored.columns
    if out_col in spark_cols:
        raise ValueError(f"output column {out_col!r} already exists")
    group = [lang_col] if lang_col else []
    th = (
        scored.where(F.col(ppl_col).isNotNull())
        .groupBy(*group)
        .agg(
            F.percentile_approx(
                ppl_col, [1.0 / 3.0, 2.0 / 3.0], accuracy
            ).alias("__th")
        )
    )
    if lang_col:
        # null-safe on the language key: a NULL-lang population is still
        # a population (plain equi-join would orphan it)
        joined = scored.join(
            F.broadcast(th.withColumnRenamed(lang_col, "__lang")),
            F.col(lang_col).eqNullSafe(F.col("__lang")),
            "left",
        ).drop("__lang")
    else:
        joined = scored.crossJoin(F.broadcast(th))
    return joined.withColumn(
        out_col,
        F.when(
            F.col(ppl_col).isNull() | F.col("__th").isNull(),
            F.lit(None).cast("string"),
        )
        .when(F.col(ppl_col) <= F.col("__th")[0], F.lit("head"))
        .when(F.col(ppl_col) <= F.col("__th")[1], F.lit("middle"))
        .otherwise(F.lit("tail")),
    ).drop("__th")
