"""BM25 full-text retrieval over a document corpus — the classical
probabilistic ranking function (Okapi BM25, Robertson et al., TREC-3;
the textbook formulation used by Lucene/Elasticsearch and the standard
"find training docs similar to this benchmark item" audit tool in
LLM-data work, e.g. retrieval-based contamination studies).

Spark-first plan shape (the 100 TB story):

1. The corpus is touched by ONE narrow scan: ``(id, doc_len, term)``
   token rows (lowercase alnum runs — the same normalization as
   ``dedup.shingles``, so retrieval and dedup agree on what a word is).
2. The query set's DISTINCT vocabulary is broadcast and the token rows
   are filtered by a broadcast hash join — everything downstream
   (tf aggregation, df aggregation, scoring, top-k) is proportional to
   the MATCHED subset, never the corpus.  A thousand query terms
   against 100 TB touch only rows containing those terms.
3. Corpus-level constants (N, avgdl) ride as a broadcast one-row frame
   (never collected to the driver); per-term document frequencies are
   at most |vocabulary| rows — broadcast back for scoring.
4. Top-k per query is a window over (query_id) partitions — thousands
   of partitions of ≤ matched-doc size, with a deterministic
   (score DESC, doc_id ASC) tiebreak.

Scoring: the standard BM25 with the Lucene-style non-negative idf,

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    w(t, d)     = tf · (k1 + 1) / (tf + k1 · (1 - b + b · dl/avgdl))
    score(q, d) = Σ_{t ∈ q, distinct} idf(t) · w(t, d)

Repeated query terms count once (classic query-side binarization);
``k1`` saturates term frequency, ``b`` length-normalizes.  Everything
is JVM expressions — no Python UDF anywhere.

No reference-repo counterpart (the reference has no text retrieval);
this is part of the beyond-reference LLM-data-pipeline surface, next
to kNN cosine (`similarity.py`) as the lexical retrieval twin.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bm25_topk", "bm25_scores", "rrf_fuse", "hybrid_topk"]


def _tokens(col: Column) -> Column:
    """Lowercase alnum-run tokenization (``dedup.shingles``'s word
    rule), empties dropped — engine-portable (split on ``[^a-z0-9]+``).

    NULL text coalesces to the EMPTY array (not NULL): under the default
    non-ANSI config ``F.size(NULL)`` is -1, so a NULL token array would
    subtract 1 from the avgdl numerator while the doc still counts in N,
    silently skewing every score.  dl=0 matches the empty-string path."""
    return F.coalesce(
        F.filter(
            F.split(F.lower(col), r"[^a-z0-9]+"), lambda x: x != F.lit("")
        ),
        F.array().cast("array<string>"),
    )


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(query_id, doc_id, score) for every (query, matching doc) pair —
    docs sharing no term with a query produce no row.  See module
    docstring for the plan shape; ``bm25_topk`` adds the ranked cut."""
    base = docs.select(
        F.col(id_col).alias("__id"), _tokens(F.col(text_col)).alias("__toks")
    )
    tok_rows = base.select(
        "__id",
        F.size("__toks").alias("__dl"),
        F.explode("__toks").alias("__term"),
    )
    # corpus constants as a broadcast ONE-ROW frame (never collected):
    # N = doc count, avgdl = Σ dl / N — explicit sum/count division so a
    # SQL oracle divides the identical doubles
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("__n_docs"),
        (
            F.sum(F.size("__toks")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("__avgdl"),
    )

    qterms = (
        queries.select(
            F.col(query_id_col).alias("__qid"),
            F.explode(_tokens(F.col(query_text_col))).alias("__term"),
        )
        .distinct()  # classic query-side binarization: repeated terms count once
    )
    vocab = qterms.select("__term").distinct()

    # the one corpus-proportional step: broadcast vocabulary filter
    matched = tok_rows.join(F.broadcast(vocab), "__term")
    tf = matched.groupBy("__id", "__term").agg(
        F.count(F.lit(1)).cast("double").alias("__tf"),
        F.first("__dl").cast("double").alias("__dl"),
    )
    df_ = tf.groupBy("__term").agg(
        F.countDistinct("__id").cast("double").alias("__df")
    )

    idf = F.log(
        F.lit(1.0)
        + (F.col("__n_docs") - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
    )
    wtd = (F.col("__tf") * F.lit(k1 + 1.0)) / (
        F.col("__tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * (F.col("__dl") / F.col("__avgdl")))
    )
    return (
        tf.join(F.broadcast(df_), "__term")
        .join(F.broadcast(qterms), "__term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("__qid").alias(query_id_col),
            F.col("__id").alias(id_col),
            (idf * wtd).alias("__w"),
        )
        .groupBy(query_id_col, id_col)
        .agg(F.sum("__w").alias("score"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    score_round: int | None = None,
) -> DataFrame:
    """(query_id, doc_id, rank, score): the ``k`` best-scoring docs per
    query, rank 1-based, deterministic (score DESC, doc_id ASC)
    tiebreak.  Queries matching nothing return no rows.

    ``score_round=n`` ranks on the score portably half-up-rounded to
    ``n`` decimals — floor(x·10ⁿ + 0.5)/10ⁿ, identical on the same IEEE
    double in every engine — and returns the ROUNDED score.  Use it when
    ranks must agree across engines: docs with identical term multisets
    (exact duplicates) tie in real arithmetic and split only by ~1e-16
    float-sum order, whose sign differs between engines; rounding
    collapses such ties onto the (score, doc_id) tiebreak."""
    if k < 1:
        raise ValueError(f"bm25_topk: k must be >= 1, got {k}")
    scored = bm25_scores(
        docs, queries, text_col, id_col, query_id_col, query_text_col, k1, b
    )
    if score_round is not None:
        p = float(10**score_round)
        scored = scored.withColumn(
            "score", F.floor(F.col("score") * p + F.lit(0.5)) / F.lit(p)
        )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "score")
    )


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k: int = 60,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    — the standard score-free combiner for heterogeneous retrievers:

        rrf(q, d) = Σ_r 1 / (k + rank_r(q, d))

    over every ranking ``r`` that returned ``d`` for ``q`` (absent docs
    contribute nothing — the paper's convention).  ``k=60`` is the
    published constant; it damps the head so one ranker's rank-1 can't
    drown the other's rank-3.  Rank-based fusion needs no score
    calibration, which is exactly why it wins for lexical⊕semantic
    hybrids whose score scales are incomparable.

    Input frames need (query_id_col, id_col, rank_col); output is
    ``(query_id, doc_id, rrf_score, rank)`` with the fused rank 1-based
    per query, ties broken by ``id_col`` ascending.

    Engine-portability note: each contribution ``1/(k + rank)`` is a
    division of identical small integers → the identical IEEE double
    everywhere; with TWO rankings the fused sum is a single commutative
    addition, so the score is bit-exact across engines/partitionings
    (the q57 ``rrf`` oracle relies on this — no float margin exists).

    100 TB shape: inputs are already top-k cuts (≤ |queries|·k rows per
    ranking); the union + groupBy here never touches the corpus."""
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    if k < 1:
        raise ValueError(f"rrf_fuse: k must be >= 1, got {k}")
    parts = [
        r.select(
            query_id_col,
            id_col,
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))).alias(
                "__c"
            ),
        )
        for r in rankings
    ]
    u = reduce(DataFrame.unionByName, parts)
    scored = u.groupBy(query_id_col, id_col).agg(
        F.sum("__c").alias("rrf_score")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).select(
        query_id_col, id_col, "rrf_score", "rank"
    )


def hybrid_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    fetch_k: int | None = None,
    rrf_k: int = 60,
    dim: int = 256,
    salt: str = "hashemb",
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
) -> DataFrame:
    """Hybrid lexical⊕semantic retrieval: BM25 top-``fetch_k`` and
    hashed-BoW-cosine top-``fetch_k`` (both over the same text), fused
    with :func:`rrf_fuse` and cut to ``k`` — the published two-tower
    recipe (every hybrid search stack: BM25 for exact-term precision,
    embeddings for paraphrase recall, RRF because the score scales are
    incomparable).  ``fetch_k`` defaults to ``max(2k, 20)`` — fuse over
    a deeper pool than you return, so a doc ranked k+1 by both rankers
    can still win.

    Output ``(query_id, doc_id, rrf_score, rank)``, rank ≤ k.

    100 TB shape: BM25 is the module's one-corpus-scan plan; the
    semantic leg is ONE ``hashed_embedding`` Arrow pass over the corpus
    fused with the ``knn_bruteforce_arrow`` matmul kernel (the query
    matrix broadcasts; each Arrow batch emits only its per-query top-k
    — never an interpreted per-row cosine, which A/B-measured 7×
    slower end-to-end at sf0.1); fusion touches only the two
    top-``fetch_k`` cuts.  Zero-norm docs/queries get no semantic vote
    (the kernel omits NULL-cosine rows)."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        embed as EM,
        similarity as SIM,
    )

    if k < 1:
        raise ValueError(f"hybrid_topk: k must be >= 1, got {k}")
    fetch_k = fetch_k if fetch_k is not None else max(2 * k, 20)
    lex = bm25_topk(
        docs, queries, k=fetch_k, text_col=text_col, id_col=id_col,
        query_id_col=query_id_col, query_text_col=query_text_col,
    ).select(query_id_col, id_col, "rank")

    demb = EM.hashed_embedding(
        docs.select(id_col, text_col), text_col=text_col, out_col="__v",
        dim=dim, salt=salt,
    ).select(id_col, "__v")
    qemb = EM.hashed_embedding(
        queries.select(query_id_col, query_text_col),
        text_col=query_text_col, out_col="__v", dim=dim, salt=salt,
    ).select(F.col(query_id_col).alias(id_col), "__v")
    wsem = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    sem = (
        SIM.knn_bruteforce_arrow(
            demb, qemb, k=fetch_k, id_col=id_col, vec_col="__v",
            query_id_col=query_id_col,
        )
        .withColumn("rank", F.row_number().over(wsem))
        .select(
            query_id_col, F.col("neighbor_id").alias(id_col), "rank"
        )
    )
    fused = rrf_fuse(
        [lex, sem], k=rrf_k, query_id_col=query_id_col, id_col=id_col
    )
    return fused.where(F.col("rank") <= k)
