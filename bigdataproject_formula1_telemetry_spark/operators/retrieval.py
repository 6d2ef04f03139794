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

__all__ = [
    "bm25_topk",
    "bm25_scores",
    "bm25_scores_weighted",
    "rm3_expand",
    "bm25_topk_rm3",
    "rrf_fuse",
    "hybrid_topk",
    "hybrid_topk_indexed",
    "mmr_rerank",
    "retrieval_metrics",
]


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
    docstring for the plan shape; ``bm25_topk`` adds the ranked cut.

    Classic query-side binarization (repeated terms count once, unit
    weight) — the weight-1.0 case of :func:`bm25_scores_weighted`."""
    qterms = (
        queries.select(
            F.col(query_id_col).alias(query_id_col),
            F.explode(_tokens(F.col(query_text_col))).alias("term"),
        )
        .distinct()  # classic query-side binarization: repeated terms count once
        .withColumn("weight", F.lit(1.0))
    )
    return bm25_scores_weighted(
        docs, qterms, text_col=text_col, id_col=id_col,
        query_id_col=query_id_col, k1=k1, b=b,
    )


def bm25_scores_weighted(
    docs: DataFrame,
    query_terms: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    term_col: str = "term",
    weight_col: str = "weight",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Weighted-query BM25: ``query_terms`` is a (query_id, term,
    weight) frame — the query-model form every PRF/expansion recipe
    produces (:func:`rm3_expand`) — and

        score(q, d) = Σ_t w_q(t) · idf(t) · sat(t, d)

    i.e. each term's classic BM25 contribution scaled by its query
    weight.  Unit weights reproduce :func:`bm25_scores` exactly.  Plan
    shape is the module-docstring one: ONE narrow corpus token scan,
    broadcast vocabulary filter, everything downstream proportional to
    the matched subset."""
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

    qterms = query_terms.select(
        F.col(query_id_col).alias("__qid"),
        F.col(term_col).alias("__term"),
        F.col(weight_col).cast("double").alias("__qw"),
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
            (F.col("__qw") * idf * wtd).alias("__w"),
        )
        .groupBy(query_id_col, id_col)
        .agg(F.sum("__w").alias("score"))
    )


def rm3_expand(
    docs: DataFrame,
    queries: DataFrame,
    fb_docs: int = 10,
    fb_terms: int = 10,
    orig_weight: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    fb_score_round: int | None = None,
) -> DataFrame:
    """RM3 pseudo-relevance-feedback query expansion (Lavrenko & Croft,
    SIGIR 2001 relevance models; the "RM3" interpolation is the
    Anserini/Lucene-standard variant): retrieve top-``fb_docs`` per
    query with BM25, estimate the relevance model

        P(t|R) ∝ Σ_{d ∈ fb} P(t|d) · P(d|q),
        P(t|d) = tf(t,d)/|d|,  P(d|q) = score(d)/Σ score(d'),

    keep the ``fb_terms`` heaviest terms (renormalized), and
    interpolate with the original (uniform) query model:

        w(t) = orig_weight · P(t|q) + (1 − orig_weight) · P'(t|R).

    Returns a (query_id, term, weight) frame for
    :func:`bm25_scores_weighted` / :func:`bm25_topk_rm3`.  Weights sum
    to 1 per query (when every original term survived tokenization);
    a query with NO matching feedback docs keeps its original model
    scaled by ``orig_weight`` — a pure rescale, rank-neutral.

    Determinism: the fb_terms cut ranks (weight DESC, term ASC).
    ``fb_score_round`` applies the portable half-up rounding to the
    FEEDBACK retrieval's ranking (and to the scores the relevance model
    normalizes), so the fb_docs cut is engine-stable — the ``bm25_topk``
    ``score_round`` pattern; the fb_terms cut itself ranks raw relevance-
    model weights, whose adjacent-gap margin is data-probed (SCALING).

    100 TB shape: two corpus-narrow passes — the BM25 retrieval (its
    own broadcast-vocabulary scan) and ONE token re-scan narrowed by a
    broadcast semi-join on the |queries|·fb_docs feedback ids; the
    relevance-model arithmetic happens on the feedback subset only."""
    if fb_docs < 1 or fb_terms < 1:
        raise ValueError(
            f"rm3_expand: fb_docs/fb_terms must be >= 1, got {fb_docs}/{fb_terms}"
        )
    if not (0.0 <= orig_weight <= 1.0):
        raise ValueError(
            f"rm3_expand: orig_weight must be in [0, 1], got {orig_weight}"
        )
    top = bm25_topk(
        docs, queries, k=fb_docs, text_col=text_col, id_col=id_col,
        query_id_col=query_id_col, query_text_col=query_text_col,
        k1=k1, b=b, score_round=fb_score_round,
    ).select(query_id_col, id_col, "score")

    # P(d|q): normalize retrieval scores per query (all > 0 — a matched
    # BM25 score is a sum of positive idf·sat terms)
    wq = Window.partitionBy(query_id_col)
    pd_q = top.withColumn(
        "__pd", F.col("score") / F.sum("score").over(wq)
    ).select(query_id_col, id_col, "__pd")

    # ONE token re-scan of the feedback docs only (broadcast semi-join
    # on |queries|·fb_docs ids), then P(t|d) = tf/dl over ALL their terms
    fb_ids = top.select(id_col).distinct()
    fb_toks = (
        docs.select(id_col, _tokens(F.col(text_col)).alias("__toks"))
        .join(F.broadcast(fb_ids), id_col, "left_semi")
        .select(
            id_col,
            F.size("__toks").cast("double").alias("__dl"),
            F.explode("__toks").alias("term"),
        )
        .where(F.col("__dl") > 0)
        .groupBy(id_col, "term")
        .agg(
            (F.count(F.lit(1)).cast("double") / F.first("__dl")).alias("__ptd")
        )
    )
    rm = (
        fb_toks.join(pd_q, id_col)
        .groupBy(query_id_col, "term")
        .agg(F.sum(F.col("__ptd") * F.col("__pd")).alias("__rm"))
    )
    if fb_score_round is not None:
        # the fb_terms cut ranks these float sums; round them portably
        # (quantum 10^-(fb_score_round+3): 1e-9 at the standard 6 — far
        # below any meaningful relevance-model distinction, ~1e8 above
        # float-sum drift) so structurally-tied terms tie EXACTLY in
        # every engine and split on the term tiebreak; probed margins in
        # tools/probe_rm3_margins.py (an sf0.01 rank-5/6 exact tie is
        # what motivated this — two terms sharing identical summand
        # multisets tie only while both engines associate their sums
        # identically, which partitioning does not guarantee)
        pw = float(10 ** (fb_score_round + 3))
        rm = rm.withColumn(
            "__rm", F.floor(F.col("__rm") * pw + F.lit(0.5)) / F.lit(pw)
        )
    wcut = Window.partitionBy(query_id_col).orderBy(
        F.col("__rm").desc(), F.col("term").asc()
    )
    rm_top = (
        rm.withColumn("__rn", F.row_number().over(wcut))
        .where(F.col("__rn") <= fb_terms)
        .withColumn("__prm", F.col("__rm") / F.sum("__rm").over(wq))
        .select(query_id_col, "term", "__prm")
    )

    # original query model: uniform over the distinct tokenized terms
    qterms = queries.select(
        F.col(query_id_col).alias(query_id_col),
        F.explode(_tokens(F.col(query_text_col))).alias("term"),
    ).distinct()
    pq = qterms.withColumn(
        "__pq", F.lit(1.0) / F.count(F.lit(1)).over(wq)
    )
    lam = float(orig_weight)
    return (
        pq.join(rm_top, [query_id_col, "term"], "full_outer")
        .select(
            query_id_col,
            "term",
            (
                F.lit(lam) * F.coalesce(F.col("__pq"), F.lit(0.0))
                + F.lit(1.0 - lam) * F.coalesce(F.col("__prm"), F.lit(0.0))
            ).alias("weight"),
        )
        # a zero-weight term scores nothing but would still MATCH docs
        # (phantom score-0 rows at lam extremes) — drop it outright
        .where(F.col("weight") > 0)
    )


def bm25_topk_rm3(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    fb_docs: int = 10,
    fb_terms: int = 10,
    orig_weight: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    score_round: int | None = None,
) -> DataFrame:
    """BM25 with RM3 expansion, end to end: expand each query with
    :func:`rm3_expand`, score the expanded weighted query with
    :func:`bm25_scores_weighted`, return the ranked top-``k`` cut
    ``(query_id, doc_id, rank, score)`` with the (score DESC, id ASC)
    tiebreak.  The classic recall lever: a document sharing NO term
    with the raw query becomes retrievable when it shares the feedback
    neighborhood's vocabulary.

    ``score_round=n`` makes BOTH ranking decisions engine-portable (the
    ``bm25_topk`` pattern): the feedback retrieval ranks — and the
    relevance model normalizes — half-up-rounded scores, and the final
    cut ranks the rounded expanded score (returned rounded).  The
    fb_terms cut ranks raw relevance-model weights; its adjacent-gap
    margin is data-probed (SCALING r12)."""
    if k < 1:
        raise ValueError(f"bm25_topk_rm3: k must be >= 1, got {k}")
    expanded = rm3_expand(
        docs, queries, fb_docs=fb_docs, fb_terms=fb_terms,
        orig_weight=orig_weight, text_col=text_col, id_col=id_col,
        query_id_col=query_id_col, query_text_col=query_text_col,
        k1=k1, b=b, fb_score_round=score_round,
    )
    scored = bm25_scores_weighted(
        docs, expanded, text_col=text_col, id_col=id_col,
        query_id_col=query_id_col, k1=k1, b=b,
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
    score_round: int | None = None,
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

    ``score_round`` plumbs the ``bm25_topk`` portable rounding into the
    LEXICAL leg's fetch_k cut.  Set it whenever duplicate-heavy corpora
    meet cross-run/rank-stability requirements: with unrounded float
    sums, identical-term-multiset families tie only up to float-sum
    association order, which varies with partition layout — the 500k
    tie-saturated sweep caught the indexed hybrid returning different
    family members per RUN before this existed (SCALING r12).  The
    semantic leg needs no rounding: identical vectors produce
    bit-identical matmul cosines and split on the id tiebreak.

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
        score_round=score_round,
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


def mmr_rerank(
    candidates: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    lam: float = 0.5,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "score",
    vec_col: str = "embedding",
    score_round: int | None = None,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998) — the classical diversity-aware selection over a
    relevance-ranked candidate pool:

        MMR(d) = λ·rel(d) − (1−λ)·max_{s ∈ S} cos(d, s)

    picked greedily: each step selects the candidate maximizing MMR
    against the already-selected set ``S`` (empty-set redundancy is 0,
    the paper's convention, so step 1 is the pure-relevance argmax).
    ``λ=1`` reproduces the input ranking; ``λ=0`` is pure
    farthest-point diversity.  The standard tool when the top-k of a
    retriever is REDUNDANT (near-duplicate training docs all matching
    a benchmark item; dedup-audit panels want distinct evidence, not
    five copies).

    Inputs: ``candidates`` (one row per (query, doc): query_id_col,
    id_col, score_col — e.g. a ``bm25_topk``/``hybrid_topk`` top-fetch_k
    cut), ``vectors`` (id_col, vec_col) supplying the similarity
    embedding.  ``score_col`` should be on a scale COMPARABLE to cosine
    ([-1, 1]) for λ to trade meaningfully — raw BM25 scores (unbounded)
    drown the redundancy term; normalize per query first (e.g. divide
    by the pool max, the ``pipelines.contamination_report`` recipe).  Candidates with no vector row (or a zero-norm/NULL
    vector) participate with cosine 0 to everything — they can still
    win on relevance, matching ``hashed_embedding``'s zero-vector
    degradation; a NULL relevance scores as 0.  Output
    ``(query_id, doc_id, mmr_score, rank)``, rank 1-based in pick
    order, ≤ k rows per query.

    Determinism: within each step, ties break by ``id_col`` ascending
    (rows are sorted by id before the argmax, which takes the FIRST
    maximum).  ``score_round=n`` applies the portable half-up rounding
    floor(x·10ⁿ + 0.5)/10ⁿ to every step's MMR values BEFORE the
    argmax (and returns the rounded score) — near-ties from float-sum
    order then collapse onto the id tiebreak identically in any
    re-implementation (the ``bm25_topk`` cross-engine pattern).

    100 TB shape: the candidate pool is a top-fetch_k cut (|queries| ×
    fetch_k rows) — its DISTINCT ids broadcast into a semi-join that
    narrows the ONE pass over the corpus-scale ``vectors`` table to
    candidate rows only; the greedy loop runs per query group inside
    ``applyInPandas`` on ≤ fetch_k rows (a fetch_k×fetch_k cosine
    matrix per query, never corpus-side pairs)."""
    import pyspark.sql.types as SQT

    if k < 1:
        raise ValueError(f"mmr_rerank: k must be >= 1, got {k}")
    if not (0.0 <= lam <= 1.0):
        raise ValueError(f"mmr_rerank: lam must be in [0, 1], got {lam}")
    cand_ids = candidates.select(id_col).distinct()
    vecs = vectors.select(id_col, vec_col).join(
        F.broadcast(cand_ids), id_col, "left_semi"
    )
    pool = candidates.select(query_id_col, id_col, score_col).join(
        vecs, id_col, "left"
    )
    out_schema = SQT.StructType(
        [
            pool.schema[query_id_col],
            pool.schema[id_col],
            SQT.StructField("mmr_score", SQT.DoubleType()),
            SQT.StructField("rank", SQT.IntegerType()),
        ]
    )
    p = float(10**score_round) if score_round is not None else None

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        n = len(pdf)
        rel = np.nan_to_num(
            pdf[score_col].to_numpy(dtype=np.float64), nan=0.0
        )
        vec_list = pdf[vec_col].tolist()
        dim = max(
            (len(v) for v in vec_list if v is not None and len(v)), default=1
        )
        V = np.zeros((n, dim), dtype=np.float64)
        for i, v in enumerate(vec_list):
            if v is not None and len(v):
                V[i, : len(v)] = np.asarray(v, dtype=np.float64)
        nrm = np.linalg.norm(V, axis=1)
        nz = nrm > 0
        Vn = np.zeros_like(V)
        Vn[nz] = V[nz] / nrm[nz, None]
        max_sim = None  # true max over S (can be NEGATIVE); empty S -> 0
        alive = np.ones(n, dtype=bool)
        picks, scores = [], []
        for _ in range(min(k, n)):
            red = np.zeros(n) if max_sim is None else max_sim
            mmr = lam * rel - (1.0 - lam) * red
            if p is not None:
                mmr = np.floor(mmr * p + 0.5) / p
            masked = np.where(alive, mmr, -np.inf)
            pick = int(np.argmax(masked))  # first max → lowest id wins ties
            picks.append(pick)
            scores.append(float(masked[pick]))
            alive[pick] = False
            sims = Vn @ Vn[pick]
            max_sim = sims if max_sim is None else np.maximum(max_sim, sims)
        return pd.DataFrame(
            {
                query_id_col: pdf[query_id_col].iloc[picks].to_numpy(),
                id_col: pdf[id_col].iloc[picks].to_numpy(),
                "mmr_score": scores,
                "rank": np.arange(1, len(picks) + 1, dtype=np.int32),
            }
        )

    return pool.groupBy(query_id_col).applyInPandas(_greedy, out_schema)


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query IR evaluation over a ranked result frame against graded
    judgments — the trec_eval metric core, all JVM expressions:

    - ``precision_at_k`` / ``recall_at_k``: binary relevance (rel > 0)
      inside the top-``k`` cut, over ``k`` / over the query's judged
      relevant count;
    - ``mrr``: 1/rank of the first relevant result over the FULL input
      run — trec_eval's recip_rank convention: a first relevant hit at
      rank k+1 still scores 1/(k+1), it is NOT zeroed by the cut (the
      cut applies only to the @k metrics); 0.0 when none;
    - ``ndcg_at_k``: burges-gain DCG Σ (2^rel − 1)/log2(rank+1) over
      the cut, normalized by the ideal DCG of the query's judgments
      (graded rels honored; ties in the ideal ordering break by doc id);
    - ``n_rel``: the query's judged-relevant count (the recall base).

    ``qrels`` is the standard (query_id, doc_id, rel) frame; unjudged
    retrieved docs count as non-relevant (the trec_eval convention) and
    queries with no judged-relevant doc are dropped (metrics undefined).
    Results deeper than ``k`` are ignored by the @k metrics (mrr sees
    the full run), so callers can pass any ranked frame
    (``bm25_topk``/``hybrid_topk``/``mmr_rerank`` output).

    100 TB shape: both inputs are reduced frames (top-k cuts and
    judgment sets — never the corpus); one join on (query, doc), one
    per-query aggregate, one broadcast of the per-query IDCG/base."""
    if k < 1:
        raise ValueError(f"retrieval_metrics: k must be >= 1, got {k}")
    res_full = results.select(
        F.col(query_id_col).alias("__qid"),
        F.col(id_col).alias("__id"),
        F.col(rank_col).cast("int").alias("__rank"),
    )
    res = res_full.where(F.col("__rank") <= k)
    qr = qrels.select(
        F.col(query_id_col).alias("__qid"),
        F.col(id_col).alias("__id"),
        F.col(rel_col).cast("double").alias("__rel"),
    )
    # per-query judgment summary: relevant count + ideal DCG@k
    w_ideal = Window.partitionBy("__qid").orderBy(
        F.col("__rel").desc(), F.col("__id").asc()
    )
    base = (
        qr.withColumn("__irank", F.row_number().over(w_ideal))
        .groupBy("__qid")
        .agg(
            F.sum((F.col("__rel") > 0).cast("long")).alias("__n_rel"),
            F.sum(
                F.when(
                    F.col("__irank") <= k,
                    (F.pow(F.lit(2.0), F.col("__rel")) - F.lit(1.0))
                    / F.log2(F.col("__irank").cast("double") + F.lit(1.0)),
                ).otherwise(F.lit(0.0))
            ).alias("__idcg"),
        )
        .where(F.col("__n_rel") > 0)
    )
    hits = res.join(qr, ["__qid", "__id"], "left").select(
        "__qid",
        "__rank",
        F.coalesce(F.col("__rel"), F.lit(0.0)).alias("__rel"),
    )
    per_q = hits.groupBy("__qid").agg(
        (
            F.sum((F.col("__rel") > 0).cast("double")) / F.lit(float(k))
        ).alias("__p_at_k"),
        F.sum((F.col("__rel") > 0).cast("double")).alias("__n_hit"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("__rel")) - F.lit(1.0))
            / F.log2(F.col("__rank").cast("double") + F.lit(1.0))
        ).alias("__dcg"),
    )
    # mrr over the FULL run (trec_eval recip_rank — not cut at k): an
    # inner join keeps only judged-relevant retrieved rows, so the max
    # is the first relevant rank wherever it sits; queries whose run
    # never hits a relevant doc fall out and coalesce to 0.0 below
    mrr_q = (
        res_full.join(qr, ["__qid", "__id"])
        .where(F.col("__rel") > 0)
        .groupBy("__qid")
        .agg(F.max(F.lit(1.0) / F.col("__rank").cast("double")).alias("mrr"))
    )
    return (
        base.join(per_q, "__qid", "left")
        .join(mrr_q, "__qid", "left")
        .select(
            F.col("__qid").alias(query_id_col),
            F.col("__n_rel").alias("n_rel"),
            F.coalesce(F.col("__p_at_k"), F.lit(0.0)).alias(
                "precision_at_k"
            ),
            (
                F.coalesce(F.col("__n_hit"), F.lit(0.0))
                / F.col("__n_rel").cast("double")
            ).alias("recall_at_k"),
            F.coalesce(F.col("mrr"), F.lit(0.0)).alias("mrr"),
            (
                F.coalesce(F.col("__dcg"), F.lit(0.0)) / F.col("__idcg")
            ).alias("ndcg_at_k"),
        )
    )


def hybrid_topk_indexed(
    spark,
    bm25_path: str,
    ivf_path: str,
    centroids: Sequence[Sequence[float]],
    queries: DataFrame,
    k: int = 10,
    fetch_k: int | None = None,
    rrf_k: int = 60,
    nprobe: int = 4,
    dim: int = 256,
    salt: str = "hashemb",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    id_col: str = "doc_id",
    score_round: int | None = None,
) -> DataFrame:
    """:func:`hybrid_topk` served ENTIRELY from materialized state — the
    steady-state form: the lexical leg reads the term-bucket-partitioned
    BM25 postings index (``bm25_index.bm25_topk_indexed``), the semantic
    leg reads the IVF inverted file (``similarity.knn_ivf_materialized``,
    partition-pruned to the probed clusters), and RRF fuses the two
    top-``fetch_k`` cuts.  NO corpus scan anywhere: both legs' plans
    carry PartitionFilters, so a query batch against 100 TB reads only
    its vocabulary's term buckets + its probes' cluster directories.

    The IVF file must be built over the SAME embedding the queries get
    here (``embed.hashed_embedding(docs, dim=dim, salt=salt)`` — the
    builder's responsibility); with enough probes (``nprobe`` =
    n_clusters) the output equals the scan-based :func:`hybrid_topk`
    rank-for-rank (pinned in tests), and fewer probes trade recall for
    the pruned read exactly as ``knn_ivf`` documents."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        bm25_index as BI,
        embed as EM,
        similarity as SIM,
    )

    if k < 1:
        raise ValueError(f"hybrid_topk_indexed: k must be >= 1, got {k}")
    fetch_k = fetch_k if fetch_k is not None else max(2 * k, 20)

    # Each leg's CONSTRUCTION runs driver-side jobs before the fused
    # plan ever executes (lexical: index meta read + query-vocabulary
    # collect; semantic: the query embedding collect + probe math), and
    # they are independent — so build the legs in two driver threads
    # (guide §2.6: overlap independent jobs; r14 optimization round).
    # The returned plans are identical to the sequential construction.
    def _lex() -> DataFrame:
        return BI.bm25_topk_indexed(
            spark, bm25_path, queries, k=fetch_k,
            query_id_col=query_id_col, query_text_col=query_text_col,
            score_round=score_round,
        ).select(query_id_col, id_col, "rank")

    def _sem() -> DataFrame:
        # the IVF family convention: BOTH the query frame and the
        # inverted file carry (vec_id, embedding) — build the file as
        # hashed_embedding(docs) -> select(doc_id AS vec_id, __v AS
        # embedding)
        qemb = EM.hashed_embedding(
            queries.select(query_id_col, query_text_col),
            text_col=query_text_col, out_col="__v", dim=dim, salt=salt,
        ).select(
            F.col(query_id_col).alias("vec_id"),
            F.col("__v").alias("embedding"),
        )
        wsem = Window.partitionBy(query_id_col).orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id").asc()
        )
        return (
            SIM.knn_ivf_materialized(
                spark, ivf_path, qemb, list(map(list, centroids)),
                k=fetch_k, nprobe=nprobe, id_col="vec_id",
                vec_col="embedding", query_id_col=query_id_col,
            )
            .where(F.col("cos_sim").isNotNull())
            .withColumn("rank", F.row_number().over(wsem))
            .select(query_id_col, F.col("neighbor_id").alias(id_col), "rank")
        )

    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    with ThreadPoolExecutor(max_workers=2) as pool:
        lex_f = pool.submit(inheritable_thread_target(_lex))
        sem_f = pool.submit(inheritable_thread_target(_sem))
        lex = lex_f.result()
        sem = sem_f.result()
    fused = rrf_fuse(
        [lex, sem], k=rrf_k, query_id_col=query_id_col, id_col=id_col
    )
    return fused.where(F.col("rank") <= k)
