"""BM25 retrieval (`operators/retrieval.py`): exact-formula parity
against a pure-Python reference, ranked-cut semantics, determinism, and
the plan shape the 100 TB story depends on (broadcast vocabulary
filter, no Python UDF, no sort-merge join of the corpus)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.operators import retrieval as RT

DOCS = [
    (0, "spark shuffles data between stages for wide operations"),
    (1, "broadcast joins avoid shuffles for small build sides"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "spark spark spark shuffle shuffle broadcast"),
    (4, "completely unrelated text about cooking pasta al dente"),
    (5, ""),  # empty doc: contributes to N and avgdl, matches nothing
]

QUERIES = [
    ("qa", "spark shuffle broadcast"),
    ("qb", "lazy dog"),
    ("qc", "zzz-missing-term"),  # matches nothing -> no rows
    ("qd", "spark spark spark"),  # repeated query terms count once
]


def _py_bm25(docs, queries, k1=1.2, b=0.75):
    """Independent reference: same formulas, dict arithmetic."""

    def toks(s):
        import re

        return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]

    dtoks = {i: toks(t) for i, t in docs}
    n = float(len(docs))
    avgdl = sum(len(v) for v in dtoks.values()) / n
    out = {}
    for qid, qt in queries:
        scores = {}
        for term in set(toks(qt)):
            df = sum(1 for v in dtoks.values() if term in v)
            if df == 0:
                continue
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for i, v in dtoks.items():
                tf = float(v.count(term))
                if tf == 0:
                    continue
                w = (tf * (k1 + 1.0)) / (
                    tf + k1 * ((1.0 - b) + b * (len(v) / avgdl))
                )
                scores[i] = scores.get(i, 0.0) + idf * w
        out[qid] = scores
    return out


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id string, text string")
    return docs, qs


def test_scores_match_python_reference(spark, frames):
    docs, qs = frames
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in RT.bm25_scores(docs, qs).collect()
    }
    want = _py_bm25(DOCS, QUERIES)
    flat = {
        (qid, i): s for qid, m in want.items() for i, s in m.items()
    }
    assert set(got) == set(flat)
    for key, s in flat.items():
        assert got[key] == pytest.approx(s, abs=1e-12), key


def test_topk_rank_and_tiebreak(spark, frames):
    docs, qs = frames
    rows = RT.bm25_topk(docs, qs, k=2).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    # qc matches nothing
    assert "qc" not in by_q
    for qid, rs in by_q.items():
        assert len(rs) <= 2
        rs = sorted(rs, key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        # ranked by score desc, doc_id asc
        for a, c in zip(rs, rs[1:]):
            assert (a["score"], -a["doc_id"]) >= (c["score"], -c["doc_id"])
    # the spam doc (3) saturates tf but is short: top hit for qa either
    # way must score doc 3 or 0/1 — assert against the reference argmax
    want = _py_bm25(DOCS, QUERIES)["qa"]
    best = min(sorted(want), key=lambda i: (-want[i], i))
    assert by_q["qa"][0]["doc_id"] == best


def test_repeated_query_terms_binarized(spark, frames):
    docs, qs = frames
    got = {
        r["doc_id"]: r["score"]
        for r in RT.bm25_scores(docs, qs).where(F.col("query_id") == "qd").collect()
    }
    one = {
        r["doc_id"]: r["score"]
        for r in RT.bm25_scores(
            docs,
            qs.sparkSession.createDataFrame(
                [("q1", "spark")], "query_id string, text string"
            ),
        ).collect()
    }
    assert got == one  # 'spark spark spark' == 'spark'


def test_deterministic(spark, frames):
    docs, qs = frames
    a = sorted(map(tuple, RT.bm25_topk(docs, qs, k=3).collect()))
    bb = sorted(map(tuple, RT.bm25_topk(docs, qs, k=3).collect()))
    assert a == bb


def test_partition_invariance(spark, frames):
    """Scores must not depend on the corpus's physical layout — the
    distributed tf/df aggregates reduce identically (up to float-sum
    associativity) however the token rows are partitioned."""
    docs, qs = frames
    a = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in RT.bm25_scores(docs, qs).collect()
    }
    bb = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in RT.bm25_scores(docs.repartition(7), qs).collect()
    }
    assert set(a) == set(bb)
    for key, s in a.items():
        assert bb[key] == pytest.approx(s, abs=1e-12), key


def test_k_validation(spark, frames):
    docs, qs = frames
    with pytest.raises(ValueError, match="k must be >= 1"):
        RT.bm25_topk(docs, qs, k=0)


def test_plan_broadcasts_and_stays_jvm(spark, frames):
    """100 TB shape: the vocabulary filter and both stats joins must
    broadcast (never a sort-merge join against the corpus), and the
    whole pipeline stays JVM-side (no Python UDF eval node)."""
    docs, qs = frames
    plan = (
        RT.bm25_topk(docs, qs, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 3  # vocab, df, qterms
    assert "BroadcastNestedLoopJoin" in plan  # the one-row stats frame
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_null_text_doc_scores_as_empty(spark, frames):
    """A NULL-text doc must behave exactly like an empty-text doc:
    counted in N, dl=0 (NOT -1 — F.size(NULL) is -1 under the default
    non-ANSI config, which would skew avgdl and every score)."""
    docs, qs = frames
    with_null = docs.unionByName(
        spark.createDataFrame([(6, None)], "doc_id long, text string")
    )
    with_empty = docs.unionByName(
        spark.createDataFrame([(6, "")], "doc_id long, text string")
    )
    a = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in RT.bm25_scores(with_null, qs).collect()
    }
    bb = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in RT.bm25_scores(with_empty, qs).collect()
    }
    assert set(a) == set(bb)
    for key, s in bb.items():
        assert a[key] == s, key  # identical doubles, not approx


def test_score_round_collapses_duplicate_ties(spark):
    """Exact-duplicate docs tie in real arithmetic but their float sums
    can differ by ~1e-16 depending on reduce order; score_round ranks on
    the portably rounded score so the (score, doc_id) tiebreak decides —
    duplicates must come out adjacent, doc_id ascending, equal scores."""
    docs = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta"),
            (20, "alpha beta gamma delta"),  # exact duplicate of 10
            (30, "alpha beta unrelated filler words here"),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [("q", "alpha beta gamma")], "query_id string, text string"
    )
    rows = sorted(
        RT.bm25_topk(docs, qs, k=3, score_round=6).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["doc_id"] for r in rows] == [10, 20, 30]
    assert rows[0]["score"] == rows[1]["score"]  # tie is EXACT post-round
    assert rows[0]["score"] == round(rows[0]["score"], 6)  # rounded returned
    assert rows[2]["score"] < rows[1]["score"]


def _rankdf(spark, rows):
    return spark.createDataFrame(
        rows, "query_id string, doc_id long, rank long"
    )


def test_rrf_matches_python_reference(spark):
    a = [("q", 1, 1), ("q", 2, 2), ("q", 3, 3), ("r", 9, 1)]
    b = [("q", 2, 1), ("q", 4, 2), ("q", 1, 3)]
    got = {
        (r["query_id"], r["doc_id"]): (r["rrf_score"], r["rank"])
        for r in RT.rrf_fuse([_rankdf(spark, a), _rankdf(spark, b)]).collect()
    }
    want = {}
    for rows in (a, b):
        for q, d, rk in rows:
            want[(q, d)] = want.get((q, d), 0.0) + 1.0 / (60.0 + rk)
    assert set(got) == set(want)
    for key, s in want.items():
        assert got[key][0] == s, key  # bit-exact, not approx
    order = sorted(
        (k for k in want if k[0] == "q"),
        key=lambda k: (-want[k], k[1]),
    )
    assert [got[k][1] for k in order] == [1, 2, 3, 4]


def test_rrf_consensus_beats_single_first_place(spark):
    """The fusion property RRF exists for: a doc ranked 2nd by BOTH
    rankers outranks docs ranked 1st by only one (1/62+1/62 > 1/61)."""
    a = [("q", 10, 1), ("q", 7, 2)]
    b = [("q", 20, 1), ("q", 7, 2)]
    rows = sorted(
        RT.rrf_fuse([_rankdf(spark, a), _rankdf(spark, b)]).collect(),
        key=lambda r: r["rank"],
    )
    assert rows[0]["doc_id"] == 7
    assert [r["doc_id"] for r in rows[1:]] == [10, 20]  # tie -> id order


def test_rrf_validation(spark):
    with pytest.raises(ValueError, match="at least one"):
        RT.rrf_fuse([])
    with pytest.raises(ValueError, match="k must be"):
        RT.rrf_fuse([_rankdf(spark, [("q", 1, 1)])], k=0)


def test_hybrid_topk_fuses_lexical_and_semantic(spark):
    """End shape: every fused rank ≤ k, contiguous from 1 per query, and
    the planted near-verbatim doc wins rank-1 (both legs agree on it).
    A doc inside both fetch_k pools but neither leg's top spot can
    still outrank single-leg favorites (the consensus property)."""
    docs = spark.createDataFrame(
        [
            (1, "spark shuffle exchange partitions wide dependency"),
            (2, "spark shuffle exchange partitions wide dependency extras"),
            (3, "cooking pasta with garlic and olive oil"),
            (4, "shuffle partitions"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [("qa", "spark shuffle exchange partitions wide dependency"),
         ("qb", "garlic olive oil")],
        "query_id string, text string",
    )
    rows = RT.hybrid_topk(docs, qs, k=3).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
    assert by_q["qa"][0]["doc_id"] == 1  # verbatim match tops both legs
    assert by_q["qb"][0]["doc_id"] == 3
    # determinism
    again = RT.hybrid_topk(docs, qs, k=3).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_hybrid_plan_shape(spark, frames):
    """100 TB shape: no sort-merge join anywhere (corpus joins broadcast
    or are top-k-cut-sized), and the ONLY Python in the final plan is
    the corpus hashed-embedding Arrow pass + the knn matmul kernel (the
    query embeddings collect in their own tiny job) — BM25 and fusion
    stay JVM-side, and nothing is row-at-a-time."""
    docs, qs = frames
    plan = (
        RT.hybrid_topk(docs, qs, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python ever
    # exactly two Arrow passes: corpus embeddings + query embeddings
    n_arrow = plan.count("ArrowEvalPython") + plan.count("MapInPandas")
    assert n_arrow == 2, plan


# ---------------------------------------------------------------- MMR


MMR_VECS = {
    0: [1.0, 0.0, 0.0, 0.0],
    1: [0.96, 0.28, 0.0, 0.0],   # near-duplicate of 0
    2: [0.0, 1.0, 0.0, 0.0],     # orthogonal
    3: [0.0, 0.0, 1.0, 0.0],     # orthogonal
    4: [1.0, 0.0, 0.0, 0.0],     # exact duplicate of 0
}
MMR_CANDS = [
    ("qa", 0, 1.0),
    ("qa", 1, 0.9),
    ("qa", 2, 0.8),
    ("qa", 3, 0.5),
    ("qa", 4, 0.95),
    ("qb", 2, 0.7),
    ("qb", 3, 0.6),
]


def _py_mmr(cands, vecs, k, lam, round_n=None):
    """Independent greedy reference: scalar loops, dict arithmetic."""
    import math

    def norm(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n > 0 else [0.0] * len(v)

    out = {}
    for qid in sorted({q for q, _, _ in cands}):
        pool = sorted((d, r) for q, d, r in cands if q == qid)
        ids = [d for d, _ in pool]
        rel = {d: (0.0 if r is None else float(r)) for d, r in pool}
        nv = {d: norm(vecs.get(d) or [0.0]) for d in ids}
        picked, max_sim, res = set(), {d: None for d in ids}, []
        for rank in range(1, min(k, len(ids)) + 1):
            best = None
            for d in ids:  # ids ascending -> first strict max wins ties
                if d in picked:
                    continue
                red = 0.0 if max_sim[d] is None else max_sim[d]
                m = lam * rel[d] - (1.0 - lam) * red
                if round_n is not None:
                    p = 10.0**round_n
                    m = math.floor(m * p + 0.5) / p
                if best is None or m > best[1]:
                    best = (d, m)
            picked.add(best[0])
            res.append((best[0], best[1], rank))
            bv = nv[best[0]]
            for d in ids:
                c = sum(x * y for x, y in zip(nv[d], bv))
                max_sim[d] = c if max_sim[d] is None else max(max_sim[d], c)
        out[qid] = res
    return out


@pytest.fixture(scope="module")
def mmr_frames(spark):
    cands = spark.createDataFrame(
        MMR_CANDS, "query_id string, doc_id long, score double"
    )
    vecs = spark.createDataFrame(
        [(d, v) for d, v in MMR_VECS.items()],
        "doc_id long, embedding array<double>",
    )
    return cands, vecs


def test_mmr_matches_python_reference(spark, mmr_frames):
    cands, vecs = mmr_frames
    for lam in (0.0, 0.3, 0.7, 1.0):
        got = RT.mmr_rerank(cands, vecs, k=4, lam=lam).collect()
        ref = _py_mmr(MMR_CANDS, MMR_VECS, k=4, lam=lam)
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], []).append(
                (r["doc_id"], r["mmr_score"], r["rank"])
            )
        for q in ref:
            mine = sorted(by_q[q], key=lambda t: t[2])
            assert [t[0] for t in mine] == [t[0] for t in ref[q]], lam
            for (_, s, _), (_, rs, _) in zip(mine, ref[q]):
                assert abs(s - rs) < 1e-9


def test_mmr_diversifies_redundant_pool(spark, mmr_frames):
    """At lam=0.7 the orthogonal doc 2 (rel 0.8) must outrank the
    exact-duplicate doc 4 (rel 0.95) at step 2 — the defining MMR
    behavior; at lam=1 relevance order is reproduced exactly."""
    cands, vecs = mmr_frames
    div = {
        r["rank"]: r["doc_id"]
        for r in RT.mmr_rerank(cands, vecs, k=3, lam=0.7).collect()
        if r["query_id"] == "qa"
    }
    assert div[1] == 0 and div[2] == 2
    pure = {
        r["rank"]: r["doc_id"]
        for r in RT.mmr_rerank(cands, vecs, k=5, lam=1.0).collect()
        if r["query_id"] == "qa"
    }
    assert [pure[i] for i in range(1, 6)] == [0, 4, 1, 2, 3]


def test_mmr_partition_invariance(spark, mmr_frames):
    cands, vecs = mmr_frames
    base = sorted(
        map(tuple, RT.mmr_rerank(cands, vecs, k=4, lam=0.5).collect())
    )
    shuf = sorted(
        map(
            tuple,
            RT.mmr_rerank(
                cands.repartition(7), vecs.repartition(5), k=4, lam=0.5
            ).collect(),
        )
    )
    assert base == shuf


def test_mmr_missing_vector_and_null_score(spark):
    """A candidate with no vector row rides with cosine 0 (can still
    win on relevance); a NULL relevance scores as 0 but stays
    selectable."""
    cands = spark.createDataFrame(
        [("q", 10, 0.9), ("q", 11, None), ("q", 12, 0.4)],
        "query_id string, doc_id long, score double",
    )
    vecs = spark.createDataFrame(
        [(10, [1.0, 0.0]), (12, [1.0, 0.0])],
        "doc_id long, embedding array<double>",
    )
    rows = {
        r["rank"]: (r["doc_id"], r["mmr_score"])
        for r in RT.mmr_rerank(cands, vecs, k=3, lam=0.5).collect()
    }
    # step 1: doc 10 (0.45); step 2: doc 11 (0.0 - 0.5*0 = 0.0) beats
    # doc 12 (0.2 - 0.5*1.0 = -0.3); step 3: doc 12
    assert [rows[i][0] for i in (1, 2, 3)] == [10, 11, 12]
    assert abs(rows[2][1] - 0.0) < 1e-12
    assert abs(rows[3][1] - (-0.3)) < 1e-12


def test_mmr_exact_ties_split_by_id_under_rounding(spark):
    """Two byte-identical candidates (same rel, same vector) produce
    bit-equal MMR at every step; score_round collapses any float dust
    and the id tiebreak orders them — the bm25 score_round pattern."""
    cands = spark.createDataFrame(
        [("q", 7, 0.5), ("q", 3, 0.5)],
        "query_id string, doc_id long, score double",
    )
    vecs = spark.createDataFrame(
        [(7, [0.6, 0.8]), (3, [0.6, 0.8])],
        "doc_id long, embedding array<double>",
    )
    rows = {
        r["rank"]: r["doc_id"]
        for r in RT.mmr_rerank(
            cands, vecs, k=2, lam=0.6, score_round=6
        ).collect()
    }
    assert rows[1] == 3 and rows[2] == 7


def test_mmr_validation(spark, mmr_frames):
    cands, vecs = mmr_frames
    with pytest.raises(ValueError):
        RT.mmr_rerank(cands, vecs, k=0)
    with pytest.raises(ValueError):
        RT.mmr_rerank(cands, vecs, k=3, lam=1.5)


def test_mmr_composes_with_hybrid(spark, frames):
    """The intended pipeline: hybrid_topk fetches a deep pool, MMR cuts
    it to k diverse docs over the same hashed embeddings."""
    from bigdataproject_formula1_telemetry_spark.operators import embed as EM

    docs, qs = frames
    pool = RT.hybrid_topk(docs, qs, k=5).withColumnRenamed(
        "rrf_score", "score"
    )
    vecs = EM.hashed_embedding(docs, text_col="text", out_col="embedding")
    out = RT.mmr_rerank(pool, vecs, k=3, lam=0.7).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len({r["doc_id"] for r in rs}) == len(rs)
    # rank 1 is the pool's relevance argmax (empty-set redundancy)
    qa = sorted(by_q["qa"], key=lambda r: r["rank"])
    pool_qa = {
        r["doc_id"]: r["score"]
        for r in pool.collect()
        if r["query_id"] == "qa"
    }
    assert qa[0]["doc_id"] == max(pool_qa, key=lambda d: (pool_qa[d], -d))


# ---------------------------------------------------------------- RM3


def _py_rm3_topk(docs, queries, k, fb_docs, fb_terms, lam, k1=1.2, b=0.75):
    """Independent RM3 reference: expansion + weighted BM25, dict math."""
    import re
    from collections import Counter

    def toks(s):
        return [t for t in re.split(r"[^a-z0-9]+", (s or "").lower()) if t]

    dtoks = {i: toks(t) for i, t in docs}
    n = float(len(docs))
    avgdl = sum(len(v) for v in dtoks.values()) / n

    def idf(term):
        df = sum(1 for v in dtoks.values() if term in v)
        return (
            None if df == 0
            else __import__("math").log(1.0 + (n - df + 0.5) / (df + 0.5))
        )

    def sat(tf, dl):
        return (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl)))

    def weighted_scores(wmap):
        scores = {}
        for term, w in wmap.items():
            i = idf(term)
            if i is None:
                continue
            for d, v in dtoks.items():
                tf = float(v.count(term))
                if tf:
                    scores[d] = scores.get(d, 0.0) + w * i * sat(tf, len(v))
        return scores

    out = {}
    for qid, qt in queries:
        qd = sorted(set(toks(qt)))
        base = weighted_scores({t: 1.0 for t in qd})
        fb = sorted(base.items(), key=lambda x: (-x[1], x[0]))[:fb_docs]
        weights = {t: lam * (1.0 / len(qd)) for t in qd}
        if fb:
            tot = sum(s for _, s in fb)
            rm = {}
            for d, s in fb:
                dl = len(dtoks[d])
                if not dl:
                    continue
                for t, c in Counter(dtoks[d]).items():
                    rm[t] = rm.get(t, 0.0) + (c / dl) * (s / tot)
            top_t = sorted(rm.items(), key=lambda x: (-x[1], x[0]))[:fb_terms]
            z = sum(w for _, w in top_t)
            for t, w in top_t:
                weights[t] = weights.get(t, 0.0) + (1.0 - lam) * (w / z)
        ranked = sorted(
            weighted_scores(weights).items(), key=lambda x: (-x[1], x[0])
        )[:k]
        out[qid] = [(d, s, r + 1) for r, (d, s) in enumerate(ranked)]
    return out


def test_rm3_matches_python_reference(spark, frames):
    docs, qs = frames
    got = RT.bm25_topk_rm3(
        docs, qs, k=4, fb_docs=3, fb_terms=5, orig_weight=0.6
    ).collect()
    ref = _py_rm3_topk(DOCS, QUERIES, k=4, fb_docs=3, fb_terms=5, lam=0.6)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score"], r["rank"])
        )
    for q, expected in ref.items():
        mine = sorted(by_q.get(q, []), key=lambda t: t[2])
        assert [t[0] for t in mine] == [t[0] for t in expected], q
        for (_, s, _), (_, rs, _) in zip(mine, expected):
            assert abs(s - rs) < 1e-9


def test_rm3_score_round_quantizes_and_is_layout_invariant(spark, frames):
    """score_round=6 (the q57 rm3 fold's setting): returned scores are
    1e-6-quantized, and the full two-pass ranking is identical across
    partition layouts (the relevance-model weights round at 1e-9, so
    structurally-tied terms split on the term tiebreak regardless of
    float-sum association order)."""
    docs, qs = frames
    base = RT.bm25_topk_rm3(
        docs, qs, k=4, fb_docs=3, fb_terms=5, orig_weight=0.5,
        score_round=6,
    ).collect()
    assert base, "expected rows"
    for r in base:
        q = round(r["score"] * 1e6)
        assert abs(r["score"] - q / 1e6) < 1e-12, r
    relayout = RT.bm25_topk_rm3(
        docs.repartition(7), qs, k=4, fb_docs=3, fb_terms=5,
        orig_weight=0.5, score_round=6,
    ).collect()
    key = lambda r: (r["query_id"], r["rank"], r["doc_id"], r["score"])
    assert sorted(map(key, base)) == sorted(map(key, relayout))


def test_rm3_expansion_recalls_cooccurring_vocabulary(spark):
    """The defining PRF behavior: a doc sharing NO term with the raw
    query becomes retrievable because the feedback docs' vocabulary
    bridges to it."""
    docs = spark.createDataFrame(
        [
            (0, "alpha beta shared context sentence"),
            (1, "alpha beta more shared context"),
            (2, "alpha beta third feedback document"),
            (3, "beta only document without the query term"),
            (4, "unrelated gamma delta filler text"),
        ],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame([("q1", "alpha")], "query_id string, text string")
    plain = {r["doc_id"] for r in RT.bm25_topk(docs, qs, k=5).collect()}
    assert 3 not in plain  # no raw-query term -> unreachable
    rm3 = {
        r["doc_id"]
        for r in RT.bm25_topk_rm3(
            docs, qs, k=5, fb_docs=3, fb_terms=5, orig_weight=0.5
        ).collect()
    }
    assert 3 in rm3  # 'beta' rides in via the relevance model


def test_rm3_orig_weight_one_preserves_ranking(spark, frames):
    """lam=1 zeroes the expansion terms' weights: ranks must equal the
    plain BM25 cut (scores rescale by the uniform 1/|q| query model)."""
    docs, qs = frames
    plain = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in RT.bm25_topk(docs, qs, k=3).collect()
    }
    rm3 = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in RT.bm25_topk_rm3(docs, qs, k=3, orig_weight=1.0).collect()
    }
    assert plain == rm3


def test_rm3_weights_sum_to_one(spark, frames):
    docs, qs = frames
    sums = (
        RT.rm3_expand(docs, qs, fb_docs=3, fb_terms=5, orig_weight=0.5)
        .groupBy("query_id")
        .agg(F.sum("weight").alias("s"))
        .collect()
    )
    assert sums
    for r in sums:
        if r["query_id"] == "qc":  # no feedback docs: orig model * lam only
            assert abs(r["s"] - 0.5) < 1e-12
        else:
            assert abs(r["s"] - 1.0) < 1e-9


def test_rm3_validation(spark, frames):
    docs, qs = frames
    with pytest.raises(ValueError):
        RT.rm3_expand(docs, qs, fb_docs=0)
    with pytest.raises(ValueError):
        RT.rm3_expand(docs, qs, orig_weight=1.5)
    with pytest.raises(ValueError):
        RT.bm25_topk_rm3(docs, qs, k=0)


# ------------------------------------------------------- IR metrics


def test_retrieval_metrics_match_hand_computation(spark):
    """One query, graded qrels, hand-computed trec_eval-core values."""
    results = spark.createDataFrame(
        [("q", 10, 1), ("q", 11, 2), ("q", 12, 3), ("q", 13, 4)],
        "query_id string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        # doc 11 rel=2, doc 13 rel=1, doc 99 rel=1 (not retrieved),
        # doc 10 judged non-relevant
        [("q", 10, 0), ("q", 11, 2), ("q", 13, 1), ("q", 99, 1)],
        "query_id string, doc_id long, rel int",
    )
    r = RT.retrieval_metrics(results, qrels, k=4).collect()
    assert len(r) == 1
    m = r[0]
    assert m["n_rel"] == 3
    assert m["precision_at_k"] == pytest.approx(2 / 4)
    assert m["recall_at_k"] == pytest.approx(2 / 3)
    assert m["mrr"] == pytest.approx(1 / 2)  # first relevant at rank 2
    dcg = (2**2 - 1) / math.log2(3) + (2**1 - 1) / math.log2(5)
    idcg = (2**2 - 1) / math.log2(2) + (2**1 - 1) / math.log2(3) \
        + (2**1 - 1) / math.log2(4)
    assert m["ndcg_at_k"] == pytest.approx(dcg / idcg, abs=1e-12)


def test_retrieval_metrics_conventions(spark):
    """Unjudged retrieved docs count non-relevant; queries with no
    judged-relevant doc are dropped; a query with judgments but no
    results scores 0 across the board; results deeper than k are
    ignored by the @k metrics but NOT by mrr (trec_eval's recip_rank
    runs over the full input — ADVICE r11)."""
    results = spark.createDataFrame(
        [("qa", 1, 1), ("qa", 2, 2), ("qa", 3, 3)],
        "query_id string, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [("qa", 3, 1), ("qb", 7, 1), ("qz", 5, 0)],
        "query_id string, doc_id long, rel int",
    )
    rows = {r["query_id"]: r for r in
            RT.retrieval_metrics(results, qrels, k=2).collect()}
    assert set(rows) == {"qa", "qb"}  # qz: no relevant judgment -> dropped
    # qa's one relevant doc sits at rank 3, outside k=2: the @k metrics
    # miss it, mrr (full-run recip_rank) still scores 1/3
    assert rows["qa"]["recall_at_k"] == 0.0
    assert rows["qa"]["mrr"] == pytest.approx(1 / 3)
    assert rows["qa"]["ndcg_at_k"] == 0.0
    assert rows["qb"]["mrr"] == 0.0  # judged but never retrieved
    # qb judged but never retrieved
    assert rows["qb"]["recall_at_k"] == 0.0
    assert rows["qb"]["precision_at_k"] == 0.0
    with pytest.raises(ValueError):
        RT.retrieval_metrics(results, qrels, k=0)


def test_retrieval_metrics_close_the_loop_on_bm25(spark, frames):
    """Self-retrieval sanity: each doc queried by its own text must come
    back rank 1 -> perfect MRR/nDCG when each query's sole relevant doc
    is itself."""
    docs, _ = frames
    live = docs.where(F.length("text") > 0)
    qs = live.select(
        F.col("doc_id").cast("string").alias("query_id"),
        F.col("text"),
    )
    qrels = live.select(
        F.col("doc_id").cast("string").alias("query_id"),
        F.col("doc_id"),
        F.lit(1).alias("rel"),
    )
    top = RT.bm25_topk(docs, qs, k=3)
    m = RT.retrieval_metrics(top, qrels, k=3).collect()
    assert len(m) == live.count()
    for r in m:
        assert r["mrr"] == pytest.approx(1.0)
        assert r["recall_at_k"] == pytest.approx(1.0)
        assert r["ndcg_at_k"] == pytest.approx(1.0)


def test_mmr_plan_shape(spark, mmr_frames):
    """100 TB shape: the corpus-scale vectors table is narrowed by a
    BROADCAST semi-join on candidate ids BEFORE any wide join (the one
    scale-critical property — the later pool join pairs two
    candidate-bounded frames, where a shuffle join is legitimate), the
    greedy is ONE grouped Arrow kernel, nothing row-at-a-time."""
    cands, vecs = mmr_frames
    plan = (
        RT.mmr_rerank(cands, vecs, k=3, lam=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_rm3_plan_stays_jvm(spark, frames):
    """RM3 end-to-end is pure JVM expressions — NO Python eval node
    anywhere — and every corpus-touching join broadcasts (the vocab
    filter and the feedback-id semi-join); the remaining joins pair
    per-query-bounded frames."""
    docs, qs = frames
    plan = (
        RT.bm25_topk_rm3(docs, qs, k=3, fb_docs=3, fb_terms=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "FlatMapGroupsInPandas" not in plan and "MapInPandas" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # vocab x2 + df + qterms
    assert "LeftSemi" in plan  # feedback-id narrowing of the token re-scan
