"""Materialized BM25 inverted index (`operators/bm25_index.py`):
index-served results equal the corpus-scan `retrieval.bm25_topk`,
increments compose exactly (build(A)+append(B) == build(A∪B)), the
serving scan is partition-pruned + term-pushed (the 100 TB property),
and the increment lifecycle is idempotent."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.operators import (
    bm25_index as BI,
    retrieval as RT,
)

DOCS_A = [
    (0, "spark shuffles data between stages for wide operations"),
    (1, "broadcast joins avoid shuffles for small build sides"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "spark spark spark shuffle shuffle broadcast"),
    (4, "completely unrelated text about cooking pasta al dente"),
    (5, ""),  # empty doc: counts in N / sum_dl
]
DOCS_B = [
    (10, "late increment about spark shuffle behavior under skew"),
    (11, "another appended doc mentioning the lazy dog again"),
]
QUERIES = [
    ("qa", "spark shuffle broadcast"),
    ("qb", "lazy dog"),
    ("qc", "zzz-missing-term"),
]


@pytest.fixture(scope="module")
def frames(spark):
    a = spark.createDataFrame(DOCS_A, "doc_id long, text string")
    b = spark.createDataFrame(DOCS_B, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id string, text string")
    return a, b, qs


def _ranked(rows):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in rows
    )


def test_index_serving_equals_corpus_scan(spark, frames, tmp_path):
    a, _, qs = frames
    path = str(tmp_path / "idx")
    BI.build_bm25_index(a, path, n_buckets=8)
    served = RT.bm25_topk(a, qs, k=3).collect()
    indexed = BI.bm25_topk_indexed(spark, path, qs, k=3).collect()
    want = {(r["query_id"], r["rank"]): r for r in served}
    got = {(r["query_id"], r["rank"]): r for r in indexed}
    assert set(want) == set(got)
    for key, r in want.items():
        assert got[key]["doc_id"] == r["doc_id"], key
        assert got[key]["score"] == pytest.approx(r["score"], abs=1e-12)


def test_append_composes_exactly(spark, frames, tmp_path):
    """build(A) + append(B) must serve the SAME results as build(A∪B):
    stats rows sum, df derives from all increments' postings."""
    a, b, qs = frames
    inc_path = str(tmp_path / "inc_idx")
    all_path = str(tmp_path / "all_idx")
    BI.build_bm25_index(a, inc_path, n_buckets=8)
    BI.append_bm25_index(b, inc_path, increment_id="inc1")
    BI.build_bm25_index(a.unionByName(b), all_path, n_buckets=8)
    x = _ranked(BI.bm25_topk_indexed(spark, inc_path, qs, k=5).collect())
    y = _ranked(BI.bm25_topk_indexed(spark, all_path, qs, k=5).collect())
    assert x == y
    # and both equal the corpus scan over A∪B
    z = _ranked(RT.bm25_topk(a.unionByName(b), qs, k=5).collect())
    assert [t[:3] for t in x] == [t[:3] for t in z]


def test_append_is_idempotent(spark, frames, tmp_path):
    a, b, qs = frames
    path = str(tmp_path / "idem_idx")
    BI.build_bm25_index(a, path, n_buckets=8)
    BI.append_bm25_index(b, path, increment_id="inc1")
    once = _ranked(BI.bm25_topk_indexed(spark, path, qs, k=5).collect())
    BI.append_bm25_index(b, path, increment_id="inc1")  # retry
    twice = _ranked(BI.bm25_topk_indexed(spark, path, qs, k=5).collect())
    assert once == twice


def test_rebuild_drops_stale_increments(spark, frames, tmp_path):
    """A base rebuild is a FRESH index: previous increments must not
    leak into the new generation (static overwrite of inc=*)."""
    a, b, qs = frames
    path = str(tmp_path / "fresh_idx")
    BI.build_bm25_index(a, path, n_buckets=8)
    BI.append_bm25_index(b, path, increment_id="inc1")
    BI.build_bm25_index(a, path, n_buckets=8)  # rebuild
    fresh = _ranked(BI.bm25_topk_indexed(spark, path, qs, k=5).collect())
    plain = str(tmp_path / "plain_idx")
    BI.build_bm25_index(a, plain, n_buckets=8)
    assert fresh == _ranked(
        BI.bm25_topk_indexed(spark, plain, qs, k=5).collect()
    )


def test_serving_scan_is_pruned_and_pushed(spark, frames, tmp_path):
    """The 100 TB property: the postings scan carries a bucket
    PARTITION filter (reads ~|query buckets|/n_buckets of the table)
    and the term list as a PUSHED parquet filter."""
    a, _, qs = frames
    path = str(tmp_path / "prune_idx")
    BI.build_bm25_index(a, path, n_buckets=8)
    plan = (
        BI.bm25_topk_indexed(spark, path, qs, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan
    p = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert p and ("In(term" in p.group(1) or "EqualTo(term" in p.group(1)), plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_vocab_size_gate_bounds_the_plan(spark, frames, tmp_path):
    """VERDICT r11 item 4: above ``max_literal_terms`` the term filter
    switches from ``isin`` literals to a broadcast semi-join, so a
    benchmark-scale query batch cannot blow up the plan — while the
    BOUNDED bucket partition literals stay, and results equal both the
    literal-path serving and the corpus scan."""
    a, _, _ = frames
    path = str(tmp_path / "gate_idx")
    BI.build_bm25_index(a, path, n_buckets=8)
    # a multi-thousand-term batch: 3000 junk terms + the real query
    junk = " ".join(f"zz{i}x" for i in range(3000))
    big_q = a.sparkSession.createDataFrame(
        [("qa", "spark shuffle broadcast " + junk), ("qb", "lazy dog")],
        "query_id string, text string",
    )
    gated = BI.bm25_topk_indexed(
        spark, path, big_q, k=3, max_literal_terms=256
    )
    plan = gated._jdf.queryExecution().executedPlan().toString()
    # bucket partition pruning survives the gate...
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan
    # ...while no multi-thousand-literal In(term, ...) reaches the scan
    # (the whole executed plan stays small — the blowup this gate kills)
    assert len(plan) < 100_000, len(plan)
    assert "SortMergeJoin" not in plan

    got = _ranked(gated.collect())
    literal = _ranked(
        BI.bm25_topk_indexed(
            spark, path, big_q, k=3, max_literal_terms=100_000
        ).collect()
    )
    scan = _ranked(RT.bm25_topk(a, big_q, k=3).collect())
    assert got == literal == scan
    with pytest.raises(ValueError):
        BI.bm25_topk_indexed(spark, path, big_q, k=3, max_literal_terms=0)


def test_no_match_and_validation(spark, frames, tmp_path):
    a, _, _ = frames
    path = str(tmp_path / "v_idx")
    BI.build_bm25_index(a, path, n_buckets=4)
    empty_q = a.sparkSession.createDataFrame(
        [("q1", "")], "query_id string, text string"
    )
    out = BI.bm25_topk_indexed(spark, path, empty_q, k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "doc_id", "rank", "score",
    ]
    with pytest.raises(ValueError):
        BI.build_bm25_index(a, path, n_buckets=0)
    with pytest.raises(ValueError):
        BI.append_bm25_index(a, path, increment_id="base")
    with pytest.raises(ValueError):
        BI.append_bm25_index(a, path, increment_id="bad/inc")
    with pytest.raises(ValueError):
        BI.bm25_topk_indexed(spark, path, empty_q, k=0)


def test_hybrid_topk_indexed_matches_scan_form(spark, frames, tmp_path):
    """The steady-state composition: BM25 postings index ⊕ IVF inverted
    file ⊕ RRF.  With nprobe = n_clusters the IVF leg is exact, so the
    fused output must equal the scan-based hybrid_topk rank-for-rank
    (RRF is rank-based -> bit-exact scores); and NEITHER leg scans a
    flat corpus — both plans carry PartitionFilters."""
    import numpy as np

    from bigdataproject_formula1_telemetry_spark.operators import (
        embed as EM,
        similarity as SIM,
    )

    a, b, qs = frames
    docs = a.unionByName(b)
    bm25_path = str(tmp_path / "h_bm25")
    ivf_path = str(tmp_path / "h_ivf")
    BI.build_bm25_index(docs, bm25_path, n_buckets=8)
    emb = EM.hashed_embedding(docs, text_col="text", out_col="__v").select(
        F.col("doc_id").alias("vec_id"), F.col("__v").alias("embedding")
    )
    rows = emb.collect()
    rng = np.random.default_rng(7)
    cents = [
        list(np.asarray(rows[i]["embedding"]) + rng.normal(0, 1e-3, 256))
        for i in (0, 3)
    ]
    SIM.build_inverted_file(emb, cents, ivf_path)
    got = sorted(
        map(
            tuple,
            RT.hybrid_topk_indexed(
                spark, bm25_path, ivf_path, cents, qs,
                k=3, nprobe=len(cents),
            ).collect(),
        )
    )
    want = sorted(map(tuple, RT.hybrid_topk(docs, qs, k=3).collect()))
    assert got == want
    # score_round plumbs into BOTH forms' bm25 legs (r12 — the 500k
    # tie-saturated sweep caught unrounded family-tie rank instability):
    # rounded indexed == rounded scan, rank-for-rank
    got_r = sorted(
        map(
            tuple,
            RT.hybrid_topk_indexed(
                spark, bm25_path, ivf_path, cents, qs,
                k=3, nprobe=len(cents), score_round=6,
            ).collect(),
        )
    )
    want_r = sorted(
        map(tuple, RT.hybrid_topk(docs, qs, k=3, score_round=6).collect())
    )
    assert got_r == want_r
    # both legs' scans are partition-pruned (no flat corpus read)
    plan = (
        RT.hybrid_topk_indexed(
            spark, bm25_path, ivf_path, cents, qs, k=3, nprobe=1
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("bucket" in f for f in filters), plan
    assert any("ivf_cluster" in f for f in filters), plan


def test_streaming_ingest_matches_batch_index(spark, frames, tmp_path):
    """index_stream: micro-batch ingest through foreachBatch appends must
    serve EXACTLY what the batch path serves — one increment per
    micro-batch, one shared lifecycle (the streaming-admission-triangle
    contract, lexical edition)."""
    a, b, qs = frames
    src = str(tmp_path / "src")
    for i, part in enumerate([DOCS_A, DOCS_B]):
        spark.createDataFrame(part, "doc_id long, text string").coalesce(
            1
        ).write.parquet(f"{src}/p{i}")
    stream_idx = str(tmp_path / "s_idx")
    batch_idx = str(tmp_path / "b_idx")
    empty = spark.createDataFrame([], "doc_id long, text string")
    BI.build_bm25_index(empty, stream_idx, n_buckets=8)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        BI.index_stream(stream, stream_idx, str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive
    BI.build_bm25_index(a.unionByName(b), batch_idx, n_buckets=8)
    got = _ranked(BI.bm25_topk_indexed(spark, stream_idx, qs, k=5).collect())
    want = _ranked(BI.bm25_topk_indexed(spark, batch_idx, qs, k=5).collect())
    assert got == want and got


def test_compact_folds_increments_search_identically(spark, frames, tmp_path):
    """compact_bm25_index: serving is EXACTLY identical before/after the
    fold (stats pre-sum is bit-exact on integer-valued doubles), the
    increment list collapses to base, and re-compaction is a no-op."""
    a, b, qs = frames
    path = str(tmp_path / "c_idx")
    BI.build_bm25_index(a, path, n_buckets=8)
    BI.append_bm25_index(b, path, increment_id="inc1")
    BI.append_bm25_index(
        spark.createDataFrame(
            [(20, "one more spark document for the second increment")],
            "doc_id long, text string",
        ),
        path,
        increment_id="inc2",
    )
    before = _ranked(BI.bm25_topk_indexed(spark, path, qs, k=5).collect())
    assert BI.list_bm25_increments(spark, path) == ["base", "inc1", "inc2"]
    assert BI.compact_bm25_index(spark, path) == 2
    assert BI.list_bm25_increments(spark, path) == ["base"]
    after = _ranked(BI.bm25_topk_indexed(spark, path, qs, k=5).collect())
    assert before == after
    # stats folded to ONE row
    assert (
        spark.read.parquet(str(tmp_path / "c_idx" / "stats")).count() == 1
    )
    # idempotent no-op
    assert BI.compact_bm25_index(spark, path) == 0
    assert _ranked(BI.bm25_topk_indexed(spark, path, qs, k=5).collect()) == after


# --------------------------------------------------------------------------
# Property-based: index-served == corpus-scan on random adversarial corpora
# --------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_VOCAB = [
    "spark", "shuffle", "broadcast", "dog", "123", "Über", "naïve-fox",
    "x", "", "lorem,ipsum", "ΔΣ", "a1b2",
]


@st.composite
def _corpus_case(draw):
    n_docs = draw(st.integers(1, 8))
    docs = [
        (i, " ".join(draw(st.lists(st.sampled_from(_VOCAB), max_size=8))))
        for i in range(n_docs)
    ]
    if draw(st.booleans()):
        docs.append((n_docs, None))  # NULL text doc
    queries = [
        (f"q{j}", " ".join(draw(st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=3))))
        for j in range(draw(st.integers(1, 3)))
    ]
    return docs, queries


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(case=_corpus_case())
@pytest.mark.slowtier
def test_index_equals_scan_on_random_corpora(spark, tmp_path, case):
    """Random adversarial corpora (unicode, punctuation runs, empty and
    NULL texts, likely exact-duplicate docs under the tiny vocabulary):
    the materialized index must serve EXACTLY what the corpus scan
    ranks.  Rounded ranking on both sides so duplicate ties collapse
    onto the shared id tiebreak instead of float-sum order."""
    import tempfile

    docs, queries = case
    d = spark.createDataFrame(docs, "doc_id long, text string")
    qs = spark.createDataFrame(queries, "query_id string, text string")
    path = tempfile.mkdtemp(dir=str(tmp_path), prefix="pidx_")
    BI.build_bm25_index(d, path, n_buckets=4)
    got = _ranked(
        BI.bm25_topk_indexed(spark, path, qs, k=4, score_round=6).collect()
    )
    want = _ranked(RT.bm25_topk(d, qs, k=4, score_round=6).collect())
    assert got == want


def test_expire_drops_all_three_tables_and_serves_survivors(
    spark, frames, tmp_path
):
    """VERDICT r13 item 4: expiring a bm25 increment drops its
    postings/stats/terms partitions TOGETHER, and serving over the
    survivors equals a from-scratch build over the surviving docs
    (the minhash ``expire_increments`` twin)."""
    import os

    a, b, qs = frames
    c = spark.createDataFrame(
        [(20, "retention keeps only the freshest spark increment")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "exp_idx")
    BI.build_bm25_index(a, path, n_buckets=8)
    BI.append_bm25_index(b, path, increment_id="inc0")
    BI.append_bm25_index(c, path, increment_id="inc1")
    assert BI.expire_bm25_increments(spark, path, keep=["inc1"]) == ["inc0"]
    for t in ("postings", "stats", "terms"):
        assert not os.path.exists(os.path.join(path, t, "inc=inc0")), t
        assert os.path.exists(os.path.join(path, t, "inc=inc1")), t
        assert os.path.exists(os.path.join(path, t, "inc=base")), t
    assert BI.list_bm25_increments(spark, path) == ["base", "inc1"]
    fresh = str(tmp_path / "fresh_idx")
    BI.build_bm25_index(a.unionByName(c), fresh, n_buckets=8)
    got = _ranked(BI.bm25_topk_indexed(spark, path, qs, k=5).collect())
    want = _ranked(BI.bm25_topk_indexed(spark, fresh, qs, k=5).collect())
    assert got == want
    # base is never expirable; a held compaction lease fails fast
    assert BI.expire_bm25_increments(spark, path, keep=lambda i: False) == [
        "inc1"
    ]
    assert BI.list_bm25_increments(spark, path) == ["base"]
    from bigdataproject_formula1_telemetry_spark.operators import (
        index_lifecycle as LC,
    )

    LC.write_lease(spark, LC.lease_file_at(path), ["base"])
    with pytest.raises(ValueError, match="compaction lease"):
        BI.expire_bm25_increments(spark, path, keep=[])
    LC.clear_lease(spark, LC.lease_file_at(path))


def test_expire_retry_converges_after_mid_clear_crash(
    spark, frames, tmp_path, monkeypatch
):
    """A crash between an expire's per-table clears leaves a torn id;
    the RETRY must still see it (candidates come from the union of all
    three tables' listings, not just postings) and finish the clear —
    a surviving terms/ partition without its postings would inflate
    served df."""
    import os

    a, b, qs = frames
    path = str(tmp_path / "torn_idx")
    BI.build_bm25_index(a, path, n_buckets=8)
    BI.append_bm25_index(b, path, increment_id="inc0")

    real = BI._clear_inc_partition
    calls = []

    def crashy(spark_, table_dir, inc):
        calls.append(os.path.basename(table_dir))
        real(spark_, table_dir, inc)
        if len(calls) == 2:  # after stats + postings, before terms
            raise RuntimeError("injected crash mid-expire")

    monkeypatch.setattr(BI, "_clear_inc_partition", crashy)
    with pytest.raises(RuntimeError, match="injected crash"):
        BI.expire_bm25_increments(spark, path, keep=[])
    monkeypatch.undo()
    # commit marker (stats) went FIRST, so the torn id is not
    # commit-complete in the crash window
    assert calls[:2] == ["stats", "postings"]
    assert not os.path.exists(os.path.join(path, "stats", "inc=inc0"))
    assert os.path.exists(os.path.join(path, "terms", "inc=inc0"))
    # retry finds the terms-only orphan and finishes the job
    assert BI.expire_bm25_increments(spark, path, keep=[]) == ["inc0"]
    assert not os.path.exists(os.path.join(path, "terms", "inc=inc0"))
    plain = str(tmp_path / "plain_idx")
    BI.build_bm25_index(a, plain, n_buckets=8)
    assert _ranked(
        BI.bm25_topk_indexed(spark, path, qs, k=5).collect()
    ) == _ranked(BI.bm25_topk_indexed(spark, plain, qs, k=5).collect())


def test_retry_clears_commit_marker_first(spark, frames, tmp_path, monkeypatch):
    """ADVICE r13: a same-id append RETRY clears the commit-marker
    table (stats) before postings/terms — a crash (or concurrent
    compaction snapshot) between the clears must never observe a
    commit-complete id whose postings are already gone (that fold
    would inflate served n_docs with no matching postings)."""
    import os

    a, b, qs = frames
    path = str(tmp_path / "retry_idx")
    BI.build_bm25_index(a, path, n_buckets=8)
    BI.append_bm25_index(b, path, increment_id="inc0")

    real = BI._clear_inc_partition
    calls = []

    def crashy(spark_, table_dir, inc):
        calls.append(os.path.basename(table_dir))
        real(spark_, table_dir, inc)
        if len(calls) == 1:
            raise RuntimeError("injected crash between retry clears")

    monkeypatch.setattr(BI, "_clear_inc_partition", crashy)
    with pytest.raises(RuntimeError, match="injected crash"):
        BI.append_bm25_index(b, path, increment_id="inc0")  # retry
    monkeypatch.undo()
    assert calls == ["stats"]
    # the torn id is NOT commit-complete: stats gone, postings present
    assert not os.path.exists(os.path.join(path, "stats", "inc=inc0"))
    assert os.path.exists(os.path.join(path, "postings", "inc=inc0"))
    # so a compaction folds NOTHING of it (commit gate), and the stale
    # postings ride whole into the next generation untouched
    assert BI.compact_bm25_index(spark, path) == 0
    # the retry itself converges: clears finish, the rewritten
    # increment serves exactly as a from-scratch build
    BI.append_bm25_index(b, path, increment_id="inc0")
    fresh = str(tmp_path / "fresh_idx")
    BI.build_bm25_index(a.unionByName(b), fresh, n_buckets=8)
    assert _ranked(
        BI.bm25_topk_indexed(spark, path, qs, k=5).collect()
    ) == _ranked(BI.bm25_topk_indexed(spark, fresh, qs, k=5).collect())


def test_pre_r13_layout_refused_with_rebuild_hint(spark, frames, tmp_path):
    """VERDICT r13 item 4: an index missing the ``terms/`` lexicon
    (pre-r13 layout) is refused loudly with the rebuild hint, and a
    rebuild restores serving."""
    import shutil
    import os

    a, _, qs = frames
    path = str(tmp_path / "old_idx")
    BI.build_bm25_index(a, path, n_buckets=8)
    shutil.rmtree(os.path.join(path, "terms"))
    with pytest.raises(ValueError, match="pre-r13"):
        BI.bm25_topk_indexed(spark, path, qs, k=3).collect()
    BI.build_bm25_index(a, path, n_buckets=8)  # the hinted rebuild
    plain = str(tmp_path / "plain_idx")
    BI.build_bm25_index(a, plain, n_buckets=8)
    assert _ranked(
        BI.bm25_topk_indexed(spark, path, qs, k=3).collect()
    ) == _ranked(BI.bm25_topk_indexed(spark, plain, qs, k=3).collect())
