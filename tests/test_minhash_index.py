"""Materialized MinHash index (operators/minhash_index.py): build/search
round trip, broadcast-only plan, append growth, and equivalence of the
incremental step with the one-shot batch pipeline."""

from __future__ import annotations

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from bigdataproject_formula1_telemetry_spark import io
from bigdataproject_formula1_telemetry_spark.operators import minhash_index as MI
from bigdataproject_formula1_telemetry_spark.operators.dedup import near_dedup_minhash


@pytest.fixture(scope="module")
def old_docs(spark):
    return io.read_table(spark, SF_SMOKE, "documents").select("doc_id", "text")


@pytest.fixture()
def index_path(spark, old_docs, tmp_path):
    p = str(tmp_path / "mhidx")
    MI.build_minhash_index(old_docs, p)
    return p


def _increment(spark, old_docs):
    rows = old_docs.orderBy("doc_id").limit(2).collect()
    return spark.createDataFrame(
        [
            Row(doc_id=100_000, text=rows[0]["text"]),                  # exact copy
            Row(doc_id=100_001, text=rows[1]["text"] + " appended"),    # near copy
            Row(doc_id=100_002, text="a genuinely fresh document about nothing else"),
            Row(doc_id=100_003, text="another brand new text with its own words"),
        ]
    )


def test_search_drops_copies_keeps_fresh(spark, old_docs, index_path):
    inc = _increment(spark, old_docs)
    kept = {
        r["doc_id"]
        for r in MI.dedup_against_index(spark, inc, index_path, 0.8).collect()
    }
    assert kept == {100_002, 100_003}


def test_plan_never_shuffles_the_index(spark, old_docs, index_path):
    inc = _increment(spark, old_docs)
    plan = (
        MI.dedup_against_index(spark, inc, index_path, 0.8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_est_jaccard_extremes(spark, old_docs, index_path):
    inc = _increment(spark, old_docs)
    new_sig = MI._sig_frame(inc, "text", "doc_id", 64, 3)
    idx = spark.read.parquet(index_path + "/sigs")
    first_old = old_docs.orderBy("doc_id").first()["doc_id"]
    a = idx.where(F.col("id") == first_old).select(F.col("sig").alias("sa"))
    b = new_sig.where(F.col("id") == 100_000).select(F.col("sig").alias("sb"))
    est = a.crossJoin(b).select(MI._est_jaccard(F.col("sa"), F.col("sb"), 64).alias("e")).first()["e"]
    assert est == 1.0
    c = new_sig.where(F.col("id") == 100_002).select(F.col("sig").alias("sb"))
    est2 = a.crossJoin(c).select(MI._est_jaccard(F.col("sa"), F.col("sb"), 64).alias("e")).first()["e"]
    assert est2 < 0.2


def test_append_grows_the_state(spark, old_docs, index_path):
    inc = _increment(spark, old_docs)
    admitted = MI.incremental_near_dedup(spark, inc, index_path, 0.8)
    assert {r["doc_id"] for r in admitted.collect()} == {100_002, 100_003}
    # a second increment copying a FIRST-increment survivor must now drop
    inc2 = spark.createDataFrame(
        [
            Row(doc_id=200_000, text="a genuinely fresh document about nothing else"),
            Row(doc_id=200_001, text="yet more entirely new material to admit"),
        ]
    )
    kept2 = {
        r["doc_id"]
        for r in MI.dedup_against_index(spark, inc2, index_path, 0.8).collect()
    }
    assert kept2 == {200_001}


def test_incremental_equals_batch_on_planted_corpus(spark, old_docs, tmp_path):
    p = str(tmp_path / "mhidx_eq")
    # index what was ADMITTED: the corpus self-deduped (sf0.001 has a few
    # natural near-dup pairs) — the realistic steady-state precondition
    base = near_dedup_minhash(old_docs).localCheckpoint(eager=True)
    MI.build_minhash_index(base, p)
    rows = base.orderBy("doc_id").limit(2).collect()
    inc = spark.createDataFrame(
        [
            Row(doc_id=100_000, text=rows[0]["text"]),
            Row(doc_id=100_001, text=rows[1]["text"]),
            Row(doc_id=100_002, text="fresh text one about new subjects entirely"),
            Row(doc_id=100_003, text="fresh text one about new subjects entirely"),
            Row(doc_id=100_004, text="fresh text two with different content"),
        ]
    )
    batch = {
        r["doc_id"]
        for r in near_dedup_minhash(base.unionByName(inc)).collect()
    }
    incr = {
        r["doc_id"]
        for r in MI.incremental_near_dedup(spark, inc, p, 0.8, append=False).collect()
    }
    old_ids = {r["doc_id"] for r in base.collect()}
    # the corpus is dup-free and ids order old < inc, so batch keeps all
    # old docs and exactly the increment's incremental survivors
    assert batch == old_ids | incr
    assert incr == {100_002, 100_004}


def test_null_text_docs_pass_through(spark, old_docs, index_path):
    inc = spark.createDataFrame(
        [Row(doc_id=1, text=None)], schema="doc_id long, text string"
    )
    kept = MI.dedup_against_index(spark, inc, index_path, 0.8).collect()
    assert [r["doc_id"] for r in kept] == [1]


def test_append_is_retry_idempotent(spark, old_docs, index_path):
    inc = _increment(spark, old_docs)
    kept = MI.dedup_against_index(spark, inc, index_path, 0.8).localCheckpoint(
        eager=True
    )
    n_sigs_before = spark.read.parquet(index_path + "/sigs").count()
    # "retry": the same increment admitted twice under the same id
    MI.append_minhash_index(kept, index_path, increment_id="day1")
    n1 = spark.read.parquet(index_path + "/sigs").count()
    MI.append_minhash_index(kept, index_path, increment_id="day1")
    n2 = spark.read.parquet(index_path + "/sigs").count()
    assert n1 == n2 == n_sigs_before + kept.count()
    # a DIFFERENT increment id adds its own partition
    MI.append_minhash_index(
        kept.withColumn("doc_id", kept["doc_id"] + 500_000),
        index_path,
        increment_id="day2",
    )
    n3 = spark.read.parquet(index_path + "/sigs").count()
    assert n3 == n2 + kept.count()
    # search still sees everything admitted
    again = {
        r["doc_id"]
        for r in MI.dedup_against_index(spark, kept, index_path, 0.8).collect()
    }
    assert again == set()  # every admitted doc is now its own index hit


def test_append_empty_retry_clears_stale_partition(spark, old_docs, index_path):
    """A retried increment that admits NOTHING must clear the prior
    attempt's inc= partition: dynamic partition overwrite alone only
    replaces partitions present in the new data, so stale signatures
    would survive an empty re-run and over-drop future increments."""
    inc = _increment(spark, old_docs)
    kept = MI.dedup_against_index(spark, inc, index_path, 0.8).localCheckpoint(
        eager=True
    )
    n_base = spark.read.parquet(index_path + "/sigs").count()
    MI.append_minhash_index(kept, index_path, increment_id="day1")
    assert spark.read.parquet(index_path + "/sigs").count() == n_base + kept.count()
    # the retry admits nothing (upstream re-filter dropped everything)
    MI.append_minhash_index(
        kept.where(F.lit(False)), index_path, increment_id="day1"
    )
    assert spark.read.parquet(index_path + "/sigs").count() == n_base
    # the once-admitted fresh docs are index hits no longer: they all
    # survive a fresh search (state truly rolled back)
    again = {
        r["doc_id"]
        for r in MI.dedup_against_index(spark, kept, index_path, 0.8).collect()
    }
    assert again == {r["doc_id"] for r in kept.collect()}


def test_append_rejects_unsafe_increment_id(spark, old_docs, index_path):
    inc = _increment(spark, old_docs)
    with pytest.raises(ValueError, match="increment_id"):
        MI.append_minhash_index(inc, index_path, increment_id="../evil")


def test_signature_verify_band_near_threshold(spark, tmp_path):
    """Verification sharpness: dedup_against_index verifies with the
    64-lane signature ESTIMATE of Jaccard, quantized to 1/64 with
    binomial lane noise (se ≈ 0.05 at J = 0.8).  Pin the band: every
    pair whose EXACT shingle Jaccard is ≥ 0.15 (3 se) away from the 0.8
    threshold must get the exact verdict; disagreements may only occur
    inside that band (minhash is deterministic, so this is a fixed
    measurement, not a flaky draw)."""
    THRESH, BAND = 0.8, 0.15
    n = 100  # tokens per doc
    pairs = []  # (pair_idx, k_shared_tokens, exact_jaccard)
    for i, target in enumerate([round(0.50 + 0.02 * j, 2) for j in range(25)]):
        s = round(2 * (n - 2) * target / (1 + target))  # shared shingles
        k = s + 2  # shared prefix tokens
        a_toks = [f"p{i}a{t}" for t in range(n)]
        b_toks = a_toks[:k] + [f"p{i}b{t}" for t in range(n - k)]
        sh = lambda toks: {
            " ".join(toks[j : j + 3]) for j in range(len(toks) - 2)
        }
        inter = len(sh(a_toks) & sh(b_toks))
        union = len(sh(a_toks) | sh(b_toks))
        pairs.append((i, a_toks, b_toks, inter / union))

    idx_path = str(tmp_path / "band_idx")
    old = spark.createDataFrame(
        [(i, " ".join(a)) for i, a, _, _ in pairs], "doc_id long, text string"
    )
    MI.build_minhash_index(old, idx_path)
    inc = spark.createDataFrame(
        [(1000 + i, " ".join(b)) for i, _, b, _ in pairs],
        "doc_id long, text string",
    )
    kept = {
        r["doc_id"]
        for r in MI.dedup_against_index(spark, inc, idx_path, THRESH)
        .select("doc_id")
        .collect()
    }
    disagree_margins = []
    for i, _, _, jacc in pairs:
        dropped = (1000 + i) not in kept
        exact_verdict = jacc >= THRESH
        if dropped != exact_verdict:
            disagree_margins.append(abs(jacc - THRESH))
    # every disagreement sits inside the 3-se band around the threshold
    assert all(m < BAND for m in disagree_margins), disagree_margins
    # sanity: the sweep actually covered both sides beyond the band
    assert any(j >= THRESH + BAND for *_, j in pairs)
    assert any(j <= THRESH - BAND for *_, j in pairs)


def test_exclude_inc_is_partition_pruned(spark, old_docs, index_path):
    """exclude_inc must reach the scans as a PARTITION filter (inc is a
    partition column), not a post-scan predicate — at scale it prices
    as skipped directories."""
    import re

    inc = _increment(spark, old_docs)
    MI.append_minhash_index(inc, index_path, increment_id="day9")
    plan = (
        MI.dedup_against_index(spark, inc, index_path, 0.8, exclude_inc="day9")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("inc" in f and "day9" in f for f in filters), filters
    # and the plan still never shuffles the index
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_expire_increments_retention(spark, old_docs, index_path):
    """The dedup-horizon policy: expired increments' documents become
    admissible again; base is always kept; listing is metadata-only."""
    fresh = spark.createDataFrame(
        [
            Row(doc_id=700_000, text="retention doc one with its own words"),
            Row(doc_id=700_001, text="retention doc two about other things"),
        ]
    )
    MI.append_minhash_index(
        fresh.where(F.col("doc_id") == 700_000), index_path,
        increment_id="day-001",
    )
    MI.append_minhash_index(
        fresh.where(F.col("doc_id") == 700_001), index_path,
        increment_id="day-002",
    )
    assert MI.list_increments(spark, index_path) == ["base", "day-001", "day-002"]
    # both docs are index hits now
    assert MI.dedup_against_index(spark, fresh, index_path, 0.8).count() == 0
    # expire day-001 (keep predicate form)
    gone = MI.expire_increments(
        spark, index_path, keep=lambda i: i >= "day-002"
    )
    assert gone == ["day-001"]
    assert MI.list_increments(spark, index_path) == ["base", "day-002"]
    kept = {
        r["doc_id"]
        for r in MI.dedup_against_index(spark, fresh, index_path, 0.8).collect()
    }
    assert kept == {700_000}  # expired doc admissible again, day-002 still hits
    # explicit-list form keeps nothing extra; base survives regardless
    assert MI.expire_increments(spark, index_path, keep=[]) == ["day-002"]
    assert MI.list_increments(spark, index_path) == ["base"]


def test_compact_index_folds_increments(spark, old_docs, index_path):
    """Compaction folds every inc= partition into base: search results
    identical before and after, increments list collapses, banded file
    count shrinks."""
    import glob

    inc1 = spark.createDataFrame(
        [Row(doc_id=800_000, text="compaction probe doc one of a kind")]
    )
    inc2 = spark.createDataFrame(
        [Row(doc_id=800_001, text="compaction probe doc two equally unique")]
    )
    MI.append_minhash_index(inc1, index_path, increment_id="c1")
    MI.append_minhash_index(inc2, index_path, increment_id="c2")
    probe = inc1.unionByName(inc2).unionByName(
        spark.createDataFrame(
            [Row(doc_id=800_002, text="a wholly fresh never indexed doc")]
        )
    )
    before = {
        r["doc_id"]
        for r in MI.dedup_against_index(spark, probe, index_path, 0.8).collect()
    }
    files_before = len(glob.glob(index_path + "/banded/**/*.parquet", recursive=True))
    assert MI.compact_index(spark, index_path) == 2
    assert MI.list_increments(spark, index_path) == ["base"]
    after = {
        r["doc_id"]
        for r in MI.dedup_against_index(spark, probe, index_path, 0.8).collect()
    }
    assert after == before == {800_002}
    files_after = len(glob.glob(index_path + "/banded/**/*.parquet", recursive=True))
    assert files_after < files_before
    # idempotent no-op on an already-compact index
    assert MI.compact_index(spark, index_path) == 0


def test_swap_staged_is_crash_safe_shape(spark, tmp_path):
    """``_swap_staged`` renames the live table ASIDE before renaming the
    staged dir into place (a complete copy exists under some name at
    every instant), and clears any stale ``.old`` left by a prior
    crashed swap instead of tripping over it."""
    from bigdataproject_formula1_telemetry_spark.operators.minhash_index import (
        _swap_staged,
    )

    live = tmp_path / "t"
    staged = tmp_path / "t.compact"
    live.mkdir()
    (live / "a.txt").write_text("old")
    staged.mkdir()
    (staged / "b.txt").write_text("new")
    stale = tmp_path / "t.old"
    stale.mkdir()
    (stale / "stale.txt").write_text("x")

    _swap_staged(spark, str(staged), str(live))
    assert (live / "b.txt").read_text() == "new"
    assert not (live / "a.txt").exists()
    assert not staged.exists() and not stale.exists()


def test_rebuild_onto_used_path_drops_stale_increments(spark, tmp_path):
    """A base build is a FRESH index: under the session's dynamic
    partition-overwrite default, the build's overwrite used to replace
    only inc=base, silently keeping the previous generation's inc=*
    partitions — stale admission state rejecting docs the new index
    never saw."""
    path = str(tmp_path / "midx")
    mk = lambda i, w: (i, " ".join([w] * 25))
    gen1 = spark.createDataFrame(
        [mk(1, "first generation article words")], "doc_id long, text string"
    )
    MI.build_minhash_index(gen1, path)
    MI.append_minhash_index(
        spark.createDataFrame(
            [mk(2, "incremental generation article words")],
            "doc_id long, text string",
        ),
        path, increment_id="day1",
    )
    assert MI.list_increments(spark, path) == ["base", "day1"]
    # rebuild from scratch with different content
    gen2 = spark.createDataFrame(
        [mk(9, "second generation article words")], "doc_id long, text string"
    )
    MI.build_minhash_index(gen2, path)
    assert MI.list_increments(spark, path) == ["base"]
    # a near-copy of the OLD day1 increment must now be admitted
    probe = spark.createDataFrame(
        [mk(100, "incremental generation article words")],
        "doc_id long, text string",
    )
    kept = MI.dedup_against_index(spark, probe, path)
    assert [r["doc_id"] for r in kept.collect()] == [100]
