"""Interleaving fault-injection for the shared index-family compaction
lease/abort contract (`operators/index_lifecycle.py`, VERDICT r11 item
1 — the race class `corpus_release` was hardened against in r10/r11,
modeled on `tests/test_release_append.py`):

- an append overlapping a held lease FAILS FAST (pre-write check);
- a lease landing mid-append ABORTS the append and rolls back its own
  `inc=` partitions — nothing published, the docs re-appendable;
- an increment appended after a compaction's snapshot (the pre-check
  window where the lease is not yet visible) is RECONCILED into the
  swapped table — moved, never deleted;
- a crash between two tables' swaps is RETRYABLE: the no-op decision
  consults every table, so the retry folds the remaining table and
  clears the lease (the compact_bm25_index stats-unfolded ADVICE r11
  finding);
- a crash between the swap's two renames is recovered (old renamed
  back) before the retry refolds.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.operators import (
    bm25_index as BI,
    exact_index as EI,
    index_lifecycle as LC,
    minhash_index as MI,
    retrieval as RT,
    semdedup as SD,
)

DOCS = [
    (0, "spark shuffles data between stages for wide operations"),
    (1, "broadcast joins avoid shuffles for small build sides"),
    (2, "the quick brown fox jumps over the lazy dog"),
    (3, "spark spark spark shuffle shuffle broadcast"),
    (4, "completely unrelated text about cooking pasta al dente"),
]
LATE = [(20, "late increment about spark shuffle behavior under skew")]
QUERIES = [("qa", "spark shuffle broadcast"), ("qb", "lazy dog")]


@pytest.fixture()
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    late = spark.createDataFrame(LATE, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id string, text string")
    return docs, late, qs


def _ranked(rows):
    return sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in rows
    )


# ------------------------------------------------------------- bm25


def test_bm25_append_fails_fast_while_lease_held(spark, frames, tmp_path):
    docs, late, _ = frames
    path = str(tmp_path / "idx")
    BI.build_bm25_index(docs, path, n_buckets=8)
    LC.write_lease(spark, LC.lease_file_at(path), ["inc0"])
    with pytest.raises(ValueError, match="compaction lease is held"):
        BI.append_bm25_index(late, path, increment_id="incX")
    LC.clear_lease(spark, LC.lease_file_at(path))
    BI.append_bm25_index(late, path, increment_id="incX")  # now clean
    assert "incX" in BI.list_bm25_increments(spark, path)


def test_bm25_lease_landing_mid_append_aborts_and_rolls_back(
    spark, frames, tmp_path, monkeypatch
):
    """The residual pre-check window: a compaction leases the index
    after the append's pre-write check but before its writes finish.
    The post-write re-check must abort the append with NOTHING
    published — both tables' inc= partitions rolled back, serving
    unchanged — and the same docs must append cleanly once the lease
    clears."""
    docs, late, qs = frames
    path = str(tmp_path / "idx")
    BI.build_bm25_index(docs, path, n_buckets=8)
    before = _ranked(BI.bm25_topk_indexed(spark, path, qs, k=5).collect())

    real_stats = BI._stats_frame

    def lease_lands_mid_write(new_docs, text_col):
        # the postings write already happened; the lease lands now,
        # before the stats write and the append's post-write re-check
        LC.write_lease(spark, LC.lease_file_at(path), ["base"])
        return real_stats(new_docs, text_col)

    monkeypatch.setattr(BI, "_stats_frame", lease_lands_mid_write)
    with pytest.raises(RuntimeError, match="leased this index mid-append"):
        BI.append_bm25_index(late, path, increment_id="incRACE")
    monkeypatch.undo()

    assert BI.list_bm25_increments(spark, path) == ["base"]
    assert not os.path.exists(os.path.join(path, "postings", "inc=incRACE"))
    assert not os.path.exists(os.path.join(path, "stats", "inc=incRACE"))
    assert (
        _ranked(BI.bm25_topk_indexed(spark, path, qs, k=5).collect())
        == before
    )

    LC.clear_lease(spark, LC.lease_file_at(path))
    BI.append_bm25_index(late, path, increment_id="incRACE")
    assert "incRACE" in BI.list_bm25_increments(spark, path)
    # post-recovery serving equals the corpus scan over docs ∪ late
    want = _ranked(
        RT.bm25_topk(docs.unionByName(late), qs, k=5).collect()
    )
    got = _ranked(BI.bm25_topk_indexed(spark, path, qs, k=5).collect())
    assert got == want


def test_bm25_compaction_reconciles_append_landing_after_snapshot(
    spark, frames, tmp_path, monkeypatch
):
    """An append that passed its pre-check before the lease became
    visible (simulated: lease write no-op'd) and lands between the
    compactor's snapshot and its swap must SURVIVE the swap — moved
    into the new table as a live increment, its rows served exactly
    once (the r11 verdict's silent-delete race, closed)."""
    docs, late, qs = frames
    path = str(tmp_path / "idx")
    BI.build_bm25_index(docs, path, n_buckets=8)
    BI.append_bm25_index(
        spark.createDataFrame(
            [(10, "another appended doc mentioning the lazy dog again")],
            "doc_id long, text string",
        ),
        path,
        increment_id="inc0",
    )

    monkeypatch.setattr(LC, "write_lease", lambda *a, **k: None)
    real_swap = LC._swap_staged_reconcile
    injected = {}

    def append_then_swap(spark_, staged, table, snapshot_ids):
        if not injected:  # first (postings) swap only
            injected["done"] = True
            BI.append_bm25_index(late, path, increment_id="incLATE")
        return real_swap(spark_, staged, table, snapshot_ids)

    monkeypatch.setattr(LC, "_swap_staged_reconcile", append_then_swap)
    assert BI.compact_bm25_index(spark, path) >= 1
    monkeypatch.undo()

    # the late increment survived the swap as a live increment
    assert "incLATE" in BI.list_bm25_increments(spark, path)
    # and serving equals the corpus scan over everything, rows once each
    all_docs = docs.unionByName(
        spark.createDataFrame(
            [(10, "another appended doc mentioning the lazy dog again")],
            "doc_id long, text string",
        )
    ).unionByName(late)
    want = _ranked(RT.bm25_topk(all_docs, qs, k=6).collect())
    got = _ranked(BI.bm25_topk_indexed(spark, path, qs, k=6).collect())
    assert got == want
    # stats fold consistency: N counts every doc exactly once
    n_docs = (
        spark.read.parquet(os.path.join(path, "stats"))
        .agg(F.sum("n_docs"))
        .first()[0]
    )
    assert n_docs == all_docs.count()


def test_bm25_crash_between_table_swaps_is_retryable(
    spark, frames, tmp_path, monkeypatch
):
    """ADVICE r11: a crash between the postings swap and the stats swap
    used to leave stats unfolded FOREVER (the no-op check consulted
    only postings).  Now: the lease survives the crash, appends fail
    fast meanwhile, and a compact retry folds the remaining table and
    clears the lease — serving identical throughout."""
    docs, late, qs = frames
    path = str(tmp_path / "idx")
    BI.build_bm25_index(docs, path, n_buckets=8)
    BI.append_bm25_index(late, path, increment_id="inc0")
    want = _ranked(BI.bm25_topk_indexed(spark, path, qs, k=6).collect())

    real_swap = LC._swap_staged_reconcile
    calls = {"n": 0}

    def crash_after_first_swap(spark_, staged, table, snapshot_ids):
        real_swap(spark_, staged, table, snapshot_ids)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash between table swaps")

    monkeypatch.setattr(LC, "_swap_staged_reconcile", crash_after_first_swap)
    with pytest.raises(RuntimeError, match="injected crash"):
        BI.compact_bm25_index(spark, path)
    monkeypatch.undo()

    # crashed state: postings folded, stats NOT, lease held
    assert BI.list_bm25_increments(spark, path) == ["base"]
    assert LC.list_inc_ids(spark, os.path.join(path, "stats")) == [
        "base",
        "inc0",
    ]
    assert LC.read_lease(spark, LC.lease_file_at(path)) == {"inc0"}
    with pytest.raises(ValueError, match="compaction lease is held"):
        BI.append_bm25_index(late, path, increment_id="incY")

    # retry finishes the job: stats folds, lease clears, serving equal
    assert BI.compact_bm25_index(spark, path) == 1
    assert LC.read_lease(spark, LC.lease_file_at(path)) is None
    assert LC.list_inc_ids(spark, os.path.join(path, "stats")) == ["base"]
    got = _ranked(BI.bm25_topk_indexed(spark, path, qs, k=6).collect())
    assert got == want


def test_recover_from_crash_between_swap_renames(spark, frames, tmp_path):
    """A crash BETWEEN the swap's two renames leaves `<table>.old` as
    the only copy; the next compact renames it back before refolding."""
    docs, late, qs = frames
    path = str(tmp_path / "idx")
    BI.build_bm25_index(docs, path, n_buckets=8)
    BI.append_bm25_index(late, path, increment_id="inc0")
    want = _ranked(BI.bm25_topk_indexed(spark, path, qs, k=6).collect())

    # simulate: live postings renamed aside, staged never landed
    ppath = os.path.join(path, "postings")
    os.rename(ppath, ppath + ".old")
    LC.write_lease(spark, LC.lease_file_at(path), ["inc0"])

    assert BI.compact_bm25_index(spark, path) == 1
    assert LC.read_lease(spark, LC.lease_file_at(path)) is None
    assert not os.path.exists(ppath + ".old")
    got = _ranked(BI.bm25_topk_indexed(spark, path, qs, k=6).collect())
    assert got == want


# ---------------------------------------------------------- minhash


def test_minhash_lease_landing_mid_append_aborts_and_rolls_back(
    spark, frames, tmp_path, monkeypatch
):
    docs, late, _ = frames
    path = str(tmp_path / "midx")
    MI.build_minhash_index(docs, path)

    real_banded = MI._banded

    def lease_lands_mid_write(sig_frame, num_hashes, bands):
        # the sigs write already happened; the lease lands before the
        # banded write and the post-write re-check
        LC.write_lease(spark, LC.lease_file_at(path), ["base"])
        return real_banded(sig_frame, num_hashes, bands)

    monkeypatch.setattr(MI, "_banded", lease_lands_mid_write)
    with pytest.raises(RuntimeError, match="leased this index mid-append"):
        MI.append_minhash_index(late, path, increment_id="incRACE")
    monkeypatch.undo()

    assert MI.list_increments(spark, path) == ["base"]
    assert not os.path.exists(os.path.join(path, "sigs", "inc=incRACE"))
    assert not os.path.exists(os.path.join(path, "banded", "inc=incRACE"))

    # a copy of a LATE doc is NOT dropped (nothing was admitted) ...
    probe = late.select(
        (F.col("doc_id") + 100).alias("doc_id"), "text"
    )
    kept = MI.dedup_against_index(spark, probe, path)
    assert kept.count() == 1

    # ... until the lease clears and the append retries cleanly
    LC.clear_lease(spark, LC.lease_file_at(path))
    MI.append_minhash_index(late, path, increment_id="incRACE")
    assert MI.dedup_against_index(spark, probe, path).count() == 0


def test_minhash_pre_check_and_expire_fail_fast(spark, frames, tmp_path):
    docs, late, _ = frames
    path = str(tmp_path / "midx")
    MI.build_minhash_index(docs, path)
    MI.append_minhash_index(late, path, increment_id="inc0")
    LC.write_lease(spark, LC.lease_file_at(path), ["inc0"])
    with pytest.raises(ValueError, match="compaction lease is held"):
        MI.append_minhash_index(late, path, increment_id="incX")
    with pytest.raises(ValueError, match="compaction lease is held"):
        MI.expire_increments(spark, path, keep=[])
    LC.clear_lease(spark, LC.lease_file_at(path))
    assert MI.expire_increments(spark, path, keep=[]) == ["inc0"]


def test_minhash_compaction_reconciles_late_append(
    spark, frames, tmp_path, monkeypatch
):
    """The same reconcile pin as bm25, on the minhash table pair: a
    post-snapshot append survives the swap and its signatures still
    drop a later copy."""
    docs, late, _ = frames
    path = str(tmp_path / "midx")
    MI.build_minhash_index(docs, path)
    MI.append_minhash_index(
        spark.createDataFrame(
            [(10, "another appended doc mentioning the lazy dog again")],
            "doc_id long, text string",
        ),
        path,
        increment_id="inc0",
    )

    monkeypatch.setattr(LC, "write_lease", lambda *a, **k: None)
    real_swap = LC._swap_staged_reconcile
    injected = {}

    def append_then_swap(spark_, staged, table, snapshot_ids):
        if not injected:
            injected["done"] = True
            MI.append_minhash_index(late, path, increment_id="incLATE")
        return real_swap(spark_, staged, table, snapshot_ids)

    monkeypatch.setattr(LC, "_swap_staged_reconcile", append_then_swap)
    assert MI.compact_index(spark, path) >= 1
    monkeypatch.undo()

    assert "incLATE" in MI.list_increments(spark, path)
    probe = late.select((F.col("doc_id") + 100).alias("doc_id"), "text")
    assert MI.dedup_against_index(spark, probe, path).count() == 0


# ------------------------------------------------- exact / semantic


def test_exact_index_lifecycle_guards(spark, frames, tmp_path, monkeypatch):
    """Pre-check fail-fast + mid-append abort/rollback + crash-retry on
    the exact index's (hashes, bloom) pair."""
    docs, late, _ = frames
    path = str(tmp_path / "eidx")
    EI.build_exact_index(docs, path, expected_items=10_000)

    LC.write_lease(spark, LC.lease_file_at(path), ["base"])
    with pytest.raises(ValueError, match="compaction lease is held"):
        EI.append_exact_index(late, path, increment_id="incX")
    LC.clear_lease(spark, LC.lease_file_at(path))

    real_rows = EI._bloom_rows

    def lease_lands_mid_write(hb, m_bits, k, inc):
        LC.write_lease(spark, LC.lease_file_at(path), ["base"])
        return real_rows(hb, m_bits, k, inc)

    monkeypatch.setattr(EI, "_bloom_rows", lease_lands_mid_write)
    with pytest.raises(RuntimeError, match="leased this index mid-append"):
        EI.append_exact_index(late, path, increment_id="incRACE")
    monkeypatch.undo()
    assert EI.list_increments(spark, path) == ["base"]
    assert not os.path.exists(os.path.join(path, "hashes", "inc=incRACE"))
    assert not os.path.exists(os.path.join(path, "bloom", "inc=incRACE"))
    # an exact copy of a late doc passes (nothing admitted)
    assert EI.dedup_exact_against_index(spark, late, path).count() == 1

    LC.clear_lease(spark, LC.lease_file_at(path))
    EI.append_exact_index(late, path, increment_id="incRACE")
    assert EI.dedup_exact_against_index(spark, late, path).count() == 0

    # crash between the hashes swap and the bloom swap, then retry
    real_swap = LC._swap_staged_reconcile
    calls = {"n": 0}

    def crash_after_first_swap(spark_, staged, table, snapshot_ids):
        real_swap(spark_, staged, table, snapshot_ids)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash between table swaps")

    monkeypatch.setattr(LC, "_swap_staged_reconcile", crash_after_first_swap)
    with pytest.raises(RuntimeError, match="injected crash"):
        EI.compact_exact_index(spark, path)
    monkeypatch.undo()
    assert LC.list_inc_ids(spark, os.path.join(path, "bloom")) == [
        "base",
        "incRACE",
    ]
    assert EI.compact_exact_index(spark, path) == 1
    assert LC.list_inc_ids(spark, os.path.join(path, "bloom")) == ["base"]
    assert LC.read_lease(spark, LC.lease_file_at(path)) is None
    # the folded index still rejects both old and late copies
    assert EI.dedup_exact_against_index(spark, late, path).count() == 0
    assert EI.dedup_exact_against_index(spark, docs, path).count() == 0


def test_folded_id_reuse_is_refused_until_rebuild(spark, frames, tmp_path):
    """The folded-id marker (the corpus_release rule, r12): re-appending
    an id a compaction folded into base would write fresh rows NEXT to
    the already-folded ones — double-counted tf/df/stats for the bm25
    serving index.  The append must refuse; a fresh id works; a base
    REBUILD starts a new generation and clears the marker."""
    docs, late, qs = frames
    path = str(tmp_path / "idx")
    BI.build_bm25_index(docs, path, n_buckets=8)
    BI.append_bm25_index(late, path, increment_id="inc0")
    assert BI.compact_bm25_index(spark, path) == 1
    assert LC.read_folded(spark, LC.lease_file_at(path)) == {"inc0"}
    with pytest.raises(ValueError, match="already folded"):
        BI.append_bm25_index(late, path, increment_id="inc0")
    # a fresh id admits cleanly, and stats count every doc exactly once
    BI.append_bm25_index(
        spark.createDataFrame(
            [(30, "yet another fresh spark document")],
            "doc_id long, text string",
        ),
        path,
        increment_id="inc1",
    )
    n_docs = (
        spark.read.parquet(os.path.join(path, "stats"))
        .agg(F.sum("n_docs"))
        .first()[0]
    )
    assert n_docs == len(DOCS) + len(LATE) + 1
    # marker accumulates across generations
    assert BI.compact_bm25_index(spark, path) == 1
    assert LC.read_folded(spark, LC.lease_file_at(path)) == {"inc0", "inc1"}
    # a base rebuild is a FRESH generation: marker cleared, ids reusable
    BI.build_bm25_index(docs, path, n_buckets=8)
    assert LC.read_folded(spark, LC.lease_file_at(path)) == set()
    BI.append_bm25_index(late, path, increment_id="inc0")
    want = _ranked(RT.bm25_topk(docs.unionByName(late), qs, k=5).collect())
    got = _ranked(BI.bm25_topk_indexed(spark, path, qs, k=5).collect())
    assert got == want


def test_crash_before_marker_write_still_blocks_folded_id(
    spark, frames, tmp_path, monkeypatch
):
    """A crash AFTER the last table's swap but BEFORE the marker write
    leaves the folded ids unmarked — but the lease still names them, so
    appends stay blocked, and the compact retry's no-op path marks the
    lease's snapshot before clearing (no window where a folded id can
    silently double-admit)."""
    docs, late, _ = frames
    path = str(tmp_path / "idx")
    BI.build_bm25_index(docs, path, n_buckets=8)
    BI.append_bm25_index(late, path, increment_id="inc0")

    real_write_folded = LC._write_folded
    calls = {"n": 0}

    def crash_on_marker(spark_, lease_file, incs):
        calls["n"] += 1
        raise RuntimeError("injected crash before marker write")

    monkeypatch.setattr(LC, "_write_folded", crash_on_marker)
    with pytest.raises(RuntimeError, match="injected crash"):
        BI.compact_bm25_index(spark, path)
    monkeypatch.setattr(LC, "_write_folded", real_write_folded)

    # tables folded, marker missing, lease held: appends blocked
    assert BI.list_bm25_increments(spark, path) == ["base"]
    assert LC.read_folded(spark, LC.lease_file_at(path)) == set()
    with pytest.raises(ValueError, match="compaction lease is held"):
        BI.append_bm25_index(late, path, increment_id="inc0")
    # the retry's no-op path marks the lease snapshot and clears
    assert BI.compact_bm25_index(spark, path) == 0
    assert LC.read_folded(spark, LC.lease_file_at(path)) == {"inc0"}
    assert LC.read_lease(spark, LC.lease_file_at(path)) is None
    with pytest.raises(ValueError, match="already folded"):
        BI.append_bm25_index(late, path, increment_id="inc0")


@pytest.mark.slowtier
def test_superseded_stale_lease_marks_folded_ids_before_overwrite(
    spark, frames, tmp_path, monkeypatch
):
    """ADVICE r12 (medium, non-no-op retry path): a compaction that
    crashed AFTER its last swap but BEFORE the marker write, with a
    reconciled late increment live, used to have the retry take the
    NON-no-op path and overwrite the stale lease — the crashed run's
    folded ids never reached ``_folded_incs.json``, so a later re-append
    under one would pass ``check_append_allowed`` and double-admit next
    to the already-folded rows.  The retry must mark the stale ids no
    longer live in any table BEFORE superseding the lease."""
    docs, late, qs = frames
    path = str(tmp_path / "idx")
    BI.build_bm25_index(docs, path, n_buckets=8)
    BI.append_bm25_index(late, path, increment_id="inc0")

    # crash after both swaps, before the marker write: tables folded,
    # lease still naming inc0, marker empty
    real_write_folded = LC._write_folded

    def crash_on_marker(spark_, lease_file, incs):
        raise RuntimeError("injected crash before marker write")

    monkeypatch.setattr(LC, "_write_folded", crash_on_marker)
    with pytest.raises(RuntimeError, match="injected crash"):
        BI.compact_bm25_index(spark, path)
    monkeypatch.setattr(LC, "_write_folded", real_write_folded)
    assert LC.read_lease(spark, LC.lease_file_at(path)) == {"inc0"}
    assert LC.read_folded(spark, LC.lease_file_at(path)) == set()

    # a late increment lands while the stale lease is held (the
    # reconcile window: its pre-check ran before the lease was visible)
    late2 = spark.createDataFrame(
        [(21, "reconciled late increment about spark broadcast")],
        "doc_id long, text string",
    )
    monkeypatch.setattr(LC, "check_append_allowed", lambda *a, **k: None)
    monkeypatch.setattr(LC, "abort_append_if_leased", lambda *a, **k: None)
    BI.append_bm25_index(late2, path, increment_id="incLATE")
    monkeypatch.undo()

    # the retry takes the non-no-op path (incLATE is live) — it must
    # mark inc0 folded BEFORE write_lease destroys the stale record
    assert BI.compact_bm25_index(spark, path) == 1
    assert LC.read_folded(spark, LC.lease_file_at(path)) == {
        "inc0",
        "incLATE",
    }
    assert LC.read_lease(spark, LC.lease_file_at(path)) is None
    with pytest.raises(ValueError, match="already folded"):
        BI.append_bm25_index(late, path, increment_id="inc0")
    # serving equals the corpus scan over everything, rows once each
    all_docs = docs.unionByName(late).unionByName(late2)
    want = _ranked(RT.bm25_topk(all_docs, qs, k=7).collect())
    got = _ranked(BI.bm25_topk_indexed(spark, path, qs, k=7).collect())
    assert got == want


def test_straddled_append_is_never_half_folded(
    spark, frames, tmp_path, monkeypatch
):
    """ADVICE r12 (medium, root-cause fix): an append straddling a
    compaction — early tables written, commit table (stats) not yet —
    used to have its postings folded into base while the rollback
    silently no-op'd on the vanished partition and deleted the stats
    one: base postings with no stats row (silently corrupted scores),
    reported as a clean abort.  Now the compactor folds only
    COMMIT-COMPLETE ids, so the mid-append compaction refuses the
    straddler entirely; the append then either completes or rolls back
    whole."""
    docs, late, qs = frames
    path = str(tmp_path / "idx")
    BI.build_bm25_index(docs, path, n_buckets=8)
    other = spark.createDataFrame(
        [(30, "a commit complete increment about spark broadcast joins")],
        "doc_id long, text string",
    )
    BI.append_bm25_index(other, path, increment_id="inc0")  # commit-complete

    real_stats = BI._stats_frame
    seen = {}

    def compactor_runs_mid_append(new_docs, text_col):
        # postings + terms for incRACE are on disk, stats (the commit
        # marker) is not: a full compaction right now must fold ONLY the
        # commit-complete inc0 and leave the straddler's partitions live
        seen["folded"] = BI.compact_bm25_index(spark, path)
        seen["postings_incs"] = BI.list_bm25_increments(spark, path)
        # ... and a compactor still mid-flight when the append's last
        # write + re-check run makes the append abort cleanly
        LC.write_lease(spark, LC.lease_file_at(path), [])
        return real_stats(new_docs, text_col)

    monkeypatch.setattr(BI, "_stats_frame", compactor_runs_mid_append)
    with pytest.raises(RuntimeError, match="leased this index mid-append"):
        BI.append_bm25_index(late, path, increment_id="incRACE")
    monkeypatch.undo()

    # the mid-append compaction folded inc0, NOT the straddler
    assert seen["folded"] == 1
    assert seen["postings_incs"] == ["base", "incRACE"]
    # the abort rolled the straddler back WHOLE — nothing half-folded
    for t in ("postings", "stats", "terms"):
        assert not os.path.exists(os.path.join(path, t, "inc=incRACE"))
    LC.clear_lease(spark, LC.lease_file_at(path))

    # the same docs re-append cleanly and serving equals the scan
    BI.append_bm25_index(late, path, increment_id="incRACE")
    all_docs = docs.unionByName(other).unionByName(late)
    want = _ranked(RT.bm25_topk(all_docs, qs, k=7).collect())
    got = _ranked(BI.bm25_topk_indexed(spark, path, qs, k=7).collect())
    assert got == want


def test_abort_rollback_detects_missing_partition(spark, tmp_path):
    """ADVICE r12 (abort-side guard, kept as defense in depth): if an
    expected ``inc=`` partition is ABSENT at rollback time (a fold the
    commit gate didn't prevent, a transient swap window, or an empty
    write), the rollback deletes NOTHING and raises the distinct
    treat-as-PUBLISHED error instead of the clean 'published nothing'
    message."""
    t1 = str(tmp_path / "t1")
    t2 = str(tmp_path / "t2")
    os.makedirs(os.path.join(t2, "inc=X"))
    lease = str(tmp_path / "_compacting.json")
    LC.write_lease(spark, lease, ["X"])
    with pytest.raises(
        RuntimeError, match="Treat this increment as PUBLISHED"
    ):
        LC.abort_append_if_leased(spark, lease, "X", [t1, t2], "op")
    # the survivor was NOT deleted
    assert os.path.exists(os.path.join(t2, "inc=X"))
    # with every partition present the clean rollback still runs
    os.makedirs(os.path.join(t1, "inc=X"))
    with pytest.raises(RuntimeError, match="published nothing"):
        LC.abort_append_if_leased(spark, lease, "X", [t1, t2], "op")
    assert not os.path.exists(os.path.join(t1, "inc=X"))
    assert not os.path.exists(os.path.join(t2, "inc=X"))


def test_minhash_folded_id_refused(spark, frames, tmp_path):
    docs, late, _ = frames
    path = str(tmp_path / "midx")
    MI.build_minhash_index(docs, path)
    MI.append_minhash_index(late, path, increment_id="inc0")
    assert MI.compact_index(spark, path) == 1
    with pytest.raises(ValueError, match="already folded"):
        MI.append_minhash_index(late, path, increment_id="inc0")
    MI.append_minhash_index(late, path, increment_id="inc1")  # fresh ok


# ------------------------------------------------- streaming (r13)


DOCS_S1 = [(100, "streaming batch one about spark shuffle mechanics")]
DOCS_S2 = [(101, "streaming batch two about broadcast joins and skew")]


def _write_stream_src(spark, src, parts):
    for i, part in enumerate(parts):
        spark.createDataFrame(part, "doc_id long, text string").coalesce(
            1
        ).write.parquet(f"{src}/p{i}")


def _run_stream(builder, timeout=120):
    q = builder.trigger(availableNow=True).start()
    try:
        q.awaitTermination(timeout)
    finally:
        if q.isActive:
            q.stop()
    return q


def test_index_stream_lease_between_micro_batches_fails_fast(
    spark, frames, tmp_path, monkeypatch
):
    """VERDICT r12 item 5: a compaction lease landing BETWEEN two
    micro-batches makes the NEXT batch's append fail fast — the
    streaming query dies loudly (foreachBatch propagates the lifecycle
    ValueError; no silent skip, no partial admit) — and a checkpoint
    RESTART after the lease clears replays the uncommitted batch
    idempotently: the final index equals the all-batch build."""
    from pyspark.errors import StreamingQueryException

    docs, _, qs = frames
    src = str(tmp_path / "src")
    _write_stream_src(spark, src, [DOCS_S1, DOCS_S2])
    idx = str(tmp_path / "s_idx")
    empty = spark.createDataFrame([], "doc_id long, text string")
    BI.build_bm25_index(empty, idx, n_buckets=8)

    real_append = BI.append_bm25_index
    calls = {"n": 0}

    def lease_lands_after_first_batch(*a, **k):
        real_append(*a, **k)
        calls["n"] += 1
        if calls["n"] == 1:
            LC.write_lease(spark, LC.lease_file_at(idx), [])

    monkeypatch.setattr(BI, "append_bm25_index", lease_lands_after_first_batch)

    def make_stream():
        return BI.index_stream(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*"),
            idx,
            str(tmp_path / "ckpt"),
        )

    with pytest.raises(StreamingQueryException, match="compaction lease is held"):
        _run_stream(make_stream())
    monkeypatch.undo()

    # batch one committed and admitted; batch two blocked, not admitted
    assert BI.list_bm25_increments(spark, idx) == ["b000000000000"]

    # lease clears (the compaction finished / was retried) -> the same
    # checkpoint replays ONLY the uncommitted batch and converges
    LC.clear_lease(spark, LC.lease_file_at(idx))
    q = _run_stream(make_stream())
    assert not q.isActive
    ref = str(tmp_path / "ref_idx")
    all_docs = spark.createDataFrame(
        DOCS_S1 + DOCS_S2, "doc_id long, text string"
    )
    BI.build_bm25_index(all_docs, ref, n_buckets=8)
    got = _ranked(BI.bm25_topk_indexed(spark, idx, qs, k=5).collect())
    want = _ranked(BI.bm25_topk_indexed(spark, ref, qs, k=5).collect())
    assert got == want


def test_index_stream_mid_batch_abort_then_replay_converges(
    spark, frames, tmp_path, monkeypatch
):
    """VERDICT r12 item 5: a lease landing MID-foreachBatch (after the
    append's pre-check, before its last write) aborts that batch's
    append with a full rollback, fails the query loudly, and the
    checkpoint replay after the lease clears re-admits the SAME batch id
    cleanly (clear-then-write idempotency) — the final index equals the
    all-batch build."""
    from pyspark.errors import StreamingQueryException

    docs, _, qs = frames
    src = str(tmp_path / "src")
    _write_stream_src(spark, src, [DOCS_S1, DOCS_S2])
    idx = str(tmp_path / "s_idx")
    empty = spark.createDataFrame([], "doc_id long, text string")
    BI.build_bm25_index(empty, idx, n_buckets=8)

    real_stats = BI._stats_frame
    calls = {"n": 0}

    def lease_lands_mid_first_batch(new_docs, text_col):
        calls["n"] += 1
        if calls["n"] == 1:
            LC.write_lease(spark, LC.lease_file_at(idx), [])
        return real_stats(new_docs, text_col)

    monkeypatch.setattr(BI, "_stats_frame", lease_lands_mid_first_batch)

    def make_stream():
        return BI.index_stream(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*"),
            idx,
            str(tmp_path / "ckpt"),
        )

    with pytest.raises(
        StreamingQueryException, match="leased this index mid-append"
    ):
        _run_stream(make_stream())
    monkeypatch.undo()

    # the aborted batch rolled back whole — nothing admitted
    assert BI.list_bm25_increments(spark, idx) == []

    LC.clear_lease(spark, LC.lease_file_at(idx))
    q = _run_stream(make_stream())
    assert not q.isActive
    assert BI.list_bm25_increments(spark, idx) == [
        "b000000000000",
        "b000000000001",
    ]
    ref = str(tmp_path / "ref_idx")
    BI.build_bm25_index(
        spark.createDataFrame(DOCS_S1 + DOCS_S2, "doc_id long, text string"),
        ref,
        n_buckets=8,
    )
    got = _ranked(BI.bm25_topk_indexed(spark, idx, qs, k=5).collect())
    want = _ranked(BI.bm25_topk_indexed(spark, ref, qs, k=5).collect())
    assert got == want


def test_admission_stream_lease_fails_fast_then_replay_converges(
    spark, tmp_path, monkeypatch
):
    """VERDICT r12 item 5, admission-topology edition: a compaction
    lease landing between two micro-batches of
    ``admit_stream_exact_against_index`` fails the query loudly (the
    exact index's append fail-fast propagates through foreachBatch) and
    the checkpoint restart after the lease clears converges — survivors
    output and index state equal the uninterrupted run's."""
    from pyspark.errors import StreamingQueryException

    from bigdataproject_formula1_telemetry_spark.streaming import (
        curation as SC,
    )

    src = str(tmp_path / "src")
    _write_stream_src(
        spark,
        src,
        [
            [(200, "admission stream first batch text")],
            [(201, "admission stream second batch text"),
             (202, "admission stream first batch text")],  # exact dup of 200
        ],
    )
    eidx = str(tmp_path / "eidx")
    EI.build_exact_index(
        spark.createDataFrame(
            [(199, "pre-existing base corpus document")],
            "doc_id long, text string",
        ),
        eidx,
        expected_items=10_000,
    )
    out = str(tmp_path / "out")

    real_append = EI.append_exact_index
    calls = {"n": 0}

    def lease_lands_after_first_batch(*a, **k):
        real_append(*a, **k)
        calls["n"] += 1
        if calls["n"] == 1:
            LC.write_lease(spark, LC.lease_file_at(eidx), [])

    monkeypatch.setattr(EI, "append_exact_index", lease_lands_after_first_batch)
    # the topology imports the symbol inside its closure body per batch
    import bigdataproject_formula1_telemetry_spark.operators.exact_index as _ei_mod

    assert _ei_mod is EI

    def make_stream():
        return SC.admit_stream_exact_against_index(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*"),
            eidx,
            out,
            str(tmp_path / "ckpt"),
        )

    with pytest.raises(
        StreamingQueryException, match="compaction lease is held"
    ):
        _run_stream(make_stream())
    monkeypatch.undo()

    LC.clear_lease(spark, LC.lease_file_at(eidx))
    q = _run_stream(make_stream())
    assert not q.isActive
    # doc 202 (exact dup of the batch-one survivor 200) was dropped by
    # the shared index state; 200 and 201 survived exactly once
    rows = sorted(
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert rows == [200, 201]
    # and the index itself rejects a re-sent copy of every survivor
    probe = spark.createDataFrame(
        [(300, "admission stream first batch text"),
         (301, "admission stream second batch text")],
        "doc_id long, text string",
    )
    assert EI.dedup_exact_against_index(spark, probe, eidx).count() == 0


def test_semantic_index_sibling_lease_guards(spark, tmp_path):
    """The semantic index's table IS the root: its lease is the sibling
    file `<root>._compacting.json`, which survives the compaction swap
    (an in-root lease would ride the renames and vanish)."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(20)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [list(map(float, rng.normal(size=8))) for _ in range(3)]
    path = str(tmp_path / "semidx")
    SD.build_semantic_index(corpus, cents, path)
    SD.build_semantic_index(
        corpus.where("vec_id < 3").select(
            (F.col("vec_id") + 100).alias("vec_id"), "embedding"
        ),
        cents,
        path,
        increment_id="inc0",
    )
    lease = SD._semantic_lease_file(path)
    assert lease == str(tmp_path / "semidx") + "._compacting.json"
    LC.write_lease(spark, lease, ["inc0"])
    with pytest.raises(ValueError, match="compaction lease is held"):
        SD.build_semantic_index(corpus, cents, path, increment_id="incX")
    with pytest.raises(ValueError, match="compaction lease is held"):
        SD.expire_semantic_increments(spark, path, keep=[])
    LC.clear_lease(spark, lease)

    n_before = spark.read.parquet(path).count()
    assert SD.compact_semantic_index(spark, path) == 1
    assert SD.list_semantic_increments(spark, path) == ["base"]
    assert spark.read.parquet(path).count() == n_before
    assert LC.read_lease(spark, lease) is None
    assert not os.path.exists(path + ".old")
    # folded-id reuse refused; the sibling marker file carries it
    assert LC.read_folded(spark, lease) == {"inc0"}
    with pytest.raises(ValueError, match="already folded"):
        SD.build_semantic_index(
            corpus.where("vec_id < 2"), cents, path, increment_id="inc0"
        )
    # a base rebuild resets the generation (marker + lease cleared)
    SD.build_semantic_index(corpus, cents, path)
    assert LC.read_folded(spark, lease) == set()
