"""Incremental corpus releases (pipelines.corpus_release_append /
read_release): index-gated admission, idempotent retries, all-duplicate
increments, manifest_full and card coverage."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.operators import (
    exact_index as EI,
    minhash_index as MI,
)
from bigdataproject_formula1_telemetry_spark.plans import pipelines as P


def _doc(i: int, words: str) -> tuple[int, str]:
    return (i, " ".join([words] * 30))


@pytest.fixture(scope="module")
def release(spark, tmp_path_factory):
    """A base release + its admission indexes over the released docs."""
    tmp = tmp_path_factory.mktemp("rel")
    base_docs = spark.createDataFrame(
        [
            _doc(1, "alpha base article text"),
            _doc(2, "beta base article text"),
            _doc(3, "gamma base article text"),
        ],
        "doc_id long, text string",
    )
    root = str(tmp / "release")
    P.corpus_release(
        base_docs, root, chunk_tokens=16, overlap=0, token_budget=64,
        n_pack_shards=2,
    )
    eidx = str(tmp / "eidx")
    midx = str(tmp / "midx")
    EI.build_exact_index(base_docs, eidx, expected_items=10_000)
    MI.build_minhash_index(base_docs, midx)
    return {"root": root, "eidx": eidx, "midx": midx, "spark": spark}


def _append(spark, release, docs, inc):
    return P.corpus_release_append(
        docs,
        release["root"],
        inc,
        minhash_index_path=release["midx"],
        exact_index_path=release["eidx"],
        chunk_tokens=16,
        overlap=0,
        token_budget=64,
        n_pack_shards=2,
    )


def test_append_admits_fresh_and_rejects_known(spark, release):
    inc_docs = spark.createDataFrame(
        [
            _doc(10, "delta fresh increment text"),
            # verbatim copy of base doc 1 -> exact index rejects
            _doc(11, "alpha base article text"),
            # near-dup of base doc 2 (one extra token) -> minhash rejects
            (12, " ".join(["beta base article text"] * 30) + " extra"),
        ],
        "doc_id long, text string",
    )
    before = P.read_release(spark, release["root"]).count()
    out = _append(spark, release, inc_docs, "inc1")
    assert out["admitted_docs"] == 1
    after = P.read_release(spark, release["root"])
    assert after.count() > before
    texts = " ".join(r["chunk_text"] for r in after.collect())
    assert "delta fresh" in texts
    assert texts.count("alpha base") == texts.count("gamma base")  # no dup
    # manifest_full covers base + inc1 and matches the data exactly
    mf = out["manifest"]
    assert set(r["inc"] for r in mf.collect()) == {"base", "inc1"}
    assert sum(int(r["n_chunks"]) for r in mf.collect()) == after.count()
    # the card describes EVERYTHING read_release returns
    card = {
        (r["section"], r["key"]): r["value"] for r in out["card"].collect()
    }
    assert card[("size", "docs")] == float(after.count())


def test_append_retry_is_idempotent(spark, release):
    inc_docs = spark.createDataFrame(
        [_doc(20, "epsilon fresh retry text")], "doc_id long, text string"
    )
    a = _append(spark, release, inc_docs, "inc2")
    rows_a = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"])
        for r in P.read_release(spark, release["root"]).collect()
    )
    b = _append(spark, release, inc_docs, "inc2")
    rows_b = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"])
        for r in P.read_release(spark, release["root"]).collect()
    )
    assert a["admitted_docs"] == b["admitted_docs"] == 1
    assert rows_a == rows_b  # replaced, never duplicated
    assert any(r["inc"] == "inc2" for r in b["manifest"].collect())


def test_all_duplicate_increment_writes_nothing(spark, release):
    dup_docs = spark.createDataFrame(
        [_doc(30, "gamma base article text")], "doc_id long, text string"
    )
    before = sorted(
        (r["doc_id"], r["chunk_idx"])
        for r in P.read_release(spark, release["root"]).collect()
    )
    out = _append(spark, release, dup_docs, "inc3")
    assert out["admitted_docs"] == 0
    after = sorted(
        (r["doc_id"], r["chunk_idx"])
        for r in P.read_release(spark, release["root"]).collect()
    )
    assert before == after
    assert not any(r["inc"] == "inc3" for r in out["manifest"].collect())
    # and the index holds nothing under inc3 (rollback semantics)
    sigs = spark.read.parquet(release["midx"] + "/sigs")
    assert sigs.where(F.col("inc") == "inc3").count() == 0


def test_append_requires_base_release(spark, tmp_path):
    docs = spark.createDataFrame([_doc(1, "x")], "doc_id long, text string")
    with pytest.raises(Exception):
        P.corpus_release_append(docs, str(tmp_path / "nope"), "inc0")


def test_streaming_crawl_drives_the_release_train(spark, tmp_path):
    """The whole engine in one flow: WARC segments land → stream-parse
    → documents bridge → foreachBatch corpus_release_append — each
    micro-batch becomes a gated, admitted, manifested increment of the
    SAME release the batch path built.  A page re-crawled in a later
    segment is rejected by the index the earlier segment extended."""
    from tests.test_warc import _record, _http
    from bigdataproject_formula1_telemetry_spark.sources import warc as W

    base_docs = spark.createDataFrame(
        [_doc(1, "seed corpus article text")], "doc_id long, text string"
    )
    root = str(tmp_path / "release")
    P.corpus_release(
        base_docs, root, chunk_tokens=16, overlap=0, token_budget=64,
        n_pack_shards=2,
    )
    eidx = str(tmp_path / "eidx")
    EI.build_exact_index(base_docs, eidx, expected_items=10_000)

    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    fresh0 = " ".join(["segment zero article text"] * 30)
    fresh1 = " ".join(["segment one article text"] * 30)
    seed = " ".join(["seed corpus article text"] * 30)

    def page(s, i, body):
        return _record(
            "response",
            _http(body.encode(), ctype="text/plain; charset=utf-8"),
            uri=f"https://ex.org/{s}/{i}",
            rec_id=f"<urn:uuid:{s}{i:03d}>",
            content_type="application/http;msgtype=response",
        )

    # segment 0: fresh page + re-crawl of the seed doc (reject)
    (seg_dir / "crawl-000.warc").write_bytes(
        page("a", 0, fresh0) + page("a", 1, seed)
    )
    # segment 1: fresh page + re-crawl of segment 0's page (reject —
    # proves the stream extends the index batchwise)
    (seg_dir / "crawl-001.warc").write_bytes(
        page("b", 0, fresh1) + page("b", 1, fresh0)
    )

    docs = W.warc_to_documents(
        W.read_warc_stream(spark, str(seg_dir), maxFilesPerTrigger="1")
    )

    def admit(batch_df, batch_id):
        P.corpus_release_append(
            batch_df.select("doc_id", "text"),
            root,
            f"b{batch_id}",
            exact_index_path=eidx,
            chunk_tokens=16,
            overlap=0,
            token_budget=64,
            n_pack_shards=2,
        )

    q = (
        docs.writeStream.foreachBatch(admit)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    released = P.read_release(spark, root)
    texts = " ".join(r["chunk_text"] for r in released.collect())
    assert "segment zero article" in texts and "segment one article" in texts
    # each body appears exactly as often as every other admitted body
    assert texts.count("segment zero article") == texts.count(
        "segment one article"
    )
    assert texts.count("seed corpus article") == texts.count(
        "segment one article"
    )
    mf = spark.read.parquet(root + "/manifest_full")
    incs = set(r["inc"] for r in mf.collect())
    assert "base" in incs and len(incs) == 3  # base + two micro-batches
    assert sum(int(r["n_chunks"]) for r in mf.collect()) == released.count()


def test_compact_release_folds_increments_bit_identically(spark, tmp_path):
    base_docs = spark.createDataFrame(
        [_doc(1, "compacting base article words")], "doc_id long, text string"
    )
    root = str(tmp_path / "rel")
    P.corpus_release(
        base_docs, root, chunk_tokens=16, overlap=0, token_budget=64,
        n_pack_shards=2,
    )
    for i, w in enumerate(["first extra article words", "second extra article words"]):
        P.corpus_release_append(
            spark.createDataFrame([_doc(10 + i, w)], "doc_id long, text string"),
            root, f"inc{i}", chunk_tokens=16, overlap=0, token_budget=64,
            n_pack_shards=2, refresh_card=False,
        )
    before = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["seq_id"], r["pack_shard"])
        for r in P.read_release(spark, root).collect()
    )
    folded = P.compact_release(spark, root)
    assert folded == 2
    after = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["seq_id"], r["pack_shard"])
        for r in P.read_release(spark, root).collect()
    )
    assert before == after  # the fold is a pure move
    assert P.list_release_increments(spark, root) == []
    # manifest_full collapses to base rows that exactly cover the data
    mf = spark.read.parquet(root + "/manifest_full")
    assert set(r["inc"] for r in mf.collect()) == {"base"}
    assert sum(int(r["n_chunks"]) for r in mf.collect()) == len(after)
    # idempotent no-op when nothing to fold
    assert P.compact_release(spark, root) == 0


def test_expire_release_increment(spark, tmp_path):
    base_docs = spark.createDataFrame(
        [_doc(1, "expiring base article words")], "doc_id long, text string"
    )
    root = str(tmp_path / "rel")
    P.corpus_release(
        base_docs, root, chunk_tokens=16, overlap=0, token_budget=64,
        n_pack_shards=2,
    )
    P.corpus_release_append(
        spark.createDataFrame(
            [_doc(10, "short lived article words")], "doc_id long, text string"
        ),
        root, "ttl0", chunk_tokens=16, overlap=0, token_budget=64,
        n_pack_shards=2, refresh_card=False,
    )
    assert "ttl0" in P.list_release_increments(spark, root)
    P.expire_release_increment(spark, root, "ttl0")
    assert P.list_release_increments(spark, root) == []
    texts = " ".join(
        r["chunk_text"] for r in P.read_release(spark, root).collect()
    )
    assert "short lived" not in texts and "expiring base" in texts
    mf = spark.read.parquet(root + "/manifest_full")
    assert set(r["inc"] for r in mf.collect()) == {"base"}


def _release_with_two_increments(spark, tmp_path):
    base_docs = spark.createDataFrame(
        [_doc(1, "crashy base article words")], "doc_id long, text string"
    )
    root = str(tmp_path / "rel")
    P.corpus_release(
        base_docs, root, chunk_tokens=16, overlap=0, token_budget=64,
        n_pack_shards=2,
    )
    for i, w in enumerate(
        ["first crash article words", "second crash article words"]
    ):
        P.corpus_release_append(
            spark.createDataFrame([_doc(10 + i, w)], "doc_id long, text string"),
            root, f"inc{i}", chunk_tokens=16, overlap=0, token_budget=64,
            n_pack_shards=2, refresh_card=False,
        )
    return root


def _release_rows(spark, root):
    return sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["seq_id"], r["pack_shard"])
        for r in P.read_release(spark, root).collect()
    )


@pytest.mark.slowtier
def test_compact_crash_window_never_double_counts(spark, tmp_path, monkeypatch):
    """Fault injection for the compaction crash window: kill the job
    AFTER the base data swap but BEFORE the folded increment dirs are
    deleted, then retry.  At every point — including inside the window —
    ``read_release`` must return exactly the pre-compaction rows, and the
    retry must fold nothing twice."""
    root = _release_with_two_increments(spark, tmp_path)
    expected = _release_rows(spark, root)

    def boom(*a, **k):
        raise RuntimeError("injected crash between data swap and cleanup")

    monkeypatch.setattr(P, "_delete_increment_dirs", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        P.compact_release(spark, root)
    monkeypatch.undo()

    # inside the window: the folded rows live in the base AND the
    # increment directories still physically exist...
    assert P.list_release_increments(spark, root) == ["inc0", "inc1"]
    # ...but the marker hides them from every reader — no double count
    assert P._read_folded_marker(spark, root) == {"inc0", "inc1"}
    assert _release_rows(spark, root) == expected

    # the retried compaction folds NOTHING twice: it only garbage-collects
    # the stale dirs and refreshes manifest_full
    assert P.compact_release(spark, root) == 0
    assert _release_rows(spark, root) == expected
    assert P.list_release_increments(spark, root) == []
    mf = spark.read.parquet(root + "/manifest_full")
    assert set(r["inc"] for r in mf.collect()) == {"base"}
    assert sum(int(r["n_chunks"]) for r in mf.collect()) == len(expected)


@pytest.mark.slowtier
def test_append_rejects_reuse_of_folded_increment_id(spark, tmp_path):
    """After compaction the marker makes readers skip the folded ids
    forever — reusing one for NEW content would silently hide its rows,
    so the append must refuse it."""
    root = _release_with_two_increments(spark, tmp_path)
    assert P.compact_release(spark, root) == 2
    with pytest.raises(ValueError, match="already folded"):
        P.corpus_release_append(
            spark.createDataFrame(
                [_doc(99, "fresh content reused id words")],
                "doc_id long, text string",
            ),
            root, "inc0", chunk_tokens=16, overlap=0, token_budget=64,
            n_pack_shards=2, refresh_card=False,
        )
    # a FRESH id still appends normally
    P.corpus_release_append(
        spark.createDataFrame(
            [_doc(99, "fresh content new id words")], "doc_id long, text string"
        ),
        root, "inc2", chunk_tokens=16, overlap=0, token_budget=64,
        n_pack_shards=2, refresh_card=False,
    )
    texts = " ".join(
        r["chunk_text"] for r in P.read_release(spark, root).collect()
    )
    assert "fresh content new id" in texts


@pytest.mark.slowtier
def test_expire_refuses_folded_increment(spark, tmp_path):
    """Expiring a folded increment must refuse loudly: its rows live in
    the base after compaction, so deleting the (possibly still present)
    increment directory would silently RETAIN the data."""
    root = _release_with_two_increments(spark, tmp_path)
    P.compact_release(spark, root)
    with pytest.raises(ValueError, match="folded into the base"):
        P.expire_release_increment(spark, root, "inc0")


@pytest.mark.slowtier
def test_rerelease_clears_stale_increments(spark, tmp_path):
    """`corpus_release` onto a previously-used root is a FRESH artifact:
    increments (and manifest_full) from the old release must not leak
    into `read_release` of the new one."""
    root = _release_with_two_increments(spark, tmp_path)
    assert P.list_release_increments(spark, root) == ["inc0", "inc1"]
    P.corpus_release(
        spark.createDataFrame(
            [_doc(50, "second generation base words")], "doc_id long, text string"
        ),
        root, chunk_tokens=16, overlap=0, token_budget=64, n_pack_shards=2,
    )
    assert P.list_release_increments(spark, root) == []
    texts = " ".join(
        r["chunk_text"] for r in P.read_release(spark, root).collect()
    )
    assert "second generation base" in texts
    assert "first crash article" not in texts and "crashy base" not in texts


@pytest.mark.slowtier
def test_append_then_compact_after_crashed_cleanup(spark, tmp_path, monkeypatch):
    """The trickiest interleaving: a compaction crashes between its data
    swap and its increment cleanup, and a NEW increment is appended
    BEFORE anyone retries.  read_release must union base (which already
    contains the folded rows) + ONLY the new increment; the retried
    compaction must fold exactly the new increment and garbage-collect
    the stale dirs."""
    root = _release_with_two_increments(spark, tmp_path)
    expected_old = _release_rows(spark, root)

    def boom(*a, **k):
        raise RuntimeError("injected crash before cleanup")

    monkeypatch.setattr(P, "_delete_increment_dirs", boom)
    with pytest.raises(RuntimeError):
        P.compact_release(spark, root)
    monkeypatch.undo()

    # a fresh append lands while the stale folded dirs still exist
    P.corpus_release_append(
        spark.createDataFrame(
            [_doc(30, "post crash fresh article words")],
            "doc_id long, text string",
        ),
        root, "inc2", chunk_tokens=16, overlap=0, token_budget=64,
        n_pack_shards=2, refresh_card=False,
    )
    rows_now = _release_rows(spark, root)
    new_rows = [r for r in rows_now if r[0] == 30]
    assert new_rows, "the fresh increment must be readable"
    # everything else is exactly the pre-crash corpus — folded rows are
    # read ONCE (from the base), never doubled via the stale dirs
    assert [r for r in rows_now if r[0] != 30] == expected_old

    # the retry folds ONLY the genuinely-new increment
    assert P.compact_release(spark, root) == 1
    assert _release_rows(spark, root) == rows_now
    assert P.list_release_increments(spark, root) == []
    mf = spark.read.parquet(root + "/manifest_full")
    assert set(r["inc"] for r in mf.collect()) == {"base"}
    assert sum(int(r["n_chunks"]) for r in mf.collect()) == len(rows_now)


def test_read_release_plan_scan_count(spark, tmp_path):
    """Plan-shape pin for the documented reader design (SCALING.md):
    read_release is one parquet scan per side — base + each live
    increment — and collapses to exactly ONE scan after compaction."""
    root = _release_with_two_increments(spark, tmp_path)

    def scans():
        return _reader_scans(spark, root)

    assert scans() == 3  # base + inc0 + inc1
    P.compact_release(spark, root)
    assert scans() == 1  # the single-scan base is restored


def _reader_scans(spark, root) -> int:
    return (
        P.read_release(spark, root)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .count("Scan parquet")
    )


def test_auto_compact_keeps_reader_scan_count_bounded(spark, tmp_path):
    """`auto_compact_at=N` makes the compaction cadence engine behavior:
    across a long train of appends the reader's plan never exceeds
    base + N-1 live-increment scans + the triggering append's own
    (N ≤ scans ≤ N+1 transiently at the trigger, then back to 1), and
    every row already released is bit-invariant across each automatic
    fold — compaction is a pure move."""
    base_docs = spark.createDataFrame(
        [_doc(1, "auto compact base article words")], "doc_id long, text string"
    )
    root = str(tmp_path / "rel")
    P.corpus_release(
        base_docs, root, chunk_tokens=16, overlap=0, token_budget=64,
        n_pack_shards=2,
    )
    threshold = 3
    fired_at = []
    for i in range(7):
        prev = _release_rows(spark, root)
        res = P.corpus_release_append(
            spark.createDataFrame(
                [_doc(100 + i, f"auto compact fresh article number{i} words")],
                "doc_id long, text string",
            ),
            root, f"inc{i}", chunk_tokens=16, overlap=0, token_budget=64,
            n_pack_shards=2, refresh_card=False, auto_compact_at=threshold,
        )
        now = _release_rows(spark, root)
        # bit-invariance: prior rows untouched by the (possible) fold,
        # the fresh doc's rows present
        assert [r for r in now if r[0] != 100 + i] == prev
        assert [r for r in now if r[0] == 100 + i]
        # bounded reader: never more than base + threshold live scans
        assert _reader_scans(spark, root) <= threshold + 1
        if res["compacted_increments"]:
            fired_at.append((i, res["compacted_increments"]))
            # a fold collapses the reader back to the single-scan base
            assert _reader_scans(spark, root) == 1
    # live counts 1,2,3 → fold 3; 1,2,3 → fold 3; 1
    assert fired_at == [(2, 3), (5, 3)]
    # the folded ids stay permanently reserved across generations
    assert P._read_folded_marker(spark, root) == {f"inc{i}" for i in range(6)}


@pytest.mark.slowtier
def test_append_rejects_folded_id_across_compaction_generations(
    spark, tmp_path
):
    """The folded-id marker accumulates across compaction GENERATIONS:
    an id folded two compactions ago (its directory long gone) is still
    refused — 'increment ids are unique for a release's lifetime' is
    enforced forever, not just until the next fold."""
    root = _release_with_two_increments(spark, tmp_path)
    assert P.compact_release(spark, root) == 2  # generation 1: inc0, inc1
    P.corpus_release_append(
        spark.createDataFrame(
            [_doc(40, "generation two fresh article words")],
            "doc_id long, text string",
        ),
        root, "inc2", chunk_tokens=16, overlap=0, token_budget=64,
        n_pack_shards=2, refresh_card=False,
    )
    assert P.compact_release(spark, root) == 1  # generation 2: inc2
    assert P._read_folded_marker(spark, root) == {"inc0", "inc1", "inc2"}
    with pytest.raises(ValueError, match="already folded"):
        P.corpus_release_append(
            spark.createDataFrame(
                [_doc(41, "reuse of generation one id words")],
                "doc_id long, text string",
            ),
            root, "inc0", chunk_tokens=16, overlap=0, token_budget=64,
            n_pack_shards=2, refresh_card=False,
        )


@pytest.mark.slowtier
def test_append_of_folding_id_fails_fast_during_compaction(
    spark, tmp_path, monkeypatch
):
    """The compaction lease turns the documented concurrency contract
    into enforcement: WHILE a compaction is folding inc0/inc1 — paused
    BEFORE the marker swaps into place, the exact window the lease
    exists for (after the swap the permanent folded-id guard takes
    over) — a re-append of a folding id raises, while an append of a
    NEW id proceeds and survives the fold."""
    root = _release_with_two_increments(spark, tmp_path)
    real_marker = P._write_folded_marker
    observed = {}

    def paused_marker(spark_, staged_, incs_):
        # inside the pre-swap window: lease held, marker NOT yet visible
        with pytest.raises(ValueError, match="leased by an in-flight"):
            P.corpus_release_append(
                spark.createDataFrame(
                    [_doc(60, "racing re-append of folding id words")],
                    "doc_id long, text string",
                ),
                root, "inc0", chunk_tokens=16, overlap=0, token_budget=64,
                n_pack_shards=2, refresh_card=False,
            )
        # a NEW id is outside the lease and proceeds mid-compaction
        P.corpus_release_append(
            spark.createDataFrame(
                [_doc(61, "concurrent new id append words")],
                "doc_id long, text string",
            ),
            root, "incNEW", chunk_tokens=16, overlap=0, token_budget=64,
            n_pack_shards=2, refresh_card=False, auto_compact_at=None,
        )
        observed["ran"] = True
        return real_marker(spark_, staged_, incs_)

    monkeypatch.setattr(P, "_write_folded_marker", paused_marker)
    assert P.compact_release(spark, root) == 2
    monkeypatch.undo()
    assert observed["ran"]
    # the lease cleared with the compaction; the mid-fold append is live
    assert P._read_compaction_lease(spark, root) == set()
    texts = " ".join(
        r["chunk_text"] for r in P.read_release(spark, root).collect()
    )
    assert "concurrent new id append" in texts
    assert "racing re-append" not in texts
    # ...and rides into the NEXT compaction normally
    assert P.compact_release(spark, root) == 1


@pytest.mark.slowtier
def test_stale_lease_blocks_then_retry_supersedes(spark, tmp_path, monkeypatch):
    """A compaction that crashes mid-fold leaves its lease in place: the
    folding ids stay blocked (their fold state is unknown — crash was
    BEFORE the marker landed, so only the lease protects them), a
    compact_release retry supersedes the stale lease, and the
    pathological crash AFTER the increment dirs were deleted (retry sees
    zero increments) still finishes maintenance: manifest refresh +
    lease clear."""
    root = _release_with_two_increments(spark, tmp_path)
    expected = _release_rows(spark, root)

    # crash flavor 1: mid-fold, BEFORE the marker/data swap — the lease
    # is the ONLY thing standing between a re-append and silent row loss
    def boom_marker(*a, **k):
        raise RuntimeError("injected crash before marker")

    monkeypatch.setattr(P, "_write_folded_marker", boom_marker)
    with pytest.raises(RuntimeError, match="before marker"):
        P.compact_release(spark, root)
    monkeypatch.undo()

    assert P._read_compaction_lease(spark, root) == {"inc0", "inc1"}
    assert P._read_folded_marker(spark, root) == set()  # swap never ran
    assert _release_rows(spark, root) == expected  # old base + incs intact
    with pytest.raises(ValueError, match="leased by an in-flight"):
        P.corpus_release_append(
            spark.createDataFrame(
                [_doc(70, "append of stale leased id words")],
                "doc_id long, text string",
            ),
            root, "inc1", chunk_tokens=16, overlap=0, token_budget=64,
            n_pack_shards=2, refresh_card=False,
        )
    with pytest.raises(ValueError, match="leased"):
        P.expire_release_increment(spark, root, "inc1")

    # crash flavor 2: the retry folds + deletes the dirs but dies before
    # the manifest refresh — the NEXT retry finds zero increments yet
    # still finishes the crashed maintenance (refresh + lease clear)
    def boom_refresh(*a, **k):
        raise RuntimeError("injected crash after cleanup")

    monkeypatch.setattr(P, "_refresh_manifest_full", boom_refresh)
    with pytest.raises(RuntimeError, match="after cleanup"):
        P.compact_release(spark, root)
    monkeypatch.undo()
    assert P.list_release_increments(spark, root) == []
    assert P._read_compaction_lease(spark, root) == {"inc0", "inc1"}
    assert _release_rows(spark, root) == expected  # folded, read from base

    assert P.compact_release(spark, root) == 0  # pure finish-the-job retry
    assert P._read_compaction_lease(spark, root) == set()
    mf = spark.read.parquet(root + "/manifest_full")
    assert set(r["inc"] for r in mf.collect()) == {"base"}
    # folded ids remain reserved by the MARKER even after the lease clears
    with pytest.raises(ValueError, match="already folded"):
        P.corpus_release_append(
            spark.createDataFrame(
                [_doc(71, "post recovery reuse attempt words")],
                "doc_id long, text string",
            ),
            root, "inc0", chunk_tokens=16, overlap=0, token_budget=64,
            n_pack_shards=2, refresh_card=False,
        )


@pytest.mark.slowtier
def test_compaction_folds_only_its_listing_snapshot(spark, tmp_path, monkeypatch):
    """TOCTOU pin: the fold unions exactly the increments captured by the
    compaction's ONE directory listing.  An increment appended AFTER the
    listing (simulated by appending inside the staged-write window) is
    NOT folded, NOT marked, NOT deleted — it survives as a live
    increment and its rows are read exactly once."""
    root = _release_with_two_increments(spark, tmp_path)
    real_marker = P._write_folded_marker
    seen = {}

    def append_then_mark(spark_, staged_, incs_):
        # the fold's union and staged write already happened; a late
        # increment lands now, after the listing snapshot
        P.corpus_release_append(
            spark.createDataFrame(
                [_doc(80, "late increment after listing words")],
                "doc_id long, text string",
            ),
            root, "incLATE", chunk_tokens=16, overlap=0, token_budget=64,
            n_pack_shards=2, refresh_card=False, auto_compact_at=None,
        )
        seen["marked"] = sorted(incs_)
        return real_marker(spark_, staged_, incs_)

    monkeypatch.setattr(P, "_write_folded_marker", append_then_mark)
    assert P.compact_release(spark, root) == 2
    monkeypatch.undo()

    # the late increment is not in the marker and its dir survived
    assert seen["marked"] == ["inc0", "inc1"]
    assert P._read_folded_marker(spark, root) == {"inc0", "inc1"}
    assert P.list_release_increments(spark, root) == ["incLATE"]
    rows = _release_rows(spark, root)
    late = [r for r in rows if r[0] == 80]
    assert len(late) == len(set(late)) and late, "read exactly once"
    # and the next compaction folds exactly it
    assert P.compact_release(spark, root) == 1
    assert _release_rows(spark, root) == rows


@pytest.mark.slowtier
def test_lease_landing_mid_append_aborts_and_rolls_back(
    spark, tmp_path, monkeypatch
):
    """The lease's residual window, closed (r11): an append whose
    PRE-write lease check passed can still be overtaken by a compaction
    leasing its id mid-flight.  The post-write double-check must then
    abort the append BEFORE anything publishes — increment dir deleted,
    index admission rolled back, manifest_full untouched — so the same
    docs remain appendable under a fresh id (nothing is silently lost
    to the compaction's fold-and-delete)."""
    import os

    base_docs = spark.createDataFrame(
        [_doc(1, "race base article words")], "doc_id long, text string"
    )
    root = str(tmp_path / "rel")
    eidx = str(tmp_path / "eidx")
    midx = str(tmp_path / "midx")
    P.corpus_release(
        base_docs, root, chunk_tokens=16, overlap=0, token_budget=64,
        n_pack_shards=2,
    )
    EI.build_exact_index(base_docs, eidx, expected_items=10_000)
    MI.build_minhash_index(base_docs, midx)
    before = _release_rows(spark, root)

    real_shards = P.write_training_shards

    def lease_lands_mid_write(packed, inc_dir):
        # a compaction leases THIS id after the append's pre-write check
        # (the append is already past it) but before its writes finish
        P._write_compaction_lease(spark, root, ["incRACE"])
        return real_shards(packed, inc_dir)

    monkeypatch.setattr(P, "write_training_shards", lease_lands_mid_write)
    with pytest.raises(RuntimeError, match="leased this id mid-append"):
        P.corpus_release_append(
            spark.createDataFrame(
                [_doc(90, "overtaken append article words")],
                "doc_id long, text string",
            ),
            root, "incRACE",
            minhash_index_path=midx, exact_index_path=eidx,
            chunk_tokens=16, overlap=0, token_budget=64, n_pack_shards=2,
            refresh_card=False,
        )
    monkeypatch.undo()

    # nothing published, nothing left behind: the release reads exactly
    # as before, and the aborted increment's dir is gone
    assert _release_rows(spark, root) == before
    assert not os.path.exists(os.path.join(root, "increments", "incRACE"))
    assert P.list_release_increments(spark, root) == []

    # admission was rolled back: once the (simulated) compaction is done
    # and the lease clears, the SAME docs append cleanly under a fresh id
    P._clear_compaction_lease(spark, root)
    out = P.corpus_release_append(
        spark.createDataFrame(
            [_doc(90, "overtaken append article words")],
            "doc_id long, text string",
        ),
        root, "incRETRY",
        minhash_index_path=midx, exact_index_path=eidx,
        chunk_tokens=16, overlap=0, token_budget=64, n_pack_shards=2,
        refresh_card=False,
    )
    assert out["admitted_docs"] == 1
    texts = " ".join(
        r["chunk_text"] for r in P.read_release(spark, root).collect()
    )
    assert "overtaken append article" in texts


def test_release_maintains_bm25_serving_index(spark, tmp_path, monkeypatch):
    """r12 (residual item 1): corpus_release(bm25_index_path=) builds the
    lexical SERVING index over the released chunk rows, and
    corpus_release_append keeps it fresh per increment — index-served
    retrieval equals a corpus scan over read_release at every step, and
    a release-append abort rolls the bm25 admission back too."""
    import os

    from bigdataproject_formula1_telemetry_spark.operators import (
        bm25_index as BI,
        retrieval as RT,
    )

    base_docs = spark.createDataFrame(
        [
            _doc(1, "alpha retrieval article words"),
            _doc(2, "beta retrieval article words"),
        ],
        "doc_id long, text string",
    )
    root = str(tmp_path / "rel")
    bidx = str(tmp_path / "bm25idx")
    P.corpus_release(
        base_docs, root, bm25_index_path=bidx,
        chunk_tokens=16, overlap=0, token_budget=64, n_pack_shards=2,
    )
    qs = spark.createDataFrame(
        [("qa", "alpha retrieval"), ("qb", "beta words")],
        "query_id string, text string",
    )

    def scan_form():
        chunks = P._bm25_chunk_rows(P.read_release(spark, root), "doc_id")
        return sorted(
            map(
                tuple,
                RT.bm25_topk(
                    chunks, qs, k=3, id_col="chunk_id", score_round=6
                ).collect(),
            )
        )

    def served_form():
        return sorted(
            map(
                tuple,
                BI.bm25_topk_indexed(
                    spark, bidx, qs, k=3, score_round=6
                ).collect(),
            )
        )

    assert served_form() == scan_form() and served_form()

    # an increment extends the index under the SAME increment id
    out = P.corpus_release_append(
        spark.createDataFrame(
            [_doc(10, "delta increment retrieval words")],
            "doc_id long, text string",
        ),
        root, "inc0", bm25_index_path=bidx,
        chunk_tokens=16, overlap=0, token_budget=64, n_pack_shards=2,
        refresh_card=False,
    )
    assert out["admitted_docs"] == 1
    assert "inc0" in BI.list_bm25_increments(spark, bidx)
    assert served_form() == scan_form()

    # a mid-append release-lease abort rolls the bm25 admission back
    before = served_form()
    real_shards = P.write_training_shards

    def lease_lands_mid_write(packed, inc_dir):
        P._write_compaction_lease(spark, root, ["incRACE"])
        return real_shards(packed, inc_dir)

    monkeypatch.setattr(P, "write_training_shards", lease_lands_mid_write)
    with pytest.raises(RuntimeError, match="leased this id mid-append"):
        P.corpus_release_append(
            spark.createDataFrame(
                [_doc(11, "epsilon overtaken increment words")],
                "doc_id long, text string",
            ),
            root, "incRACE", bm25_index_path=bidx,
            chunk_tokens=16, overlap=0, token_budget=64, n_pack_shards=2,
            refresh_card=False,
        )
    monkeypatch.undo()
    assert not os.path.exists(
        os.path.join(bidx, "postings", "inc=incRACE")
    ) or not os.listdir(os.path.join(bidx, "postings", "inc=incRACE"))
    # ADVICE r12: the rollback clears the partitions DIRECTLY — no empty
    # inc= partition with a (0,0) stats row left to show up in listings
    # and get folded/blocked by a later bm25 compaction
    assert "incRACE" not in BI.list_bm25_increments(spark, bidx)
    assert not os.path.exists(os.path.join(bidx, "stats", "inc=incRACE"))
    assert served_form() == before == scan_form()
    P._clear_compaction_lease(spark, root)
    # a later bm25 compaction is untouched by the aborted id
    assert BI.compact_bm25_index(spark, bidx) == 1  # folds inc0 only
    assert served_form() == before


@pytest.mark.slowtier
def test_release_contamination_report_serves_from_release_index(
    spark, tmp_path, monkeypatch
):
    """r13: the steady-state release audit — ``contamination_report``
    over the released chunk rows with ``bm25_index_path=`` pointing at
    the index the release train itself maintains.  Equal to the
    scan-form report after base + increment, with the scan-form
    retrieval never invoked."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        retrieval as RTmod,
    )

    base_docs = spark.createDataFrame(
        [
            _doc(1, "alpha retrieval article words"),
            _doc(2, "beta retrieval article words"),
        ],
        "doc_id long, text string",
    )
    root = str(tmp_path / "rel")
    bidx = str(tmp_path / "bm25idx")
    P.corpus_release(
        base_docs, root, bm25_index_path=bidx,
        chunk_tokens=16, overlap=0, token_budget=64, n_pack_shards=2,
    )
    P.corpus_release_append(
        spark.createDataFrame(
            [_doc(10, "delta increment retrieval words")],
            "doc_id long, text string",
        ),
        root, "inc0", bm25_index_path=bidx,
        chunk_tokens=16, overlap=0, token_budget=64, n_pack_shards=2,
        refresh_card=False,
    )
    bench = spark.createDataFrame(
        [(7, "alpha retrieval words"), (8, "delta increment")],
        "bench_id long, text string",
    )
    chunks = P._bm25_chunk_rows(P.read_release(spark, root), "doc_id")

    def _key(rows_):
        return sorted(
            (
                r["bench_id"], r["rank"], r["chunk_id"],
                round(r["score"], 9), r["contam_ngrams"],
                None if r["cos_sim"] is None else round(r["cos_sim"], 9),
            )
            for r in rows_
        )

    want = _key(
        P.contamination_report(
            chunks, bench, k=3, id_col="chunk_id",
            bench_id_col="bench_id", score_round=6,
        ).collect()
    )
    monkeypatch.setattr(
        RTmod, "bm25_topk",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("scan-form retrieval on the indexed path")
        ),
    )
    got = _key(
        P.contamination_report(
            chunks, bench, k=3, id_col="chunk_id",
            bench_id_col="bench_id", score_round=6,
            bm25_index_path=bidx,
        ).collect()
    )
    monkeypatch.undo()
    assert got == want and got


@pytest.mark.slowtier
def test_release_abort_rollback_leg_failure_never_masks_abort(
    spark, tmp_path, monkeypatch
):
    """ADVICE r12: a rollback leg can itself raise — the empty
    index-append guards on that index's OWN compaction lease, a
    different lease than the release's — and that used to MASK the
    abort RuntimeError (the caller would see a confusing ValueError and
    never learn the release append aborted).  The abort error must
    always propagate, with the failed leg chained into the message, and
    the OTHER legs (here the direct bm25 partition clear) must still
    run."""
    import os

    from bigdataproject_formula1_telemetry_spark.operators import (
        bm25_index as BI,
        index_lifecycle as LC,
    )

    base_docs = spark.createDataFrame(
        [_doc(1, "mask base article words")], "doc_id long, text string"
    )
    root = str(tmp_path / "rel")
    eidx = str(tmp_path / "eidx")
    bidx = str(tmp_path / "bm25idx")
    P.corpus_release(
        base_docs, root, bm25_index_path=bidx,
        chunk_tokens=16, overlap=0, token_budget=64, n_pack_shards=2,
    )
    EI.build_exact_index(base_docs, eidx, expected_items=10_000)

    # both leases land mid-append, AFTER every index admission (the
    # admissions run overlapped since r15, so the only deterministic
    # "after admissions, before re-check" instant is the re-check's own
    # lease read — injected via the second _read_compaction_lease call:
    # the first is the pre-write fail-fast check, the second is the
    # post-write re-check): the release lease triggers the abort; the
    # exact index's own lease makes the rollback's empty exact append
    # raise
    real_lease_read = P._read_compaction_lease
    calls = {"n": 0}

    def leases_land_at_recheck(spark_, path_):
        calls["n"] += 1
        if path_ == root and calls["n"] == 2:
            P._write_compaction_lease(spark_, root, ["incRACE"])
            LC.write_lease(spark_, LC.lease_file_at(eidx), ["base"])
        return real_lease_read(spark_, path_)

    monkeypatch.setattr(P, "_read_compaction_lease", leases_land_at_recheck)
    with pytest.raises(
        RuntimeError, match="leased this id mid-append"
    ) as excinfo:
        P.corpus_release_append(
            spark.createDataFrame(
                [_doc(11, "masked overtaken increment words")],
                "doc_id long, text string",
            ),
            root, "incRACE",
            exact_index_path=eidx, bm25_index_path=bidx,
            chunk_tokens=16, overlap=0, token_budget=64, n_pack_shards=2,
            refresh_card=False,
        )
    monkeypatch.undo()
    msg = str(excinfo.value)
    assert "rollback legs that themselves failed" in msg
    assert "exact:" in msg and "compaction lease is held" in msg
    # the bm25 leg still ran (direct clear, no lifecycle guard to trip)
    assert "incRACE" not in BI.list_bm25_increments(spark, bidx)
    assert not os.path.exists(os.path.join(bidx, "stats", "inc=incRACE"))
    # the exact leg's admission is the flagged leftover needing manual
    # verification — present, exactly as the chained message says
    assert "incRACE" in EI.list_increments(spark, eidx)
    # the release itself published nothing
    assert not os.path.exists(os.path.join(root, "increments", "incRACE"))
    LC.clear_lease(spark, LC.lease_file_at(eidx))
    P._clear_compaction_lease(spark, root)


def test_bench_shape_appends_never_auto_compact(spark, tmp_path):
    """VERDICT r10 item 2 companion: bench.py's corpus_release_append
    entry appends exactly N_RUNS=3 increments per session with default
    kwargs — the default auto_compact_at=32 must never fire at bench
    increment counts, or the entry's timing would silently include a
    full base fold.  Pins compacted_increments == 0 for every
    bench-shaped append (3 << 32)."""
    base_docs = spark.createDataFrame(
        [_doc(1, "bench shape base words")], "doc_id long, text string"
    )
    root = str(tmp_path / "rel")
    P.corpus_release(
        base_docs, root, chunk_tokens=16, overlap=0, token_budget=64,
        n_pack_shards=2,
    )
    for i in range(3):  # bench.py N_RUNS
        out = P.corpus_release_append(
            spark.createDataFrame(
                [_doc(100 + i, f"bench shape increment {i} words")],
                "doc_id long, text string",
            ),
            root, f"bench{i}", chunk_tokens=16, overlap=0, token_budget=64,
            n_pack_shards=2, refresh_card=False,
        )
        assert out["compacted_increments"] == 0
    assert P.list_release_increments(spark, root) == [
        "bench0", "bench1", "bench2"
    ]
    assert P._read_folded_marker(spark, root) == set()


@pytest.mark.slowtier
def test_expire_release_increment_expires_paired_indexes(spark, tmp_path):
    """r14: expire_release_increment(minhash/exact/bm25 paths) drops the
    MATCHING index increments with the data — the expired docs become
    admissible again and the bm25 serving index stops ranking their
    chunks (served == scan over the surviving release)."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        bm25_index as BI,
        exact_index as EI,
        retrieval as RT,
    )

    base_docs = spark.createDataFrame(
        [
            _doc(1, "alpha retention article words"),
            _doc(2, "beta retention article words"),
        ],
        "doc_id long, text string",
    )
    root = str(tmp_path / "rel")
    bidx = str(tmp_path / "bm25idx")
    eidx = str(tmp_path / "eidx")
    kw = dict(chunk_tokens=16, overlap=0, token_budget=64, n_pack_shards=2)
    P.corpus_release(base_docs, root, bm25_index_path=bidx, **kw)
    EI.build_exact_index(base_docs, eidx, expected_items=1_000)

    ttl_docs = spark.createDataFrame(
        [_doc(10, "short lived retention words")], "doc_id long, text string"
    )
    P.corpus_release_append(
        ttl_docs, root, "ttl0", bm25_index_path=bidx,
        exact_index_path=eidx, refresh_card=False, **kw,
    )
    assert "ttl0" in BI.list_bm25_increments(spark, bidx)
    assert "ttl0" in EI.list_increments(spark, eidx)

    P.expire_release_increment(
        spark, root, "ttl0", exact_index_path=eidx, bm25_index_path=bidx
    )
    assert "ttl0" not in P.list_release_increments(spark, root)
    assert "ttl0" not in BI.list_bm25_increments(spark, bidx)
    assert "ttl0" not in EI.list_increments(spark, eidx)

    # the serving index matches a scan over the SURVIVING release
    qs = spark.createDataFrame(
        [("qa", "alpha retention"), ("qb", "short lived")],
        "query_id string, text string",
    )
    chunks = P._bm25_chunk_rows(P.read_release(spark, root), "doc_id")
    scan = sorted(
        map(
            tuple,
            RT.bm25_topk(
                chunks, qs, k=3, id_col="chunk_id", score_round=6
            ).collect(),
        )
    )
    served = sorted(
        map(
            tuple,
            BI.bm25_topk_indexed(spark, bidx, qs, k=3, score_round=6).collect(),
        )
    )
    assert served == scan and served
    assert not any("10#" in str(t[1]) for t in served)

    # the expired docs are ADMISSIBLE again (the dedup-horizon policy)
    out = P.corpus_release_append(
        ttl_docs, root, "ttl1", bm25_index_path=bidx,
        exact_index_path=eidx, refresh_card=False, **kw,
    )
    assert out["admitted_docs"] == 1
