"""Materialized exact-dedup index + Bloom sidecar
(operators/exact_index.py): membership correctness (no false
negatives), measured false-positive rate, index round trip, idempotent
append, and equivalence with batch exact_dedup semantics."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from bigdataproject_formula1_telemetry_spark import io
from bigdataproject_formula1_telemetry_spark.operators import exact_index as EI


def test_bloom_params_and_no_false_negatives():
    m, k = EI._bloom_params(10_000, 0.01)
    assert m % 64 == 0 and k >= 1
    rng = np.random.default_rng(3)
    keys = rng.integers(-(2**63), 2**63, 10_000, dtype=np.int64)
    bits = np.zeros(m // 64, dtype=np.uint64)
    EI._set_bits(bits, EI._positions(keys, m, k))
    # every inserted key tests positive — Bloom guarantees it
    assert EI._test_bits(bits, EI._positions(keys, m, k)).all()


def test_bloom_measured_fpr_within_band():
    m, k = EI._bloom_params(10_000, 0.01)
    rng = np.random.default_rng(4)
    keys = rng.integers(-(2**63), 2**63, 10_000, dtype=np.int64)
    fresh = rng.integers(-(2**63), 2**63, 50_000, dtype=np.int64)
    fresh = np.setdiff1d(fresh, keys)
    bits = np.zeros(m // 64, dtype=np.uint64)
    EI._set_bits(bits, EI._positions(keys, m, k))
    fp = EI._test_bits(bits, EI._positions(fresh, m, k)).mean()
    assert fp <= 0.03, fp  # 3x the 1% design point


@pytest.fixture()
def exact_idx(spark, tmp_path):
    docs = (
        io.read_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 80)
    )
    p = str(tmp_path / "eidx")
    EI.build_exact_index(docs, p, expected_items=10_000)
    return p, docs


def test_dedup_against_exact_index(spark, exact_idx):
    p, docs = exact_idx
    rows = docs.orderBy("doc_id").limit(3).collect()
    inc = spark.createDataFrame(
        [
            Row(doc_id=9001, text=rows[0]["text"]),   # exact copy -> drop
            Row(doc_id=9002, text=rows[1]["text"]),   # exact copy -> drop
            Row(doc_id=9003, text=rows[2]["text"] + " x"),  # near, NOT exact -> keep
            Row(doc_id=9004, text="a wholly fresh document"),
            Row(doc_id=9005, text=None),              # null text: no null in index -> keep
        ]
    )
    kept = {
        r["doc_id"]
        for r in EI.dedup_exact_against_index(spark, inc, p).collect()
    }
    assert kept == {9003, 9004, 9005}


def test_append_and_empty_retry(spark, exact_idx):
    p, docs = exact_idx
    inc = spark.createDataFrame(
        [Row(doc_id=9100, text="novel content one"),
         Row(doc_id=9101, text="novel content two")]
    )
    n0 = spark.read.parquet(p + "/hashes").count()
    EI.append_exact_index(inc, p, increment_id="day1")
    EI.append_exact_index(inc, p, increment_id="day1")  # retry replaces
    assert spark.read.parquet(p + "/hashes").count() == n0 + 2
    # admitted docs are now exact-index hits
    again = EI.dedup_exact_against_index(spark, inc, p).collect()
    assert again == []
    # an empty retry rolls the increment back — hashes AND bloom chunk
    EI.append_exact_index(inc.where(F.lit(False)), p, increment_id="day1")
    assert spark.read.parquet(p + "/hashes").count() == n0
    revived = {
        r["doc_id"] for r in EI.dedup_exact_against_index(spark, inc, p).collect()
    }
    assert revived == {9100, 9101}
    with pytest.raises(ValueError, match="increment_id"):
        EI.append_exact_index(inc, p, increment_id="bad/../id")


def test_exclude_inc_enables_retry_of_search_then_append(spark, exact_idx):
    p, _ = exact_idx
    inc = spark.createDataFrame([Row(doc_id=9200, text="retry survivor doc")])
    # half-completed prior attempt already admitted the increment
    EI.append_exact_index(inc, p, increment_id="day2")
    # naive retry would drop the doc as a self-match...
    naive = EI.dedup_exact_against_index(spark, inc, p).collect()
    assert naive == []
    # ...excluding its own partition restores it
    kept = EI.dedup_exact_against_index(
        spark, inc, p, exclude_inc="day2"
    ).collect()
    assert [r["doc_id"] for r in kept] == [9200]


def test_bloom_fill_fraction_gauge(spark, exact_idx):
    p, _ = exact_idx
    fill = EI.bloom_fill_fraction(spark, p)
    # 80 docs in a 10k-capacity filter: nearly empty, far from saturation
    assert 0.0 < fill < 0.05


def test_exact_index_plan_broadcasts_and_prunes(spark, exact_idx):
    """The probe joins broadcast (index never shuffled); exclude_inc
    reaches the hash scan as a partition filter."""
    import re
    from pyspark.sql import Row

    p, _ = exact_idx
    inc = spark.createDataFrame([Row(doc_id=9300, text="plan probe doc")])
    EI.append_exact_index(inc, p, increment_id="day3")
    plan = (
        EI.dedup_exact_against_index(spark, inc, p, exclude_inc="day3")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("inc" in f and "day3" in f for f in filters), filters


def test_normalized_index_dedups_formatting_variants(spark, tmp_path):
    """normalize=True keys on the fingerprint identity: case,
    punctuation and whitespace variants of an indexed doc are exact
    hits; genuinely different token streams are not.  The mode is
    persisted in the index, so appends/searches follow it without the
    caller restating it."""
    base = spark.createDataFrame(
        [Row(doc_id=1, text="The quick brown fox, jumps!")]
    )
    p = str(tmp_path / "nidx")
    EI.build_exact_index(base, p, expected_items=1000, normalize=True)
    inc = spark.createDataFrame(
        [
            Row(doc_id=10, text="the QUICK   brown fox jumps"),   # variant -> drop
            Row(doc_id=11, text="the quick brown fox jumped"),    # different -> keep
        ]
    )
    kept = {r["doc_id"] for r in EI.dedup_exact_against_index(spark, inc, p).collect()}
    assert kept == {11}
    # append follows the stored mode: a variant of an admitted doc hits
    EI.append_exact_index(
        spark.createDataFrame([Row(doc_id=20, text="Entirely new words here.")]),
        p, increment_id="d1",
    )
    probe = spark.createDataFrame(
        [Row(doc_id=30, text="entirely NEW words here")]
    )
    assert EI.dedup_exact_against_index(spark, probe, p).collect() == []
    # a raw-keyed index (default) does NOT collapse variants
    p2 = str(tmp_path / "ridx")
    EI.build_exact_index(base, p2, expected_items=1000)
    kept2 = {r["doc_id"] for r in EI.dedup_exact_against_index(spark, inc, p2).collect()}
    assert kept2 == {10, 11}


def test_bloom_positions_properties_hypothesis():
    """Property form of the Bloom kernel (no Spark): positions always in
    [0, m), deterministic, and membership has NO false negatives for
    arbitrary int64 keys (including 0, -1, extremes)."""
    from hypothesis import given, settings, strategies as st

    keys_st = st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1, max_size=300,
    )

    @settings(max_examples=80, deadline=None)
    @given(keys_st, st.integers(min_value=1, max_value=2000))
    def check(keys, n_cap):
        m, k = EI._bloom_params(max(n_cap, len(keys)), 0.01)
        arr = np.asarray(keys, dtype=np.int64)
        pos = EI._positions(arr, m, k)
        assert pos.shape == (len(keys), k)
        assert (pos < m).all()
        assert (pos == EI._positions(arr, m, k)).all()  # deterministic
        bits = np.zeros(m // 64, dtype=np.uint64)
        EI._set_bits(bits, pos)
        assert EI._test_bits(bits, pos).all()  # no false negatives

    check()


def test_compact_exact_index(spark, exact_idx):
    """Compaction folds hashes and ORs the bloom chunks into base:
    search results identical, increments collapse, idempotent no-op."""
    p, docs = exact_idx
    inc = spark.createDataFrame(
        [Row(doc_id=9400, text="compacted exact doc one"),
         Row(doc_id=9401, text="compacted exact doc two")]
    )
    EI.append_exact_index(inc.where(F.col("doc_id") == 9400), p, increment_id="e1")
    EI.append_exact_index(inc.where(F.col("doc_id") == 9401), p, increment_id="e2")
    probe = inc.unionByName(
        spark.createDataFrame([Row(doc_id=9402, text="never indexed fresh doc")])
    )
    before = {
        r["doc_id"] for r in EI.dedup_exact_against_index(spark, probe, p).collect()
    }
    fill_before = EI.bloom_fill_fraction(spark, p)
    assert EI.compact_exact_index(spark, p) == 2
    assert EI.list_increments(spark, p) == ["base"]
    after = {
        r["doc_id"] for r in EI.dedup_exact_against_index(spark, probe, p).collect()
    }
    assert after == before == {9402}
    # OR-fold preserves exactly the same bit set
    assert abs(EI.bloom_fill_fraction(spark, p) - fill_before) < 1e-12
    assert EI.compact_exact_index(spark, p) == 0


def test_build_bloom_is_distributed_and_bit_identical(spark, tmp_path):
    """r6 VERDICT item 1: the BASE Bloom build must never collect a hash
    to the driver (the old form pulled the whole corpus hash column
    through toPandas — ~800 GB at 10^11 docs).  DataFrame.toPandas and
    DataFrame.collect are patched to raise for the whole build; the
    distributed result is then checked BIT-identical to the driver-side
    ``_bloom_rows`` constructor, chunk layout included."""
    from unittest import mock

    import pyspark.sql as psql

    docs = (
        io.read_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 200)
    )
    p = str(tmp_path / "eidx_dist")

    def boom(self, *a, **k):
        raise AssertionError("driver-side collection during build_exact_index")

    with mock.patch.object(psql.DataFrame, "toPandas", boom), mock.patch.object(
        psql.DataFrame, "collect", boom
    ):
        EI.build_exact_index(docs, p, expected_items=5_000)

    bits, m_bits, k = EI._load_bloom(spark, p)
    hb = (
        spark.read.parquet(p + "/hashes").select("hb").toPandas()["hb"].to_numpy()
    )
    ref = np.zeros(m_bits // 64, dtype=np.uint64)
    assert len(hb)
    EI._set_bits(ref, EI._positions(np.asarray(hb, np.int64), m_bits, k))
    assert np.array_equal(bits, ref)

    got = spark.read.parquet(p + "/bloom").orderBy("chunk_idx").collect()
    want = EI._bloom_rows(hb, m_bits, k, "base")
    assert [r["chunk_idx"] for r in got] == list(want["chunk_idx"])
    assert [bytes(r["bits"]) for r in got] == [bytes(b) for b in want["bits"]]
    assert all(int(r["m_bits"]) == m_bits and int(r["k"]) == k for r in got)


def test_build_bloom_multi_chunk_keeps_zero_chunks(spark, tmp_path):
    """Multi-chunk sidecars keep their ALL-ZERO chunks (the skeleton
    union), so the layout matches ``_bloom_rows`` exactly even when no
    hash happens to land in a chunk — here the degenerate extreme: an
    EMPTY corpus sized for 3M items (4 chunks, all zero)."""
    docs = (
        io.read_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 0)
    )
    p = str(tmp_path / "eidx_empty")
    EI.build_exact_index(docs, p, expected_items=3_000_000)
    got = spark.read.parquet(p + "/bloom").orderBy("chunk_idx").collect()
    m_bits, k = EI._bloom_params(3_000_000, 0.01)
    want = EI._bloom_rows(np.zeros(0, dtype=np.int64), m_bits, k, "base")
    assert len(got) == len(want) >= 4
    assert [r["chunk_idx"] for r in got] == list(want["chunk_idx"])
    assert [bytes(r["bits"]) for r in got] == [bytes(b) for b in want["bits"]]
    assert EI.bloom_fill_fraction(spark, p) == 0.0


def test_rebuild_onto_used_path_drops_stale_increments(spark, tmp_path):
    """Same fresh-index contract as the minhash side: a rebuild must not
    inherit the previous generation's inc=* hash or bloom partitions."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        exact_index as EI,
    )

    path = str(tmp_path / "eidx")
    gen1 = spark.createDataFrame(
        [(1, "first generation text")], "doc_id long, text string"
    )
    EI.build_exact_index(gen1, path, expected_items=1000)
    EI.append_exact_index(
        spark.createDataFrame(
            [(2, "incremental generation text")], "doc_id long, text string"
        ),
        path, increment_id="day1",
    )
    assert EI.list_increments(spark, path) == ["base", "day1"]
    EI.build_exact_index(
        spark.createDataFrame(
            [(9, "second generation text")], "doc_id long, text string"
        ),
        path, expected_items=1000,
    )
    assert EI.list_increments(spark, path) == ["base"]
    # a verbatim copy of the OLD increment doc must now be admitted
    probe = spark.createDataFrame(
        [(100, "incremental generation text")], "doc_id long, text string"
    )
    kept = EI.dedup_exact_against_index(spark, probe, path)
    assert [r["doc_id"] for r in kept.collect()] == [100]


def test_expire_exact_increments_drops_both_tables(spark, exact_idx, tmp_path):
    """r14 (the minhash/bm25 expire twin): expiring an increment drops
    its hashes AND bloom partitions together, expired docs become
    admissible again, and survivors stay rejected."""
    import os

    path, docs = exact_idx
    inc0 = spark.createDataFrame(
        [Row(doc_id=9400, text="horizon doc zero")]
    )
    inc1 = spark.createDataFrame(
        [Row(doc_id=9401, text="horizon doc one")]
    )
    EI.append_exact_index(inc0, path, increment_id="inc0")
    EI.append_exact_index(inc1, path, increment_id="inc1")
    assert EI.expire_exact_increments(spark, path, keep=["inc1"]) == ["inc0"]
    for t in ("hashes", "bloom"):
        assert not os.path.exists(os.path.join(path, t, "inc=inc0")), t
        assert os.path.exists(os.path.join(path, t, "inc=inc1")), t
        assert os.path.exists(os.path.join(path, t, "inc=base")), t
    # expired doc is admissible again; survivor and base stay rejected
    probe = spark.createDataFrame(
        [
            Row(doc_id=1, text="horizon doc zero"),
            Row(doc_id=2, text="horizon doc one"),
            Row(doc_id=3, text=docs.orderBy("doc_id").first()["text"]),
            Row(doc_id=4, text="genuinely fresh probe text"),
        ]
    )
    got = sorted(
        r["doc_id"]
        for r in EI.dedup_exact_against_index(
            spark, probe, path, "text", "doc_id"
        ).collect()
    )
    assert got == [1, 4]
    # base never expires; a compaction lease fails fast
    assert EI.expire_exact_increments(spark, path, keep=lambda i: False) == [
        "inc1"
    ]
    assert EI.list_increments(spark, path) == ["base"]
    from bigdataproject_formula1_telemetry_spark.operators import (
        index_lifecycle as LC,
    )

    LC.write_lease(spark, LC.lease_file_at(path), ["base"])
    with pytest.raises(ValueError, match="compaction lease"):
        EI.expire_exact_increments(spark, path, keep=[])
    LC.clear_lease(spark, LC.lease_file_at(path))
