"""Streaming curation: cross-micro-batch dedup must match the batch
operators on the same corpus (exact: identical survivors; near-dup:
identical survivors where the est-Jaccard is decisively off-threshold).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from bigdataproject_formula1_telemetry_spark import io
from bigdataproject_formula1_telemetry_spark.operators import dedup
from bigdataproject_formula1_telemetry_spark.streaming import curation
from tests.conftest import SF_SMOKE

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


@pytest.fixture(scope="module")
def corpus_pdf(spark):
    """60 real documents + 12 exact copies + 12 near-dups (one appended
    token, shingle-Jaccard ≈ 0.9+), copies with fresh higher ids so the
    originals arrive in the first micro-batch."""
    base = (
        io.read_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 60)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exact = base.iloc[:12].copy()
    exact["doc_id"] = exact["doc_id"] + 1000
    near = base.iloc[20:32].copy()
    near["doc_id"] = near["doc_id"] + 2000
    near["text"] = near["text"] + " appended"
    return pd.concat([base, exact, near], ignore_index=True)


def _start_stream(spark, tmp_path, corpus_pdf, transform):
    """Write the corpus as three id-ordered files (originals first),
    stream them one file per trigger through ``transform`` into a memory
    sink, and return the sink's rows."""
    src = str(tmp_path / "src")
    parts = [
        corpus_pdf[corpus_pdf["doc_id"] < 60],
        corpus_pdf[(corpus_pdf["doc_id"] >= 1000) & (corpus_pdf["doc_id"] < 2000)],
        corpus_pdf[corpus_pdf["doc_id"] >= 2000],
    ]
    for i, part in enumerate(parts):
        spark.createDataFrame(part, DOC_SCHEMA).coalesce(1).write.parquet(
            src, mode="overwrite" if i == 0 else "append"
        )
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    name = f"cur_{abs(hash(str(tmp_path))) % 10**8}"
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.sql(f"SELECT * FROM {name}").toPandas()


def test_exact_dedup_stream_matches_batch(spark, corpus_pdf, tmp_path):
    got = _start_stream(
        spark, tmp_path, corpus_pdf, lambda s: curation.dedup_stream_exact(s)
    )
    batch = dedup.exact_dedup(spark.createDataFrame(corpus_pdf, DOC_SCHEMA))
    exp_ids = set(r.doc_id for r in batch.select("doc_id").collect())
    assert set(got["doc_id"]) == exp_ids
    # the 12 exact copies (and nothing else) were suppressed
    assert set(corpus_pdf["doc_id"]) - set(got["doc_id"]) == set(
        range(1000, 1012)
    )


def test_near_dedup_stream_matches_batch_clustered(spark, corpus_pdf, tmp_path):
    """Bucket-level verdicts folded per doc reproduce the batch
    ``near_dedup_clustered`` survivor set: exact copies (est 1.0) and
    planted near-dups (est ≈ 0.9) suppressed, originals kept."""
    verdicts = _start_stream(
        spark,
        tmp_path,
        corpus_pdf,
        lambda s: curation.near_dedup_stream(s, num_hashes=64, bands=16),
    )
    folded = curation.collapse_verdicts(
        spark.createDataFrame(verdicts), threshold=0.8
    ).toPandas()
    assert len(folded) == len(corpus_pdf)

    stream_survivors = set(folded[~folded["is_dup"]]["doc_id"])
    batch = dedup.near_dedup_clustered(
        spark.createDataFrame(corpus_pdf, DOC_SCHEMA), threshold=0.8
    )
    batch_survivors = set(r.doc_id for r in batch.select("doc_id").collect())
    assert stream_survivors == batch_survivors

    # every suppressed doc points at an earlier-arrived original
    dups = folded[folded["is_dup"]]
    assert (dups["dup_of"] < dups["doc_id"]).all()
    # exact copies match their original at estimate exactly 1.0
    exact_rows = folded[folded["doc_id"].between(1000, 1011)]
    assert (exact_rows["est_jaccard"] == 1.0).all()
    assert (exact_rows["dup_of"] == exact_rows["doc_id"] - 1000).all()


def test_near_dedup_stream_transitive_chain(spark, tmp_path):
    """A~B, B~C with A,B,C arriving in three different micro-batches:
    the first-arrived doc survives, both later links are suppressed —
    the streaming analogue of the batch connected component."""
    words = [f"w{i}" for i in range(40)]
    a = " ".join(words)
    b = " ".join(words + ["xa", "xb"])          # J(a,b) high
    c = " ".join(words + ["xa", "xb", "xc", "xd"])  # J(b,c) high, J(a,c) lower
    pdf = pd.DataFrame({"doc_id": [1, 1001, 2001], "text": [a, b, c]})
    verdicts = _start_stream(
        spark,
        tmp_path,
        pdf,
        lambda s: curation.near_dedup_stream(s, num_hashes=64, bands=16),
    )
    folded = (
        curation.collapse_verdicts(spark.createDataFrame(verdicts), threshold=0.8)
        .toPandas()
        .set_index("doc_id")
    )
    assert not folded.loc[1, "is_dup"]
    assert folded.loc[1001, "is_dup"] and folded.loc[1001, "dup_of"] == 1
    # C was admitted after B: it suppresses via whichever earlier link
    # its buckets surface — the chain never resurrects a duplicate
    assert folded.loc[2001, "is_dup"]
    assert folded.loc[2001, "dup_of"] in (1, 1001)


from bigdataproject_formula1_telemetry_spark.streaming import merge as _merge


@pytest.mark.skipif(
    not _merge.HAS_TWS_RUNTIME,
    reason="transformWithState needs the protobuf package at runtime",
)
def test_near_dedup_stream_tws_matches_v1(spark, corpus_pdf, tmp_path):
    """The transformWithStateInPandas form must emit the same folded
    verdicts as the applyInPandasWithState form on the same corpus."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        tws = _start_stream(
            spark,
            tmp_path,
            corpus_pdf,
            lambda s: curation.near_dedup_stream_tws(s, num_hashes=64, bands=16),
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    v1 = _start_stream(
        spark,
        tmp_path / "v1",
        corpus_pdf,
        lambda s: curation.near_dedup_stream(s, num_hashes=64, bands=16),
    )
    fa = (
        curation.collapse_verdicts(spark.createDataFrame(tws), threshold=0.8)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    fb = (
        curation.collapse_verdicts(spark.createDataFrame(v1), threshold=0.8)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert fa.equals(fb)


def test_exact_dedup_stream_watermark_bounded_state(spark, tmp_path):
    """The bounded-state form: a copy arriving within the watermark
    horizon is dropped; a copy arriving after the original's state has
    been evicted (event time far past the watermark) passes through —
    the documented state-size/recall trade."""
    import datetime as dt

    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows1 = [(1, "alpha beta gamma", base),
             (2, "delta epsilon zeta", base + dt.timedelta(seconds=10))]
    # batch 2: near-in-time copy of doc 1 (inside the 5 min horizon →
    # dropped) + an unrelated doc 2 h ahead that advances the watermark
    rows2 = [(1001, "alpha beta gamma", base + dt.timedelta(seconds=60)),
             (999, "eta theta iota", base + dt.timedelta(hours=2))]
    # batch 3: spacer — state eviction happens at the END of the first
    # batch that runs with the advanced watermark, so the far copy must
    # arrive one batch after the advance
    rows3 = [(998, "kappa lambda mu", base + dt.timedelta(hours=2, seconds=30))]
    # batch 4: far copy of doc 2 — doc 2's state is evicted by now
    rows4 = [(1002, "delta epsilon zeta",
              base + dt.timedelta(hours=2, seconds=60))]
    schema = "doc_id long, text string, ts timestamp"
    src = str(tmp_path / "wm")
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src, mode="overwrite")
    for rows in (rows2, rows3, rows4):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src, mode="append")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        curation.dedup_stream_exact(stream, ts_col="ts", within="5 minutes")
        .writeStream.format("memory")
        .queryName("wm_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = set(
        r.doc_id for r in spark.sql("SELECT doc_id FROM wm_dedup").collect()
    )
    assert 1 in got and 2 in got and 999 in got
    assert 1001 not in got          # within horizon → duplicate dropped
    assert 1002 in got              # state evicted → passes (documented)


def test_near_dedup_stream_rocksdb_state_store(spark, corpus_pdf, tmp_path):
    """The 100 TB state recipe the docstrings point at: the LSH-bucket
    state runs unchanged on the RocksDB state store provider."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        verdicts = _start_stream(
            spark,
            tmp_path,
            corpus_pdf,
            lambda s: curation.near_dedup_stream(s, num_hashes=64, bands=16),
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    folded = curation.collapse_verdicts(
        spark.createDataFrame(verdicts), threshold=0.8
    ).toPandas()
    batch = dedup.near_dedup_clustered(
        spark.createDataFrame(corpus_pdf, DOC_SCHEMA), threshold=0.8
    )
    assert set(folded[~folded["is_dup"]]["doc_id"]) == set(
        r.doc_id for r in batch.select("doc_id").collect()
    )


def test_stateless_text_gates_apply_to_streams(spark, corpus_pdf, tmp_path):
    """The module docstring's claim, pinned: quality/PII/repetition are
    pure column expressions, so the same transform applied to the stream
    equals the batch result row-for-row."""
    from bigdataproject_formula1_telemetry_spark.operators import text as T

    def gates(df):
        return df.select(
            "doc_id",
            T.redact_pii(F.col("text")).alias("clean"),
            T.quality_score(F.col("text")).alias("q"),
            T.repetition_stats(F.col("text"))["dup_line_frac"].alias("dup"),
        )

    got = (
        _start_stream(spark, tmp_path, corpus_pdf, gates)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        gates(spark.createDataFrame(corpus_pdf, DOC_SCHEMA))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["clean"].tolist() == exp["clean"].tolist()
    assert np.allclose(got["q"], exp["q"])
    assert np.allclose(got["dup"], exp["dup"])


def test_lm_perplexity_gate_applies_to_streams(spark, corpus_pdf, tmp_path):
    """The CCNet perplexity gate on a stream: the LM is trained offline
    (batch word-count), the Arrow scoring form is a stateless mapInPandas
    — so stream == batch row-for-row (the 100 TB ingest-time quality
    gate: score documents as they arrive, no state store needed)."""
    from bigdataproject_formula1_telemetry_spark.operators import lm as L

    batch_docs = spark.createDataFrame(corpus_pdf, DOC_SCHEMA)
    logp, unk = L.collect_lm(L.unigram_lm(batch_docs, vocab_size=1000))

    def gate(df):
        return L.doc_perplexity_arrow(df, logp, unk)

    got = (
        _start_stream(spark, tmp_path, corpus_pdf, gate)
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        gate(batch_docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_tokens"].tolist() == exp["n_tokens"].tolist()
    assert np.allclose(got["ppl"], exp["ppl"])


def _write_stream_parts(spark, tmp_path, corpus_pdf):
    src = str(tmp_path / "admit_src")
    parts = [
        corpus_pdf[corpus_pdf["doc_id"] < 60],
        corpus_pdf[(corpus_pdf["doc_id"] >= 1000) & (corpus_pdf["doc_id"] < 2000)],
        corpus_pdf[corpus_pdf["doc_id"] >= 2000],
    ]
    for i, part in enumerate(parts):
        spark.createDataFrame(part, DOC_SCHEMA).coalesce(1).write.parquet(
            src, mode="overwrite" if i == 0 else "append"
        )
    return src, parts


def _run_admission(spark, src, index_path, out_path, ckpt):
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        curation.admit_stream_against_index(
            stream, index_path, out_path, ckpt
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_admit_stream_shares_state_with_batch_incremental(
    spark, tmp_path, corpus_pdf
):
    """foreachBatch admission against the materialized index: the
    stream's survivors must equal running minhash_index's batch
    incremental step over the same micro-batch partition of the corpus
    — ONE dedup state for both ingest modes."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        minhash_index as MI,
    )

    base = (
        io.read_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .where((F.col("doc_id") >= 200) & (F.col("doc_id") < 240))
    )
    stream_idx = str(tmp_path / "idx_stream")
    batch_idx = str(tmp_path / "idx_batch")
    MI.build_minhash_index(base, stream_idx)
    MI.build_minhash_index(base, batch_idx)

    src, parts = _write_stream_parts(spark, tmp_path, corpus_pdf)
    out_path = str(tmp_path / "admitted")
    _run_admission(
        spark, src, stream_idx, out_path, str(tmp_path / "ckpt1")
    )

    # batch reference: the same three increments through the batch API
    batch_survivors = set()
    for i, part in enumerate(parts):
        inc = spark.createDataFrame(part, DOC_SCHEMA)
        kept = MI.incremental_near_dedup(
            spark, inc, batch_idx, append=True, increment_id=f"b{i:012d}"
        )
        batch_survivors |= {r["doc_id"] for r in kept.select("doc_id").collect()}

    got = spark.read.parquet(out_path)
    stream_survivors = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert stream_survivors == batch_survivors
    # exact copies (1000-block) were all dropped against earlier batches;
    # most originals survive (the documents table plants a few near-dups
    # among the originals themselves, so not all 60 — equality with the
    # batch API above is the exact contract)
    assert not any(1000 <= d < 2000 for d in stream_survivors)
    assert len({d for d in stream_survivors if d < 60}) >= 40
    # both indexes hold identical admitted id sets per increment
    s_sigs = spark.read.parquet(stream_idx + "/sigs")
    b_sigs = spark.read.parquet(batch_idx + "/sigs")
    s_ids = {(r["inc"], r["id"]) for r in s_sigs.collect()}
    b_ids = {(r["inc"], r["id"]) for r in b_sigs.collect()}
    assert s_ids == b_ids


def test_admit_stream_full_replay_is_idempotent(spark, tmp_path, corpus_pdf):
    """The at-least-once failure mode taken to its limit: replay the
    WHOLE stream from scratch (fresh checkpoint, same index and output).
    Each batch re-runs under its original inc= id, the search excludes
    the batch's own partition, both writes replace — index and output
    must converge to the first run's exact content."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        minhash_index as MI,
    )

    base = (
        io.read_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .where((F.col("doc_id") >= 200) & (F.col("doc_id") < 240))
    )
    idx = str(tmp_path / "idx_replay")
    MI.build_minhash_index(base, idx)
    src, _ = _write_stream_parts(spark, tmp_path, corpus_pdf)
    out_path = str(tmp_path / "admitted_replay")

    _run_admission(spark, src, idx, out_path, str(tmp_path / "ckptA"))
    first_out = sorted(
        map(str, spark.read.parquet(out_path).select("inc", "doc_id").collect())
    )
    first_sigs = sorted(
        map(str, spark.read.parquet(idx + "/sigs").select("inc", "id").collect())
    )

    # lost checkpoint → full replay
    _run_admission(spark, src, idx, out_path, str(tmp_path / "ckptB"))
    assert sorted(
        map(str, spark.read.parquet(out_path).select("inc", "doc_id").collect())
    ) == first_out
    assert sorted(
        map(str, spark.read.parquet(idx + "/sigs").select("inc", "id").collect())
    ) == first_sigs


def _run_exact_admission(spark, src, index_path, out_path, ckpt):
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        curation.admit_stream_exact_against_index(
            stream, index_path, out_path, ckpt
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive


@pytest.mark.slowtier
def test_admit_stream_exact_shares_state_and_replays(spark, tmp_path, corpus_pdf):
    """Exact-dedup streaming admission against the Bloom-backed index:
    equals the sequential batch API on the same increments, and a full
    from-scratch replay converges byte-identically."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        exact_index as EIX,
    )

    base = (
        io.read_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .where((F.col("doc_id") >= 300) & (F.col("doc_id") < 340))
    )
    sidx = str(tmp_path / "eidx_stream")
    bidx = str(tmp_path / "eidx_batch")
    EIX.build_exact_index(base, sidx, expected_items=10_000)
    EIX.build_exact_index(base, bidx, expected_items=10_000)

    src, parts = _write_stream_parts(spark, tmp_path, corpus_pdf)
    out_path = str(tmp_path / "exact_admitted")
    _run_exact_admission(spark, src, sidx, out_path, str(tmp_path / "eck1"))

    # batch reference: same three increments, sequentially
    from bigdataproject_formula1_telemetry_spark.operators.dedup import (
        exact_dedup,
    )

    batch_survivors = set()
    for i, part in enumerate(parts):
        inc = exact_dedup(spark.createDataFrame(part, DOC_SCHEMA))
        kept = EIX.dedup_exact_against_index(
            spark, inc, bidx, exclude_inc=f"b{i:012d}"
        ).localCheckpoint(eager=True)
        EIX.append_exact_index(kept, bidx, increment_id=f"b{i:012d}")
        batch_survivors |= {r["doc_id"] for r in kept.select("doc_id").collect()}

    got = spark.read.parquet(out_path)
    stream_survivors = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert stream_survivors == batch_survivors
    # the 1000-block are verbatim copies of batch-0 docs: all dropped;
    # the 2000-block are appended-token NEAR copies: exact dedup keeps them
    assert not any(1000 <= d < 2000 for d in stream_survivors)
    assert all(d + 2000 in stream_survivors
               for d in stream_survivors if d < 32 and d >= 20)

    first_out = sorted(
        map(str, got.select("inc", "doc_id").collect())
    )
    first_hashes = sorted(
        map(str, spark.read.parquet(sidx + "/hashes").select("inc", "id").collect())
    )
    # full replay (lost checkpoint) converges to identical content
    _run_exact_admission(spark, src, sidx, out_path, str(tmp_path / "eck2"))
    assert sorted(
        map(str, spark.read.parquet(out_path).select("inc", "doc_id").collect())
    ) == first_out
    assert sorted(
        map(str, spark.read.parquet(sidx + "/hashes").select("inc", "id").collect())
    ) == first_hashes


def test_admission_stats_rows_and_replay_idempotence(spark, tmp_path, corpus_pdf):
    """stats_path writes one (inc, n_input, n_admitted, n_dropped) row
    per micro-batch under the same idempotent inc= discipline; totals
    reconcile with the survivor output, and a full replay rewrites
    rather than double-counts."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        minhash_index as MI,
    )

    base = (
        io.read_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .where((F.col("doc_id") >= 400) & (F.col("doc_id") < 430))
    )
    idx = str(tmp_path / "stats_idx")
    MI.build_minhash_index(base, idx)
    src, parts = _write_stream_parts(spark, tmp_path, corpus_pdf)
    out_path = str(tmp_path / "stats_out")
    stats_path = str(tmp_path / "stats_rows")

    def run(ckpt):
        stream = (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            curation.admit_stream_against_index(
                stream, idx, out_path, ckpt, stats_path=stats_path
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run(str(tmp_path / "sck1"))
    stats = spark.read.parquet(stats_path).toPandas().sort_values("inc")
    assert len(stats) == 3  # one row per micro-batch
    assert (stats["n_input"] == [len(p) for p in parts]).all()
    assert (stats["n_dropped"] == stats["n_input"] - stats["n_admitted"]).all()
    n_out = spark.read.parquet(out_path).count()
    assert stats["n_admitted"].sum() == n_out
    # full replay: stats rows are REWRITTEN per inc, never appended
    run(str(tmp_path / "sck2"))
    stats2 = spark.read.parquet(stats_path).toPandas().sort_values("inc")
    assert len(stats2) == 3
    assert stats2["n_admitted"].tolist() == stats["n_admitted"].tolist()


@pytest.mark.slowtier
def test_admit_stream_semantic_shares_state_and_replays(spark, tmp_path):
    """SEMANTIC streaming admission (the third axis of the admission
    triangle): equals the sequential incremental_semantic_dedup batch
    API on the same increments, and a full from-scratch replay
    converges byte-identically."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        semdedup as SD,
        similarity as sim,
    )

    VEC_SCHEMA = "vec_id long, embedding array<double>"
    rng = np.random.default_rng(83)
    dim = 8
    base = rng.standard_normal((40, dim))
    base_sdf = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(base)], VEC_SCHEMA
    )
    C = sim.ivf_centroids(base_sdf, n_clusters=4, max_iter=3)
    sidx = str(tmp_path / "semidx_stream")
    bidx = str(tmp_path / "semidx_batch")
    SD.build_semantic_index(base_sdf, C, sidx, "base")
    SD.build_semantic_index(base_sdf, C, bidx, "base")

    fresh1 = rng.standard_normal((10, dim))
    parts = [
        # batch 0: 10 fresh + 3 near-copies of base (must drop vs index)
        [(100 + i, v.tolist()) for i, v in enumerate(fresh1)]
        + [
            (150 + i, (base[i] + rng.standard_normal(dim) * 1e-3).tolist())
            for i in range(3)
        ],
        # batch 1: near-copies of batch-0 fresh rows (cross-batch dedup
        # through the shared index) + 4 genuinely fresh
        [
            (200 + i, (fresh1[i] + rng.standard_normal(dim) * 1e-3).tolist())
            for i in range(5)
        ]
        + [(250 + i, rng.standard_normal(dim).tolist()) for i in range(4)],
        # batch 2: exact replica pair within the batch (self-dedup) + fresh
        [(300, fresh1[9].tolist()), (301, rng.standard_normal(dim).tolist()),
         (302, rng.standard_normal(dim).tolist())],
    ]
    src = str(tmp_path / "vsrc")
    for i, part in enumerate(parts):
        spark.createDataFrame(part, VEC_SCHEMA).coalesce(1).write.parquet(
            src, mode="overwrite" if i == 0 else "append"
        )

    out_path = str(tmp_path / "sem_admitted")

    def run(ckpt):
        stream = (
            spark.readStream.schema(VEC_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            curation.admit_stream_semantic_against_index(
                stream, sidx, C, out_path, str(tmp_path / ckpt),
                threshold=0.95, nprobe=2,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert not q.isActive

    run("sck1")

    # batch reference: same increments through the batch API
    batch_survivors = set()
    for i, part in enumerate(parts):
        kept = SD.incremental_semantic_dedup(
            spark, spark.createDataFrame(part, VEC_SCHEMA), bidx, C,
            threshold=0.95, nprobe=2, append=True,
            increment_id=f"b{i:012d}",
        )
        batch_survivors |= {r["vec_id"] for r in kept.select("vec_id").collect()}

    got = spark.read.parquet(out_path)
    stream_survivors = {r["vec_id"] for r in got.select("vec_id").collect()}
    assert stream_survivors == batch_survivors
    # the planted verdicts: base near-copies and cross-batch copies die,
    # fresh rows live
    assert not any(150 <= v < 160 for v in stream_survivors)
    assert not any(200 <= v < 205 for v in stream_survivors)
    assert not any(v == 300 for v in stream_survivors)
    assert {250, 251, 252, 253, 301, 302} <= stream_survivors
    assert all(100 <= v < 110 for v in stream_survivors if v < 150)

    first_out = sorted(map(str, got.select("inc", "vec_id").collect()))
    first_idx = sorted(
        map(str, spark.read.parquet(sidx).select("inc", "vec_id").collect())
    )
    # full replay (lost checkpoint) converges to identical content
    run("sck2")
    assert sorted(
        map(str, spark.read.parquet(out_path).select("inc", "vec_id").collect())
    ) == first_out
    assert sorted(
        map(str, spark.read.parquet(sidx).select("inc", "vec_id").collect())
    ) == first_idx
