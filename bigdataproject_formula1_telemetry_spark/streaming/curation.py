"""Streaming curation: cross-micro-batch deduplication for a continuously
ingested document stream — the streaming face of ``operators/dedup.py``.

At ingest scale, curation cannot be a nightly re-run over the full
corpus: new documents arrive continuously and each must be checked
against everything already admitted.  Spark-first building blocks:

- exact dedup → streaming ``dropDuplicates`` (state = one content hash
  per distinct doc) or ``dropDuplicatesWithinWatermark`` (state bounded
  by the watermark horizon — the dedup-window contract production
  ingest pipelines run with; at 100 TB pair it with the RocksDB state
  store provider so state spills off-heap).
- near-dedup → explicit LSH-bucket state via ``applyInPandasWithState``:
  the stream carries each doc's minhash signature into its ``bands``
  band buckets, and every bucket holds the signatures admitted so far.
- steady-state admission → ``admit_stream_against_index``: micro-batches
  filtered against the MATERIALIZED MinHash index
  (``operators/minhash_index.py``) in ``foreachBatch``, so batch and
  streaming ingest share ONE dedup state instead of the stream holding
  its own per-bucket copy.

The stateless text operators (``operators/text.py`` quality scoring,
language-ID, chunking) apply to streaming frames unchanged — they are
pure column expressions; only dedup needs state and lives here.

Semantics note (the honest streaming trade): the batch operators verify
LSH candidates with EXACT shingle Jaccard, which a stream cannot do
without keeping every admitted document's shingle set in state.  The
streaming form verifies with the signature-ESTIMATED Jaccard (lane
agreement fraction — unbiased, se ≈ sqrt(J(1-J)/num_hashes) ≈ 0.05 at
64 lanes), the standard streaming approximation.  Near-threshold pairs
can therefore differ from the batch verdict; pairs ≳ 2 se away agree.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..operators.dedup import minhash_signature_arrow, shingles


def dedup_stream_exact(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str | None = None,
    within: str | None = None,
) -> DataFrame:
    """Exact streaming dedup keyed on ``md5(text)`` — first arrival wins,
    later copies never leave the stream.

    Without ``ts_col``/``within``: plain streaming ``dropDuplicates`` —
    state holds one 16-byte hash per DISTINCT document forever (correct
    at any horizon, state grows with the distinct corpus).  With them:
    ``withWatermark(ts_col, within)`` + ``dropDuplicatesWithinWatermark``
    — a copy arriving within ``within`` of the original is dropped and
    state older than the watermark is evicted, so state is bounded by
    the ingest rate × horizon instead of corpus size.
    """
    hashed = stream.withColumn("__content_h", F.md5(F.col(text_col)))
    if ts_col is not None and within is not None:
        out = hashed.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(
            ["__content_h"]
        )
    elif ts_col is not None or within is not None:
        raise ValueError("pass BOTH ts_col and within, or neither")
    else:
        out = hashed.dropDuplicates(["__content_h"])
    return out.drop("__content_h")


def _band_hash_expr(sig: Column, num_hashes: int, bands: int) -> Column:
    """bands × xxhash64-of-band-lanes (the expression banding of
    ``minhash_lsh_candidates``'s fallback path — bucket ids only need to
    be self-consistent within the stream, and the signature column is
    already materialized here, so there is nothing to fuse)."""
    rows_per_band = num_hashes // bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            F.array_join(
                F.transform(
                    F.slice(sig, b * rows_per_band + 1, rows_per_band),
                    lambda v: v.cast("string"),
                ),
                ",",
            )
        ),
    )


_VERDICT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("band", IntegerType()),
        StructField("dup_of", LongType()),
        StructField("est_jaccard", DoubleType()),
    ]
)

_BUCKET_STATE = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("sigs", BinaryType()),
    ]
)


def near_dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Cross-batch MinHash near-dedup with explicit LSH-bucket state.

    Per doc: shingle hashes → Arrow minhash signature (the batch
    kernel, bit-identical lanes) → ``bands`` bucket keys.  Per
    ``(band, bucket)`` group, ``applyInPandasWithState`` holds the
    signatures seen so far (ids + one packed int64 blob, 8·num_hashes
    bytes per admitted doc) and emits one verdict row per (doc, band):
    ``dup_of`` = the best-matching earlier doc and ``est_jaccard`` = the
    lane-agreement estimate against it (NULL/0.0 when the bucket was
    empty).  Docs are compared against earlier arrivals only — within a
    micro-batch, ascending ``id_col`` order stands in for arrival order,
    so the first-arrived (lowest-id) doc of a duplicate chain survives,
    matching the batch ``near_dedup_clustered`` min-id-representative
    semantics (every doc is stored in state whether or not it was
    flagged, so transitive chains A~B~C suppress B AND C exactly like
    the batch connected component does).

    A doc's GLOBAL verdict is the max estimate over its bands — fold
    the bucket rows with ``collapse_verdicts`` (per micro-batch in
    ``foreachBatch``, or on the materialized sink).  Buckets are capped
    at ``max_bucket_size`` admitted signatures: beyond it, new docs
    still get verdicts against the stored set but stop being admitted
    (a boilerplate-pileup bucket stops growing; its docs keep pairing
    through their other bands — the same degeneracy contract as the
    batch ``max_bucket_size``, logged there, bounded here).

    State per bucket is ids + signatures (~520 B/doc at 64 lanes), never
    text.  At 100 TB: bands × corpus signatures sharded across the
    ``(band, bucket)`` key space — use the RocksDB state store provider.
    """
    import numpy as np

    if num_hashes % bands:
        raise ValueError(f"bands ({bands}) must divide num_hashes ({num_hashes})")

    h = F.transform(shingles(F.col(text_col), shingle_n), lambda s: F.xxhash64(s))
    sig = minhash_signature_arrow(num_hashes)(h)
    banded = (
        stream.select(F.col(id_col).cast("long").alias("doc_id"), sig.alias("__sig"))
        .select(
            "doc_id",
            "__sig",
            F.posexplode(_band_hash_expr(F.col("__sig"), num_hashes, bands)).alias(
                "band", "bhash"
            ),
        )
    )

    def bucket_fn(key, pdfs, state: GroupState):
        if state.exists:
            ids, blob = state.get
            ids = list(ids)
            S = np.frombuffer(bytes(blob), dtype=np.int64).reshape(
                len(ids), num_hashes
            )
        else:
            ids = []
            S = np.empty((0, num_hashes), dtype=np.int64)
        band = int(key[0])
        chunks = [S]
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id")
            out = {
                "doc_id": [],
                "band": [],
                "dup_of": [],
                "est_jaccard": [],
            }
            for doc_id, sig_arr in zip(pdf["doc_id"], pdf["__sig"]):
                v = np.asarray(sig_arr, dtype=np.int64)
                if len(ids):
                    if len(chunks) > 1:
                        chunks = [np.vstack(chunks)]
                        S = chunks[0]
                    agree = (S == v).mean(axis=1)
                    best = int(np.argmax(agree))
                    out["dup_of"].append(ids[best])
                    out["est_jaccard"].append(float(agree[best]))
                else:
                    out["dup_of"].append(None)
                    out["est_jaccard"].append(0.0)
                out["doc_id"].append(int(doc_id))
                out["band"].append(band)
                if len(ids) < max_bucket_size:
                    ids.append(int(doc_id))
                    chunks.append(v[None, :])
            if out["doc_id"]:
                yield pd.DataFrame(out).astype(
                    {"doc_id": "int64", "band": "int32", "est_jaccard": "float64"}
                )
        S = np.vstack(chunks) if len(chunks) > 1 else chunks[0]
        state.update((ids, S.tobytes()))

    return banded.groupBy("band", "bhash").applyInPandasWithState(
        bucket_fn,
        outputStructType=_VERDICT_SCHEMA,
        stateStructType=_BUCKET_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def collapse_verdicts(verdicts: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Fold bucket-level ``near_dedup_stream`` rows into one verdict per
    doc: ``is_dup`` iff the best band estimate clears ``threshold``,
    ``dup_of`` = that band's matched doc (ties → lowest matched id).
    Batch helper — run it per micro-batch in ``foreachBatch`` or over
    the materialized verdict sink."""
    order = F.struct(
        F.col("est_jaccard"),
        (-F.coalesce(F.col("dup_of"), F.lit(2**62))).alias("neg_id"),
    )
    best = verdicts.groupBy("doc_id").agg(
        F.max("est_jaccard").alias("est_jaccard"),
        F.max_by("dup_of", order).alias("dup_of"),
    )
    return best.select(
        "doc_id",
        (F.col("est_jaccard") >= F.lit(threshold)).alias("is_dup"),
        F.when(F.col("est_jaccard") >= threshold, F.col("dup_of")).alias("dup_of"),
        "est_jaccard",
    )


def near_dedup_stream_tws(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """``near_dedup_stream`` on ``transformWithStateInPandas`` (Spark 4's
    arbitrary-state v2 API) — identical bucket semantics with the
    ids+signatures blob as a named ``ValueState``.

    Same runtime requirements as ``merge.latest_value_merge_stream_tws``:
    the RocksDB state store provider and the ``protobuf`` package
    (``merge.HAS_TWS_RUNTIME``); the ``applyInPandasWithState`` form is
    the always-available path.  Verdict rows, arrival-order tie-break,
    bucket cap, and the transitive-suppression contract are all as
    documented on ``near_dedup_stream``."""
    import numpy as np
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    if num_hashes % bands:
        raise ValueError(f"bands ({bands}) must divide num_hashes ({num_hashes})")

    h = F.transform(shingles(F.col(text_col), shingle_n), lambda s: F.xxhash64(s))
    sig = minhash_signature_arrow(num_hashes)(h)
    banded = (
        stream.select(F.col(id_col).cast("long").alias("doc_id"), sig.alias("__sig"))
        .select(
            "doc_id",
            "__sig",
            F.posexplode(_band_hash_expr(F.col("__sig"), num_hashes, bands)).alias(
                "band", "bhash"
            ),
        )
    )

    class _BucketProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._bucket = handle.getValueState("bucket", _BUCKET_STATE)

        def handleInputRows(self, key, rows, timer_values):
            if self._bucket.exists():
                ids, blob = tuple(self._bucket.get())
                ids = list(ids)
                S = np.frombuffer(bytes(blob), dtype=np.int64).reshape(
                    len(ids), num_hashes
                )
            else:
                ids = []
                S = np.empty((0, num_hashes), dtype=np.int64)
            band = int(key[0])
            chunks = [S]
            for pdf in rows:
                pdf = pdf.sort_values("doc_id")
                out = {"doc_id": [], "band": [], "dup_of": [], "est_jaccard": []}
                for doc_id, sig_arr in zip(pdf["doc_id"], pdf["__sig"]):
                    v = np.asarray(sig_arr, dtype=np.int64)
                    if len(ids):
                        if len(chunks) > 1:
                            chunks = [np.vstack(chunks)]
                        S = chunks[0]
                        agree = (S == v).mean(axis=1)
                        best = int(np.argmax(agree))
                        out["dup_of"].append(ids[best])
                        out["est_jaccard"].append(float(agree[best]))
                    else:
                        out["dup_of"].append(None)
                        out["est_jaccard"].append(0.0)
                    out["doc_id"].append(int(doc_id))
                    out["band"].append(band)
                    if len(ids) < max_bucket_size:
                        ids.append(int(doc_id))
                        chunks.append(v[None, :])
                if out["doc_id"]:
                    yield pd.DataFrame(out).astype(
                        {"doc_id": "int64", "band": "int32", "est_jaccard": "float64"}
                    )
            S = np.vstack(chunks) if len(chunks) > 1 else chunks[0]
            self._bucket.update((ids, S.tobytes()))

        def close(self) -> None:
            pass

    return banded.groupBy("band", "bhash").transformWithStateInPandas(
        statefulProcessor=_BucketProcessor(),
        outputStructType=_VERDICT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )


def admit_batch_against_index(
    spark,
    batch_df: DataFrame,
    index_path: str,
    increment_id: str,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """One micro-batch of the steady-state admission: self-dedup the
    batch, drop what the materialized index already has, admit the
    survivors under ``inc=<increment_id>`` — exactly
    ``minhash_index.incremental_near_dedup`` (retry-idempotent: the
    search excludes the increment's own partition, the append replaces
    it).  Returns the admitted survivors, eagerly materialized."""
    from ..operators.minhash_index import incremental_near_dedup

    return incremental_near_dedup(
        spark, batch_df, index_path, threshold, text_col, id_col,
        num_hashes, bands, shingle_n, append=True, increment_id=increment_id,
    )


def admit_stream_against_index(
    stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    stats_path: str | None = None,
):
    """The steady-state streaming-ingest topology: every micro-batch is
    near-dedup-filtered against the MATERIALIZED MinHash index — the
    same state batch jobs build and search — and the survivors are (a)
    admitted to the index and (b) written to ``out_path``, both under
    ``inc=b<batch_id>`` partitions.

    This is the foreachBatch complement to ``near_dedup_stream``: that
    operator holds its own per-LSH-bucket state inside the state store
    (self-contained, exactly-once), which means a batch backfill and the
    stream each dedup against a PRIVATE corpus view.  Routing the stream
    through the shared index gives one dedup state for both ingest
    modes; the trade is foreachBatch's at-least-once contract, which the
    ``inc=`` discipline absorbs: a replayed micro-batch re-runs with the
    same batch id, the index search EXCLUDES the batch's own partition
    (a half-admitted prior attempt can't match the batch against
    itself), and both writes clear-then-replace their partition — so
    replays converge to the same index and output, byte-for-byte
    (pinned in tests, including a full from-scratch replay).  r12
    caveat (the ``bm25_index.index_stream`` rule): run the index
    compactors only while the stream is STOPPED with its last batch
    committed — a compaction folding a batch's ``inc=`` between a crash
    and its replay makes the replay fail loudly on the folded-id marker
    instead of silently re-admitting next to the folded rows.

    Returns the configured ``DataStreamWriter`` — caller picks the
    trigger and calls ``.start()``.  Survivor rows in ``out_path`` carry
    their ``inc`` partition for provenance.

    ``stats_path`` (optional) writes one admission-telemetry row per
    micro-batch — ``(inc, n_input, n_admitted, n_dropped)`` — under the
    same idempotent ``inc=`` discipline, so replays rewrite their own
    stats row too.  This is the ingest dashboard feed: a dup-rate spike
    (n_dropped/n_input) is the first sign of a crawler loop or a replayed
    upstream source.  Counting costs two counts of the (small by
    contract) increment."""
    return _admission_writer(
        stream,
        checkpoint_dir,
        out_path,
        stats_path,
        lambda spark, batch_df, inc_id: admit_batch_against_index(
            spark, batch_df, index_path, inc_id, threshold,
            text_col, id_col, num_hashes, bands, shingle_n,
        ),
    )


def _admission_writer(stream, checkpoint_dir, out_path, stats_path, admit_fn):
    """Shared foreachBatch body for the two index-admission topologies:
    idempotent survivor write (+ optional per-batch stats row)."""
    from ..operators.minhash_index import _INC_ID_RE, _clear_inc_partition

    def _admit(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        inc_id = f"b{batch_id:012d}"
        assert _INC_ID_RE.match(inc_id)
        survivors = admit_fn(spark, batch_df, inc_id)
        _clear_inc_partition(spark, out_path, inc_id)
        survivors.withColumn("inc", F.lit(inc_id)).write.mode(
            "append"
        ).partitionBy("inc").parquet(out_path)
        if stats_path is not None:
            n_in = batch_df.count()
            n_adm = survivors.count()
            _clear_inc_partition(spark, stats_path, inc_id)
            spark.createDataFrame(
                [(inc_id, n_in, n_adm, n_in - n_adm)],
                "inc string, n_input long, n_admitted long, n_dropped long",
            ).write.mode("append").partitionBy("inc").parquet(stats_path)

    return stream.writeStream.foreachBatch(_admit).option(
        "checkpointLocation", checkpoint_dir
    )


def admit_stream_exact_against_index(
    stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    stats_path: str | None = None,
):
    """EXACT-dedup twin of ``admit_stream_against_index``: micro-batches
    filtered against the materialized md5 hash index + Bloom sidecar
    (``operators/exact_index.py``) in ``foreachBatch``, survivors
    admitted to the index and written to ``out_path`` under
    ``inc=b<batch_id>`` — batch and streaming exact-dedup share ONE
    state, with the same replay-convergent idempotency discipline
    (own-partition-excluded search, clear-then-write admission; pinned
    in tests including a full from-scratch replay).

    Unlike ``dedup_stream_exact`` (whose dropDuplicates state lives in
    the state store, private to the stream), this topology lets a batch
    backfill and the live stream dedup against the same corpus.  The
    per-batch self-dedup is ``dedup.exact_dedup`` (deterministic min-id
    keeper — NOT dropDuplicates' arbitrary row, which would break
    byte-identical replay convergence).

    Returns the configured ``DataStreamWriter``; ``stats_path`` as on
    ``admit_stream_against_index``."""
    from ..operators.dedup import exact_dedup
    from ..operators.exact_index import (
        append_exact_index,
        dedup_exact_against_index,
    )

    def _admit_one(spark, batch_df: DataFrame, inc_id: str) -> DataFrame:
        self_deduped = exact_dedup(batch_df, text_col, id_col)
        survivors = dedup_exact_against_index(
            spark, self_deduped, index_path, text_col, id_col,
            exclude_inc=inc_id,
        ).localCheckpoint(eager=True)
        append_exact_index(
            survivors, index_path, increment_id=inc_id,
            text_col=text_col, id_col=id_col,
        )
        return survivors

    return _admission_writer(
        stream, checkpoint_dir, out_path, stats_path, _admit_one
    )


def admit_stream_semantic_against_index(
    stream: DataFrame,
    index_path: str,
    centroids,
    out_path: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "low_centroid_sim",
    stats_path: str | None = None,
):
    """SEMANTIC twin of ``admit_stream_against_index``, completing the
    admission triangle (exact / MinHash / embedding): micro-batches are
    SemDeDup-filtered against the materialized
    ``semdedup.build_semantic_index`` table in ``foreachBatch`` —
    per-batch self-dedup (``semantic_dedup``), then the
    partition-pruned broadcast search against every OTHER increment's
    vectors, then clear-then-replace admission under ``inc=b<batch_id>``
    — so a batch backfill and the live stream share ONE semantic-dedup
    state, with the same replay-convergent idempotency discipline as
    the other two axes (own-partition-excluded search; replays converge
    byte-for-byte).

    ``centroids`` is the trained coarse quantizer shared by every
    producer of this index (train once, ship with the index —
    re-clustering would re-shard the whole table).  Returns the
    configured ``DataStreamWriter``; ``stats_path`` as on
    ``admit_stream_against_index``."""
    from ..operators.semdedup import incremental_semantic_dedup

    def _admit_one(spark, batch_df: DataFrame, inc_id: str) -> DataFrame:
        return incremental_semantic_dedup(
            spark, batch_df, index_path, centroids, threshold, nprobe,
            id_col=id_col, vec_col=vec_col, keep=keep,
            append=True, increment_id=inc_id,
        )

    return _admission_writer(
        stream, checkpoint_dir, out_path, stats_path, _admit_one
    )
