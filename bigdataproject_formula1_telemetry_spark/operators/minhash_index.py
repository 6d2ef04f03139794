"""Materialized MinHash index: incremental batch near-dedup at corpus
scale.

``near_dedup_minhash`` re-shingles the WHOLE corpus every run — right
for a one-shot curation pass, wrong for the steady state of a 100 TB
corpus that grows by daily increments: re-hashing petabytes to admit a
few million new documents is the dominant (and avoidable) cost.  This
module materializes the dedup state once and makes each increment pay
only for itself, mirroring the repo's other ingest-time/serving-time
splits (``similarity.build_inverted_file`` / ``knn_ivf_materialized``
for ANN; ``streaming/curation.py`` holds the same state per LSH bucket
in a state store for the streaming topology):

- ``build_minhash_index(docs, path)`` — ONE pass over the corpus writes
  two parquet tables: ``sigs`` (id, 64-lane minhash signature — the
  fused Arrow kernel, 8·64 B/doc) and ``banded`` (band, bhash, id),
  partitioned by ``band`` (16 directories).
- ``dedup_against_index(spark, new_docs, path)`` — the increment (small
  by contract, like a kNN query set) is signed and banded, then
  **broadcast** against the index scan: candidate generation and
  signature verification never shuffle the index, whose only cost is a
  column-pruned parquet scan (plan asserted in tests).  Verification
  uses the unbiased signature estimate of Jaccard (matching-lane
  fraction, 64 lanes) — the standard at-scale verify when the indexed
  side's shingle sets are not retained.  The estimate is quantized to
  1/64 with binomial lane noise (se ≈ √(J(1−J)/64) ≈ 0.05 at J = 0.8),
  so verdicts near the threshold BAND: pairs whose exact Jaccard is
  within ~3 se (±0.15) of the threshold may verify either way, pairs
  outside that band get the exact verdict (pinned by a deterministic
  sweep in ``tests/test_minhash_index.py``).  Widen ``num_hashes`` to
  sharpen: the band shrinks as 1/√num_hashes.
- ``append_minhash_index(new_docs, path, increment_id)`` — admit the
  survivors under an ``inc=<id>`` partition whose directory is
  explicitly cleared before the write, so a retried/re-run increment
  replaces itself instead of double-appending — even when the retry
  admits nothing (idempotent admission); tomorrow's increment dedups
  against today's.

Intra-increment duplicates are deliberately out of scope: self-dedup
the increment first (``near_dedup_minhash`` — it is small), then filter
it against the index, then append.  ``incremental_near_dedup``
composes exactly that and is equivalence-tested against the one-shot
batch pipeline on planted duplicates.
"""

from __future__ import annotations

import os
import re as _re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.operators.dedup import (
    minhash_signature_arrow,
    near_dedup_minhash,
    shingle_sets,
)

__all__ = [
    "build_minhash_index",
    "append_minhash_index",
    "dedup_against_index",
    "incremental_near_dedup",
    "list_increments",
    "expire_increments",
    "compact_index",
]


def _sig_frame(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    shingle_n: int,
) -> DataFrame:
    """(id, sig) — NULL-text docs are excluded (they have no shingle set;
    they can neither certify nor suffer a near-dup)."""
    sh = shingle_sets(
        docs.where(F.col(text_col).isNotNull()),
        text_col,
        id_col,
        shingle_n,
        storage="none",  # single consumer here — no barrier needed
    )
    return sh.select(
        "id", minhash_signature_arrow(num_hashes)(F.col("h")).alias("sig")
    )


def _banded(sig_frame: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """Explode (id, sig) to (band, bhash, id) — JVM slice+xxhash64 over
    the stored signature, deterministic across sessions (fixed seed)."""
    rows_per_band = num_hashes // bands
    return sig_frame.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.cast("int").alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bhash"),
                ),
            )
        ).alias("bb"),
    ).select("bb.band", "bb.bhash", "id")


def build_minhash_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> None:
    """One corpus pass → ``path/sigs`` + ``path/banded`` (partitioned by
    band).  The signature kernel runs once; the banded table derives
    from the *written* sigs so the two tables can never drift."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        index_lifecycle as LC,
    )

    if num_hashes % bands:
        raise ValueError(f"bands ({bands}) must divide num_hashes ({num_hashes})")
    LC.reset_lifecycle(docs.sparkSession, LC.lease_file_at(path))
    sig = _sig_frame(docs, text_col, id_col, num_hashes, shingle_n).withColumn(
        "inc", F.lit("base")
    )
    # STATIC overwrite per-write: a base build is a FRESH index.  Under
    # the session default (partitionOverwriteMode=dynamic) this write
    # only replaces inc=base, so rebuilding onto a used path would keep
    # the previous generation's inc=* partitions — stale admission state
    # silently rejecting docs the new index never saw.
    sig.write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("inc").parquet(os.path.join(path, "sigs"))
    spark = docs.sparkSession
    stored = spark.read.parquet(os.path.join(path, "sigs"))
    _banded(stored.select("id", "sig"), num_hashes, bands).withColumn(
        "inc", F.lit("base")
    ).write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("inc", "band").parquet(os.path.join(path, "banded"))


_INC_ID_RE = _re.compile(r"^[A-Za-z0-9._-]+$")


def _clear_inc_partition(spark, table_path: str, increment_id: str) -> None:
    """Recursively delete ``table_path/inc=<increment_id>`` (no-op if
    absent) via the Hadoop FileSystem API, so the delete works on any
    Hadoop-compatible store, not just local paths."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(
        os.path.join(table_path, f"inc={increment_id}")
    )
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    fs.delete(p, True)


def _swap_staged(spark, staged: str, table: str) -> None:
    """Crash-safe staged→live swap shared by every ``compact_*``: the
    live table is renamed ASIDE (``<table>.old``) before the staged dir
    is renamed into place, so a COMPLETE copy exists under some name at
    every instant — delete-then-rename had a window (after the
    recursive delete, before the rename) with NO live directory at all.
    The exposure here is two metadata renames, and a crash between them
    leaves ``<table>.old`` intact: recover by renaming it back (the
    next swap also clears any stale ``.old`` first, so a lost final
    delete is residual garbage, never data loss)."""
    jvm = spark._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(staged)
    dst = jvm.org.apache.hadoop.fs.Path(table)
    old = jvm.org.apache.hadoop.fs.Path(table + ".old")
    fs = dst.getFileSystem(conf)
    fs.delete(old, True)  # stale .old from a prior crashed swap
    if fs.exists(dst) and not fs.rename(dst, old):
        raise IOError(f"swap: rename {table} -> {table}.old failed")
    if not fs.rename(src, dst):
        fs.rename(old, dst)  # put the live table back before raising
        raise IOError(f"swap: rename {staged} -> {table} failed")
    fs.delete(old, True)


def append_minhash_index(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    increment_id: str = "inc0",
) -> None:
    """Admit an increment under its own ``inc=<increment_id>`` partition,
    idempotently per increment id: the partition directory is explicitly
    DELETED before the write, so a re-run (job retry, re-deploy)
    replaces the prior attempt even when the new survivors frame is
    EMPTY or covers fewer band partitions — dynamic partition overwrite
    alone only replaces partitions present in the new data, which would
    leave a previously-written ``inc=<id>`` intact on an empty retry and
    let its stale signatures over-drop future increments.  The caller
    filters the increment first (see ``incremental_near_dedup``) and
    supplies a stable id per batch (date, batch number).  Fails fast
    while a compaction lease is held, and aborts-with-rollback if one
    lands mid-append (the shared ``index_lifecycle`` contract, r12)."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        index_lifecycle as LC,
    )

    if not _INC_ID_RE.match(increment_id):
        raise ValueError(
            "increment_id must match [A-Za-z0-9._-]+ (it names a "
            f"partition directory), got {increment_id!r}"
        )
    spark = new_docs.sparkSession
    lease = LC.lease_file_at(path)
    LC.check_append_allowed(
        spark, lease, "append_minhash_index", increment_id=increment_id
    )
    tables = [os.path.join(path, "sigs"), os.path.join(path, "banded")]
    # retry clear order: COMMIT MARKER (banded) first (ADVICE r13, bm25
    # twin) — the id must stop being commit-complete before sigs is
    # touched, or a concurrent compaction could fold a torn increment
    _clear_inc_partition(spark, tables[1], increment_id)
    _clear_inc_partition(spark, tables[0], increment_id)
    sig = _sig_frame(new_docs, text_col, id_col, num_hashes, shingle_n)
    sig.withColumn("inc", F.lit(increment_id)).write.mode(
        "append"
    ).partitionBy("inc").parquet(tables[0])
    _banded(sig, num_hashes, bands).withColumn(
        "inc", F.lit(increment_id)
    ).write.mode("append").partitionBy("inc", "band").parquet(tables[1])
    LC.abort_append_if_leased(
        spark, lease, increment_id, tables, "append_minhash_index"
    )


def _est_jaccard(sig_a, sig_b, num_hashes: int):
    """Unbiased minhash estimate: fraction of agreeing lanes."""
    agree = F.filter(
        F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda m: m
    )
    return F.size(agree).cast("double") / F.lit(float(num_hashes))


def dedup_against_index(
    spark: SparkSession,
    new_docs: DataFrame,
    path: str,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    exclude_inc: str | None = None,
) -> DataFrame:
    """The increment minus every doc whose estimated Jaccard against ANY
    indexed doc reaches ``threshold``.

    Plan shape (asserted in tests): the increment's banded/sig frames
    are BROADCAST; the index's ``banded`` and ``sigs`` scans are joined
    broadcast-side-small, so the index is never shuffled — its cost is
    one column-pruned scan per table.

    ``exclude_inc`` skips one ``inc=`` partition of the index (a
    partition-pruned predicate): pass the increment's OWN id when the
    search is part of a search-then-append step that may be retried —
    a half-completed prior attempt would otherwise have admitted this
    very increment, and the retry would drop every doc as a match
    against itself."""
    new_sig = _sig_frame(new_docs, text_col, id_col, num_hashes, shingle_n)
    new_banded = _banded(new_sig, num_hashes, bands).withColumnRenamed(
        "id", "new_id"
    )
    idx_banded = spark.read.parquet(os.path.join(path, "banded"))
    idx_sigs_raw = spark.read.parquet(os.path.join(path, "sigs"))
    if exclude_inc is not None:
        idx_banded = idx_banded.where(F.col("inc") != F.lit(exclude_inc))
        idx_sigs_raw = idx_sigs_raw.where(F.col("inc") != F.lit(exclude_inc))
    idx_banded = idx_banded.drop("inc")
    cand = (
        idx_banded.join(F.broadcast(new_banded), ["band", "bhash"])
        .select(F.col("id").alias("old_id"), "new_id")
        .distinct()
    )
    idx_sigs = idx_sigs_raw.drop("inc")
    scored = (
        idx_sigs.withColumnRenamed("sig", "old_sig")
        .join(F.broadcast(cand), idx_sigs["id"] == cand["old_id"])
        .join(
            F.broadcast(new_sig.select(F.col("id").alias("nid"), F.col("sig").alias("new_sig"))),
            F.col("new_id") == F.col("nid"),
        )
        .select(
            "new_id",
            _est_jaccard(F.col("old_sig"), F.col("new_sig"), num_hashes).alias(
                "est_jaccard"
            ),
        )
    )
    dup_ids = scored.where(F.col("est_jaccard") >= threshold).select(
        F.col("new_id").alias(id_col)
    ).distinct()
    return new_docs.join(F.broadcast(dup_ids), id_col, "left_anti")


def incremental_near_dedup(
    spark: SparkSession,
    new_docs: DataFrame,
    path: str,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    append: bool = True,
    increment_id: str = "inc0",
) -> DataFrame:
    """The steady-state daily step: self-dedup the increment (it is
    small — the full batch operator is fine), drop what the index
    already has, and (by default) admit the survivors.  Returns the
    admitted survivors.  NOTE: ``append=True`` runs an action (the
    index write), so call it once — not inside a lazy plan."""
    kept = near_dedup_minhash(
        new_docs,
        text_col=text_col,
        id_col=id_col,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
    )
    survivors = dedup_against_index(
        spark, kept, path, threshold, text_col, id_col,
        num_hashes, bands, shingle_n,
        # retry-safety: a half-completed prior run of THIS increment may
        # already sit in the index; never match the increment against it
        exclude_inc=increment_id if append else None,
    )
    if append:
        survivors = survivors.localCheckpoint(eager=True)
        append_minhash_index(
            survivors, path, text_col, id_col, num_hashes, bands, shingle_n,
            increment_id=increment_id,
        )
    return survivors


def list_increments(spark: SparkSession, path: str) -> list[str]:
    """The increment ids present in the index (from the ``sigs`` table's
    partition directory names — metadata only, no data scan)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(os.path.join(path, "sigs"))
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("inc="):
            out.append(name[len("inc="):])
    return sorted(out)


def expire_increments(
    spark: SparkSession,
    path: str,
    keep: "callable | list[str]",
    tables: tuple[str, ...] = ("sigs", "banded"),
) -> list[str]:
    """Retention for the materialized index: delete every ``inc=``
    partition whose id is NOT kept — the dedup-horizon policy (e.g.
    "only dedup against the last 90 days") that bounds index size the
    way ``dropDuplicatesWithinWatermark`` bounds streaming state.
    ``keep`` is a predicate over the increment id (or an explicit list);
    the ``base`` partition is ALWAYS kept — rebuild to rotate it.
    Returns the expired ids.  Metadata-only: partition directory
    deletes, no data scan; expired documents simply become admissible
    again (searches stop seeing their signatures).  Fails fast while a
    compaction lease is held — deleting partitions mid-fold would tear
    the compactor's scan (and the fold would resurrect the rows in the
    new base anyway)."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        index_lifecycle as LC,
    )

    if LC.read_lease(spark, LC.lease_file_at(path)) is not None:
        raise ValueError(
            "expire_increments: a compaction lease is held on this "
            "index; retry after the compaction completes"
        )
    kept = (
        (lambda i: i in set(keep)) if isinstance(keep, (list, set, tuple))
        else keep
    )
    expired = [
        i for i in list_increments(spark, path)
        if i != "base" and not kept(i)
    ]
    for inc in expired:
        # clear in REVERSE write order — the append's COMMIT MARKER is
        # its last-written table, so it must be the first partition to
        # go: the id stops being commit-complete before any data table
        # is torn, and a compaction starting mid-expire (expire holds no
        # lease) can never fold a half-deleted increment (ADVICE r13,
        # the retry-clear twin)
        for t in reversed(tables):
            _clear_inc_partition(spark, os.path.join(path, t), inc)
    return expired


def compact_index(spark: SparkSession, path: str) -> int:
    """LSM-style maintenance: fold every ``inc=`` partition into a fresh
    ``base`` — after months of daily increments the banded table holds
    incs × bands small files, and scan cost is file-count-bound long
    before it is byte-bound.  Returns the number of increments folded.

    Signatures are REWRITTEN, never recomputed (no text, no shingling —
    a metadata-scale job relative to a build).  Driven by the shared
    ``index_lifecycle.compact_index_tables`` (r12): leased against
    concurrent appends (which fail fast, or abort-with-rollback if they
    were mid-flight when the lease landed), each table folds exactly its
    post-lease ``inc IN snapshot`` rows through the staged-then-rename
    swap (a COMPLETE copy exists under some name at every instant), the
    swap reconciles — moves, never deletes — increments appended after
    the snapshot, and a crash between the two tables' swaps is
    retryable (the no-op decision consults both).  Run it when
    ``list_increments`` grows past a few hundred, after
    ``expire_increments``."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        index_lifecycle as LC,
    )

    def make_fold(parts):
        def fold(spark_, table, ids, staged):
            (
                spark_.read.parquet(table)
                .where(F.col("inc").isin(list(ids)))
                .drop("inc")
                .withColumn("inc", F.lit("base"))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "static")
                .partitionBy(*parts)
                .parquet(staged)
            )

        return fold

    return LC.compact_index_tables(
        spark,
        LC.lease_file_at(path),
        [
            (os.path.join(path, "sigs"), make_fold(["inc"])),
            (os.path.join(path, "banded"), make_fold(["inc", "band"])),
        ],
        # banded is the append's commit marker (written last): a
        # mid-append straddler is reconciled whole, never half-folded
        # (sigs-in-base without banded rows would be undiscoverable
        # admission state) — ADVICE r12 root-cause fix
        commit_table=os.path.join(path, "banded"),
    )
