"""Materialized EXACT-dedup index with a Bloom-filter sidecar: the
steady-state form of ``dedup.exact_dedup`` for a corpus that grows by
increments, mirroring ``minhash_index`` (which holds NEAR-dedup state).

``exact_dedup`` re-hashes the whole corpus per run; a 100 TB steady
state wants content hashes materialized ONCE and each daily increment
checked against them:

- ``build_exact_index(docs, path, expected_items)`` — one pass writes
  ``path/hashes`` (the md5 content hash per doc, partitioned by
  ``inc``) and ``path/bloom`` (a Bloom filter over the hashes, sized
  for ``expected_items`` at ``fpr``; stored as parquet rows of bit
  chunks so it lives on the same storage as the index).
- ``dedup_exact_against_index(spark, new_docs, path)`` — the increment
  (small by contract) is hashed; the BLOOM SIDECAR — kilobytes-to-
  megabytes where the hash table is gigabytes-to-terabytes — is
  loaded once and tested per increment row in a vectorized kernel.
  Bloom-negative docs are DEFINITELY new (no false negatives by
  construction) and skip the index entirely; only the bloom-positive
  subset (true dups + fpr·fresh) joins against the hash table —
  broadcast against the index scan, index never shuffled, and when the
  subset is empty AQE eliminates the index scan altogether.  The join
  verifies on the full 128-bit md5, so Bloom false positives cost a
  probe, never a wrong drop.
- ``append_exact_index(new_docs, path, increment_id)`` — admit under
  ``inc=<increment_id>`` with the same clear-then-write idempotent
  retry discipline as ``minhash_index.append_minhash_index``; the
  increment's Bloom chunk rows are OR-able with the base's (same
  (m, k) read from the sidecar meta).

Bloom construction is the textbook one (Bloom 1970; double hashing per
Kirsch & Mitzenmacher's g_i = h1 + i·h2 composition): k positions per
key derived from two 64-bit views of the key, bits in a numpy uint64
array.  Appends past ``expected_items`` degrade the fpr gracefully
(more probes, never wrong drops) — re-build with a larger capacity when
``bloom_fill_fraction`` approaches ~0.5.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from bigdataproject_formula1_telemetry_spark.operators.minhash_index import (
    _INC_ID_RE,
    _clear_inc_partition,
    _swap_staged,
)

__all__ = [
    "build_exact_index",
    "append_exact_index",
    "dedup_exact_against_index",
    "bloom_fill_fraction",
    "list_increments",
    "compact_exact_index",
]

#: bits per stored chunk row (1 MiB of filter per row keeps rows small)
_CHUNK_BITS = 8 * 1024 * 1024

_BLOOM_SCHEMA = StructType(
    [
        StructField("inc", StringType()),
        StructField("m_bits", LongType()),
        StructField("k", IntegerType()),
        StructField("chunk_idx", IntegerType()),
        StructField("bits", BinaryType()),
    ]
)

_ODD = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 golden gamma (odd)


def _bloom_params(expected_items: int, fpr: float) -> tuple[int, int]:
    """(m_bits, k) for a target capacity/false-positive rate — the
    standard sizing m = −n·ln p / ln²2, k = (m/n)·ln 2."""
    if expected_items < 1:
        raise ValueError(f"expected_items must be >= 1, got {expected_items}")
    if not 0.0 < fpr < 1.0:
        raise ValueError(f"fpr must be in (0,1), got {fpr}")
    m = max(64, int(math.ceil(-expected_items * math.log(fpr) / (math.log(2) ** 2))))
    m = ((m + 63) // 64) * 64  # whole uint64 words
    k = max(1, round(m / expected_items * math.log(2)))
    return m, k


def _positions(hb: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing: h1 = key, h2 = odd-mixed
    key (never both zero-stride), g_i = h1 + i·h2 mod m."""
    h1 = hb.view(np.uint64) if hb.dtype == np.int64 else hb.astype(np.uint64)
    with np.errstate(over="ignore"):
        h2 = (h1 ^ (h1 >> np.uint64(31))) * _ODD | np.uint64(1)
        i = np.arange(k, dtype=np.uint64)
        return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits))


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    word, off = pos >> np.uint64(6), pos & np.uint64(63)
    np.bitwise_or.at(bits, word.ravel(), np.uint64(1) << off.ravel())


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    word, off = pos >> np.uint64(6), pos & np.uint64(63)
    hit = (bits[word] >> off) & np.uint64(1)
    return hit.all(axis=1).astype(bool)


def _content_hash(text_col: str, normalize: bool = False):
    """128-bit md5 of the text (the join/verify key) — NULL text gets a
    sentinel so null-text docs dedup among themselves, matching
    ``dedup.exact_dedup``'s key.  ``normalize=True`` keys on the
    casefolded/punctuation-stripped token join instead (the q32
    fingerprint identity), so trivial formatting variants — case,
    punctuation, whitespace runs — dedup together; texts that normalize
    to empty share one key (they carry no tokens)."""
    src = F.col(text_col)
    if normalize:
        src = F.array_join(
            F.filter(
                F.split(F.lower(src), r"[^a-z0-9]+"), lambda t: t != F.lit("")
            ),
            " ",
        )
    return F.coalesce(F.md5(src), F.lit("\x00null"))


def _hash_frame(
    docs: DataFrame, text_col: str, id_col: str, normalize: bool = False
) -> DataFrame:
    h = _content_hash(text_col, normalize)
    return docs.select(
        F.col(id_col).alias("id"), h.alias("h"), F.xxhash64(h).alias("hb")
    )


def _write_meta(spark: SparkSession, path: str, normalize: bool) -> None:
    spark.createDataFrame(
        [(bool(normalize),)], "normalize boolean"
    ).write.mode("overwrite").parquet(os.path.join(path, "meta"))


def _read_normalize(spark: SparkSession, path: str) -> bool:
    """The index's key mode is INDEX state, not a caller argument —
    append/search read it back so a normalized index can never be
    probed with raw keys (or vice versa)."""
    try:
        return bool(
            spark.read.parquet(os.path.join(path, "meta")).first()["normalize"]
        )
    except Exception:
        return False  # index predates the meta table: raw keys


def _bloom_rows(
    hb: np.ndarray, m_bits: int, k: int, inc: str
) -> pd.DataFrame:
    bits = np.zeros(m_bits // 64, dtype=np.uint64)
    if len(hb):
        _set_bits(bits, _positions(np.asarray(hb, dtype=np.int64), m_bits, k))
    chunks = []
    words_per_chunk = _CHUNK_BITS // 64
    for ci in range(0, len(bits), words_per_chunk):
        chunks.append(
            {
                "inc": inc,
                "m_bits": m_bits,
                "k": k,
                "chunk_idx": ci // words_per_chunk,
                "bits": bits[ci : ci + words_per_chunk].tobytes(),
            }
        )
    return pd.DataFrame(chunks, columns=[f.name for f in _BLOOM_SCHEMA.fields])


def _write_bloom_distributed(
    hashes: DataFrame, m_bits: int, k: int, inc: str, out_path: str
) -> None:
    """Build the Bloom sidecar WITHOUT collecting a single hash to the
    driver — the 100 TB-safe base-build path (the old form pulled the
    whole corpus hash column through ``toPandas``: ~800 GB of driver
    traffic at 10¹¹ docs).  Three distributed steps, bit-identical to
    ``_bloom_rows`` by the commutativity of OR:

    1. each Arrow batch emits (word_idx, or-mask) rows for its set
       bits, pre-ORed within the batch (``np.unique`` + ``bitwise_or.at``
       — duplicate-heavy corpora collapse early),
    2. ``groupBy(word_idx).agg(bit_or)`` folds batches (OR on int64
       two's-complement bit patterns IS OR on the uint64 words),
    3. ``groupBy(chunk_idx).applyInPandas`` assembles each 1 MiB chunk,
       a skeleton union keeping all-zero chunks present so the sidecar
       layout matches ``_bloom_rows`` exactly.

    Only chunk rows (≤ m_bits/2²³ of them) ever leave the executors."""
    spark = hashes.sparkSession
    words_per_chunk = _CHUNK_BITS // 64
    n_words = m_bits // 64
    n_chunks = (n_words + words_per_chunk - 1) // words_per_chunk

    mask_schema = StructType(
        [StructField("w", LongType()), StructField("mask", LongType())]
    )

    def emit(batches):
        for pdf in batches:
            hb = pdf["hb"].to_numpy(dtype=np.int64)
            if not len(hb):
                continue
            pos = _positions(hb, m_bits, k)
            word = (pos >> np.uint64(6)).ravel()
            msk = (np.uint64(1) << (pos & np.uint64(63))).ravel()
            uw, inv = np.unique(word, return_inverse=True)
            acc = np.zeros(len(uw), dtype=np.uint64)
            np.bitwise_or.at(acc, inv, msk)
            yield pd.DataFrame(
                {"w": uw.astype(np.int64), "mask": acc.view(np.int64)}
            )

    partials = hashes.select("hb").mapInPandas(emit, mask_schema)
    folded = partials.groupBy("w").agg(F.bit_or("mask").alias("mask"))
    # skeleton rows use a w = -1 SENTINEL, not NULL: a nullable long
    # column arrives in pandas as float64, whose 53-bit mantissa would
    # silently drop low bits of the 64-bit masks
    skeleton = spark.range(n_chunks).select(
        F.col("id").cast("int").alias("chunk_idx"),
        F.lit(-1).cast("long").alias("w"),
        F.lit(0).cast("long").alias("mask"),
    )
    keyed = folded.select(
        (F.col("w") / F.lit(words_per_chunk)).cast("int").alias("chunk_idx"),
        "w",
        "mask",
    ).unionByName(skeleton)

    def assemble(key, pdf):
        ci = int(key[0])
        start = ci * words_per_chunk
        arr = np.zeros(min(words_per_chunk, n_words - start), dtype=np.uint64)
        valid = pdf["w"].to_numpy(dtype=np.int64) >= 0
        w_rel = pdf.loc[valid, "w"].to_numpy(dtype=np.int64) - start
        m = pdf.loc[valid, "mask"].to_numpy(dtype=np.int64).view(np.uint64)
        arr[w_rel] |= m
        return pd.DataFrame(
            [
                {
                    "inc": inc,
                    "m_bits": m_bits,
                    "k": k,
                    "chunk_idx": ci,
                    "bits": arr.tobytes(),
                }
            ],
            columns=[f.name for f in _BLOOM_SCHEMA.fields],
        )

    # static per-write (see build_exact_index): the base bloom is a
    # fresh artifact; dynamic overwrite would keep stale inc= chunks
    keyed.groupBy("chunk_idx").applyInPandas(assemble, _BLOOM_SCHEMA).write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "static").partitionBy("inc").parquet(
        out_path
    )


def _load_bloom(spark: SparkSession, path: str) -> tuple[np.ndarray, int, int]:
    """OR every increment's chunks into one bit array (m, k are fixed at
    build time and shared by all increments)."""
    rows = spark.read.parquet(os.path.join(path, "bloom")).collect()
    if not rows:
        raise ValueError(f"empty bloom sidecar at {path}/bloom")
    m_bits, k = int(rows[0]["m_bits"]), int(rows[0]["k"])
    bits = np.zeros(m_bits // 64, dtype=np.uint64)
    words_per_chunk = _CHUNK_BITS // 64
    for r in rows:
        if int(r["m_bits"]) != m_bits or int(r["k"]) != k:
            raise ValueError("bloom chunks disagree on (m_bits, k)")
        chunk = np.frombuffer(bytes(r["bits"]), dtype=np.uint64)
        start = int(r["chunk_idx"]) * words_per_chunk
        bits[start : start + len(chunk)] |= chunk
    return bits, m_bits, k


def build_exact_index(
    docs: DataFrame,
    path: str,
    expected_items: int,
    fpr: float = 0.01,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = False,
) -> None:
    """One corpus pass → ``path/hashes`` (+ the Bloom sidecar sized for
    ``expected_items`` total docs across base AND future increments).
    The sidecar's bit array derives from the WRITTEN hashes so the two
    can never drift.  ``normalize=True`` keys on the fingerprint
    identity (see ``_content_hash``) — the mode is persisted in
    ``path/meta`` and appends/searches follow it automatically."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        index_lifecycle as LC,
    )

    m_bits, k = _bloom_params(expected_items, fpr)
    spark0 = docs.sparkSession
    LC.reset_lifecycle(spark0, LC.lease_file_at(path))
    _write_meta(spark0, path, normalize)
    hf = _hash_frame(docs, text_col, id_col, normalize).withColumn(
        "inc", F.lit("base")
    )
    # static per-write: a base build is a FRESH index — under the
    # session's dynamic overwrite default, rebuilding onto a used path
    # would keep the previous generation's inc=* partitions (stale
    # admission state)
    hf.write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy("inc").parquet(os.path.join(path, "hashes"))
    # sidecar from the WRITTEN hashes (never drifts), built distributed:
    # no hash ever reaches the driver — only the final chunk rows do,
    # and those go straight to the parquet write.  Explicit schema: an
    # EMPTY corpus writes a fileless directory that schema inference
    # cannot read (the sidecar must still exist, all-zero, so appends
    # against a fresh index have their (m, k) to read back).
    _write_bloom_distributed(
        spark0.read.schema("hb long").parquet(os.path.join(path, "hashes")),
        m_bits,
        k,
        "base",
        os.path.join(path, "bloom"),
    )


def append_exact_index(
    new_docs: DataFrame,
    path: str,
    increment_id: str = "inc0",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Admit an increment under ``inc=<increment_id>`` — hashes AND its
    Bloom chunk (same (m, k) as the base, read from the sidecar).
    Idempotent per increment id: both partitions are cleared before the
    write, so an empty retry truly rolls back.  Fails fast while a
    compaction lease is held, and aborts-with-rollback if one lands
    mid-append (the shared ``index_lifecycle`` contract, r12)."""
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
        spark, lease, "append_exact_index", increment_id=increment_id
    )
    _, m_bits, k = _load_bloom(spark, path)
    normalize = _read_normalize(spark, path)
    tables = [os.path.join(path, "hashes"), os.path.join(path, "bloom")]
    # retry clear order: COMMIT MARKER (bloom) first (ADVICE r13, bm25
    # twin) — the id must stop being commit-complete before hashes is
    # touched, or a concurrent compaction could fold a torn increment
    _clear_inc_partition(spark, tables[1], increment_id)
    _clear_inc_partition(spark, tables[0], increment_id)
    hf = _hash_frame(new_docs, text_col, id_col, normalize).localCheckpoint(
        eager=True
    )
    hf.withColumn("inc", F.lit(increment_id)).write.mode("append").partitionBy(
        "inc"
    ).parquet(tables[0])
    hb = hf.select("hb").toPandas()["hb"].to_numpy()
    if len(hb):
        spark.createDataFrame(
            _bloom_rows(hb, m_bits, k, increment_id), _BLOOM_SCHEMA
        ).write.mode("append").partitionBy("inc").parquet(tables[1])
    LC.abort_append_if_leased(
        spark, lease, increment_id, tables, "append_exact_index"
    )


def dedup_exact_against_index(
    spark: SparkSession,
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    exclude_inc: str | None = None,
) -> DataFrame:
    """The increment minus every doc whose EXACT content (md5) is in the
    index.  The Bloom sidecar prunes first: definitely-new docs never
    touch the hash table; only bloom-positive docs probe it (broadcast
    against the index scan — and when nothing is bloom-positive, AQE
    eliminates the scan).  ``exclude_inc`` skips one index partition,
    for retried search-then-append steps (see
    ``minhash_index.dedup_against_index``)."""
    bits, m_bits, k = _load_bloom(spark, path)
    normalize = _read_normalize(spark, path)
    inc_cols = new_docs.columns
    hashed = new_docs.withColumn(
        "__h", _content_hash(text_col, normalize)
    ).withColumn("__hb", F.xxhash64(F.col("__h")))
    out_schema = StructType(
        list(hashed.schema.fields) + [StructField("__maybe", IntegerType())]
    )

    def probe(batches):
        for pdf in batches:
            hb = pdf["__hb"].to_numpy(dtype=np.int64)
            maybe = (
                _test_bits(bits, _positions(hb, m_bits, k))
                if len(hb)
                else np.zeros(0, dtype=bool)
            )
            out = pdf.copy()
            out["__maybe"] = maybe.astype("int32")
            yield out

    probed = hashed.mapInPandas(probe, out_schema)
    idx = spark.read.parquet(os.path.join(path, "hashes"))
    if exclude_inc is not None:
        idx = idx.where(F.col("inc") != F.lit(exclude_inc))
    candidates = probed.where(F.col("__maybe") == 1)
    hits = (
        idx.join(
            F.broadcast(candidates.select(F.col("__h").alias("h")).distinct()),
            "h",
        )
        .select("h")
        .distinct()
    )
    kept = probed.join(
        F.broadcast(hits), probed["__h"] == hits["h"], "left_anti"
    )
    return kept.select(*inc_cols)


def bloom_fill_fraction(spark: SparkSession, path: str) -> float:
    """Fraction of set bits in the (OR-combined) sidecar — the capacity
    gauge: the realized fpr is ≈ fill^k, and past ~0.5 the filter stops
    pruning; rebuild with a larger ``expected_items`` then."""
    bits, _, _ = _load_bloom(spark, path)
    ones = int(sum(bin(int(w)).count("1") for w in bits))
    return ones / (len(bits) * 64)


def list_increments(spark: SparkSession, path: str) -> list[str]:
    """Increment ids present in the index (hash-table partition
    directory names — metadata only)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(os.path.join(path, "hashes"))
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("inc="):
            out.append(name[len("inc="):])
    return sorted(out)


def expire_exact_increments(
    spark: SparkSession, path: str, keep: "callable | list[str]"
) -> list[str]:
    """Retention for the exact-dedup admission index — the
    ``minhash_index.expire_increments`` twin (r14, completing the index
    family: minhash r11, bm25 r14): delete every ``inc=`` partition
    whose id is NOT kept, across BOTH tables (hashes and the Bloom
    sidecar) so membership pruning and the exact join always describe
    the same surviving horizon.  ``keep`` is a predicate over the
    increment id (or an explicit list); ``base`` is ALWAYS kept —
    rebuild to rotate it.  Returns the expired ids.  Expired documents
    simply become admissible again (the dedup-horizon policy).

    Fails fast while a compaction lease is held.  Per id the clear
    order is COMMIT MARKER FIRST (bloom, then hashes — the append
    writes bloom last), so a compaction starting mid-expire can never
    fold a half-deleted increment; candidates come from the UNION of
    both tables' listings so a crashed expire's torn id (bloom gone,
    hashes still present would over-admit nothing, but hashes gone with
    bloom present would false-positive-prune against ghosts) is still
    seen — and finished — by the retry."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        index_lifecycle as LC,
    )

    if LC.read_lease(spark, LC.lease_file_at(path)) is not None:
        raise ValueError(
            "expire_exact_increments: a compaction lease is held on "
            "this index; retry after the compaction completes"
        )
    kept = (
        (lambda i: i in set(keep)) if isinstance(keep, (list, set, tuple))
        else keep
    )
    present: set[str] = set()
    for t in ("hashes", "bloom"):
        present.update(LC.list_inc_ids(spark, os.path.join(path, t)))
    expired = sorted(i for i in present if i != "base" and not kept(i))
    for inc in expired:
        for t in ("bloom", "hashes"):
            _clear_inc_partition(spark, os.path.join(path, t), inc)
    return expired


def compact_exact_index(spark: SparkSession, path: str) -> int:
    """Fold every ``inc=`` partition into a fresh ``base`` — the
    exact-dedup twin of ``minhash_index.compact_index`` (same
    staged-then-rename swap, same file-count motivation).  Hashes are
    rewritten, never recomputed; the Bloom sidecar needs NO per-key
    work at all — its per-increment bit chunks simply OR into one base
    chunk set (the union filter is exactly the bitwise OR).  Returns
    the number of increments folded.

    Driven by the shared ``index_lifecycle.compact_index_tables``
    (r12): leased against concurrent appends, per-table post-lease
    snapshots (the Bloom fold ORs exactly the snapshot's chunks, so a
    late-append's chunk survives as its own increment next to its
    reconciled hash partition), retryable after a crash between the two
    swaps."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        index_lifecycle as LC,
    )

    def fold_hashes(spark_, table, ids, staged):
        (
            spark_.read.parquet(table)
            .where(F.col("inc").isin(list(ids)))
            .drop("inc")
            .withColumn("inc", F.lit("base"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("inc")
            .parquet(staged)
        )

    def fold_bloom(spark_, table, ids, staged):
        rows_in = (
            spark_.read.parquet(table)
            .where(F.col("inc").isin(list(ids)))
            .collect()
        )
        if not rows_in:
            raise ValueError(f"empty bloom sidecar at {table}")
        m_bits, k = int(rows_in[0]["m_bits"]), int(rows_in[0]["k"])
        bits = np.zeros(m_bits // 64, dtype=np.uint64)
        words_per_chunk = _CHUNK_BITS // 64
        for r in rows_in:
            if int(r["m_bits"]) != m_bits or int(r["k"]) != k:
                raise ValueError("bloom chunks disagree on (m_bits, k)")
            chunk = np.frombuffer(bytes(r["bits"]), dtype=np.uint64)
            start = int(r["chunk_idx"]) * words_per_chunk
            bits[start : start + len(chunk)] |= chunk
        rows = []
        for ci in range(0, len(bits), words_per_chunk):
            rows.append(
                {
                    "inc": "base",
                    "m_bits": m_bits,
                    "k": k,
                    "chunk_idx": ci // words_per_chunk,
                    "bits": bits[ci : ci + words_per_chunk].tobytes(),
                }
            )
        spark_.createDataFrame(
            pd.DataFrame(rows, columns=[f.name for f in _BLOOM_SCHEMA.fields]),
            _BLOOM_SCHEMA,
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "static"
        ).partitionBy("inc").parquet(staged)

    return LC.compact_index_tables(
        spark,
        LC.lease_file_at(path),
        [
            (os.path.join(path, "hashes"), fold_hashes),
            (os.path.join(path, "bloom"), fold_bloom),
        ],
        # bloom is the append's commit marker (written last; an empty
        # increment writes neither table, so bloom-present <=> the
        # append's hashes are on disk): a mid-append straddler is
        # reconciled whole, never half-folded — ADVICE r12
        commit_table=os.path.join(path, "bloom"),
    )
