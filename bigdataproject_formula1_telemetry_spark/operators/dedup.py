"""Deduplication operators for large-scale training-data pipelines.

North-star extensions (SURVEY §7 M7): exact dedup, MinHash+LSH near-dedup,
SimHash, and n-gram Jaccard — all designed so no step materializes the
corpus on the driver and every shuffle is keyed by a bounded-cardinality
bucket (band hash / simhash prefix), which is what keeps candidate
generation sub-quadratic at 100 TB.
"""

from __future__ import annotations

import logging

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

logger = logging.getLogger(__name__)


#: Strong refs to every DataFrame ``_barrier`` has persisted and not yet
#: released.  Python GC of a DataFrame handle does NOT free its JVM cache
#: blocks, so without explicit tracking a long-lived session that runs
#: dedup pipelines repeatedly accumulates DISK_ONLY blocks forever.
_BARRIER_REGISTRY: list[DataFrame] = []


def _barrier(df: DataFrame, storage: str = "memory") -> DataFrame:
    """Materialization / optimizer barrier between dedup pipeline stages.

    The barrier is load-bearing for performance: Catalyst's
    CollapseProject re-inlines expensive expressions (shingling, minhash)
    into every downstream consumer without one (measured 40× blowup).
    Storage backends trade speed for cluster fault-tolerance:

    - ``"memory"`` (default since r15): ``persist(MEMORY_AND_DISK)``.
      Lazy, keeps lineage (lost partitions recompute), still an
      optimizer barrier because the cached subtree is replaced before
      optimization.  Default rationale (r14/r15, guide §5): the r14
      q54 probe measured the DISK_ONLY round trip costing 1.8× within
      one quiet session, and MEMORY_AND_DISK is never worse — blocks
      that exceed the storage pool spill to disk, i.e. it degrades TO
      ``"persist"`` under memory pressure, with the same lineage-based
      fault tolerance at 100 TB (storage memory is bounded by
      ``spark.memory.fraction``; eviction, not OOM).
    - ``"persist"``: ``persist(DISK_ONLY)`` — the pre-r15 default; as
      above, data always on disk (measured 2.4× FASTER than
      localCheckpoint on the 5k-doc pipeline — lazy persists pipeline
      into consumers; localCheckpoint runs an eager materialization job
      per barrier).
    - ``"local_checkpoint"``: eager, executor-local blocks, lineage
      truncated — a lost executor fails the job.
    - ``"none"``: no barrier (A/B testing the optimizer blowup only).

    Persisted barriers are tracked in ``_BARRIER_REGISTRY``; call
    ``release_barriers()`` after the pipeline's terminal action to free
    their cache blocks (unpersisting *before* the consuming action would
    silently recompute the expensive stage instead)."""
    if storage == "local_checkpoint":
        return df.localCheckpoint()
    if storage == "persist":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.DISK_ONLY)
        _BARRIER_REGISTRY.append(out)
        return out
    if storage == "memory":
        from pyspark import StorageLevel

        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        _BARRIER_REGISTRY.append(out)
        return out
    if storage == "none":
        return df
    raise ValueError(
        f"storage must be local_checkpoint|persist|memory|none, got {storage!r}"
    )


def release_barriers() -> int:
    """Unpersist every barrier DataFrame persisted since the last call
    and return how many were released.

    Call this after the terminal action of a dedup/similarity pipeline
    (e.g. after the survivors are written) in long-lived sessions —
    otherwise each run leaves its intermediate cache blocks pinned until
    the session dies.  Safe to call any time: survivors of a completed
    action are plain data; unpersisted barriers only mean a *recompute*
    if the same lazy DataFrame is acted on again, never wrong results."""
    n = 0
    for df in _BARRIER_REGISTRY:
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped, etc. — releasing is best-effort
            pass
    _BARRIER_REGISTRY.clear()
    return n


# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup by content hash: within each md5(text) group keep the
    row with the smallest id (deterministic keeper; NULL texts share one
    sentinel key, so they dedup among themselves).

    The plan has NO skewed stage at all: keeper ids come from a
    ``groupBy(hash).agg(min(id))`` — N copies of ONE document (empty
    page, error boilerplate — the classic web-crawl hot key) collapse in
    the map-side partial aggregation, so the reduce sees one partial per
    map task, never N rows — and the survivors are a LEFT SEMI join of
    the corpus against the keeper-id set on the UNIFORM id key (a window
    over the hash, or a join-back ON the hash, would funnel the hot
    key's full rows into one partition; measured at 4M rows / 2M copies
    of one 2.2 KB doc: hash-window 6.3-7.4 s, hash-join-back 10.5 s,
    this semi-join 4.5 s — faster locally AND the only shape with no
    single-task failure mode left at any replica count).  Plan asserted
    window-free.  Assumes ids are unique (two rows sharing both text
    AND id would both survive)."""
    key = F.coalesce(F.md5(F.col(text_col)), F.lit("\x00null"))
    keep_ids = (
        df.withColumn("__h", key)
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep_ids, id_col, "left_semi")


# --------------------------------------------------------------------------
# Shingling + MinHash + LSH
# --------------------------------------------------------------------------

def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct), built with JVM-side functions:
    lowercase → split on non-alphanumerics → sliding n-grams → distinct.

    The n-grams come from ``arrays_zip`` of n shifted slices (one O(words)
    slice per offset) rather than a per-index ``slice`` inside transform
    (O(words²)) — measured 10× faster at 5k docs, identical output."""
    words = F.filter(
        F.split(F.lower(text), r"[^a-z0-9]+"), lambda x: x != F.lit("")
    )
    cnt = F.size(words) - F.lit(n - 1)
    slices = [F.slice(words, i + 1, F.greatest(cnt, F.lit(1))) for i in range(n)]
    grams = F.transform(
        F.arrays_zip(*slices),
        lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)]),
    )
    return F.array_distinct(
        F.when(cnt <= 0, F.array(F.array_join(words, " "))).otherwise(grams)
    )


def shingle_sets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    storage: str = "memory",
) -> DataFrame:
    """(id, h) hashed distinct-shingle sets, materialized behind a lineage
    barrier (see ``_barrier``; default ``persist(DISK_ONLY)``).

    The barrier is load-bearing for performance, not correctness:
    shingling is the most expensive expression in the pipeline, and
    Catalyst's CollapseProject would otherwise re-inline it into every
    downstream consumer (64 minhash transforms, 16 band slices, both
    sides of the verify join) — measured 40× slowdown without it.

    Only the xxhash64 of each shingle is kept: the signature stage wants
    longs anyway, and set Jaccard over 64-bit hashes equals string
    Jaccard up to a ~2⁻⁶⁴ collision probability — while the checkpoint
    stores 8 bytes per shingle instead of the string.
    """
    sh = shingles(F.col(text_col), shingle_n)
    return _barrier(
        df.select(
            F.col(id_col).alias("id"),
            F.transform(sh, lambda s: F.xxhash64(s)).alias("h"),
        ),
        storage,
    )


#: splitmix64 finalizer constants (public domain, Steele et al.) — the
#: per-lane permutation must MIX, not just permute: the previous affine
#: family ``h*(2k+1)+k`` shares a fixed attractor at the signed-long
#: floor (an element with hash -2^63+δ maps to ≈ -2^63 + (2k+1)δ under
#: EVERY lane, so it wins the signed min in nearly all lanes), which
#: collapsed lane independence for sets containing such an element —
#: observed as 8/64 lane agreement on a Jaccard-0.889 pair that ideal
#: minhash catches with p ≈ 1-1.5e-7.
_GOLDEN = 0x9E3779B97F4A7C15
_MIX1 = 0xBF58476D1CE4E5B9
_MIX2 = 0x94D049BB133111EB


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _mix64_expr(z: Column) -> Column:
    """splitmix64 finalizer as a JVM expression (two's-complement wrap ==
    numpy uint64 wrap; requires non-ANSI mode for wrapping multiply —
    only the Arrow path runs in driver queries)."""
    z = z.bitwiseXOR(F.shiftrightunsigned(z, 30)) * F.lit(_signed64(_MIX1))
    z = z.bitwiseXOR(F.shiftrightunsigned(z, 27)) * F.lit(_signed64(_MIX2))
    return z.bitwiseXOR(F.shiftrightunsigned(z, 31))


def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """MinHash signature from a *plain shingle-array column reference*:
    one xxhash64 pass over the shingles, then ``num_hashes`` independent
    lane permutations ``splitmix64(h + k·golden)`` with array_min each.

    Pass a materialized column (see ``shingle_sets``) — not a shingle
    *expression* — or Catalyst will clone the expression per hash."""
    return minhash_signature_from_hashes(
        F.transform(shingle_col, lambda s: F.xxhash64(s)), num_hashes
    )


def minhash_signature_from_hashes(hash_col: Column, num_hashes: int = 64) -> Column:
    """Signature from pre-computed shingle hashes (``shingle_sets``'s ``h``
    column): per lane k, min over elements of ``splitmix64(h + k·golden)``
    — a genuinely mixing permutation family (see ``_GOLDEN`` note).

    Expression form — used for A/B verification.  Higher-order functions
    are *interpreted* (no whole-stage codegen), so the production path is
    the numpy form below (``minhash_signature_arrow``), which computes the
    bit-identical result ~10× faster via one Arrow batch per partition.
    """

    def lane(k: Column) -> Column:
        return F.array_min(
            F.transform(
                hash_col,
                lambda h: _mix64_expr(h + k * F.lit(_signed64(_GOLDEN))),
            )
        )

    return F.transform(F.sequence(F.lit(0), F.lit(num_hashes - 1)), lane)


def _mix64_np(z):
    """numpy splitmix64 finalizer (uint64 wrap == JVM two's-complement)."""
    import numpy as np

    z = (z ^ (z >> np.uint64(30))) * np.uint64(_MIX1)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(_MIX2)
    return z ^ (z >> np.uint64(31))


def _lanes_np(h, num_hashes: int):
    """(num_hashes, len(h)) mixed lane values for one shingle-hash set."""
    import numpy as np

    hv = np.asarray(h, dtype=np.int64).view(np.uint64)
    ks = np.arange(num_hashes, dtype=np.uint64) * np.uint64(_GOLDEN)
    return _mix64_np(hv[None, :] + ks[:, None])


def minhash_signature_arrow(num_hashes: int = 64):
    """Arrow-vectorized signature UDF, bit-identical to the expression
    form: Java long arithmetic wraps two's-complement — numpy uint64
    arithmetic wraps identically, and ``.view(int64)`` before the min
    reproduces the JVM's *signed* array_min."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(LongType()))
    def sig(h_col: pd.Series) -> pd.Series:
        out = []
        for h in h_col:
            out.append(_lanes_np(h, num_hashes).view("int64").min(axis=1))
        return pd.Series(out)

    return sig


def minhash_band_hashes_arrow(num_hashes: int = 64, bands: int = 16):
    """Fused signature+banding Arrow UDF: shingle hashes → 64 minhash
    lanes → ``bands`` band hashes, in ONE Arrow batch pass per partition.

    Fusing removes the separate signature materialization barrier the
    two-stage form needed (sig fed all 16 JVM band slices): the UDF's
    output is the band-hash array directly, so there is nothing for
    CollapseProject to re-inline.  The band hash is an FNV-1a fold of the
    band's lanes — two docs share a bucket iff all ``num_hashes/bands``
    lanes in that band are equal (up to a 2⁻⁶⁴ collision), the same
    bucketing semantics as hashing the joined lane string."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    if num_hashes % bands:
        # fail at plan time: inside the Arrow UDF this surfaces as an
        # opaque numpy reshape error at execution, and the expression
        # fallback would silently drop the leftover lanes instead
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})"
        )
    rows_per_band = num_hashes // bands
    fnv_offset = np.uint64(0xCBF29CE484222325)
    fnv_prime = np.uint64(0x100000001B3)

    @pandas_udf(ArrayType(LongType()))
    def band_hashes(h_col: pd.Series) -> pd.Series:
        out = []
        for h in h_col:
            sig = _lanes_np(h, num_hashes).view("int64").min(axis=1)
            lanes = sig.view(np.uint64).reshape(bands, rows_per_band)
            acc = np.full(bands, fnv_offset, dtype=np.uint64)
            for i in range(rows_per_band):
                acc = (acc ^ lanes[:, i]) * fnv_prime
            out.append(acc.view(np.int64))
        return pd.Series(out)

    return band_hashes


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    sh: DataFrame | None = None,
    storage: str = "memory",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH candidate pairs: band the signature (bands × rows-per-band),
    hash each band, group by (band_idx, band_hash), and emit intra-bucket
    pairs.  The pair join is per-bucket, so the shuffle key cardinality is
    ~corpus-size × bands / bucket-size — never an all-pairs cross join.

    ``max_bucket_size`` hardens against degenerate buckets (e.g. an
    all-identical boilerplate corpus would otherwise make one bucket and
    an O(n²) intra-bucket pair blowup): buckets larger than the cap are
    dropped *entirely* before the pair join, and the drop is logged —
    never silent.  Docs in a dropped bucket usually still pair through
    their other ``bands - 1`` buckets.

    Returns (id_a, id_b) candidate pairs with id_a < id_b, distinct.
    """
    if num_hashes % bands:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})"
        )
    if sh is None:
        sh = shingle_sets(df, text_col, id_col, shingle_n, storage=storage)
    if "h" in sh.columns:
        # production path: one fused Arrow pass, no signature barrier
        bh = minhash_band_hashes_arrow(num_hashes, bands)(F.col("h"))
        banded = sh.select("id", F.posexplode(bh).alias("band", "bhash"))
    else:
        # expression fallback (string shingles): two-stage with a barrier
        rows_per_band = num_hashes // bands
        sig = _barrier(
            sh.select("id", minhash_signature(F.col("sh"), num_hashes).alias("sig")),
            storage,
        )
        banded = sig.select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.struct(
                        b.alias("band"),
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
        ).select("id", "bb.band", "bb.bhash")
    # barrier: the (id, band, bhash) table feeds both sides of the
    # self-join (16 longs/doc — far cheaper to materialize than the
    # signature array the pre-fusion pipeline checkpointed here).
    banded = _barrier(banded, storage)
    if max_bucket_size is not None:
        # bucket sizing via groupBy, never a window over the bucket key:
        # the oversized bucket is BY DEFINITION the hot key, and a window
        # would funnel all its rows into one unsplittable partition —
        # exactly the blowup the cap exists to prevent.  Partial
        # aggregation absorbs the count; the oversized bucket keys (at
        # most n_rows/max_bucket_size of them — normally a handful) feed
        # an anti join that AQE plans as broadcast when small and can
        # skew-split otherwise.
        big = (
            banded.groupBy("band", "bhash")
            .agg(F.count(F.lit(1)).alias("__bsz"))
            .where(F.col("__bsz") > max_bucket_size)
        )
        dropped = big.agg(
            F.count(F.lit(1)).alias("buckets"), F.sum("__bsz").alias("rows")
        ).first()
        if dropped["buckets"]:
            logger.warning(
                "minhash_lsh_candidates: dropping %d oversized LSH bucket(s) "
                "(%d banded rows) above max_bucket_size=%d — pairs inside them "
                "are not generated",
                dropped["buckets"],
                dropped["rows"],
                max_bucket_size,
            )
            banded = banded.join(
                big.select("band", "bhash"), ["band", "bhash"], "left_anti"
            )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    sh: DataFrame | None = None,
    storage: str = "memory",
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs: join shingle sets to the
    (id_a, id_b) pairs and compute |∩|/|∪| with array intrinsics.

    The shingle frame is first semi-filtered to the ids that actually
    appear in a candidate pair: joining the full frame per pair side
    scanned the (wide, array-heavy) shingle table TWICE, and on a
    500k-doc corpus that verify stage was the single largest cost in the
    pipeline (13.5 s of a 35 s run) for a few thousand candidates.  The
    filtered frame is pair-sized, so both per-side joins read the small
    barrier instead."""
    if sh is None:
        sh = shingle_sets(df, text_col, id_col, shingle_n, storage=storage)
    set_col = "h" if "h" in sh.columns else "sh"
    sh = sh.select("id", F.col(set_col).alias("ss"))
    pairs = _barrier(pairs.select("id_a", "id_b"), storage)
    ids = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # broadcast the id set: without the hint the semi-join shuffles the
    # array-heavy shingle frame by id — the exact cost this filter exists
    # to avoid.  Candidate pairs are bounded by the LSH bucket caps, so
    # the id set is broadcast-sized by construction.
    needed = _barrier(sh.join(F.broadcast(ids), "id", "left_semi"), storage)
    out = (
        pairs.join(
            needed.withColumnRenamed("id", "id_a").withColumnRenamed("ss", "sh_a"),
            "id_a",
        ).join(
            needed.withColumnRenamed("id", "id_b").withColumnRenamed("ss", "sh_b"),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return out.select(
        "id_a",
        "id_b",
        F.when(union > 0, inter.cast("double") / union.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("jaccard"),
    )


def _exact_collapse(df: DataFrame, text_col: str, id_col: str):
    """(tagged, reps) for identical-text collapsing: ``tagged`` maps every
    id to the min id of its exact-text group (``__rep``, one linear
    md5-keyed shuffle); ``reps`` is one representative row per distinct
    text.

    Identical texts are the degenerate LSH case — they share every band
    bucket, so a replica-heavy corpus (N copies of each doc) grows the
    intra-bucket pair join quadratically in N and no bucket cap can help
    (dropping the bucket misses all the dups).  Pairing representatives
    only removes that blowup structurally AND skips shingling the copies;
    semantics are preserved because identical texts have Jaccard 1.0
    (any threshold) and a near-dup of a representative is a near-dup of
    its whole group.  NULL texts share ONE sentinel key: they all produce
    the identical ``[xxhash64(NULL)]`` shingle set downstream (Jaccard
    1.0 — they dedup together regardless), and a per-id key would leave a
    NULL-heavy corpus sharing every LSH bucket, re-creating exactly the
    O(n²) intra-bucket blowup the collapse exists to prevent.

    Representative selection is a ``groupBy(key)`` aggregate (NOT
    ``min() over Window.partitionBy(key)``): the replica-heavy corpus
    this collapse exists for is precisely the one where a single text's
    copies would all land in one unsplittable window partition — the
    map-side partial aggregation absorbs the hot key.  ``tagged`` then
    joins only NARROW (id, 16-byte hash) rows back on the hash (the one
    inherently hash-keyed step — every member must learn its rep; AQE
    can split it and the rows carry no text), and ``reps`` is a
    skew-free LEFT SEMI join on the uniform id key (the
    ``exact_dedup`` shape, measured there)."""
    key = F.when(
        F.col(text_col).isNotNull(), F.md5(F.col(text_col))
    ).otherwise(F.lit("\x00null"))
    keyed = df.select(F.col(id_col), F.col(text_col)).withColumn("__k", key)
    reps_tbl = keyed.groupBy("__k").agg(F.min(id_col).alias("__rep"))
    tagged = (
        keyed.select(id_col, "__k").join(reps_tbl, "__k").select(id_col, "__rep")
    )
    reps = df.select(id_col, text_col).join(
        reps_tbl.select(F.col("__rep").alias(id_col)), id_col, "left_semi"
    )
    return tagged, reps


def _expand_losers(
    df: DataFrame, tagged: DataFrame | None, losing_reps: DataFrame, id_col: str
) -> DataFrame:
    """Survivors after collapsing: drop every non-representative member
    and all members of groups whose representative lost.  With
    ``tagged=None`` (collapse skipped) the losing ids ARE the losers."""
    if tagged is None:
        losers = losing_reps.select(F.col("__lost").alias(id_col))
    else:
        lost_members = tagged.join(
            losing_reps, tagged["__rep"] == losing_reps["__lost"], "left_semi"
        ).select(id_col)
        non_reps = tagged.where(F.col(id_col) != F.col("__rep")).select(id_col)
        losers = lost_members.unionByName(non_reps).distinct()
    return df.join(losers, id_col, "left_anti")


def _maybe_collapse(df: DataFrame, text_col: str, id_col: str, collapse):
    """Adaptive exact-collapse: the collapse costs one full-text shuffle,
    pure overhead on a dup-free corpus — and it is a *performance*
    rewrite only (LSH catches Jaccard-1.0 pairs regardless), so the
    decision can be approximate.  ``collapse=None`` probes
    ``approx_count_distinct(md5(text))`` (partial-agg job, no text
    shuffle) and collapses only when >10% of rows are exact copies;
    pass True/False to force."""
    if collapse is None:
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct(F.md5(F.col(text_col)), 0.05).alias("d"),
        ).first()
        collapse = r["n"] > 0 and r["d"] < 0.9 * r["n"]
    if collapse:
        return _exact_collapse(df, text_col, id_col)
    return None, df


def near_dedup_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    storage: str = "memory",
    max_bucket_size: int | None = None,
    collapse_exact: bool | None = None,
) -> DataFrame:
    """Full near-dedup: adaptively collapse exact-text duplicates to
    representatives (``_maybe_collapse``) → LSH candidates → exact
    Jaccard verify → drop the higher id of every pair above threshold
    (greedy keep-lowest-id; ``near_dedup_clustered`` adds transitive
    merging).

    Shingle sets are computed once (representatives only) and shared by
    the signature and the verify join."""
    tagged, reps = _maybe_collapse(df, text_col, id_col, collapse_exact)
    sh = shingle_sets(reps, text_col, id_col, shingle_n, storage=storage)
    cand = minhash_lsh_candidates(
        reps, text_col, id_col, num_hashes, bands, shingle_n, sh=sh,
        storage=storage, max_bucket_size=max_bucket_size,
    )
    losing_reps = (
        jaccard_pairs(reps, cand, text_col, id_col, shingle_n, sh=sh)
        .where(F.col("jaccard") >= threshold)
        .select(F.col("id_b").alias("__lost"))
        .distinct()
    )
    return _expand_losers(df, tagged, losing_reps, id_col)


# --------------------------------------------------------------------------
# Connected components (duplicate clustering)
# --------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
    storage: str = "memory",
    driver_threshold: int = 5_000_000,
) -> DataFrame:
    """Min-label propagation over an undirected edge list → (id, component)
    where component = min id reachable.

    Hybrid execution: the duplicate graph is tiny relative to the corpus
    (edges = verified dup *pairs*), so when the edge count is at or below
    ``driver_threshold`` the components are solved with one union-find on
    the driver — the edges arrive as ONE Arrow batch (``toArrow``) and
    stay numpy arrays, ~16 bytes/edge for long ids → ~80 MB at the 5M
    default (a Row-object collect would be ~100-200 bytes/edge, 0.5-1.5
    GB in the Python process, which no JVM heap setting bounds).  Larger
    graphs fall back to the distributed algorithm: each round joins
    current labels across edges and takes the per-node min, lineage cut
    per round (iterative plans otherwise grow exponentially), converging
    in O(diameter) rounds with ``max_iter`` bounding pathological chains.
    Both paths produce identical labels (tested).  This is the standard
    production formulation of large-scale near-dup clustering (greedy
    pair-dropping under-merges transitive duplicate groups).
    """
    edges = (
        pairs.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .unionByName(
            pairs.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d"))
        )
        .distinct()
    )
    edges = _barrier(edges, storage)
    if driver_threshold and edges.count() <= driver_threshold:
        # bounded by driver_threshold by contract; Arrow batch → numpy
        # columns, never a list of Row objects (see docstring)
        import numpy as np

        tbl = edges.toArrow()
        s_np = tbl.column("s").to_numpy(zero_copy_only=False)
        d_np = tbl.column("d").to_numpy(zero_copy_only=False)
        parent: dict = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        chunk = 1 << 20  # bound transient boxed-int lists to ~chunk objects
        for off in range(0, len(s_np), chunk):
            for a, b in zip(
                s_np[off : off + chunk].tolist(), d_np[off : off + chunk].tolist()
            ):
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        # edges carry both directions, so s alone covers every node
        nodes = np.unique(s_np).tolist()
        out = pd.DataFrame(
            {"id": nodes, "component": [find(n) for n in nodes]}
        )
        id_type = pairs.schema[src_col].dataType
        from pyspark.sql.types import StructField as _SF, StructType as _ST

        schema = _ST([_SF("id", id_type), _SF("component", id_type)])
        return pairs.sparkSession.createDataFrame(out, schema=schema)
    # The per-round barrier must be an EAGER lineage truncation
    # (localCheckpoint), NOT a lazy persist: persist caches *data* but
    # keeps the full logical plan, so each round's plan embeds the
    # previous round's — exponential plan growth that OOMs the driver
    # JVM after ~10 rounds (caught by the path-equivalence test).  On a
    # cluster, a reliable `checkpoint()` dir is the durable equivalent.
    labels = (
        edges.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    # Integral ids ONLY: casting float/double ids to decimal(38,0)
    # truncates fractional parts, so two distinct label states could
    # alias to the same sum and stop propagation early with wrong
    # components.  Fractional/decimal/string ids use the diff join.
    numeric_ids = isinstance(
        pairs.schema[src_col].dataType,
        (ByteType, ShortType, IntegerType, LongType),
    )

    def label_sum(lb: DataFrame):
        # exact decimal sum — labels are ≤ initial ids, so |sum| <
        # nodes × max|id| ≪ 10^38; no overflow, no float rounding
        return lb.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).first()["s"]

    # Convergence check: min-label propagation is monotone (every node's
    # label is non-increasing), so the label multiset changed iff its
    # exact sum decreased — ONE aggregate over the freshly checkpointed
    # labels instead of the old labels⨝new_labels diff join (which was
    # ~half of each round's driver-visible job time).  String ids fall
    # back to the diff join.  The INITIAL label sum is never computed:
    # round 1 is treated as always-changed (prev_sum None), trading one
    # aggregate job per invocation for at most one redundant round on a
    # graph that is already converged at entry (only possible when the
    # edge list is empty — bounded by max_iter regardless).
    prev_sum = None
    for _ in range(max_iter):
        msgs = (
            edges.join(labels, edges.s == labels.id)
            .select(F.col("d").alias("id"), "component")
        )
        # NB: a pointer-doubling shortcut round (label := label of label)
        # was tried here and measured SLOWER (17.2 s vs 12.1 s on a 200k-
        # edge chain graph): duplicate graphs have small diameters, so the
        # extra per-round self-join costs more than the rounds it saves.
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        if numeric_ids:
            new_sum = label_sum(new_labels)
            changed = int(prev_sum is None or new_sum != prev_sum)
            prev_sum = new_sum
        else:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .where(F.col("n.component") != F.col("o.component"))
                .limit(1)
                .count()
            )
        labels = new_labels
        if changed == 0:
            break
    return labels


def near_dedup_clustered(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    storage: str = "memory",
    max_bucket_size: int | None = None,
    collapse_exact: bool | None = None,
) -> DataFrame:
    """Cluster-aware near-dedup: LSH candidates → Jaccard verify →
    connected components over the duplicate graph → keep the minimum id
    of every component.  Unlike the greedy ``near_dedup_minhash``, this
    merges transitive duplicate chains (A~B, B~C ⇒ one survivor, even if
    A≁C directly).  Exact-text duplicates are collapsed to
    representatives first (``_exact_collapse``): members connect to
    their representative with Jaccard 1.0, so component membership and
    the min-id survivor are unchanged — the component min is always a
    representative (each rep is its group's min id)."""
    tagged, reps = _maybe_collapse(df, text_col, id_col, collapse_exact)
    sh = shingle_sets(reps, text_col, id_col, shingle_n, storage=storage)
    cand = minhash_lsh_candidates(
        reps, text_col, id_col, num_hashes, bands, shingle_n, sh=sh,
        storage=storage, max_bucket_size=max_bucket_size,
    )
    dup_pairs = jaccard_pairs(reps, cand, text_col, id_col, shingle_n, sh=sh).where(
        F.col("jaccard") >= threshold
    )
    comp = connected_components(dup_pairs, storage=storage)
    losing_reps = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias("__lost")
    )
    return _expand_losers(df, tagged, losing_reps, id_col)


def duplicate_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    storage: str = "memory",
    max_bucket_size: int | None = None,
    collapse_exact: bool | None = None,
) -> DataFrame:
    """(id, cluster) for EVERY document: ``cluster`` = the minimum id of
    the doc's near-duplicate connected component (its own id when it has
    no near-dup).  This is the cluster table behind
    ``near_dedup_clustered``, exposed as a first-class artifact —
    survivor selection is ``cluster == id``, duplicate-family audits
    group by ``cluster``, and leakage-free dataset splitting gates on
    ``cluster`` so a whole duplicate family lands in ONE split
    (``sampling.leakage_free_split``).

    Plan: identical to ``near_dedup_clustered`` through the
    exact-collapse → LSH → Jaccard-verify → connected-components steps,
    then one left join maps members through their exact-text
    representative to the component label (docs outside every component
    coalesce to their own id)."""
    tagged, reps = _maybe_collapse(df, text_col, id_col, collapse_exact)
    sh = shingle_sets(reps, text_col, id_col, shingle_n, storage=storage)
    cand = minhash_lsh_candidates(
        reps, text_col, id_col, num_hashes, bands, shingle_n, sh=sh,
        storage=storage, max_bucket_size=max_bucket_size,
    )
    dup_pairs = jaccard_pairs(reps, cand, text_col, id_col, shingle_n, sh=sh).where(
        F.col("jaccard") >= threshold
    )
    comp = connected_components(dup_pairs, storage=storage).select(
        F.col("id").alias("__rid"), F.col("component").alias("__cluster")
    )
    if tagged is None:
        base = df.select(F.col(id_col).alias("id")).withColumn(
            "__rep", F.col("id")
        )
    else:
        base = tagged.select(F.col(id_col).alias("id"), "__rep")
    return (
        base.join(comp, base["__rep"] == comp["__rid"], "left")
        .select(
            "id",
            F.coalesce(F.col("__cluster"), F.col("__rep")).alias("cluster"),
        )
    )


def duplicate_family_histogram(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    **kwargs,
) -> DataFrame:
    """(family_size, n_families) — the duplicate-mass profile of a
    corpus: how many near-duplicate families exist at each size
    (``family_size = 1`` rows are the unique documents).  The standard
    curation-audit artifact (duplicate-cluster size distributions are
    how the published dedup papers characterize a crawl); feeds
    ``sinks.write_html_report``.  Σ family_size·n_families = corpus
    size; survivors after cluster dedup = Σ n_families.

    Cost: one ``duplicate_clusters`` pass + two combinable counts
    (cluster→size, size→families) — both skew-free (the second groups
    on the bounded size domain; partial aggregation absorbs the
    many-size-1 mass)."""
    clusters = duplicate_clusters(
        df, text_col=text_col, id_col=id_col, threshold=threshold, **kwargs
    )
    sizes = clusters.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("family_size")
    )
    return (
        sizes.groupBy("family_size")
        .agg(F.count(F.lit(1)).alias("n_families"))
        .orderBy("family_size")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash_from_hashes(hashes: Column, bits: int = 64) -> Column:
    """SimHash fold over a *materialized* shingle-hash array column:
    per-bit majority vote across hashes, packed into one 64-bit value.

    Expressed as JVM intrinsics only (no UDF).  The per-bit loop is
    unrolled in Python because shift amounts must be literals; each bit is
    one ``aggregate`` popcount over the hash array.  The top bit wraps
    into the long sign bit — fingerprints are opaque ids, so the wrap is
    harmless and deterministic.

    ``hashes`` must be a plain column reference (see ``simhash_table``) —
    passing an expression would let Catalyst clone it into all 64
    popcounts.
    """
    n = F.size(hashes).cast("long")
    one = F.lit(1).cast("long")

    def popcount_at(b: int) -> Column:
        # closure (not a lambda default) so the HOF lambda keeps 2 params
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda a, h: a + F.shiftrightunsigned(h, b).bitwiseAND(one),
        )

    total = F.lit(0).cast("long")
    for b in range(bits):
        bit = F.when(popcount_at(b) * 2 > n, one).otherwise(F.lit(0).cast("long"))
        total = total + F.shiftleft(bit, b)
    return total


def simhash_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    shingle_n: int = 2,
    storage: str = "memory",
) -> DataFrame:
    """(id, simhash64) fingerprints: shingle → hash once behind a lineage
    barrier, then the unrolled per-bit vote."""
    hs = _barrier(
        df.select(
            F.col(id_col).alias("id"),
            F.transform(
                shingles(F.col(text_col), shingle_n), lambda s: F.xxhash64(s)
            ).alias("h"),
        ),
        storage,
    )
    return hs.select("id", simhash_from_hashes(F.col("h"), bits).alias("simhash64"))


def simhash_md5_arrow():
    """Arrow pandas_udf: 64-bit SimHash over *shingle strings*, emitted
    as a 16-char lowercase hex fingerprint.  md5 + fold happen in ONE
    fused kernel: per shingle, the top 8 digest bytes of ``hashlib.md5``
    (C speed — identical to the top 16 hex chars of JVM/DuckDB ``md5`` on
    the same UTF-8 bytes), then a vectorized per-bit majority vote.

    md5 evaluates identically in every engine (unlike xxhash64), so this
    variant is cross-engine checkable: bit ``b`` of the fingerprint is
    the majority vote of bit ``b`` across ``int(md5(tok)[:16], 16)``
    token values, and hex char ``i`` (1-indexed from the left) encodes
    bits ``4*(16-i)+k`` — exactly reproducible in SQL from per-nibble bit
    extraction of the md5 hex string.  Fusing the hashing into the
    kernel (rather than a JVM ``transform(..., md5)``) removes an
    interpreted HOF pass *and* shrinks the Arrow transfer 4× (8 digest
    bytes vs a 32-char hex string per shingle) — the old form scaled at
    ~2.7× per 10× data, this one ~linearly.  The xxhash64 path
    (``simhash_table``) stays the JVM-only production default."""
    import hashlib

    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    shifts = np.arange(64, dtype=np.uint64)
    md5 = hashlib.md5

    @pandas_udf(StringType())
    def fp(tok_col: pd.Series) -> pd.Series:
        out = []
        for toks in tok_col:
            if toks is None:
                out.append(None)
                continue
            v = np.frombuffer(
                b"".join(md5(t.encode()).digest()[:8] for t in toks),
                dtype=">u8",
            ).astype(np.uint64)
            ones = ((v[None, :] >> shifts[:, None]) & np.uint64(1)).sum(axis=1)
            maj = 2 * ones > len(v)  # strict majority, same as simhash_from_hashes
            fpv = 0
            for b in range(64):
                if maj[b]:
                    fpv |= 1 << b
            out.append(format(fpv, "016x"))
        return pd.Series(out)

    return fp


def simhash_md5_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 2,
) -> DataFrame:
    """(id, fp_hex) portable SimHash fingerprints (see
    ``simhash_md5_arrow``).  Shingling stays JVM-side (tokenization
    parity with the SQL oracles); hashing + folding run in the fused
    Arrow kernel (single consumer → no lineage barrier needed)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), shingle_n).alias("toks"),
    )
    return toks.select(
        "id", simhash_md5_arrow()(F.col("toks")).alias("fp_hex")
    )


# --------------------------------------------------------------------------
# Benchmark decontamination
# --------------------------------------------------------------------------

def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Drop training documents that share at least ``min_hits`` word
    ``shingle_n``-grams with an evaluation/benchmark corpus — the
    standard published decontamination recipe (long-n-gram overlap; 8-13
    gram windows are the usual public choices, long enough that chance
    collisions are negligible).

    Plan shape: both sides shingle to xxhash64 n-gram hashes (one narrow
    map each), the benchmark's DISTINCT hash set becomes the build side
    of a broadcast hash join (an eval suite is tiny next to a training
    corpus — thousands of documents vs billions), and a grouped
    hit-count left-anti filters the corpus.  The training side is
    touched by exactly one scan + one aggregation keyed on ``id_col``;
    nothing about the benchmark's size enters the shuffle.

    Returns the surviving documents (all columns).  For the audit frame
    (which doc matched how many benchmark n-grams) use
    ``contamination_hits``."""
    hits = contamination_hits(docs, benchmark, text_col, id_col, shingle_n)
    flagged = hits.where(F.col("n_contaminated_ngrams") >= min_hits).select(
        F.col(id_col).alias("__bad_id")
    )
    return docs.join(
        flagged, docs[id_col] == F.col("__bad_id"), "left_anti"
    )


def contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 8,
    bench_text_col: str | None = None,
) -> DataFrame:
    """(id, n_contaminated_ngrams) for every training document sharing at
    least one ``shingle_n``-gram hash with the benchmark corpus — the
    audit/report face of ``decontaminate``.  ``bench_text_col`` names
    the benchmark's text column when it differs from the corpus's
    (e.g. auditing released ``chunk_text`` rows against a benchmark
    whose column is ``text``); default = ``text_col``."""
    bench_text_col = bench_text_col or text_col
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(
            F.transform(shingles(F.col(text_col), shingle_n), lambda s: F.xxhash64(s))
        ).alias("__g"),
    )
    bench_grams = (
        benchmark.select(
            F.explode(
                F.transform(
                    shingles(F.col(bench_text_col), shingle_n),
                    lambda s: F.xxhash64(s),
                )
            ).alias("__g")
        )
        .distinct()
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "__g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
    )


def hamming_near_dup_pairs(
    df: DataFrame,
    hash_col: str = "simhash",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 64,
) -> DataFrame:
    """All pairs within ``max_hamming`` bit flips of each other, exactly —
    the pair-finding stage SimHash (text) and dHash (images) both need.

    Pigeonhole banding: the 64-bit hash is split into ``max_hamming + 1``
    near-equal bit runs; two hashes within distance d ≤ max_hamming must
    agree EXACTLY on at least one run (d flips cannot touch all d+1
    runs), so candidate generation is an equality self-join on
    (band_idx, band_value) — the same shuffle shape as the MinHash LSH
    bucket join, never all-pairs — with **guaranteed recall** (unlike
    probabilistic LSH).  Verification is one JVM expression:
    ``bit_count(a XOR b) <= max_hamming``.  Returns
    (id_a, id_b, hamming) with id_a < id_b, distinct.

    Scale: candidates ∝ corpus × bands / band-cardinality; degenerate
    skew (many identical hashes) produces true duplicate groups whose
    pairs are genuinely quadratic in the group size — collapse identical
    hashes first if that is a concern (cf. ``_exact_collapse``).
    """
    n_bands = max_hamming + 1
    if n_bands > bits:
        raise ValueError(f"max_hamming {max_hamming} too large for {bits}-bit hashes")
    widths = [bits // n_bands + (1 if i < bits % n_bands else 0) for i in range(n_bands)]
    offs = [sum(widths[:i]) for i in range(n_bands)]
    h = F.col(hash_col).cast("long")
    def _mask(w: int) -> int:
        # a full-width band's mask is all-ones == signed -1 (1<<64 would
        # overflow the Java long literal)
        return (1 << w) - 1 if w < 64 else -1

    band_vals = [
        F.shiftrightunsigned(h, offs[i]).bitwiseAND(F.lit(_mask(widths[i])))
        for i in range(n_bands)
    ]
    banded = df.select(
        F.col(id_col).alias("__hid"),
        h.alias("__h"),
        F.posexplode(F.array(*band_vals)).alias("__band", "__bv"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__bv") == F.col("b.__bv"))
            & (F.col("a.__hid") < F.col("b.__hid")),
        )
        .select(
            F.col("a.__hid").alias("id_a"),
            F.col("b.__hid").alias("id_b"),
            F.bit_count(F.col("a.__h").bitwiseXOR(F.col("b.__h"))).alias("hamming"),
        )
        .where(F.col("hamming") <= F.lit(max_hamming))
        .distinct()
    )
    return cand


def near_dedup_simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = 64,
    shingle_n: int = 2,
    storage: str = "memory",
) -> DataFrame:
    """SimHash near-dedup, end to end: fingerprint → pigeonhole-banded
    exact hamming pairs (guaranteed recall at ``max_hamming``) → greedy
    keep-lowest-id, mirroring ``near_dedup_minhash``'s survivor
    semantics on the SimHash axis.

    When to prefer which: MinHash+verify thresholds on *Jaccard* (the
    published near-dup criterion; exact verify); SimHash+hamming is one
    64-bit fingerprint per doc — 8 bytes of dedup state, a cheaper
    pair join, and a distance with guaranteed recall, at the cost of a
    coarser similarity proxy.  The fingerprints are the same ones q31
    computes; the hamming join is shared with image dHash dedup."""
    fp = _barrier(
        simhash_table(df, text_col, id_col, bits, shingle_n, storage=storage),
        storage,
    )
    losers = (
        hamming_near_dup_pairs(
            fp, hash_col="simhash64", id_col="id", max_hamming=max_hamming,
            bits=bits,
        )
        .select(F.col("id_b").alias("__lost"))
        .distinct()
    )
    return df.join(
        losers, df[id_col] == losers["__lost"], "left_anti"
    )


def _span_hashes_kernel(text_col: str, id_col: str, span_tokens: int):
    """(id, pos, h) rows: a 64-bit rolling polynomial hash of every
    ``span_tokens``-token window (stride 1), O(n_tokens) per doc."""
    import numpy as np

    B = np.uint64(0x9E3779B97F4A7C15)  # odd multiplier (splitmix gamma)

    def kernel(batches):
        import hashlib

        Bpow = B ** np.uint64(span_tokens - 1)
        memo: dict[str, int] = {}  # token→hash, amortized across batches

        def tok_hash(t: str) -> int:
            # stable across processes (never the PYTHONHASHSEED builtin)
            v = memo.get(t)
            if v is None:
                v = memo[t] = int.from_bytes(
                    hashlib.md5(t.encode()).digest()[:8], "little"
                )
            return v

        for pdf in batches:
            ids, poss, hs = [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                toks = text.split()
                n = len(toks)
                if n < span_tokens:
                    continue
                th = np.array([tok_hash(t) for t in toks], dtype=np.uint64)
                # rolling: h_i = sum_{j<span} th[i+j] * B^(span-1-j);
                # uint64 wraparound IS the hash semantics (mod 2^64)
                with np.errstate(over="ignore"):
                    h = np.uint64(0)
                    out = np.empty(n - span_tokens + 1, dtype=np.uint64)
                    for j in range(span_tokens):
                        h = h * B + th[j]
                    out[0] = h
                    for i in range(1, n - span_tokens + 1):
                        h = (h - th[i - 1] * Bpow) * B + th[i + span_tokens - 1]
                        out[i] = h
                ids.extend([rid] * len(out))
                poss.extend(range(len(out)))
                hs.extend(out.view(np.int64).tolist())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "pos": pd.array(poss, dtype="int64"),
                    "h": pd.array(hs, dtype="int64"),
                }
            )

    return kernel


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 50,
    storage: str = "none",
) -> DataFrame:
    """ExactSubstr dedup (public method: Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022): every
    ``span_tokens``-token window that occurs more than once in the
    corpus — across documents OR repeated within one — is excised from
    every occurrence EXCEPT the first (global order: smallest
    ``(doc_id, pos)`` keeps).  Token order elsewhere is untouched;
    documents shorter than the span pass through verbatim.

    Plan: ONE narrow rolling-hash kernel emits (id, pos, span-hash)
    rows (O(n_tokens) work and rows — the inherent cost the paper's
    suffix-array approach pays too); keeper selection is a
    ``groupBy(h)`` AGGREGATE (count + min-struct), never a window over
    the span hash: span hashes are uniform across DISTINCT spans, but
    one boilerplate span (license header, nav text) repeated in
    millions of documents piles every occurrence onto a single key, and
    a window partition cannot be split — partial (map-side) aggregation
    absorbs exactly that skew, and the join-back from occurrences to
    the one-row-per-hash keeper side is an equi-join AQE's skew
    handling CAN split.  Non-keeper occurrences group per doc
    (~cut-count rows); a final narrow kernel drops the union of cut
    token ranges per document.  Hash collisions (2⁻⁶⁴ per pair) can cut
    a false span — the standard fingerprint-dedup tradeoff, same class
    as the shingle-hash Jaccard note in ``shingle_sets``.

    ``storage`` barriers the span frame between its two consumers (the
    keeper aggregate and the join-back; see ``_barrier``) — default
    ``"none"``: the span frame is O(n_tokens) rows, the largest
    intermediate in the repo, and re-running the narrow rolling-hash
    kernel is measurably cheaper than materializing it (500k-doc A/B:
    none 7.0 s / memory 6.0 s / persist-to-disk 24.9 s — and at 100 TB
    caching a corpus-token-count frame is not a real option, while the
    recompute is one extra narrow scan)."""
    import numpy as np

    from pyspark.sql.types import (
        ArrayType as _AT,
        LongType as _LT,
        StructField as _SF,
        StructType as _ST,
    )

    spans_schema = _ST(
        [
            df.schema[id_col],
            _SF("pos", _LT()),
            _SF("h", _LT()),
        ]
    )
    # barrier: spans feeds BOTH the keeper aggregate and the join-back —
    # without it the rolling-hash kernel would run twice over the corpus
    spans = _barrier(
        df.select(id_col, text_col).mapInPandas(
            _span_hashes_kernel(text_col, id_col, span_tokens), spans_schema
        ),
        storage,
    )
    keepers = (
        spans.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(F.struct(F.col(id_col), F.col("pos"))).alias("__keep"),
        )
        .where(F.col("__n") > 1)
        .select(
            "h",
            F.col(f"__keep.{id_col}").alias("__keep_id"),
            F.col("__keep.pos").alias("__keep_pos"),
        )
    )
    cuts = (
        spans.join(keepers, "h")
        .where(
            (F.col(id_col) != F.col("__keep_id"))
            | (F.col("pos") != F.col("__keep_pos"))
        )
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("__cut_pos"))
    )
    joined = df.join(cuts, id_col, "left")

    out_schema = df.schema
    cols = df.columns

    def excise(batches):
        for pdf in batches:
            texts = []
            for text, cut in zip(pdf[text_col], pdf["__cut_pos"]):
                if cut is None or text is None or len(cut) == 0:
                    texts.append(text)
                    continue
                toks = text.split()
                drop = np.zeros(len(toks), dtype=bool)
                for p in cut:
                    drop[int(p): int(p) + span_tokens] = True
                texts.append(" ".join(t for t, d in zip(toks, drop) if not d))
            out = pdf[cols].copy()
            out[text_col] = texts
            yield out

    return joined.mapInPandas(excise, out_schema)
