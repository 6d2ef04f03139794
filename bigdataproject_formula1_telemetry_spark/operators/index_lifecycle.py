"""Shared LSM lifecycle for the materialized-index family — ONE
implementation of the compaction lease/abort contract that
``plans.pipelines.corpus_release`` pioneered (``_compacting.json`` +
mid-append abort, VERDICT r10/r11), adapted to indexes whose compaction
REPLACES whole table directories (bm25 postings/stats, minhash
sigs/banded, exact hashes/bloom, the semantic inverted file).

Why the release contract alone is not enough here: ``compact_release``
folds per-increment DIRECTORIES and swaps only the base, so an increment
appended after its listing snapshot simply survives in place.  The index
compactors rewrite the ENTIRE ``inc=``-partitioned table through a
staged-then-rename swap — an ``append_*`` landing between the
compactor's snapshot read and its ``_swap_staged`` would be silently
DELETED by the swap (the r11 verdict's race class).  Three mechanisms
close it:

1. **Lease (fail fast).**  ``compact_*`` writes ``_compacting.json``
   (its listing snapshot + a nonce) BEFORE reading any data and clears
   it only after every table has swapped.  Every ``append_*`` checks the
   lease first and raises while one is held — a whole-table swap
   endangers ANY concurrent append, so unlike the release the lease
   blocks all of them, not just the folding ids.

2. **Post-write re-check (abort + rollback).**  An append whose
   pre-check passed an instant before the lease landed re-reads the
   lease AFTER its writes: if one appeared, it deletes its own ``inc=``
   partitions and raises — nothing is published, the docs stay
   appendable under the same id after the compaction completes.

3. **Post-swap reconciliation (no silent deletes, ever).**  The swap
   folds only ``inc IN snapshot``; any ``inc=`` directory present in the
   old live table but NOT in the snapshot (an append that landed after
   the snapshot and whose re-check ran before the lease became visible)
   is MOVED into the new table before ``.old`` is deleted.  The append
   reported success, so its rows must survive — they ride as a live
   increment into the next compaction instead of vanishing.

4. **Folded-id marker (no silent double-admit).**  A compaction folds
   its snapshot ids into ``base`` and records them in
   ``_folded_incs.json`` (accumulating across generations, the
   ``corpus_release`` marker rule): a later ``append_*`` of a folded id
   RAISES instead of writing fresh rows next to the already-folded ones
   — for the admission indexes that double-admit was merely redundant,
   but for the bm25 SERVING index it double-counts tf/df/stats and
   corrupts every score touching those docs.  Increment ids are unique
   for an index's lifetime; pick a fresh id to retry.

Crash recovery: the lease survives a crashed compaction and keeps every
append fail-fast-blocked until a ``compact_*`` retry finishes the job —
including marking the leased ids folded, so a crash between the last
swap and the marker write cannot reopen a folded id (the lease names
exactly the snapshot being folded).  BOTH retry paths honor this: the
no-op path marks the whole stale snapshot, and the non-no-op path
(reached when a reconciled late increment keeps work pending) marks the
stale ids no longer live in any table BEFORE superseding the lease
(ADVICE r12 — the overwrite used to destroy the only record of them).
The retry's no-op decision consults EVERY table (a crash between two
tables' swaps leaves the later ones unfolded — ``compact_bm25_index``'s
postings-only check could never retry the stats fold, ADVICE r11), and
a stale ``<table>.old`` is reconciled against the leased snapshot before
anything else runs.

Concurrency contract (documented, enforced fail-fast — not a lock):
ONE maintenance writer.  Two concurrent ``compact_*`` calls on the same
index are the operator's to serialize (a retry deliberately supersedes
a stale lease, exactly like ``compact_release``).
"""

from __future__ import annotations

import json
import os
import uuid

__all__ = [
    "lease_file_at",
    "read_lease",
    "write_lease",
    "clear_lease",
    "read_folded",
    "check_append_allowed",
    "abort_append_if_leased",
    "list_inc_ids",
    "compact_index_tables",
]

_COMPACTING_LEASE = "_compacting.json"
_FOLDED_MARKER = "_folded_incs.json"


def _folded_file_for(lease_file: str) -> str:
    """The folded-id marker lives NEXT to the lease (same directory for
    root leases, same sibling prefix for the semantic index's sibling
    lease) — derived, so every module that picked a lease location gets
    the marker for free."""
    assert lease_file.endswith(_COMPACTING_LEASE), lease_file
    return lease_file[: -len(_COMPACTING_LEASE)] + _FOLDED_MARKER


def lease_file_at(path: str) -> str:
    """Default lease location: at the INDEX ROOT, next to the table
    subdirectories (never scanned by parquet readers).  Indexes whose
    table IS the root (the semantic inverted file) must use a SIBLING
    file instead — a root-internal lease would ride the compaction
    renames and vanish with ``.old``."""
    return os.path.join(path, _COMPACTING_LEASE)


def _fs_path(spark, p: str):
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path(p)
    fs = hp.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hp, jvm


def _read_small(fs, p) -> str:
    # JDK-only small-file read through the Hadoop FS API (the
    # plans.pipelines._read_small_file recipe: readAllBytes proxies to
    # Python bytes; a JVM-side buffer fill would stay invisible here)
    stream = fs.open(p)
    try:
        return bytes(stream.readAllBytes()).decode("utf-8")
    finally:
        stream.close()


def read_lease(spark, lease_file: str) -> "set[str] | None":
    """The in-flight (or crashed) compaction's snapshot ids, or ``None``
    when no lease exists.  An EMPTY snapshot still blocks appends — the
    distinction None-vs-set is load-bearing for recovery."""
    fs, p, _ = _fs_path(spark, lease_file)
    if not fs.exists(p):
        return None
    return set(json.loads(_read_small(fs, p))["incs"])


def write_lease(spark, lease_file: str, incs) -> None:
    fs, p, _ = _fs_path(spark, lease_file)
    out = fs.create(p, True)  # overwrite: a retry supersedes a stale lease
    try:
        out.write(
            bytearray(
                json.dumps(
                    {"incs": sorted(incs), "nonce": uuid.uuid4().hex}
                ).encode("utf-8")
            )
        )
    finally:
        out.close()


def clear_lease(spark, lease_file: str) -> None:
    fs, p, _ = _fs_path(spark, lease_file)
    if fs.exists(p):
        fs.delete(p, False)


def read_folded(spark, lease_file: str) -> "set[str]":
    """Increment ids a past compaction folded into ``base`` — empty for
    a never-compacted index.  Keyed off the lease location."""
    fs, p, _ = _fs_path(spark, _folded_file_for(lease_file))
    if not fs.exists(p):
        return set()
    return set(json.loads(_read_small(fs, p)))


def _write_folded(spark, lease_file: str, incs) -> None:
    fs, p, _ = _fs_path(spark, _folded_file_for(lease_file))
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps(sorted(incs)).encode("utf-8")))
    finally:
        out.close()


def reset_lifecycle(spark, lease_file: str) -> None:
    """Clear the lease AND the folded-id marker — for ``build_*``: a
    base build is a FRESH index (static overwrite drops every prior
    ``inc=`` partition), so the previous generation's folded ids must
    not keep blocking re-use, and a stale lease has nothing left to
    retry against."""
    clear_lease(spark, lease_file)
    fs, p, _ = _fs_path(spark, _folded_file_for(lease_file))
    if fs.exists(p):
        fs.delete(p, False)


def check_append_allowed(
    spark, lease_file: str, op: str, increment_id: "str | None" = None
) -> None:
    """Pre-write append guard: raise while a compaction lease is held —
    the compactor's staged write re-reads the WHOLE table and the swap
    replaces it, so any append overlapping a compaction is unsafe (not
    just re-appends of folding ids, the release-contract difference) —
    and raise on reuse of a FOLDED increment id: its rows live in
    ``base`` now, so a fresh write under the same id would double-admit
    (score-corrupting for the bm25 serving index)."""
    if read_lease(spark, lease_file) is not None:
        raise ValueError(
            f"{op}: a compaction lease is held (see "
            f"{os.path.basename(lease_file)} — an in-flight or crashed "
            "compact run); appends would race the whole-table swap.  "
            "Retry after the compaction completes — or, if it crashed, "
            "after a compact retry supersedes the stale lease"
        )
    if increment_id is not None and increment_id in read_folded(
        spark, lease_file
    ):
        raise ValueError(
            f"{op}: increment id {increment_id!r} was already folded "
            "into the base by a compaction; its rows live in base, so "
            "re-appending under this id would double-admit them.  "
            "Increment ids are unique for an index's lifetime — pick a "
            "fresh id"
        )


def abort_append_if_leased(
    spark, lease_file: str, increment_id: str, table_dirs, op: str
) -> None:
    """Post-write append re-check (the ``corpus_release_append``
    double-check, r11): if a lease landed after the pre-check, roll back
    this append's own ``inc=`` partitions and raise — nothing published.
    The rollback's deletes can tear the racing compactor's scan, which
    fails THAT job loudly with the lease still held (retryable) — the
    acceptable loud outcome, never a silent loss.

    A MISSING expected ``inc=`` partition during the rollback is
    evidence the racing compactor already FOLDED it into ``base``
    (ADVICE r12: an append straddling the lease — table 1 written
    pre-lease and snapshotted, table 2 written post-lease — used to
    have table 1 silently folded while the rollback deleted table 2,
    corrupting e.g. bm25 scores with postings that have no stats row
    while reporting a clean abort).  In that case the rollback deletes
    NOTHING: the surviving partitions stay live so the index CONVERGES
    to the fully-admitted state (a folded table's rows are in ``base``;
    the survivors fold on the next compaction — at every instant each
    row of the increment is served exactly once), and the raise says
    the increment must be treated as PUBLISHED, not re-sent.  The only
    other way a partition can be absent is a table the append wrote
    zero rows for (a partitioned write of an empty frame creates no
    directory) — keeping the survivors is identical to the full write
    in that case too, so the conservative path is correct for both."""
    if read_lease(spark, lease_file) is None:
        return
    parts = [
        (t, _fs_path(spark, os.path.join(t, f"inc={increment_id}")))
        for t in table_dirs
    ]
    missing = [t for t, (fs, p, _) in parts if not fs.exists(p)]
    if missing:
        raise RuntimeError(
            f"{op}({increment_id!r}): a compaction leased this index "
            "mid-append AND the increment's partition is already absent "
            f"from {[os.path.basename(t.rstrip('/')) for t in missing]} — "
            "the compaction folded it into base (or the append wrote "
            "zero rows there).  Rolled back NOTHING: the surviving "
            "partitions stay live and fold on the next compaction, so "
            "the index converges to the fully-admitted state.  Treat "
            "this increment as PUBLISHED — do not re-send its rows"
        )
    for t, (fs, p, _) in parts:
        fs.delete(p, True)
        # the append's own write re-cached this table's file listing;
        # the rollback deletes OUTSIDE Spark, so drop the stale entries
        # or a same-session read would chase the deleted files
        spark.catalog.refreshByPath(t)
    raise RuntimeError(
        f"{op}({increment_id!r}): a compaction leased this index "
        "mid-append; the append rolled its own partitions back and "
        "published nothing — retry after the compaction completes"
    )


def list_inc_ids(spark, table_dir: str) -> "list[str]":
    """``inc=`` partition directory names under one table — metadata
    only, no data scan."""
    fs, p, _ = _fs_path(spark, table_dir)
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("inc="):
            out.append(name[len("inc="):])
    return sorted(out)


def _recover_table(spark, lease_file: str, table_dir: str) -> None:
    """Finish a crashed swap before compacting again: ``.old`` with no
    live table means the crash hit between the two renames (rename it
    back); ``.old`` NEXT TO a live table means the crash hit after the
    swap but before cleanup — reconcile its non-snapshot ``inc=`` dirs
    into the live table (they are post-snapshot appends the interrupted
    reconciliation never moved) and delete it."""
    table = table_dir.rstrip("/")
    fs, old_p, jvm = _fs_path(spark, table + ".old")
    if not fs.exists(old_p):
        return
    dst = jvm.org.apache.hadoop.fs.Path(table)
    if not fs.exists(dst):
        if not fs.rename(old_p, dst):
            raise IOError(
                f"recover: rename {table}.old -> {table} failed"
            )
        return
    snapshot = read_lease(spark, lease_file)
    if snapshot is None:
        # .old should never outlive the lease — ambiguous garbage; a
        # silent delete could destroy a post-snapshot append's only copy
        raise IOError(
            f"recover: {table}.old exists with no compaction lease — "
            "ambiguous crash state; inspect and remove (or restore) "
            f"{table}.old manually"
        )
    for st in fs.listStatus(old_p):
        name = st.getPath().getName()
        if not name.startswith("inc=") or name[len("inc="):] in snapshot:
            continue
        dest = jvm.org.apache.hadoop.fs.Path(os.path.join(table, name))
        if fs.exists(dest):
            continue
        if not fs.rename(st.getPath(), dest):
            raise IOError(f"recover: reconcile of {name} into {table} failed")
    fs.delete(old_p, True)


def _swap_staged_reconcile(
    spark, staged: str, table_dir: str, snapshot_ids: "set[str]"
) -> None:
    """``minhash_index._swap_staged`` plus the reconciliation step: after
    the staged dir renames into place, every ``inc=`` directory in the
    old live table whose id is NOT in the compaction's snapshot (an
    append that landed after the snapshot) is MOVED into the new table
    — preserved, never deleted.  A complete copy of the table exists
    under some name at every instant, exactly as before."""
    table = table_dir.rstrip("/")
    fs, src, jvm = _fs_path(spark, staged)
    dst = jvm.org.apache.hadoop.fs.Path(table)
    old = jvm.org.apache.hadoop.fs.Path(table + ".old")
    fs.delete(old, True)  # stale .old from a prior crashed swap
    if fs.exists(dst) and not fs.rename(dst, old):
        raise IOError(f"swap: rename {table} -> {table}.old failed")
    if not fs.rename(src, dst):
        fs.rename(old, dst)  # put the live table back before raising
        raise IOError(f"swap: rename {staged} -> {table} failed")
    if fs.exists(old):
        for st in fs.listStatus(old):
            name = st.getPath().getName()
            if (
                not name.startswith("inc=")
                or name[len("inc="):] in snapshot_ids
            ):
                continue
            dest = jvm.org.apache.hadoop.fs.Path(os.path.join(table, name))
            if fs.exists(dest):
                continue
            if not fs.rename(st.getPath(), dest):
                raise IOError(
                    f"swap: reconcile of late increment {name} into "
                    f"{table} failed"
                )
    fs.delete(old, True)
    # renames happen outside Spark: drop any cached file listing so a
    # same-session read sees the swapped table, not the old file set
    spark.catalog.refreshByPath(table)


def compact_index_tables(
    spark, lease_file: str, specs, commit_table: "str | None" = None
) -> int:
    """Drive one leased, crash-retryable, reconcile-swapped compaction
    over an index's tables.  ``specs`` is a sequence of ``(table_dir,
    fold)`` where ``fold(spark, table_dir, inc_ids, staged_dir)`` writes
    the folded table (exactly the rows of ``inc IN inc_ids``, rewritten
    under ``inc=base``) to ``staged_dir``.  Returns the number of
    distinct non-base increment ids folded across all tables (0 =
    no-op; the decision consults EVERY table, so a crash between two
    tables' swaps is retryable — ADVICE r11).

    ``commit_table`` (r13, the root-cause fix for ADVICE r12's
    partial-fold straddle): the table an append writes LAST — its
    ``inc=`` partition is the append's commit marker, so an id present
    there has every earlier table's partition on disk.  When given,
    only commit-complete ids fold; an append STRADDLING the lease
    (early tables written, commit not yet) is excluded from every
    table's fold and its partitions ride the swap's reconciliation
    instead — so the append either completes and rolls back cleanly
    (all partitions present) or was fully folded (all absent), never
    half-folded.  Ids named by a stale (crashed-run) lease stay
    eligible even if the crashed run already folded the commit table
    (they were commit-complete when leased — without this a crash
    between the commit table's swap and a later table's would strand
    the later table's partition forever)."""
    for table_dir, _ in specs:
        _recover_table(spark, lease_file, table_dir)
    union_nonbase = {
        i
        for table_dir, _ in specs
        for i in list_inc_ids(spark, table_dir)
        if i != "base"
    }
    if not union_nonbase:
        # nothing left to fold; a surviving lease is a crashed run whose
        # tables all swapped — its snapshot ids ARE folded, so mark them
        # (a crash between the last swap and the marker write must not
        # reopen a folded id for re-append) before finishing cleanup
        stale = read_lease(spark, lease_file)
        if stale:
            already = read_folded(spark, lease_file)
            _write_folded(
                spark, lease_file, (stale - {"base"}) | already
            )
        clear_lease(spark, lease_file)
        return 0
    # a stale lease being SUPERSEDED here names a crashed run's snapshot;
    # any of its ids no longer live in ANY table were fully folded by
    # that run (it crashed after their swaps, before its marker write) —
    # mark them NOW, before write_lease overwrites the only record of
    # them, or a later append could reuse a folded id and double-admit
    # (ADVICE r12; the no-op path above already honored this — this is
    # the non-no-op twin, reached when e.g. a reconciled late increment
    # keeps union_nonbase non-empty).  An id the crashed run's abort
    # rollback deleted instead of folding gets marked too — a false
    # "already folded" refusal is loud and the retry-under-a-fresh-id
    # remedy is identical, never a silent loss.
    stale = read_lease(spark, lease_file)
    if stale:
        ghosts = stale - union_nonbase - {"base"}
        if ghosts:
            _write_folded(
                spark, lease_file, ghosts | read_folded(spark, lease_file)
            )
    # the fold set: commit-complete ids only (plus a stale lease's still-
    # live ids — commit-complete when the crashed run leased them).  Ids
    # live somewhere but NOT in the fold set are in-flight straddlers:
    # every table leaves them out of its fold, so the swap reconciles
    # them — never half-folded
    if commit_table is not None:
        intended = {
            i for i in list_inc_ids(spark, commit_table) if i != "base"
        }
        if stale:
            intended |= stale & union_nonbase
    else:
        intended = set(union_nonbase)
    if not intended:
        # only incomplete (commit-less) increments live: nothing is safe
        # to fold yet — their appends will finish (or be retried under
        # the same id) and a later compaction takes them
        clear_lease(spark, lease_file)
        return 0
    # lease FIRST: from here until the clear, appends fail fast (or
    # abort on their post-write re-check) instead of racing the swaps.
    # The lease names exactly the fold set — crash recovery reconciles
    # every NON-leased ``inc=`` out of a stale ``.old``, so leasing an
    # id we might not fold would let recovery drop its only copy
    write_lease(spark, lease_file, sorted(intended))
    folded: set = set()
    for table_dir, fold in specs:
        # per-table snapshot listed AFTER the lease: an append completing
        # in the pre-check window is either fully listed (folded) or
        # rolls itself back (its dirs vanish before the fold reads them —
        # a torn read fails THIS job loudly, lease held, retry clean)
        ids = list_inc_ids(spark, table_dir)
        fold_ids = [i for i in ids if i == "base" or i in intended]
        if not [i for i in fold_ids if i != "base"]:
            continue  # nothing foldable here (already folded, or only
            # in-flight straddlers — reconciliation is not a fold)
        folded.update(i for i in fold_ids if i != "base")
        staged = table_dir.rstrip("/") + ".compact"
        fs, sp, _ = _fs_path(spark, staged)
        fs.delete(sp, True)
        fold(spark, table_dir, fold_ids, staged)
        _swap_staged_reconcile(spark, staged, table_dir, set(fold_ids))
    # marker BEFORE the lease clears (appends stay blocked until both
    # land); accumulates across generations — id uniqueness is for the
    # index's lifetime, exactly the corpus_release marker rule
    _write_folded(
        spark, lease_file, folded | read_folded(spark, lease_file)
    )
    clear_lease(spark, lease_file)
    return len(folded)
