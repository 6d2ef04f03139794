"""Near-dedup exactness vs a brute-force oracle (sf0.001 documents):
candidate verification must make every drop justified (precision = 1 by
construction), and LSH banding must catch high-similarity pairs (recall)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark import io
from bigdataproject_formula1_telemetry_spark.operators import dedup
from tests.conftest import SF_SMOKE

THRESHOLD = 0.7


def py_shingles(text: str, n: int = 3) -> frozenset:
    words = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    if len(words) < n:
        return frozenset({" ".join(words)})
    return frozenset(" ".join(words[i : i + n]) for i in range(len(words) - n + 1))


def py_jaccard(a: frozenset, b: frozenset) -> float:
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)


@pytest.fixture(scope="module")
def docs_pdf(spark):
    return io.read_table(spark, SF_SMOKE, "documents").select("doc_id", "text").toPandas()


@pytest.fixture(scope="module")
def oracle_pairs(docs_pdf):
    """All pairs with exact 3-gram Jaccard ≥ THRESHOLD (brute force)."""
    sh = {r.doc_id: py_shingles(r.text) for r in docs_pdf.itertuples(index=False)}
    ids = sorted(sh)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            j = py_jaccard(sh[a], sh[b])
            if j >= THRESHOLD:
                out[(a, b)] = j
    return out


def test_jaccard_pairs_exact(spark, docs_pdf, oracle_pairs):
    """The Spark n-gram Jaccard must equal the brute-force python value."""
    docs = io.read_table(spark, SF_SMOKE, "documents")
    cand = dedup.minhash_lsh_candidates(docs)
    got = dedup.jaccard_pairs(docs, cand).toPandas()
    sh = {r.doc_id: py_shingles(r.text) for r in docs_pdf.itertuples(index=False)}
    for r in got.itertuples(index=False):
        exp = py_jaccard(sh[r.id_a], sh[r.id_b])
        assert abs(r.jaccard - exp) < 1e-12, (r.id_a, r.id_b)


def test_near_dedup_recall_and_precision(spark, docs_pdf, oracle_pairs):
    docs = io.read_table(spark, SF_SMOKE, "documents")
    kept = set(
        r.doc_id
        for r in dedup.near_dedup_minhash(docs, threshold=THRESHOLD)
        .select("doc_id")
        .collect()
    )
    all_ids = set(docs_pdf["doc_id"])
    dropped = all_ids - kept

    # precision: every dropped doc has a true near-duplicate partner
    sh = {r.doc_id: py_shingles(r.text) for r in docs_pdf.itertuples(index=False)}
    for d in dropped:
        assert any(
            py_jaccard(sh[d], sh[o]) >= THRESHOLD for o in all_ids if o != d
        ), f"doc {d} dropped without a true near-dup"

    # recall on strong pairs (j ≥ 0.85 → banding catch prob ≈ 1): at most
    # one member of each strong pair survives
    strong = [(a, b) for (a, b), j in oracle_pairs.items() if j >= 0.85]
    if strong:
        missed = [(a, b) for a, b in strong if a in kept and b in kept]
        assert len(missed) <= max(1, len(strong) // 10), missed


def test_arrow_signature_bit_identical_to_expression(spark):
    """The production Arrow minhash path must reproduce the JVM expression
    path exactly (two's-complement wrap + signed min)."""
    docs = io.read_table(spark, SF_SMOKE, "documents")
    sh = dedup.shingle_sets(docs)
    from pyspark.sql import functions as F

    expr = sh.select("id", dedup.minhash_signature_from_hashes(F.col("h")).alias("sig"))
    arrow = sh.select("id", dedup.minhash_signature_arrow(64)(F.col("h")).alias("sig"))
    diff = (
        expr.alias("a")
        .join(arrow.alias("b"), "id")
        .where(F.expr("a.sig <> b.sig"))
        .count()
    )
    assert diff == 0


def test_connected_components_matches_union_find(spark):
    import pandas as pd

    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (5, 5)]
    pairs = spark.createDataFrame(pd.DataFrame(edges, columns=["id_a", "id_b"]))
    got = {
        r["id"]: r["component"]
        for r in dedup.connected_components(pairs).collect()
    }

    # python union-find oracle
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        parent[find(a)] = find(b)

    for a, b in edges:
        union(a, b)
    exp = {x: min(y for y in parent if find(y) == find(x)) for x in parent}
    assert got == exp


def test_clustered_dedup_merges_transitive_chains(spark, docs_pdf):
    """A~B and B~C (but A≁C) must leave ONE survivor with clustering."""
    import pandas as pd

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    words = base.split()
    # B shares 75% with A and 75% with C; A and C share ~50%
    a = " ".join(words)
    b = " ".join(words[:15] + ["one", "two", "three", "four", "five"])
    c = " ".join(words[:10] + ["one", "two", "three", "four", "five",
                               "six", "seven", "eight", "nine", "ten"])
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "text": [a, b, c]})
    sdf = spark.createDataFrame(pdf)
    kept = dedup.near_dedup_clustered(
        sdf, threshold=0.3, bands=32, num_hashes=64, shingle_n=2
    )
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert ids == [1], ids


def test_exact_dedup_keeps_min_id(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [10, 3, 7, 5],
            "text": ["same text", "same text", "other", "same text"],
        }
    )
    kept = dedup.exact_dedup(spark.createDataFrame(pdf)).toPandas()
    assert sorted(kept["doc_id"]) == [3, 7]


def test_simhash_near_for_near_texts(spark):
    import pandas as pd

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [base, base.replace("today", "tonight"), "completely different words here entirely unrelated content"],
        }
    )
    out = dedup.simhash_table(spark.createDataFrame(pdf)).toPandas().set_index("id")

    def hamming(a, b):
        return bin((int(a) ^ int(b)) & 0xFFFFFFFFFFFFFFFF).count("1")

    near = hamming(out.loc[1, "simhash64"], out.loc[2, "simhash64"])
    far = hamming(out.loc[1, "simhash64"], out.loc[3, "simhash64"])
    assert near < far
    assert near <= 16


@pytest.mark.parametrize("storage", ["persist", "memory", "none"])
def test_storage_backends_identical_survivors(spark, storage):
    """Every barrier backend must produce the same survivor set as the
    default localCheckpoint path (the barrier is perf/fault-tolerance
    only, never semantics)."""
    docs = io.read_table(spark, SF_SMOKE, "documents")
    base = set(
        r.doc_id
        for r in dedup.near_dedup_minhash(docs, threshold=THRESHOLD).collect()
    )
    got = set(
        r.doc_id
        for r in dedup.near_dedup_minhash(
            docs, threshold=THRESHOLD, storage=storage
        ).collect()
    )
    assert got == base


def test_storage_rejects_unknown_backend(spark):
    docs = io.read_table(spark, SF_SMOKE, "documents")
    with pytest.raises(ValueError, match="storage"):
        dedup.near_dedup_minhash(docs, storage="s3-magic")


def test_bucket_cap_bounds_adversarial_corpus(spark, caplog):
    """An all-identical corpus puts every doc in one bucket per band —
    O(n²) candidate pairs.  max_bucket_size must drop those buckets (and
    log it), bounding the pair join."""
    import logging

    import pandas as pd

    n = 60
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(n)) + [1000, 1001],
            "text": ["identical boilerplate text repeated everywhere for test"] * n
            + ["some unique document alpha", "another unique document beta"],
        }
    )
    sdf = spark.createDataFrame(pdf)
    uncapped = dedup.minhash_lsh_candidates(sdf).count()
    assert uncapped == n * (n - 1) // 2

    with caplog.at_level(logging.WARNING, logger="bigdataproject_formula1_telemetry_spark.operators.dedup"):
        capped = dedup.minhash_lsh_candidates(sdf, max_bucket_size=10).count()
    assert capped == 0
    assert any("oversized LSH bucket" in r.message for r in caplog.records)

    # a cap larger than any bucket is a no-op
    assert dedup.minhash_lsh_candidates(sdf, max_bucket_size=n).count() == uncapped


def test_lane_mixing_has_no_signed_floor_attractor():
    """Regression: the affine family h*(2k+1)+k kept an element with hash
    near the signed-long floor as the min in nearly EVERY lane (it maps to
    ≈ -2^63 + (2k+1)δ under all lanes), collapsing minhash's per-lane
    independence — a J=8/9 pair showed 8/64 lane agreement (expected 57)
    and was missed by LSH despite p_catch ≈ 1-1.5e-7.  The splitmix64
    lane family must keep agreement near J for attractor elements."""
    import numpy as np

    rng = np.random.default_rng(123)
    base = rng.integers(-(2**62), 2**62, 24, dtype=np.int64)
    attractor = np.int64(-(2**63) + 12345)  # hash just above the signed floor
    a = np.concatenate([base, [attractor]])  # A = B ∪ {attractor}, J = 24/25
    sig_a = dedup._lanes_np(a, 64).view("int64").min(axis=1)
    sig_b = dedup._lanes_np(base, 64).view("int64").min(axis=1)
    agreement = int((sig_a == sig_b).sum())
    # E[agreement] = 64 * 24/25 ≈ 61; the broken family gave ≈ 0 here
    assert agreement >= 48, agreement


def test_simhash_md5_matches_pure_python_oracle(spark, docs_pdf):
    """Portable simhash: fingerprints must equal an independent pure-Python
    implementation (md5 → 64-bit majority vote → hex)."""
    import hashlib

    def py_fp(text: str) -> str:
        toks = py_shingles(text, n=2)
        vals = [int(hashlib.md5(t.encode()).hexdigest()[:16], 16) for t in toks]
        fpv = 0
        for b in range(64):
            ones = sum((v >> b) & 1 for v in vals)
            if 2 * ones > len(vals):
                fpv |= 1 << b
        return format(fpv, "016x")

    sdf = io.read_table(spark, SF_SMOKE, "documents")
    got = {
        r.id: r.fp_hex
        for r in dedup.simhash_md5_table(sdf).collect()
    }
    sample = docs_pdf.head(40)
    for r in sample.itertuples(index=False):
        assert got[r.doc_id] == py_fp(r.text), r.doc_id


def test_near_dedup_replica_corpus_matches_single_copy(spark, docs_pdf):
    """Exact-text collapse: a corpus where every doc has 3 identical
    copies must dedup to the same survivors as the single-copy corpus
    (replica ids are strictly larger, so reps are the original ids)."""
    import pandas as pd

    base = docs_pdf.head(60)[["doc_id", "text"]]
    copies = [base]
    for r in (1, 2):
        c = base.copy()
        c["doc_id"] = c["doc_id"] + 1_000_000 * r
        copies.append(c)
    tripled = spark.createDataFrame(pd.concat(copies, ignore_index=True))
    single = spark.createDataFrame(base)
    kept3 = sorted(r.doc_id for r in dedup.near_dedup_minhash(tripled, threshold=THRESHOLD).collect())
    kept1 = sorted(r.doc_id for r in dedup.near_dedup_minhash(single, threshold=THRESHOLD).collect())
    assert kept3 == kept1
    kept3c = sorted(r.doc_id for r in dedup.near_dedup_clustered(tripled, threshold=THRESHOLD).collect())
    kept1c = sorted(r.doc_id for r in dedup.near_dedup_clustered(single, threshold=THRESHOLD).collect())
    assert kept3c == kept1c


def test_near_dedup_null_texts_untouched(spark):
    rows = [(1, "alpha beta gamma delta"), (2, None), (3, None),
            (4, "alpha beta gamma delta")]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r.doc_id for r in dedup.near_dedup_minhash(sdf, threshold=0.7).collect())
    # identical texts dedup to min id; NULL texts produce identical
    # [NULL]-shingle hash sets, so they dedup together too — same as the
    # pre-collapse pipeline (xxhash64(NULL) is a constant, not NULL)
    assert kept == [1, 2]


def test_connected_components_driver_and_distributed_paths_agree(spark):
    """The driver-side union-find shortcut and the distributed min-label
    propagation must label identically (driver_threshold=0 forces the
    distributed path)."""
    import pandas as pd

    rng = __import__("numpy").random.default_rng(5)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 200, (300, 2)) if a != b]
    pairs = spark.createDataFrame(pd.DataFrame(edges, columns=["id_a", "id_b"]))
    fast = {
        r["id"]: r["component"]
        for r in dedup.connected_components(pairs).collect()
    }
    dist = {
        r["id"]: r["component"]
        for r in dedup.connected_components(pairs, driver_threshold=0).collect()
    }
    assert fast == dist and len(fast) > 0


def test_band_count_must_divide_num_hashes(spark):
    """A non-divisible (num_hashes, bands) combo must fail at plan time
    with a clear error, not an opaque numpy reshape failure inside the
    Arrow UDF (ADVICE r2)."""
    sdf = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="must divide"):
        dedup.minhash_band_hashes_arrow(num_hashes=64, bands=12)
    with pytest.raises(ValueError, match="must divide"):
        dedup.minhash_lsh_candidates(sdf, num_hashes=64, bands=12).collect()


def test_exact_collapse_null_texts_share_one_representative(spark):
    """NULL texts must collapse to ONE representative pre-pairing (shared
    sentinel key): per-id keys would leave a NULL-heavy corpus sharing
    every LSH bucket — the O(n²) blowup the collapse exists to prevent
    (ADVICE r2).  End-to-end dedup semantics are unchanged (NULLs dedup
    together either way, test_near_dedup_null_texts_untouched)."""
    rows = [(1, "alpha beta gamma"), (2, None), (3, None), (4, None)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    tagged, reps = dedup._exact_collapse(sdf, "text", "doc_id")
    t = {r["doc_id"]: r["__rep"] for r in tagged.collect()}
    assert t == {1: 1, 2: 2, 3: 2, 4: 2}
    assert sorted(r["doc_id"] for r in reps.collect()) == [1, 2]
    kept = sorted(
        r.doc_id for r in dedup.near_dedup_minhash(sdf, threshold=0.7).collect()
    )
    assert kept == [1, 2]


def test_release_barriers_frees_cache_blocks(spark):
    """Barrier persists are tracked and released by release_barriers()
    (ADVICE r2: repeated pipeline runs in a long-lived session used to
    pin DISK_ONLY blocks forever)."""
    dedup.release_barriers()  # drain anything left by earlier tests
    sdf = spark.createDataFrame(
        [(i, f"doc {i} words alpha beta") for i in range(20)],
        "doc_id long, text string",
    )
    sh = dedup.shingle_sets(sdf)
    sh.count()
    assert len(dedup._BARRIER_REGISTRY) >= 1
    assert sh.storageLevel.useDisk
    released = dedup.release_barriers()
    assert released >= 1
    assert dedup._BARRIER_REGISTRY == []
    assert not sh.storageLevel.useDisk  # blocks actually freed
    # idempotent
    assert dedup.release_barriers() == 0


def test_decontaminate_drops_benchmark_overlap(spark):
    """Docs sharing an 8-gram with the benchmark are dropped; clean docs
    survive; the audit frame counts the shared n-grams; short docs whose
    whole text is under n tokens only match on full-text equality."""
    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            # embeds the benchmark sentence verbatim → contaminated
            (1, "intro words " + bench_text + " trailing words"),
            # clean: same vocabulary, different order/content
            (2, "fox dog lazy brown the quick words other entirely here"),
            (3, "completely unrelated text about formula one telemetry data"),
            # exact copy of the benchmark line → contaminated
            (4, bench_text),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")

    kept = dedup.decontaminate(docs, bench, shingle_n=8)
    assert sorted(r.doc_id for r in kept.select("doc_id").collect()) == [2, 3]

    audit = dedup.contamination_hits(docs, bench, shingle_n=8).toPandas()
    audit = audit.set_index("doc_id")["n_contaminated_ngrams"]
    # 10-token benchmark → 3 eight-grams; doc 4 shares all 3
    assert audit.loc[4] == 3
    assert audit.loc[1] == 3
    assert 2 not in audit.index and 3 not in audit.index

    # benchmark side must broadcast (training side never shuffles on it)
    plan = (
        dedup.contamination_hits(docs, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_redact_pii_and_counts(spark):
    from bigdataproject_formula1_telemetry_spark.operators import text as T

    rows = [
        (1, "contact me at jane.doe+x@example.co.uk or 192.168.0.1 soon"),
        (2, "call +1 (415) 555-0199 today"),
        (3, "no pii here at all"),
        (4, "two mails: a@b.io c@d.org and 10.0.0.255"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id",
        T.redact_pii(F.col("text")).alias("clean"),
        T.pii_counts(F.col("text")).alias("c"),
    ).toPandas().set_index("doc_id")
    assert "<EMAIL>" in out.loc[1, "clean"] and "<IP>" in out.loc[1, "clean"]
    assert "jane" not in out.loc[1, "clean"]
    assert "<PHONE>" in out.loc[2, "clean"] and "555" not in out.loc[2, "clean"]
    assert out.loc[3, "clean"] == "no pii here at all"
    assert out.loc[4, "clean"].count("<EMAIL>") == 2
    assert out.loc[1, "c"]["email"] == 1 and out.loc[1, "c"]["ipv4"] == 1
    assert out.loc[2, "c"]["phone"] == 1
    assert out.loc[4, "c"]["email"] == 2 and out.loc[4, "c"]["ipv4"] == 1


def test_repetition_stats_gopher_rules(spark):
    from bigdataproject_formula1_telemetry_spark.operators import text as T

    boiler = "\n".join(["click here to subscribe now"] * 10)
    clean = "a genuinely varied sentence with many different words in it"
    spam = " ".join(["buy"] * 30)
    df = spark.createDataFrame(
        [(1, boiler), (2, clean), (3, spam), (4, "")],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id", T.repetition_stats(F.col("text")).alias("r")
    ).toPandas().set_index("doc_id")
    assert out.loc[1, "r"]["dup_line_frac"] == 0.9       # 10 lines, 1 distinct
    assert out.loc[1, "r"]["dup_3gram_frac"] > 0.5
    assert out.loc[2, "r"]["dup_line_frac"] == 0.0
    assert out.loc[2, "r"]["dup_3gram_frac"] == 0.0
    assert out.loc[3, "r"]["top_word_frac"] == 1.0       # all the same token
    assert out.loc[4, "r"]["dup_line_frac"] == 0.0
    assert out.loc[4, "r"]["top_word_frac"] == 0.0


def test_duplicate_clusters_and_family_histogram(spark):
    """Every doc gets a cluster label (own id when unique); the family
    histogram accounts for the whole corpus and matches the planted
    family structure (10 triples + singletons)."""
    from bigdataproject_formula1_telemetry_spark import io
    from bigdataproject_formula1_telemetry_spark.operators.dedup import (
        duplicate_clusters,
        duplicate_family_histogram,
        near_dedup_clustered,
    )
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    base = (
        io.read_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .where((F.col("doc_id") >= 100) & (F.col("doc_id") < 140))
    )
    # 10 planted triples: base doc + exact copy + near copy
    head = base.where(F.col("doc_id") < 110)
    corpus = (
        base.unionByName(
            head.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
        ).unionByName(
            head.select(
                (F.col("doc_id") + 2000).alias("doc_id"),
                F.concat_ws(" ", F.col("text"), F.lit("appended")).alias("text"),
            )
        )
    )
    n = corpus.count()
    clusters = duplicate_clusters(corpus).collect()
    assert len(clusters) == n  # every doc labeled exactly once
    label = {r["id"]: r["cluster"] for r in clusters}
    for d in range(100, 110):
        assert label[d] == label[d + 1000] == label[d + 2000] == d
    # survivor semantics: cluster == id set equals near_dedup_clustered
    survivors = {i for i, c in label.items() if i == c}
    batch = {
        r["doc_id"]
        for r in near_dedup_clustered(corpus).select("doc_id").collect()
    }
    assert survivors == batch

    hist = {
        r["family_size"]: r["n_families"]
        for r in duplicate_family_histogram(corpus).collect()
    }
    assert sum(s * k for s, k in hist.items()) == n  # total mass accounted
    assert hist.get(3, 0) >= 10  # the planted triples (>=: corpus may
    # contain its own planted near-dup pairs merging into families)
    assert sum(hist.values()) == len(survivors)


def test_exact_dedup_and_collapse_plans_have_no_window(spark):
    """Hot-key discipline: keeper/representative selection over a
    content hash must be an aggregate + join (splittable under skew),
    never a window over the hash — N copies of one viral/empty page
    would pile into a single unsplittable window partition."""
    from bigdataproject_formula1_telemetry_spark.operators.dedup import (
        _exact_collapse,
        exact_dedup,
    )

    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, None)],
        "doc_id long, text string",
    )
    p1 = exact_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p1
    tagged, reps = _exact_collapse(docs, "text", "doc_id")
    p2 = tagged._jdf.queryExecution().executedPlan().toString()
    p3 = reps._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p2 and "Window" not in p3
    # semantics unchanged: min-id keeper, null texts group together
    assert {r["doc_id"] for r in exact_dedup(docs).collect()} == {1, 3}
    t = {r["doc_id"]: r["__rep"] for r in tagged.collect()}
    assert t == {1: 1, 2: 1, 3: 3}
