"""Deterministic sampling: rate concentration, reproducibility, strata."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark import io
from bigdataproject_formula1_telemetry_spark.operators import sampling
from bigdataproject_formula1_telemetry_spark.operators import text as T_mod
from tests.conftest import SF_SMOKE


def test_rate_and_determinism(spark):
    o = io.read_table(spark, SF_SMOKE, "orders")
    n = o.count()
    s1 = sampling.deterministic_sample(o, ["o_orderkey"], 0.2, salt="a")
    k1 = s1.count()
    assert abs(k1 / n - 0.2) < 0.05
    # identical sample on re-run (no rand())
    k2 = sampling.deterministic_sample(o, ["o_orderkey"], 0.2, salt="a")
    assert (
        s1.select("o_orderkey").subtract(k2.select("o_orderkey")).count() == 0
    )
    # different salt → different (but same-rate) sample
    s3 = sampling.deterministic_sample(o, ["o_orderkey"], 0.2, salt="b")
    overlap = s1.select("o_orderkey").intersect(s3.select("o_orderkey")).count()
    assert overlap < k1  # not the same set


def test_nested_fractions_subset_property(spark):
    """A 10% sample is a subset of the 20% sample (same salt) — the
    threshold gate is monotone, enabling progressive dataset growth."""
    o = io.read_table(spark, SF_SMOKE, "orders")
    s10 = sampling.deterministic_sample(o, ["o_orderkey"], 0.1)
    s20 = sampling.deterministic_sample(o, ["o_orderkey"], 0.2)
    assert s10.select("o_orderkey").subtract(s20.select("o_orderkey")).count() == 0


def test_stratified_rates(spark):
    docs = io.read_table(spark, SF_SMOKE, "documents")
    out = sampling.stratified_sample(
        docs, "lang", {"en": 0.3, "zh": 1.0}, ["doc_id"]
    )
    pdf = out.groupBy("lang").count().toPandas().set_index("lang")["count"]
    base = docs.groupBy("lang").count().toPandas().set_index("lang")["count"]
    assert pdf.get("zh", 0) == base["zh"]  # keep-all stratum
    assert 0.1 < pdf.get("en", 0) / base["en"] < 0.5  # ~30%
    # unlisted strata default to 0
    assert set(pdf.index) <= {"en", "zh"}


def test_sample_by_key_keeps_whole_groups(spark):
    ev = io.read_table(spark, SF_SMOKE, "events")
    kept = sampling.sample_by_key(ev, ["user_id"], 0.3)
    per_user_kept = kept.groupBy("user_id").count()
    per_user_all = ev.groupBy("user_id").count().withColumnRenamed("count", "all")
    j = per_user_kept.join(per_user_all, "user_id").where(
        F.col("count") != F.col("all")
    )
    assert j.count() == 0  # every kept user keeps ALL their events


def test_fraction_one_keeps_every_row(spark):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"id": range(2000)}))
    assert sampling.deterministic_sample(df, ["id"], 1.0).count() == 2000


def test_null_ids_gate_independently(spark):
    """Null-id rows must not share one all-or-nothing gate decision: with
    a second non-null id column varying, ~frac of null-id rows survive."""
    import pandas as pd

    pdf = pd.DataFrame({"a": [None] * 1000, "b": range(1000)})
    df = spark.createDataFrame(pdf)
    n = sampling.deterministic_sample(df, ["a", "b"], 0.5).count()
    assert 350 < n < 650, n
    # all id columns null: same single gate per distinct identity, but the
    # sentinel makes the decision deterministic, not dependent on frac of
    # the OTHER columns' hash  (documented contract)
    pdf2 = pd.DataFrame({"a": [None] * 10, "b": [None] * 10})
    df2 = spark.createDataFrame(pdf2, schema="a string, b string")
    k = sampling.deterministic_sample(df2, ["a", "b"], 0.5).count()
    assert k in (0, 10)


def test_chunk_documents_reconstruction_and_overlap(spark):
    """Chunking invariants: stride-concatenation reconstructs the token
    stream exactly; with overlap, each chunk's head repeats the previous
    chunk's tail; empty docs yield no chunks; plan stays shuffle-free."""
    from bigdataproject_formula1_telemetry_spark.operators import text as T

    docs = [
        (1, " ".join(f"w{i}" for i in range(300))),
        (2, "one two three"),
        (3, ""),
        (4, None),
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")

    # no-overlap: concatenating chunks in order reproduces the tokens
    flat = (
        T.chunk_documents(sdf, chunk_tokens=128, overlap=0)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    by_doc: dict[int, list[str]] = {}
    for r in flat:
        by_doc.setdefault(r.doc_id, []).extend(r.chunk_text.split(" "))
    assert by_doc[1] == [f"w{i}" for i in range(300)]
    assert by_doc[2] == ["one", "two", "three"]
    assert 3 not in by_doc and 4 not in by_doc
    assert [r.n_tokens for r in flat if r.doc_id == 1] == [128, 128, 44]

    # overlap: chunk i+1's first `overlap` tokens == chunk i's last
    over = (
        T.chunk_documents(sdf.where("doc_id = 1"), chunk_tokens=100, overlap=25)
        .orderBy("chunk_idx")
        .collect()
    )
    for prev, nxt in zip(over, over[1:]):
        ptoks = prev.chunk_text.split(" ")
        ntoks = nxt.chunk_text.split(" ")
        assert ntoks[:25] == ptoks[75:100]

    # narrow transformation: no exchange in the plan
    plan = T.chunk_documents(sdf)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    with pytest.raises(ValueError, match="overlap"):
        T.chunk_documents(sdf, chunk_tokens=10, overlap=10)


def test_chunk_documents_drops_fully_redundant_tail(spark):
    """A final window that adds no tokens beyond the previous chunk's
    overlap region is dropped (n=80, chunk 100/overlap 25 -> stride 75:
    the start-75 window covers only tokens already in chunk 0)."""
    from bigdataproject_formula1_telemetry_spark.operators import text as T

    sdf = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(80)))], "doc_id long, text string"
    )
    out = T.chunk_documents(sdf, chunk_tokens=100, overlap=25).collect()
    assert len(out) == 1 and out[0].n_tokens == 80


def test_pack_sequences_budget_and_occupancy(spark):
    """First-fit-in-order packing: no bin over budget (except a lone
    oversize chunk), ≥50% occupancy when all chunks fit, deterministic
    assignment, independent packing per partition key.  Includes the
    (6,6,6)@10 case that broke a cumsum formulation."""
    from bigdataproject_formula1_telemetry_spark.operators import text as T

    rows = [
        # shard a: the cumsum-breaking case
        ("a", 1, 0, 6), ("a", 1, 1, 6), ("a", 1, 2, 6),
        # shard b: exact fits + an oversize chunk
        ("b", 2, 0, 10), ("b", 2, 1, 4), ("b", 2, 2, 17), ("b", 2, 3, 5),
    ]
    sdf = spark.createDataFrame(
        rows, "shard string, doc_id long, chunk_idx long, n_tokens long"
    )
    out = T.pack_sequences(
        sdf, token_budget=10, partition_by="shard"
    ).toPandas()

    for shard, g in out.groupby("shard"):
        fills = g[~g.oversize].groupby("seq_id")["n_tokens"].sum()
        assert (fills <= 10).all(), (shard, fills)
    a = out[out.shard == "a"].sort_values("chunk_idx")
    assert list(a.seq_id) == [0, 1, 2]  # 6+6 would overflow 10
    b = out[out.shard == "b"].sort_values("chunk_idx")
    # 10 fills bin 0; 4 opens bin 1; oversize 17 monopolizes bin 2; 5 joins... 
    # no: 4 is alone in bin 1 when 17 arrives (4+10>10), so 17 -> bin 2, 5 -> bin 3
    assert list(b.seq_id) == [0, 1, 2, 3]
    assert list(b.oversize) == [False, False, True, False]

    # convenience single-group form packs globally and stays deterministic
    g1 = T.pack_sequences(sdf, token_budget=10).toPandas()
    g2 = T.pack_sequences(sdf, token_budget=10).toPandas()
    key = ["doc_id", "chunk_idx"]
    assert g1.sort_values(key).seq_id.tolist() == g2.sort_values(key).seq_id.tolist()


def test_chunk_pack_shuffle_end_to_end_on_documents(spark):
    """The training-data tail of the pipeline on the real documents
    table: chunk -> pack -> deterministic shuffle.  Invariants: every
    non-empty document is fully represented, no bin over budget, and
    the shuffle is a salt-keyed permutation (same salt = same order,
    new salt = different order, same membership)."""
    from bigdataproject_formula1_telemetry_spark import io
    from bigdataproject_formula1_telemetry_spark.operators import (
        sampling as SA,
        text as T,
    )
    from tests.conftest import SF_SMOKE

    docs = io.read_table(spark, SF_SMOKE, "documents")
    chunks = T.chunk_documents(docs, chunk_tokens=64, overlap=8)
    packed = T.pack_sequences(chunks, token_budget=256)
    pdf = packed.toPandas()

    tok_by_doc = pdf.groupby("doc_id")["n_tokens"].sum()
    src = docs.selectExpr(
        "doc_id", "size(filter(split(trim(text), '\\\\s+'), t -> t != '')) AS n"
    ).toPandas().set_index("doc_id")["n"]
    nonempty = src[src > 0]
    # every non-empty doc appears; chunk tokens >= source tokens (overlap
    # duplicates some), and chunk 0 alone never exceeds source + nothing
    assert set(nonempty.index) == set(tok_by_doc.index)
    assert (tok_by_doc.loc[nonempty.index] >= nonempty).all()
    fills = pdf[~pdf.oversize].groupby("seq_id")["n_tokens"].sum()
    assert (fills <= 256).all()

    key = ["doc_id", "chunk_idx"]
    s1 = SA.deterministic_shuffle(packed, key, salt="ep1").select(*key).toPandas()
    s1b = SA.deterministic_shuffle(packed, key, salt="ep1").select(*key).toPandas()
    s2 = SA.deterministic_shuffle(packed, key, salt="ep2").select(*key).toPandas()
    assert s1.values.tolist() == s1b.values.tolist()
    assert s1.values.tolist() != s2.values.tolist()
    assert sorted(map(tuple, s1.values.tolist())) == sorted(
        map(tuple, s2.values.tolist())
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (rolling hash)
# ---------------------------------------------------------------------------

def _cdc_corpus(spark):
    return (
        io.read_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 40)
    )


def test_cdc_chunks_partition_reconstruction_and_bounds(spark):
    """CDC chunks exactly partition the token stream: reconstruction,
    per-chunk bounds (min..max, final chunk may run short), contiguous
    chunk_idx, deterministic across runs."""
    docs = _cdc_corpus(spark)
    got = T_mod.cdc_chunks(docs, target_tokens=32).toPandas()
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert set(got["doc_id"]) == set(texts)
    for did, grp in got.groupby("doc_id"):
        grp = grp.sort_values("chunk_idx")
        assert list(grp["chunk_idx"]) == list(range(len(grp)))
        toks = texts[did].split()
        assert " ".join(grp["chunk_text"]) == " ".join(toks)
        assert grp["n_tokens"].sum() == len(toks)
        assert (grp["n_tokens"] <= 32 * 4).all()
        assert (grp["n_tokens"].iloc[:-1] >= 8).all()  # min = target/4
    again = T_mod.cdc_chunks(docs, target_tokens=32).toPandas()
    assert got.sort_values(["doc_id", "chunk_idx"])["chunk_hash"].tolist() == \
        again.sort_values(["doc_id", "chunk_idx"])["chunk_hash"].tolist()

    # narrow map stage: the chunker must never shuffle
    plan = (
        T_mod.cdc_chunks(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_cdc_chunks_shift_invariance_vs_fixed_windows(spark):
    """THE property CDC buys: prepending a header re-aligns at the next
    content-defined boundary, so most chunk hashes survive — while
    fixed-window chunking loses every chunk."""
    docs = _cdc_corpus(spark).toPandas()
    shifted = docs.copy()
    shifted["text"] = "breaking news header added today : " + shifted["text"]
    a = T_mod.cdc_chunks(
        spark.createDataFrame(docs), target_tokens=32
    ).toPandas()
    b = T_mod.cdc_chunks(
        spark.createDataFrame(shifted), target_tokens=32
    ).toPandas()
    kept_total, orig_total = 0, 0
    for did, grp in a.groupby("doc_id"):
        if len(grp) < 4:
            continue
        bh = set(b[b["doc_id"] == did]["chunk_hash"])
        kept_total += sum(1 for h in grp["chunk_hash"] if h in bh)
        orig_total += len(grp)
    assert orig_total > 0
    assert kept_total / orig_total >= 0.6, (kept_total, orig_total)

    # fixed windows, same corpus, same per-doc comparison: the 7-token
    # shift misaligns every window, so survival collapses (the synthetic
    # corpus repeats content, so demand ≤ 0.2 rather than exactly 0)
    fa = T_mod.chunk_documents(
        spark.createDataFrame(docs), chunk_tokens=32
    ).withColumn("h", F.xxhash64("chunk_text")).toPandas()
    fb = T_mod.chunk_documents(
        spark.createDataFrame(shifted), chunk_tokens=32
    ).withColumn("h", F.xxhash64("chunk_text")).toPandas()
    f_kept, f_orig = 0, 0
    for did, grp in fa.groupby("doc_id"):
        if len(grp) < 2:
            continue
        bh = set(fb[fb["doc_id"] == did]["h"])
        f_kept += sum(1 for h in grp["h"] if h in bh)
        f_orig += len(grp)
    assert f_orig > 0
    fixed_rate = f_kept / f_orig
    cdc_rate = kept_total / orig_total
    assert fixed_rate <= 0.2, fixed_rate
    assert cdc_rate > fixed_rate + 0.3, (cdc_rate, fixed_rate)


def test_shared_chunk_fraction_detects_partial_duplication(spark):
    """A doc that embeds another doc's full text behind a different
    header scores containment ≈ 1 against it; unrelated docs never pair."""
    docs = _cdc_corpus(spark).toPandas().iloc[:10]
    # embed the longest doc (most chunks → clearest containment signal)
    base_row = docs.loc[docs["text"].str.split().str.len().idxmax()]
    base_text = base_row["text"]
    import pandas as pd

    wrapped = pd.DataFrame(
        {
            "doc_id": [9001],
            "text": ["mirror site banner : " + base_text + " : footer links"],
        }
    )
    corpus = pd.concat([docs, wrapped], ignore_index=True)
    chunks = T_mod.cdc_chunks(spark.createDataFrame(corpus), target_tokens=12)
    pairs = T_mod.shared_chunk_fraction(chunks).toPandas()
    hit = pairs[(pairs["id_a"] == base_row["doc_id"]) & (pairs["id_b"] == 9001)]
    assert len(hit) == 1
    assert hit.iloc[0]["containment"] >= 0.6, hit
    # the synthetic documents corpus is pairwise-unrelated: no other
    # pair shares enough to clear even a lenient containment bar
    others = pairs[(pairs["id_b"] != 9001)]
    assert (others["containment"] < 0.5).all()


def test_cdc_cuts_properties_hypothesis():
    """Property-based hardening of the CDC boundary logic (no Spark):
    cuts exactly partition [0, n); every chunk except the last respects
    [min, max]; the last respects max; determinism; and suffix stability
    — chunking h and a prefix-extended copy agree on all spans after
    their first common cut point."""
    from hypothesis import given, settings, strategies as st

    from bigdataproject_formula1_telemetry_spark.operators.text import _cdc_cuts

    hashes = st.lists(
        st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=400
    )
    params = st.tuples(
        st.integers(min_value=2, max_value=64),   # target
        st.integers(min_value=1, max_value=8),    # window
    )

    @settings(max_examples=150, deadline=None)
    @given(hashes, params)
    def check(hs, p):
        target, window = p
        min_t = max(1, target // 4)
        max_t = target * 4
        h = np.asarray(hs, dtype=np.uint64)
        # uint64 wraparound is the intended hash semantics and must be
        # silenced at the source (np.errstate), never leak as a warning
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            spans = _cdc_cuts(h, target, min_t, max_t, window)
        # exact partition
        assert [s for s, _ in spans] == (
            [0] + [e for _, e in spans[:-1]] if spans else []
        )
        assert (spans[-1][1] if spans else 0) == len(h)
        # bounds
        for i, (s, e) in enumerate(spans):
            assert e > s
            assert e - s <= max_t
            if i < len(spans) - 1:
                assert e - s >= min_t
        # determinism
        assert spans == _cdc_cuts(h, target, min_t, max_t, window)
        # suffix stability: prepend `window + max_t` items — after the
        # first cut at identical content offset, spans must coincide
        if len(h) > 2 * max_t:
            pre = np.arange(window + max_t, dtype=np.uint64) * np.uint64(7919)
            h2 = np.concatenate([pre, h])
            off = len(pre)
            s2 = {(s - off, e - off) for s, e in _cdc_cuts(h2, target, min_t, max_t, window)}
            s1 = set(spans)
            shared = s1 & s2
            if shared:
                first_shared_end = min(e for _, e in shared)
                tail1 = {(s, e) for s, e in s1 if s >= first_shared_end}
                tail2 = {(s, e) for s, e in s2 if s >= first_shared_end}
                assert tail1 == tail2

    check()


def test_score_weighted_sample(spark):
    from tests.conftest import SF_CORRECT
    from bigdataproject_formula1_telemetry_spark import io
    from bigdataproject_formula1_telemetry_spark.operators.sampling import (
        score_weighted_sample,
    )

    docs = io.read_table(spark, SF_CORRECT, "documents")  # 500 rows
    n = docs.count()
    out = score_weighted_sample(docs, "n_chars", ["doc_id"], 0.4)
    kept = out.count()
    assert abs(kept - 0.4 * n) <= 3 * (0.4 * 0.6 * n) ** 0.5 + 5
    # soft preference: high-score rows keep at a higher realized rate
    med = docs.agg(F.expr("percentile_approx(n_chars, 0.5)")).first()[0]
    hi_rate = out.where(F.col("n_chars") > med).count() / max(
        docs.where(F.col("n_chars") > med).count(), 1
    )
    lo_rate = out.where(F.col("n_chars") <= med).count() / max(
        docs.where(F.col("n_chars") <= med).count(), 1
    )
    assert hi_rate > lo_rate
    # deterministic under repartitioning
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in score_weighted_sample(
            docs.repartition(13), "n_chars", ["doc_id"], 0.4
        ).collect()
    )
    assert a == b
    # target_fraction=1 keeps every positive-score row
    assert score_weighted_sample(docs, "n_chars", ["doc_id"], 1.0).count() == n
    # NULL / non-positive scores never survive
    bad = spark.createDataFrame(
        [(1, None), (2, -5.0), (3, 0.0), (4, 10.0)],
        schema="doc_id long, s double",
    )
    kept_bad = {
        r["doc_id"]
        for r in score_weighted_sample(bad, "s", ["doc_id"], 1.0).collect()
    }
    assert kept_bad == {4}


def test_score_weighted_sample_sizing_is_one_scan(spark):
    """Sizing c must cost ONE aggregate over the corpus (a quantile
    sketch bisected driver-side) — not one full aggregate per bisection
    round (up to 21 scans in the earlier revision).  Job count is the
    observable: one aggregate is at most 2 jobs under AQE (map stage +
    result stage); the per-round form was 40+."""
    from tests.conftest import SF_CORRECT
    from bigdataproject_formula1_telemetry_spark import io
    from bigdataproject_formula1_telemetry_spark.operators.sampling import (
        score_weighted_sample,
    )

    docs = io.read_table(spark, SF_CORRECT, "documents")
    sc = spark.sparkContext
    group = "sws-sizing-probe"
    sc.setJobGroup(group, "score_weighted_sample sizing")
    try:
        score_weighted_sample(docs, "n_chars", ["doc_id"], 0.4)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    assert 1 <= len(jobs) <= 3, jobs


def test_score_weighted_sample_heavy_tail_brackets(spark):
    """The ADVICE counterexamples: heavy-tailed scores where the old
    `10·n/Σs` upper bound failed to bracket the solve and the sampler
    silently kept ~0.1% at a 90% target.  The `1/min_positive` bound
    caps every row, so the bisection always brackets."""
    import numpy as np
    from bigdataproject_formula1_telemetry_spark.operators.sampling import (
        score_weighted_sample,
    )

    # one huge score dominating the sum
    rows = [(0, 1e6)] + [(i, 1e-6) for i in range(1, 1000)]
    df = spark.createDataFrame(rows, schema="doc_id long, s double")
    kept = score_weighted_sample(df, "s", ["doc_id"], 0.9).count()
    assert abs(kept - 900) <= 4 * (900 * 0.1) ** 0.5 + 2, kept

    # Pareto(0.7)-style tail
    rng = np.random.default_rng(7)
    scores = (1.0 / rng.random(2000)) ** (1 / 0.7)
    df2 = spark.createDataFrame(
        [(int(i), float(s)) for i, s in enumerate(scores)],
        schema="doc_id long, s double",
    )
    kept2 = score_weighted_sample(df2, "s", ["doc_id"], 0.5).count()
    assert abs(kept2 - 1000) <= 4 * (1000 * 0.5) ** 0.5 + 2, kept2


def test_assign_split_partition_properties(spark):
    from tests.conftest import SF_CORRECT
    from bigdataproject_formula1_telemetry_spark import io
    from bigdataproject_formula1_telemetry_spark.operators.sampling import (
        assign_split,
    )

    docs = io.read_table(spark, SF_CORRECT, "documents")
    n = docs.count()
    fr = {"val": 0.1, "test": 0.1, "train": 0.8}
    out = assign_split(docs, ["doc_id"], fr)
    sizes = {r["split"]: r["c"] for r in
             out.groupBy("split").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert set(sizes) <= set(fr) and sum(sizes.values()) == n
    for name, f in fr.items():
        exp = f * n
        assert abs(sizes.get(name, 0) - exp) <= 4 * (exp * (1 - f)) ** 0.5 + 2
    # deterministic + partitioning-invariant
    a = sorted((r["doc_id"], r["split"]) for r in out.collect())
    b = sorted(
        (r["doc_id"], r["split"])
        for r in assign_split(docs.repartition(13), ["doc_id"], fr).collect()
    )
    assert a == b
    import pytest as _pt
    with _pt.raises(ValueError, match="sum to 1"):
        assign_split(docs, ["doc_id"], {"a": 0.5, "b": 0.4})
    with _pt.raises(ValueError, match="at least one"):
        assign_split(docs, ["doc_id"], {})


def test_leakage_free_split_colocates_duplicate_families(spark):
    from tests.conftest import SF_SMOKE
    from bigdataproject_formula1_telemetry_spark import io
    from bigdataproject_formula1_telemetry_spark.operators.sampling import (
        leakage_free_split,
    )

    base = (
        io.read_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 40)
    )
    # plant exact copies AND near-copies (appended token) of every doc
    copies = base.select(
        (F.col("doc_id") + 1000).alias("doc_id"), F.col("text")
    )
    nears = base.select(
        (F.col("doc_id") + 2000).alias("doc_id"),
        F.concat_ws(" ", F.col("text"), F.lit("appended")).alias("text"),
    )
    corpus = base.unionByName(copies).unionByName(nears)
    out = leakage_free_split(
        corpus, {"val": 0.3, "train": 0.7}
    ).collect()
    split_of = {r["doc_id"]: r["split"] for r in out}
    assert len(split_of) == corpus.count()
    # every family (base, +1000 copy, +2000 near-copy) in ONE split
    for d in range(40):
        fam = {split_of[d], split_of[d + 1000], split_of[d + 2000]}
        assert len(fam) == 1, (d, fam)
    # both splits are non-trivially populated at 30/70 over 40 families
    from collections import Counter
    c = Counter(split_of.values())
    assert c["val"] > 0 and c["train"] > 0


def test_pack_sequences_bfd_beats_first_fit_occupancy(spark):
    """BFD packs tighter than first-fit-in-order on adversarial sizes,
    honors the budget, and sorts ties deterministically."""
    from bigdataproject_formula1_telemetry_spark.operators import text as T

    # first-fit on this order wastes half of every bin (7,4 pairs);
    # BFD pairs 7s with 3s and 4s with each other
    rows = []
    for i, s in enumerate([7, 4] * 20 + [3] * 20):
        rows.append(("a", i, 0, s))
    sdf = spark.createDataFrame(
        rows, "shard string, doc_id long, chunk_idx long, n_tokens long"
    )

    def occupancy(strategy):
        out = T.pack_sequences(
            sdf, token_budget=10, partition_by="shard", strategy=strategy
        ).toPandas()
        fills = out[~out.oversize].groupby("seq_id")["n_tokens"].sum()
        assert (fills <= 10).all()
        return fills.mean() / 10.0, out

    ff_occ, _ = occupancy("first_fit")
    bfd_occ, bfd_out = occupancy("best_fit_decreasing")
    assert bfd_occ > ff_occ
    # exact BFD outcome on this mix: 20 full (7+3) bins + 10 (4+4) bins
    # = 280 tokens / 30 bins = 0.9333…
    assert abs(bfd_occ - 280 / 300) < 1e-9
    # deterministic
    again = T.pack_sequences(
        sdf, token_budget=10, partition_by="shard",
        strategy="best_fit_decreasing",
    ).toPandas()
    assert bfd_out.sort_values("doc_id")["seq_id"].tolist() == \
        again.sort_values("doc_id")["seq_id"].tolist()
    import pytest as _pt
    with _pt.raises(ValueError, match="strategy"):
        T.pack_sequences(sdf, strategy="bogus")
