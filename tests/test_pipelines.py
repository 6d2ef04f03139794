"""ETL pipeline tests on reference-shaped telemetry fixtures: warehouse
build invariants, lap-dataset rules (107%, compound encoding), pace
features, and the §5 audit as real asserts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.plans import pipelines as P
from bigdataproject_formula1_telemetry_spark import schemas
from tests import fixtures


@pytest.fixture(scope="module")
def bronze(spark):
    pdf = fixtures.gen_telemetry_raw()
    return spark.createDataFrame(pdf, schema=schemas.TELEMETRY_RAW)


@pytest.fixture(scope="module")
def warehouse(spark, bronze):
    df = P.build_warehouse(bronze)
    df = df.localCheckpoint()  # computed once, reused across tests
    return df


def test_warehouse_grid_and_schema(warehouse):
    pdf = warehouse.toPandas()
    assert len(pdf) > 0
    # exact 10 m grid from 0
    assert (np.mod(pdf["Distance"].to_numpy(), 10.0) == 0).all()
    per_lap_min = pdf.groupby(["Year", "Round", "Driver", "LapNumber"])["Distance"].min()
    assert (per_lap_min == 0.0).all()
    # float32 channels per the reference downcast
    assert str(pdf["Speed"].dtype) == "float32"
    assert str(pdf["Distance"].dtype) == "float32"


def test_warehouse_guards(warehouse):
    pdf = warehouse.toPandas()
    # the short-sampled lap (driver 1, lap 5) and short-extent lap
    # (driver 16, lap 6) must be gone
    assert len(pdf[(pdf["Driver"] == 1) & (pdf["LapNumber"] == 5)]) == 0
    assert len(pdf[(pdf["Driver"] == 16) & (pdf["LapNumber"] == 6)]) == 0
    # every surviving lap reaches at least 2000 m
    ext = pdf.groupby(["Year", "Round", "Driver", "LapNumber"])["Distance"].max()
    assert (ext >= 2000.0 - 10.0).all()


def test_warehouse_laptime_constant_per_lap(warehouse):
    pdf = warehouse.toPandas()
    g = pdf.groupby(["Year", "Round", "Driver", "LapNumber"])["LapTime_Sec"]
    assert (g.nunique() == 1).all()
    assert (g.first() > 0).all()


def test_lap_dataset_rules(warehouse):
    laps = P.build_lap_dataset(warehouse).toPandas()
    assert len(laps) > 0
    # >50 s rule
    assert (laps["LapTime_Sec"] > 50).all()
    # 107% rule holds against the surviving group minima (and the known
    # 1.2x outlier lap is gone)
    grp_min = laps.groupby(["Year", "Round"])["LapTime_Sec"].transform("min")
    assert (laps["LapTime_Sec"] <= 1.07 * grp_min + 1e-9).all()
    # compound encoding: only known compounds, lowercase normalized
    assert set(laps["Compound_Encoded"].unique()) <= {1, 2, 3, 4, 5}
    soft = laps[laps["Compound"].str.upper() == "SOFT"]
    assert (soft["Compound_Encoded"] == 1).all()


def test_pace_features(warehouse):
    feats = P.add_pace_features(P.build_lap_dataset(warehouse)).toPandas()
    assert len(feats) > 0
    assert feats["Prev_Pace_Ratio"].notna().all()
    assert (feats["Pace_Ratio"] >= 1.0 - 1e-9).all()
    # lag alignment: within each (Year,Round,Driver) ordered by LapNumber,
    # Prev_Pace_Ratio equals the previous row's Pace_Ratio
    for _, g in feats.groupby(["Year", "Round", "Driver"]):
        g = g.sort_values("LapNumber")
        if len(g) >= 2:
            assert np.allclose(
                g["Prev_Pace_Ratio"].to_numpy()[1:], g["Pace_Ratio"].to_numpy()[:-1]
            )


def test_audit(spark, warehouse):
    meta = spark.createDataFrame(fixtures.gen_race_meta(), schema=schemas.RACE_META)
    audit = P.audit_warehouse(meta, warehouse).toPandas()
    assert len(audit) == 6  # 2 years x 3 planned rounds
    by = audit.set_index(["year", "round"])["status"]
    assert by[(2023, 3)] == "MISSING"
    assert by[(2024, 3)] == "MISSING"
    # collected rounds have 4 drivers < 15 → INCOMPLETE (by design)
    assert by[(2023, 1)] == "INCOMPLETE"
    rows = audit.set_index(["year", "round"])["n_rows"]
    assert rows[(2023, 3)] == 0 and rows[(2023, 1)] > 0


def test_partitioned_roundtrip(spark, warehouse, tmp_path):
    """S9/S10/S11: partitioned write → partition-pruned read."""
    from bigdataproject_formula1_telemetry_spark import io

    root = str(tmp_path / "wh")
    io.write_partitioned(warehouse, root, ("Year", "Round"))
    back = spark.read.parquet(root)
    assert back.count() == warehouse.count()
    one = io.read_partition(spark, root, Year=2023, Round=1)
    expected = warehouse.where((F.col("Year") == 2023) & (F.col("Round") == 1))
    assert one.count() == expected.count()
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition pruning reached the scan
    assert "PartitionFilters: [" in plan


def test_warehouse_mode_parity(spark, bronze, warehouse):
    """partition-mode (repartition+mapInPandas) and grouped-mode
    (applyInPandas) warehouses must be row-identical — same kernel, only
    the Arrow batching differs."""
    grouped = P.build_warehouse(bronze, mode="grouped").toPandas()
    part = warehouse.toPandas()  # module fixture uses the default (partition)
    key = ["Year", "Round", "Driver", "LapNumber", "Distance"]
    grouped = grouped.sort_values(key).reset_index(drop=True)
    part = part.sort_values(key).reset_index(drop=True)
    assert list(grouped.columns) == list(part.columns)
    assert grouped.equals(part), "mode outputs diverge"


def test_warehouse_mode_validation(bronze):
    with pytest.raises(ValueError, match="mode"):
        P.build_warehouse(bronze, mode="bogus")


def test_curate_documents_end_to_end(spark):
    """Composed curation tail (dedup → chunk → pack → shuffle) on the
    documents table: survivors' chunks all present, no non-oversize bin
    over budget, packing sharded (not single-task), epoch shuffle is a
    salt-keyed permutation."""
    from bigdataproject_formula1_telemetry_spark import io
    from bigdataproject_formula1_telemetry_spark.operators import dedup as D
    from tests.conftest import SF_SMOKE

    docs = io.read_table(spark, SF_SMOKE, "documents")
    out = P.curate_documents(
        docs, chunk_tokens=64, overlap=8, token_budget=256, n_pack_shards=4
    )
    pdf = out.toPandas()

    kept_ids = {
        r.doc_id for r in D.near_dedup_minhash(docs).select("doc_id").collect()
    }
    n_tok = docs.selectExpr(
        "doc_id", "size(filter(split(trim(text), '\\\\s+'), t -> t != '')) AS n"
    ).toPandas().set_index("doc_id")["n"]
    nonempty_kept = {i for i in kept_ids if n_tok.get(i, 0) > 0}
    assert set(pdf.doc_id) == nonempty_kept

    fills = pdf[~pdf.oversize].groupby(["pack_shard", "seq_id"])["n_tokens"].sum()
    assert (fills <= 256).all()
    assert pdf.pack_shard.nunique() > 1  # sharded packing, not one task

    key = ["doc_id", "chunk_idx"]
    again = P.curate_documents(
        docs, chunk_tokens=64, overlap=8, token_budget=256, n_pack_shards=4
    ).toPandas()
    assert pdf[key].values.tolist() == again[key].values.tolist()
    other = P.curate_documents(
        docs, chunk_tokens=64, overlap=8, token_budget=256, n_pack_shards=4,
        epoch_salt="epoch1",
    ).toPandas()
    assert pdf[key].values.tolist() != other[key].values.tolist()
    assert sorted(map(tuple, pdf[key].values)) == sorted(map(tuple, other[key].values))


def test_curate_documents_with_all_gates(spark):
    """The composed pipeline with every optional gate on: repetitive
    boilerplate filtered, benchmark-contaminated docs dropped, PII
    scrubbed before chunking (no chunk carries the raw email)."""
    from bigdataproject_formula1_telemetry_spark.plans import pipelines as P

    bench_text = "what is the capital of france paris is the answer here"
    docs = spark.createDataFrame(
        [
            (1, "a perfectly ordinary document with enough distinct words "
                "to chunk and keep around for training purposes today"),
            (2, "\n".join(["subscribe to our newsletter now"] * 8)),
            (3, "leading text " + bench_text + " trailing text"),
            (4, "reach me at someone@example.com for more information and "
                "details about the varied topics discussed in this text"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(9, bench_text)], "doc_id long, text string")
    out = P.curate_documents(
        docs,
        chunk_tokens=8,
        overlap=0,
        token_budget=32,
        benchmark=bench,
        redact=True,
        max_dup_line_frac=0.3,
    ).toPandas()
    kept_ids = set(out["doc_id"])
    assert kept_ids == {1, 4}          # 2 = boilerplate, 3 = contaminated
    joined = " ".join(out[out["doc_id"] == 4]["chunk_text"])
    assert "someone@example.com" not in joined
    assert "<EMAIL>" in joined


def test_corpus_card(spark, tmp_path):
    from tests.conftest import SF_SMOKE
    from bigdataproject_formula1_telemetry_spark import io, sinks
    from bigdataproject_formula1_telemetry_spark.plans import pipelines

    docs = io.read_table(spark, SF_SMOKE, "documents")
    card = pipelines.corpus_card(docs)
    rows = {(r["section"], r["key"]): r["value"] for r in card.collect()}
    n = docs.count()
    assert rows[("size", "docs")] == float(n)
    assert rows[("size", "tokens")] > 0 and rows[("size", "chars")] > 0
    # quantiles ordered, ppl present and positive
    assert rows[("quality", "q_p10")] <= rows[("quality", "q_p50")] <= rows[("quality", "q_p90")]
    assert 0 < rows[("quality", "ppl_p10")] <= rows[("quality", "ppl_p50")] <= rows[("quality", "ppl_p90")]
    # synthetic corpus has no exact dups: approx fraction ~0 (2% HLL band)
    assert abs(rows[("dup", "exact_dup_frac_approx")]) <= 0.05
    # lang breakdown sums to the doc count
    langs = {k: v for (s, k), v in rows.items() if s == "lang"}
    assert sum(langs.values()) == float(n)
    # feeds the report sink (already-reduced by construction)
    out = str(tmp_path / "card.html")
    assert sinks.write_html_report(card, out, "corpus card") == len(rows)
    assert "corpus card" in open(out).read()
    # contamination section: benchmark sampled from the corpus itself →
    # both audit counters must see at least those docs
    bench = docs.orderBy("doc_id").limit(3)
    card2 = pipelines.corpus_card(docs, benchmark=bench)
    rows2 = {(r["section"], r["key"]): r["value"] for r in card2.collect()}
    assert rows2[("contamination", "contam_ngram_docs")] >= 3
    assert rows2[("contamination", "contam_semantic_docs")] >= 3


def test_write_training_shards(spark, tmp_path):
    from tests.conftest import SF_SMOKE
    from bigdataproject_formula1_telemetry_spark import io
    from bigdataproject_formula1_telemetry_spark.plans import pipelines
    from pyspark.sql import functions as F

    docs = io.read_table(spark, SF_SMOKE, "documents")
    packed = pipelines.curate_documents(docs, n_pack_shards=4)
    out = str(tmp_path / "shards")
    manifest = pipelines.write_training_shards(packed, out)
    rows = {r["pack_shard"]: r for r in manifest.collect()}
    assert set(rows) == {0, 1, 2, 3}
    # manifest accounting matches the frame itself
    exp = {
        r["pack_shard"]: r
        for r in packed.groupBy("pack_shard")
        .agg(
            F.countDistinct("seq_id").alias("n_sequences"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .collect()
    }
    for k in exp:
        for c in ("n_sequences", "n_chunks", "n_tokens"):
            assert rows[k][c] == exp[k][c], (k, c)
    # one shard reads back partition-pruned and complete
    one = spark.read.parquet(out + "/data").where(F.col("pack_shard") == 2)
    assert one.count() == rows[2]["n_chunks"]
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(pack_shard" in plan


@pytest.mark.slowtier
def test_curate_documents_all_gates_compose(spark):
    """Every published-recipe gate ON at once: the flagship composition
    must still produce a valid packed corpus, and each gate must have
    had an observable effect (strictly fewer docs surviving than the
    gate-free run at the document stage)."""
    from tests.conftest import SF_CORRECT
    from bigdataproject_formula1_telemetry_spark import io
    from bigdataproject_formula1_telemetry_spark.plans import pipelines
    from pyspark.sql import functions as F

    docs = io.read_table(spark, SF_CORRECT, "documents")
    bench = docs.orderBy("doc_id").limit(3)
    base = pipelines.curate_documents(docs)
    full = pipelines.curate_documents(
        docs,
        benchmark=bench,
        semantic_threshold=0.999,
        redact=True,
        max_dup_line_frac=0.9,
        max_ppl=1e9,
        soft_quality=("n_chars", 0.7),
        span_dedup_tokens=40,
        mixture=("lang", 0.5, 300),
    )
    n_base, n_full = base.count(), full.count()
    assert 0 < n_full < n_base
    # the packed output keeps its invariants: budgets respected
    agg = (
        full.groupBy("pack_shard", "seq_id")
        .agg(F.sum("n_tokens").alias("t"), F.max("oversize").alias("ov"))
        .collect()
    )
    assert all(r["t"] <= 1024 or r["ov"] for r in agg)
    # deterministic end to end
    again = pipelines.curate_documents(
        docs,
        benchmark=bench,
        semantic_threshold=0.999,
        redact=True,
        max_dup_line_frac=0.9,
        max_ppl=1e9,
        soft_quality=("n_chars", 0.7),
        span_dedup_tokens=40,
        mixture=("lang", 0.5, 300),
    )
    assert sorted(map(str, full.collect())) == sorted(map(str, again.collect()))


def test_write_training_shards_idempotent(spark, tmp_path):
    """Re-running the delivery step (job retry / re-deploy) must yield a
    byte-identical manifest — overwrite semantics, no append drift."""
    from tests.conftest import SF_SMOKE
    from bigdataproject_formula1_telemetry_spark import io
    from bigdataproject_formula1_telemetry_spark.plans import pipelines

    docs = io.read_table(spark, SF_SMOKE, "documents")
    packed = pipelines.curate_documents(docs, n_pack_shards=4)
    out = str(tmp_path / "shards_idem")
    m1 = sorted(map(str, pipelines.write_training_shards(packed, out).collect()))
    m2 = sorted(map(str, pipelines.write_training_shards(packed, out).collect()))
    assert m1 == m2
    data = spark.read.parquet(out + "/data")
    assert data.count() == packed.count()


def test_corpus_release_manifest_card_consistency(spark, tmp_path):
    """The composed release artifact (curate → shards+manifest → card):
    the card's size section, the manifest totals, and the packed rows
    must all agree — the invariant a training-run consumer checks before
    trusting the shards."""
    from tests.conftest import SF_SMOKE
    from bigdataproject_formula1_telemetry_spark import io

    docs = io.read_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "release")
    res = P.corpus_release(
        docs, out, chunk_tokens=64, overlap=8, token_budget=256,
        n_pack_shards=4,
    )
    manifest = res["manifest"].toPandas()
    card = {
        (r["section"], r["key"]): r["value"] for r in res["card"].collect()
    }
    released = spark.read.parquet(out + "/data")
    n_rows = released.count()
    # three-way agreement: card size rows == manifest totals == data
    assert card[("size", "docs")] == manifest["n_chunks"].sum() == n_rows
    # whitespace-token budgeting: card tokens == manifest token total
    assert card[("size", "tokens")] == manifest["n_tokens"].sum()
    # packing section: sequences counted from the data, occupancy sane
    n_seqs = released.select("pack_shard", "seq_id").distinct().count()
    assert card[("packing", "n_sequences")] == n_seqs == manifest["n_sequences"].sum()
    assert 0.5 <= card[("packing", "occupancy")] <= 1.0
    assert card[("packing", "token_budget")] == 256.0
    # the card ships next to the shards
    import os
    assert os.path.isdir(out + "/card")
    # manifest covers every shard directory that was written
    shard_dirs = {d for d in os.listdir(out + "/data") if d.startswith("pack_shard=")}
    assert len(shard_dirs) == len(manifest)


def test_corpus_release_with_benchmark_contamination_section(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "a perfectly ordinary document with enough distinct words "
                "to chunk and keep around for training purposes today"),
            (2, "totally different content about other things entirely with "
                "many additional words to survive chunk level filtering"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "unrelated benchmark question text")], "doc_id long, text string"
    )
    res = P.corpus_release(
        docs, str(tmp_path / "rel2"), benchmark=bench,
        chunk_tokens=8, overlap=0, token_budget=32, n_pack_shards=2,
    )
    card = {
        (r["section"], r["key"]): r["value"] for r in res["card"].collect()
    }
    # decontaminated upstream → the released corpus audits clean
    assert card[("contamination", "contam_ngram_docs")] == 0.0


def test_curate_documents_against_materialized_index(spark, tmp_path):
    """The steady-state curation shape: minhash_index_path drops docs
    the materialized corpus state already holds, on top of the batch
    self-dedup."""
    from tests.conftest import SF_SMOKE
    from bigdataproject_formula1_telemetry_spark import io
    from bigdataproject_formula1_telemetry_spark.operators import (
        minhash_index as MI,
    )

    base = (
        io.read_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 30)
    )
    idx = str(tmp_path / "curate_idx")
    MI.build_minhash_index(base, idx)
    indexed_row = base.orderBy("doc_id").first()
    batch = spark.createDataFrame(
        [
            (5001, indexed_row["text"]),                      # in the index -> drop
            (5002, "a brand new never indexed document with plenty of "
                   "distinct words to chunk for training"),
        ],
        "doc_id long, text string",
    )
    out = P.curate_documents(
        batch, chunk_tokens=8, overlap=0, token_budget=32, n_pack_shards=2,
        minhash_index_path=idx,
    ).toPandas()
    assert set(out["doc_id"]) == {5002}
    # without the index path, both survive (no self-dup between them)
    out2 = P.curate_documents(
        batch, chunk_tokens=8, overlap=0, token_budget=32, n_pack_shards=2,
    ).toPandas()
    assert set(out2["doc_id"]) == {5001, 5002}


def test_corpus_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "gamma text"), (4, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text CHANGED"), (4, None), (5, "fresh")],
        "doc_id long, text string",
    )
    got = {r["id"]: r["change"] for r in P.corpus_diff(old, new).collect()}
    assert got == {
        1: "unchanged", 2: "modified", 3: "removed", 4: "unchanged",
        5: "added",
    }


def test_corpus_release_provenance_config(spark, tmp_path):
    """The release ships its curation config and the card carries the
    config hash: same kwargs → same hash, changed kwargs → changed."""
    import json

    docs = spark.createDataFrame(
        [(i, f"document number {i} with several words to chunk and pack "
             f"plus unique token u{i}") for i in range(8)],
        "doc_id long, text string",
    )
    kw = dict(chunk_tokens=8, overlap=0, token_budget=32, n_pack_shards=2)
    r1 = P.corpus_release(docs, str(tmp_path / "p1"), **kw)
    r2 = P.corpus_release(docs, str(tmp_path / "p2"), **kw)
    r3 = P.corpus_release(
        docs, str(tmp_path / "p3"), **{**kw, "token_budget": 64}
    )

    def config_row(p):
        return spark.read.parquet(str(tmp_path / p / "config")).first()

    def card_hash(res):
        keys = [r["key"] for r in res["card"].collect()
                if r["section"] == "provenance"]
        assert len(keys) == 1 and keys[0].startswith("config_md5:")
        return keys[0].split(":", 1)[1]

    c1, c2, c3 = config_row("p1"), config_row("p2"), config_row("p3")
    assert c1["config_md5"] == c2["config_md5"] != c3["config_md5"]
    assert json.loads(c1["config_json"])["token_budget"] == 32
    assert card_hash(r1) == c1["config_md5"]
    assert card_hash(r3) == c3["config_md5"]


def test_curate_documents_blocklist_gate_and_empty_release_guard(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "a clean document with enough words to chunk and keep "
                "around for the training corpus"),
            (2, "this one mentions badword somewhere in its body text "
                "across enough words to chunk"),
        ],
        "doc_id long, text string",
    )
    out = P.curate_documents(
        docs, chunk_tokens=8, overlap=0, token_budget=32, n_pack_shards=2,
        blocklist=(["badword"], "page"),
    ).toPandas()
    assert set(out["doc_id"]) == {1}
    # all-blocked corpus → corpus_release refuses loudly
    import pytest as _pt
    with _pt.raises(ValueError, match="empty release"):
        P.corpus_release(
            docs, str(tmp_path / "empty_rel"),
            chunk_tokens=8, overlap=0, token_budget=32, n_pack_shards=2,
            blocklist=(["badword", "clean", "document"], "page"),
            # 'clean'/'document' also block doc 1 -> nothing survives
        )
    # write-then-verify: the refused release leaves NO root behind (a
    # consumer pointed at the path fails at the path, not mid-read)
    assert not (tmp_path / "empty_rel").exists()


def test_curate_documents_html_main_mode(spark):
    art = ("A long informative body paragraph with plenty of words to "
           "survive both the extractor and the chunker comfortably here.")
    docs = spark.createDataFrame(
        [(1, f'<nav><a href="/">Home</a> <a href="/x">More</a></nav>'
             f"<p>{art}</p>")],
        "doc_id long, text string",
    )
    out = P.curate_documents(
        docs, chunk_tokens=8, overlap=0, token_budget=32, n_pack_shards=2,
        html="main",
    ).toPandas()
    joined = " ".join(out["chunk_text"])
    assert "informative body paragraph" in joined
    assert "Home" not in joined  # nav dropped structurally


def test_curate_documents_gopher_gate(spark):
    long_good = " ".join(
        ["the quick brown fox and that lazy dog have wandered off with"] * 6
    )
    docs = spark.createDataFrame(
        [
            (1, long_good),
            (2, " ".join(str(i) for i in range(80))),  # numeric: fails alpha rule
        ],
        "doc_id long, text string",
    )
    out = P.curate_documents(
        docs, chunk_tokens=8, overlap=0, token_budget=32, n_pack_shards=2,
        gopher=True,
    ).toPandas()
    assert set(out["doc_id"]) == {1}
    # threshold overrides flow through
    out2 = P.curate_documents(
        docs, chunk_tokens=8, overlap=0, token_budget=32, n_pack_shards=2,
        gopher={"min_alpha_word_frac": 0.0, "min_stopword_hits": 0,
                "min_mean_word_len": 0.0},
    ).toPandas()
    assert set(out2["doc_id"]) == {1, 2}


def test_curate_documents_fineweb_gate(spark):
    good = "\n".join(
        ["A properly terminated sentence of reasonable length sits here."] * 4
    )
    unpunct = "\n".join(
        ["a line of decent length with no terminal punctuation at all"] * 4
    )
    docs = spark.createDataFrame(
        [(1, good), (2, unpunct)], "doc_id long, text string"
    )
    out = P.curate_documents(
        docs, chunk_tokens=8, overlap=0, token_budget=32, n_pack_shards=2,
        fineweb={"max_dup_line_char_frac": 1.0},  # the good doc repeats lines
    ).toPandas()
    assert set(out["doc_id"]) == {1}


@pytest.mark.slowtier
def test_web_curation_preset_end_to_end(spark):
    """The reference web preset runs end-to-end on a synthetic crawl:
    the article-shaped page survives every published gate, nav-only and
    word-salad pages do not."""
    art_sent = ("The quick brown fox and that lazy dog have wandered off "
                "with great purpose to explore the wide golden field of "
                "wheat because adventure is rewarding for everyone involved.")
    article = "".join(f"<p>Paragraph {i}: {art_sent}</p>" for i in range(4))
    pages = [
        (1, f'<nav><a href="/">Home</a> <a href="/a">About</a></nav>{article}'),
        (2, '<nav><a href="/">Home</a> <a href="/b">More</a> '
            '<a href="/c">Links</a></nav>'),                     # nav only
        (3, "<p>" + " ".join(f"tok{i}" for i in range(120)) + ".</p>"),  # no stopwords
    ]
    docs = spark.createDataFrame(pages, "doc_id long, text string")
    kw = P.web_curation_kwargs()
    out = P.curate_documents(
        docs, chunk_tokens=16, overlap=0, token_budget=64, n_pack_shards=2,
        **kw,
    ).toPandas()
    assert set(out["doc_id"]) == {1}
    joined = " ".join(out["chunk_text"])
    assert "Home" not in joined  # nav structurally removed from page 1 too
    # the preset is provenance-serializable (json round trip)
    import json
    assert json.loads(json.dumps(kw, default=str))


def test_curate_documents_semdedup_gate(spark):
    """The SemDeDup gate drops paraphrase-class near-dups (shared
    vocabulary, different enough shingles to survive MinHash at 0.99)
    while distinct documents survive; int spec self-trains centroids."""
    import pandas as pd
    from bigdataproject_formula1_telemetry_spark.plans import pipelines

    base = (
        "the quick brown fox jumps over the lazy dog near the quiet river "
        "bank while morning light settles on the tall green reeds"
    )
    para = (
        "while morning light settles on the tall green reeds the quick "
        "brown fox jumps over the lazy dog near the quiet river bank"
    )
    distinct = [
        "completely different subject matter about spark query planning",
        "unrelated cooking recipe with flour butter sugar and three eggs",
        "telemetry packets decoded from the udp stream at sixty hertz",
        "astronomy notes on the rings of saturn and icy moons tonight",
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [base, para] + distinct,
        }
    )
    docs = spark.createDataFrame(pdf)

    # MinHash at a high threshold keeps both word-orderings...
    no_gate = pipelines.curate_documents(
        docs, dedup_threshold=0.99, chunk_tokens=64, token_budget=256,
        n_pack_shards=2,
    )
    assert {0, 1} <= set(r.doc_id for r in no_gate.select("doc_id").collect())

    # ...the semdedup gate (order-invariant hashed-BoW cosine) collapses
    # them to one survivor and keeps the distinct docs
    gated = pipelines.curate_documents(
        docs, dedup_threshold=0.99, chunk_tokens=64, token_budget=256,
        n_pack_shards=2, semdedup=(2, 0.95),
    )
    kept = set(r.doc_id for r in gated.select("doc_id").distinct().collect())
    assert len(kept & {0, 1}) == 1
    assert {2, 3, 4, 5} <= kept

    # explicit pre-trained centroids are accepted verbatim
    from bigdataproject_formula1_telemetry_spark.operators import (
        embed as EM, similarity as SIM,
    )

    semb = EM.hashed_embedding(docs, out_col="__semb")
    C = SIM.ivf_centroids(semb, n_clusters=2, id_col="doc_id", vec_col="__semb")
    gated2 = pipelines.curate_documents(
        docs, dedup_threshold=0.99, chunk_tokens=64, token_budget=256,
        n_pack_shards=2, semdedup=(C, 0.95),
    )
    kept2 = set(r.doc_id for r in gated2.select("doc_id").distinct().collect())
    assert kept2 == kept


def test_corpus_card_semantic_dup_section(spark):
    """The dup section's paraphrase-axis twin: word-shuffled copies are
    INVISIBLE to the exact-dup row (different md5) but counted by the
    semantic families row."""
    import numpy as np
    import pandas as pd
    from bigdataproject_formula1_telemetry_spark.operators import (
        embed as EM, similarity as SIM,
    )
    from bigdataproject_formula1_telemetry_spark.plans import pipelines

    rng = np.random.default_rng(103)
    base_docs = [
        " ".join(rng.choice(
            ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lam", "mu"], size=30))
        for _ in range(10)
    ]
    shuffled = []
    for d in base_docs[:5]:
        w = d.split()
        rng.shuffle(w)
        shuffled.append(" ".join(w))
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(15), "text": base_docs + shuffled}
        )
    )
    semb = EM.hashed_embedding(docs, out_col="__semb")
    C = SIM.ivf_centroids(semb, n_clusters=2, id_col="doc_id", vec_col="__semb")
    card = pipelines.corpus_card(
        docs, lang_col=None, semantic=(C, 0.999)
    ).toPandas()
    rows = card.set_index("key")["value"].to_dict()
    # exact row blind to the shuffles; semantic row sees the 5 families
    assert rows["exact_dup_frac_approx"] < 0.05
    assert rows["sem_dup_families"] <= 10
    assert rows["sem_dup_frac"] >= 5 / 15 - 1e-9


@pytest.mark.slowtier
def test_curate_documents_d4_gate(spark):
    """semdedup=(spec, threshold, keep_fraction) = full D4: the
    diversification stage thins the survivors beyond the dedup-only
    gate, and the result is a subset of it."""
    from tests.conftest import SF_SMOKE
    from bigdataproject_formula1_telemetry_spark import io
    from bigdataproject_formula1_telemetry_spark.plans import pipelines

    docs = io.read_table(spark, SF_SMOKE, "documents")
    dd = pipelines.curate_documents(
        docs, chunk_tokens=64, token_budget=256, n_pack_shards=2,
        semdedup=(4, 0.95),
    ).select("doc_id").distinct()
    d4 = pipelines.curate_documents(
        docs, chunk_tokens=64, token_budget=256, n_pack_shards=2,
        semdedup=(4, 0.95, 0.6),
    ).select("doc_id").distinct()
    n_dd, n_d4 = dd.count(), d4.count()
    assert 0 < n_d4 < n_dd
    assert d4.join(dd, "doc_id", "left_anti").count() == 0
    # realized keep near the requested fraction (sketch band)
    assert abs(n_d4 / n_dd - 0.6) < 0.15


def test_curate_normalize_gate_collapses_layout_variants(spark):
    """normalize= runs before every hash: a tab/space-run layout variant
    and an NFC-vs-decomposed variant of one doc must EXACT-dedup down to
    one survivor; without the gate all three survive (the miss the gate
    exists to close).  'jvm' mode collapses layout but not unicode."""
    body = "solid unique caf\u00e9 article body text with many words " * 8
    variants = [
        (1, body),
        (2, body.replace(" ", "\t ", 3) + "  "),      # layout variant
        (3, body.replace("\u00e9", "e\u0301")),      # decomposed accents
        (4, "a completely different second document " * 10),
    ]
    docs = spark.createDataFrame(variants, "doc_id long, text string")
    kw = dict(chunk_tokens=64, overlap=0, token_budget=256, n_pack_shards=2,
              dedup_threshold=0.99)

    plain = P.curate_documents(docs, **kw)
    norm = P.curate_documents(docs, normalize="NFC", **kw)
    # exact near-dup at 0.99: un-normalized variants hash apart on
    # whitespace/accents; normalized they collapse to one survivor + doc 4
    assert set(
        r.doc_id for r in norm.select("doc_id").distinct().collect()
    ) == {1, 4}
    assert len(
        plain.select("doc_id").distinct().collect()
    ) > 2  # the gate is load-bearing

    # 'jvm' mode: layout collapses (doc 2 gone), unicode variant survives
    jvm = P.curate_documents(docs, normalize="jvm", **kw)
    ids = {r.doc_id for r in jvm.select("doc_id").distinct().collect()}
    assert 2 not in ids and 3 in ids and {1, 4} <= ids


def test_contamination_report_mmr_diversifies_evidence(spark):
    """mmr_lambda: a benchmark item whose lexical neighborhood is one
    duplicate family shows the family ONCE plus the distinct near-miss
    behind it, instead of k copies; score stays the doc's BM25
    relevance and the annotation columns survive unchanged."""
    fam = "solar panel efficiency degrades under partial shading conditions"
    docs = spark.createDataFrame(
        [
            (0, fam),
            (1, fam),                      # exact duplicate of 0
            (2, fam + " extra"),           # near-duplicate
            (3, "panel mounting hardware galvanized steel rails shading"),
            (4, "unrelated cooking pasta recipe with garlic and oil"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, "solar panel efficiency shading")], "bench_id long, text string"
    )
    plain = sorted(
        P.contamination_report(docs, bench, k=3, bench_id_col="bench_id").collect(),
        key=lambda r: r["rank"],
    )
    # the duplicate family fills the lexical top ranks
    assert {r["doc_id"] for r in plain[:2]} == {0, 1}
    div = sorted(
        P.contamination_report(docs, bench, k=3, mmr_lambda=0.5, bench_id_col="bench_id").collect(),
        key=lambda r: r["rank"],
    )
    assert [f for f in div[0].asDict()] == [
        "bench_id", "rank", "doc_id", "score", "contam_ngrams", "cos_sim"
    ]
    ids = [r["doc_id"] for r in div]
    assert len(set(ids)) == len(ids) == 3
    # at most one member of the exact-duplicate family in the diverse cut
    assert len({0, 1} & set(ids)) == 1
    # the distinct near-miss (doc 3) makes the cut
    assert 3 in ids
    # score is the BM25 relevance of that doc in the plain pool
    pool = {
        r["doc_id"]: r["score"]
        for r in P.contamination_report(docs, bench, k=5, bench_id_col="bench_id").collect()
    }
    for r in div:
        assert r["score"] == pytest.approx(pool[r["doc_id"]], abs=1e-12)


def test_contamination_report_served_from_bm25_index(
    spark, tmp_path, monkeypatch
):
    """r13 (SCALING r12 residual 1): ``bm25_index_path=`` serves the
    report's retrieval leg from the materialized index — identical
    report end-to-end (plain AND MMR forms), scan-form ``bm25_topk``
    never invoked, and the annotation legs' corpus scan narrowed to the
    report's own rows via a PUSHED isin id filter."""
    import re

    from bigdataproject_formula1_telemetry_spark.operators import (
        bm25_index as BI,
        retrieval as RTmod,
    )

    fam = "solar panel efficiency degrades under partial shading conditions"
    rows = [
        (0, fam),
        (1, fam),
        (2, fam + " extra"),
        (3, "panel mounting hardware galvanized steel rails shading"),
        (4, "unrelated cooking pasta recipe with garlic and oil"),
        (5, "battery storage rounds out solar generation after sunset"),
    ]
    dpath = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        dpath
    )
    docs = spark.read.parquet(dpath)  # parquet-backed: pushdown visible
    bench = spark.createDataFrame(
        [(1, "solar panel efficiency shading"), (2, "battery storage solar")],
        "bench_id long, text string",
    )
    idx = str(tmp_path / "bm25idx")
    BI.build_bm25_index(docs, idx, n_buckets=8)

    def _key(rows_):
        return sorted(
            (
                r["bench_id"], r["rank"], r["doc_id"],
                round(r["score"], 9), r["contam_ngrams"],
                None if r["cos_sim"] is None else round(r["cos_sim"], 9),
            )
            for r in rows_
        )

    for kw in ({}, {"mmr_lambda": 0.5}):
        want = _key(
            P.contamination_report(
                docs, bench, k=3, bench_id_col="bench_id",
                score_round=6, **kw,
            ).collect()
        )
        # the indexed form must never touch the scan-form retrieval
        real_topk = RTmod.bm25_topk

        def boom(*a, **k):
            raise AssertionError("scan-form bm25_topk called on indexed path")

        monkeypatch.setattr(RTmod, "bm25_topk", boom)
        rep = P.contamination_report(
            docs, bench, k=3, bench_id_col="bench_id",
            score_round=6, bm25_index_path=idx, **kw,
        )
        got = _key(rep.collect())
        monkeypatch.setattr(RTmod, "bm25_topk", real_topk)
        assert got == want and got, kw
        # the annotation legs read the corpus through a pushed literal
        # id filter (the report's own rows), not a full scan
        plan = rep._jdf.queryExecution().executedPlan().toString()
        assert re.search(r"PushedFilters: \[[^\]]*In\(doc_id", plan), plan[
            :2000
        ]


def test_contamination_report_validates_fetch_k(spark):
    """ADVICE r11: with mmr_lambda set, fetch_k must EXCEED k — fetch_k
    < k silently under-returns and fetch_k == k gives MMR no pool beyond
    the plain cut; both now raise."""
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(1, "alpha beta")], "bench_id long, text string"
    )
    for bad in (2, 3):
        with pytest.raises(ValueError, match="fetch_k"):
            P.contamination_report(
                docs, bench, k=3, mmr_lambda=0.5, fetch_k=bad,
                bench_id_col="bench_id",
            )
    # fetch_k > k stays valid; without mmr_lambda fetch_k is unused
    P.contamination_report(
        docs, bench, k=3, mmr_lambda=0.5, fetch_k=4, bench_id_col="bench_id"
    ).collect()


def test_corpus_diff_near_attributes_moved_content(spark):
    """corpus_diff_near: added docs that near-match removed docs get
    near_of attribution; genuinely new docs don't; same-id edits stay
    'modified' and are never re-attributed."""
    base3 = "solar panels degrade measurably under partial shading on tilted roofs"
    base4 = "inverter clipping losses dominate oversized array designs in summer"
    old = spark.createDataFrame(
        [
            (1, "stable document kept in both releases verbatim"),
            (2, "document whose text will change in place across releases"),
            (3, base3),
            (4, base4),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "stable document kept in both releases verbatim"),
            (2, "document whose text DID change in place across releases"),
            (5, base3.replace("tilted", "flat")),  # re-ided near-dup of 3
            (6, "a genuinely new article about battery cycling chemistry"),
            (7, base4),  # exact copy of removed 4 under a fresh id
        ],
        "doc_id long, text string",
    )
    rows = {
        r["id"]: r
        for r in P.corpus_diff_near(old, new, threshold=0.5).collect()
    }
    assert rows[1]["change"] == "unchanged" and rows[1]["near_of"] is None
    assert rows[2]["change"] == "modified" and rows[2]["near_of"] is None
    assert rows[3]["change"] == "removed" and rows[3]["near_of"] is None
    assert rows[4]["change"] == "removed"
    assert rows[5]["change"] == "added" and rows[5]["near_of"] == 3
    assert 0.5 <= rows[5]["near_jaccard"] < 1.0
    assert rows[6]["change"] == "added" and rows[6]["near_of"] is None
    assert rows[7]["change"] == "added" and rows[7]["near_of"] == 4
    assert rows[7]["near_jaccard"] == pytest.approx(1.0)
    # threshold=1.0 keeps only the exact re-id
    strict = {
        r["id"]: r["near_of"]
        for r in P.corpus_diff_near(old, new, threshold=1.0).collect()
    }
    assert strict[7] == 4 and strict[5] is None
    with pytest.raises(ValueError):
        P.corpus_diff_near(old, new, threshold=0.0)
