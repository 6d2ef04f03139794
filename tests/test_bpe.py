"""BPE trainer: corpus-scale word counting in Spark + the classic merge
loop — checked on the Sennrich et al. (2016) worked example and on
round-trip / compression invariants over real documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark import io
from bigdataproject_formula1_telemetry_spark.operators import bpe
from tests.conftest import SF_SMOKE


def test_train_bpe_sennrich_example(spark):
    """The BPE paper's worked example: corpus {low×5, lower×2, newest×6,
    widest×3}.  The first merges must assemble 'est</w>' (freq 9 pairs
    dominate) and 'lo' / 'low' — the published behavior."""
    words = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    merges = bpe.train_bpe(docs, num_merges=10)
    joined = ["".join(m) for m in merges]
    # the freq-9 's t' / 'e s' chain assembles 'est</w>' within two
    # merges (the paper's example — tie-break direction is arbitrary,
    # ours is deterministic lexicographic-max), then 'lo' at freq 7
    assert "est</w>" in joined[:2], joined
    assert "lo" in joined[:4], joined

    seg = bpe.bpe_segment(docs, merges).collect()[0]["pieces"]
    # after 10 merges the frequent words collapse to few pieces
    assert "low</w>" in seg or "low" in seg


def test_bpe_segment_roundtrip_and_compression(spark):
    """Invariants on real documents: concatenating a doc's pieces (EOW
    markers → spaces) reproduces the lowercased token stream exactly;
    more merges never increase the piece count; the memoized Spark pass
    equals a driver-side reference segmentation."""
    docs = (
        io.read_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 30)
    )
    merges = bpe.train_bpe(docs, num_merges=60)
    out = bpe.bpe_segment(docs, merges).toPandas().set_index("doc_id")
    texts = {r.doc_id: r.text for r in docs.collect()}
    ranks = {m: i for i, m in enumerate(merges)}
    for did, text in texts.items():
        pieces = out.loc[did, "pieces"]
        rebuilt = "".join(pieces).replace(bpe.EOW, " ").strip()
        assert rebuilt == " ".join(text.lower().split())
        assert out.loc[did, "n_pieces"] == len(pieces)
        # reference: per-word driver segmentation
        ref = []
        for w in text.lower().split():
            ref.extend(bpe._segment_word(w, ranks))
        assert list(pieces) == ref

    fewer = bpe.bpe_segment(docs, merges[:10]).toPandas().set_index("doc_id")
    assert (out["n_pieces"] <= fewer["n_pieces"]).all()

    # no merges → pure character pieces
    none = bpe.bpe_segment(docs, []).toPandas().set_index("doc_id")
    did = next(iter(texts))
    n_chars = sum(len(w) for w in texts[did].lower().split())
    assert none.loc[did, "n_pieces"] == n_chars


def test_word_frequencies_cap_and_determinism(spark):
    docs = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a d")], "doc_id long, text string"
    )
    top2 = bpe.word_frequencies(docs, max_words=2).collect()
    assert [(r.word, r.freq) for r in top2] == [("a", 3), ("b", 3)]


def test_curation_pipeline_budgets_bpe_counts(spark):
    """curate_documents(bpe_merges=...) packs bins by trained-tokenizer
    piece counts: every bin's BPE-token total respects the budget, and
    the n_tokens column ≥ the whitespace count (each word ≥ 1 piece)."""
    from bigdataproject_formula1_telemetry_spark.plans import pipelines as P

    docs = (
        io.read_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 20)
    )
    merges = bpe.train_bpe(docs, num_merges=40)
    out = P.curate_documents(
        docs, chunk_tokens=16, overlap=0, token_budget=64, bpe_merges=merges
    ).toPandas()
    assert len(out) > 0
    fills = out[~out["oversize"]].groupby(["pack_shard", "seq_id"])["n_tokens"].sum()
    assert (fills <= 64).all()
    # BPE pieces >= whitespace tokens for every chunk
    ws = out["chunk_text"].str.split().str.len()
    assert (out["n_tokens"] >= ws).all()


def test_train_bpe_delta_update_matches_full_recount(spark):
    """The incremental pair-count maintenance must reproduce the
    full-recount reference exactly (same counts each round → same
    argmax → same merge list), including spelling collapses and
    repeated-symbol words."""
    texts = [
        "low lower lowest newest newer new wide wider widest",
        "aaaa aaa aa a abab ababab",
        "the the the them theme thesis",
        "low low low lower lowest newest newest",
    ]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                 schema="doc_id long, text string")
    from bigdataproject_formula1_telemetry_spark.operators.bpe import (
        EOW,
        train_bpe,
        word_frequencies,
    )

    # brute-force reference: recount every pair every round
    rows = word_frequencies(docs, "text", 100_000).collect()
    vocab = {}
    for r in rows:
        chars = tuple(r["word"])
        if not chars:
            continue
        key = chars[:-1] + (chars[-1] + EOW,)
        vocab[key] = vocab.get(key, 0) + r["freq"]

    def pair_counts(v):
        pc = {}
        for word, freq in v.items():
            for p in zip(word, word[1:]):
                pc[p] = pc.get(p, 0) + freq
        return pc

    ref_merges = []
    for _ in range(40):
        pc = pair_counts(vocab)
        if not pc:
            break
        best = max(pc.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
        if best[1] < 1:
            break
        (a, b), _ = best
        ref_merges.append((a, b))
        merged, nv = a + b, {}
        for word, freq in vocab.items():
            out, i = [], 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + freq
        vocab = nv

    assert train_bpe(docs, num_merges=40) == ref_merges
