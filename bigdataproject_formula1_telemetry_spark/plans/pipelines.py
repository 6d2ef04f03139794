"""Batch pipelines re-expressing the reference's ETL chain (SURVEY §3.1-3.2)
as single Spark jobs.

Reference: F1_Data_PreProcessing.ipynb — a ProcessPoolExecutor fans out one
OS process per (year, round), each pulling from Mongo into pandas, looping
over lap groups, and writing one parquet partition (2h06m for 7 years).
Here the whole thing is one declarative plan: scan → clean → grouped
resample → partitioned write.  Spark schedules per-partition tasks (the
pool disappears), and partitionBy replaces the hand-built hive paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark import functions as FN
from bigdataproject_formula1_telemetry_spark.operators import (
    relational as R,
    resample,
    windows as W,
)

LAP_KEYS = ["Year", "Round", "Driver", "LapNumber"]


def clean_bronze(df: DataFrame) -> DataFrame:
    """Null/type cleanup (F1_Data_PreProcessing.ipynb:58-61): drop rows
    missing Speed/Distance/LapNumber, Brake → 0/1 int-ish, nGear/DRS
    fillna(0)."""
    return (
        df.na.drop(subset=["Speed", "Distance", "LapNumber"])
        .withColumn("Brake", F.coalesce(F.col("Brake"), F.lit(0.0)).cast("double"))
        .na.fill({"nGear": 0.0, "DRS": 0.0})
    )


def build_warehouse(
    bronze: DataFrame, step: float = 10.0, mode: str = "partition"
) -> DataFrame:
    """Bronze → 10 m-grid warehouse (the reference's ``process_single_round``
    body, F1_Data_PreProcessing.ipynb:33-146, for ALL rounds in one job).

    Per (Year, Round, Driver, LapNumber): dedup Distance (keep first by
    Time), drop laps with <10 samples or max(Distance) < 2000, resample
    all channels onto arange(0, max_dist, 10) — linear for Speed/RPM/
    Throttle, nearest for Brake/nGear/DRS/TyreLife — and attach
    LapTime_Sec = max(Time) − min(Time) (W9) + Compound metadata.

    ONE shuffle total, on the lap keys: the Distance-dedup (keep first by
    Time) and the LapTime_Sec scalar are fused into the grouped kernel via
    ``pre_fn`` — they partition by the same lap, so computing them as
    separate window passes (as the first revision did) cost two extra
    exchanges/sorts over the full bronze table for no semantic difference.

    ``mode``: 'partition' (default) amortizes Arrow/UDF overhead across a
    whole shuffle partition (``resample_grouped_partitions``, 3.5× faster
    on lap-sized groups); 'grouped' keeps the strict per-group memory
    bound of ``applyInPandas``.  Outputs are identical (tested).
    """
    import numpy as np
    from pyspark.sql.types import DoubleType as _Dbl
    from pyspark.sql.types import StructField as _SF

    cleaned = clean_bronze(bronze).withColumn(
        "Compound", F.coalesce(F.col("Compound"), F.lit("UNKNOWN"))
    ).withColumn("TyreLife", F.coalesce(F.col("TyreLife"), F.lit(0.0)))

    def _dedup_and_laptime(pdf):
        # keep-first-by-Time per Distance (== dedup_by_key semantics),
        # then the lap scalar over the deduped rows
        pdf = pdf.sort_values("Time", na_position="last", kind="stable")
        pdf = pdf.drop_duplicates(subset=["Distance"], keep="first")
        t = pdf["Time"].to_numpy(dtype=float)
        return pdf.assign(LapTime_Sec=float(np.nanmax(t) - np.nanmin(t)))

    if mode not in ("partition", "grouped"):
        raise ValueError(f"mode must be 'partition' or 'grouped', got {mode!r}")
    fn = (
        resample.resample_grouped_partitions
        if mode == "partition"
        else resample.resample_grouped
    )
    resampled = fn(
        cleaned,
        keys=LAP_KEYS,
        x_col="Distance",
        linear_cols=["Speed", "RPM", "Throttle"],
        nearest_cols=["Brake", "nGear", "DRS", "TyreLife"],
        step=step,
        start=0.0,
        min_rows=10,
        min_extent=2000.0,
        carry_cols=["Compound", "LapTime_Sec"],
        pre_fn=_dedup_and_laptime,
        pre_fields=[_SF("LapTime_Sec", _Dbl())],
    )
    # float32 downcasts per the reference's storage optimization
    # (F1_Data_PreProcessing.ipynb:128-131).
    return resampled.select(
        F.col("Distance").cast("float").alias("Distance"),
        F.col("Speed").cast("float").alias("Speed"),
        F.col("RPM").cast("float").alias("RPM"),
        F.col("Throttle").cast("float").alias("Throttle"),
        F.col("Brake").cast("double"),
        F.col("nGear").cast("double"),
        F.col("DRS").cast("double"),
        F.col("TyreLife").cast("double"),
        F.col("LapTime_Sec").cast("double"),
        "Year",
        "Round",
        "Driver",
        "LapNumber",
        "Compound",
    )


def build_lap_dataset(warehouse: DataFrame) -> DataFrame:
    """Warehouse → lap-summary training dataset
    (``create_clean_dataset``, F1_Data_PreProcessing.ipynb:271-353):
    A1 group-agg, the 107%-rule filter per (Year, Round), compound
    encoding, encoded≠0 filter."""
    laps = warehouse.groupBy(*LAP_KEYS).agg(
        F.avg("Speed").alias("Speed_mean"),
        F.avg("Throttle").alias("Throttle_mean"),
        F.avg("Brake").alias("Brake_mean"),
        F.max("TyreLife").alias("TyreLife_max"),
        F.first("Compound").alias("Compound"),
        F.max("LapTime_Sec").alias("LapTime_Sec"),
    )
    valid = R.pct_of_group_min_filter(
        laps.where(F.col("LapTime_Sec") > 50),
        ["Year", "Round"],
        "LapTime_Sec",
        pct=1.07,
    )
    encoded = valid.withColumn(
        "Compound_Encoded", FN.encode_compound(F.col("Compound"))
    )
    return encoded.where(F.col("Compound_Encoded") != 0)


def add_pace_features(lap_dataset: DataFrame) -> DataFrame:
    """Training features (P1-...ipynb:441-466): session-fastest ratio (W1)
    + per-driver lag features (W2) + first-lap drop (P6)."""
    with_ratio = W.group_min_ratio(
        lap_dataset,
        ["Year", "Round"],
        "LapTime_Sec",
        out_col="Pace_Ratio",
        best_col="Session_Fastest",
    )
    with_ratio = with_ratio.withColumn(
        "Pace_Ratio", F.col("LapTime_Sec") / F.col("Session_Fastest")
    )
    lagged = W.lag_features(
        with_ratio,
        ["Year", "Round", "Driver"],
        ["LapNumber"],
        ["Pace_Ratio", "Speed_mean"],
    )
    return lagged.na.drop(subset=["Prev_Pace_Ratio"])


def curate_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    token_budget: int = 1024,
    dedup_threshold: float = 0.8,
    n_pack_shards: int = 32,
    epoch_salt: str = "epoch0",
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark: DataFrame | None = None,
    redact: bool = False,
    max_dup_line_frac: float | None = None,
    bpe_merges: list[tuple[str, str]] | None = None,
    max_ppl: float | None = None,
    lm_model: DataFrame | None = None,
    semantic_threshold: float | None = None,
    html: bool = False,
    c4_clean: bool = False,
    normalize: str | None = None,
    max_line_occurrences: int | None = None,
    soft_quality: tuple[str, float] | None = None,
    span_dedup_tokens: int | None = None,
    mixture: tuple[str, float, int] | None = None,
    quality_classifier: tuple | None = None,
    max_order_ppl: float | None = None,
    order_lm: tuple | None = None,
    minhash_index_path: str | None = None,
    blocklist: tuple | None = None,
    gopher: bool | dict = False,
    fineweb: bool | dict = False,
    semdedup: tuple | None = None,
    url_blocklist: tuple | None = None,
    max_docs_per_domain: int | None = None,
    url_col: str = "url",
    sentence_chunking: bool = False,
) -> DataFrame:
    """The LLM training-data curation tail, composed end to end:

        near_dedup_minhash → chunk_documents → pack_sequences
        → deterministic_shuffle

    Near-dedup runs at DOCUMENT granularity before chunking — the chunks
    of two near-duplicate documents would otherwise each show up as a
    pairwise near-dup (multiplying the LSH candidate volume by the
    chunks-per-doc factor for no extra information), and doc-level drop
    is what the corpus-curation recipes (C4/RefinedWeb-style) specify.

    Packing is sharded by ``pmod(xxhash64(doc_id), n_pack_shards)`` — a
    deterministic shard key that exists for any corpus, sized to cluster
    parallelism, so the first-fit kernel packs each shard independently
    (the ``partition_by=None`` single-task form is small-frames-only by
    contract).  The final epoch shuffle orders by the salt-keyed gate on
    the full chunk identity ``(doc_id, chunk_idx)``.

    Optional gates, each a standard published curation stage:
    ``max_dup_line_frac`` (Gopher repetition rule, pre-dedup),
    ``benchmark`` (8-gram eval-set decontamination, broadcast-anti;
    ``semantic_threshold`` adds the order-invariant hashed-BoW cosine
    pass on top),
    ``blocklist=(words, "page"|"line")`` (the C4 banned-words gate,
    word-boundary matched, applied right after extraction),
    ``gopher=True`` / ``gopher={overrides}`` (the full Gopher A1.1
    quality rule set via ``text.gopher_filter``; note the published
    50-word minimum — pass overrides for short-document corpora),
    ``fineweb=True`` / ``fineweb={overrides}`` (the three FineWeb
    custom line filters via ``text.fineweb_filter``, after the
    C4/Gopher class — the paper's order),
    ``redact`` (PII scrub applied BEFORE hashing so dedup keys and
    chunk identities see the redacted text), ``bpe_merges`` (a
    ``bpe.train_bpe`` model — bins then budget real tokenizer piece
    counts instead of whitespace tokens), ``html``/``c4_clean`` (tag
    strip + the C4 line heuristics, applied FIRST — every downstream
    hash/score must see extracted text; docs emptied by the cleanup are
    dropped), ``normalize="NFC"|"NFKC"|"jvm"`` (``text.normalize_text``
    right after extraction, before every hash/score/dedup key — layout
    variants of one page dedup together; ``"jvm"`` = control/whitespace
    cleanup only, no Arrow pass), ``max_line_occurrences`` (RefinedWeb
    corpus-level line
    dedup, applied just before doc dedup so near-dup hashing sees
    boilerplate-free text), ``soft_quality=(score_col, fraction)``
    (FineWeb-style score-weighted thinning via
    ``sampling.score_weighted_sample``, applied pre-dedup like the other
    quality gates), ``span_dedup_tokens`` (ExactSubstr duplicated-span
    excision after doc dedup — partial overlaps doc-level dedup can't
    see), ``mixture=(strata_col, temperature, target_rows)``
    (temperature rebalance via ``mixing.mixture_sample``, applied
    POST-dedup — domain proportions should reflect the deduped corpus,
    and the published multilingual recipes rebalance last),
    ``quality_classifier=(weights, min_prob)`` (FineWeb-Edu/DCLM-style
    TRAINED quality gate: ``classifier.train_text_classifier`` weights
    scored in one narrow pass, rows under ``min_prob`` dropped —
    applied pre-dedup with the other quality gates; pass
    ``min_prob=None`` to only attach the score, e.g. to feed
    ``soft_quality`` with it), ``max_order_ppl`` (order-sensitive
    stupid-backoff bigram perplexity gate — kills scrambled/word-salad
    text that is bag-identical to clean text; pass pre-trained dicts
    via ``order_lm=(bigram, unigram, unk_logp)`` at corpus scale),
    ``max_ppl`` (CCNet-style
    perplexity gate under a smoothed unigram LM — pass a pre-trained
    ``lm_model`` (``lm.unigram_lm``, the production shape: train once on
    a clean sample, reuse across corpus shards) or let it self-train on
    the post-repetition-gate corpus), ``minhash_index_path`` (the
    steady-state shape: after self-dedup, also drop docs the
    MATERIALIZED MinHash index already holds — one broadcast search,
    admission left to the caller's ``inc=`` discipline),
    ``semdedup=(n_clusters | centroids, threshold[, keep_fraction])``
    (SemDeDup cluster-scoped semantic dedup over hashed-BoW embeddings,
    right after the lexical doc dedup — catches the paraphrase/template
    axis MinHash shingles can't; a third element appends SSL-prototypes
    pruning = the full D4 composition; see ``operators/semdedup.py``),
    ``url_blocklist=(domains, keywords)`` + ``max_docs_per_domain``
    (r7: the RefinedWeb FIRST stage — UT1-style suffix domain
    blocklist, C4 keyword gate, and expected-count domain capping via
    ``operators/urls.py``, applied before any content parsing; needs a
    ``url_col`` column, e.g. from ``sources.warc.warc_to_documents``).

    One measured artifact for the whole tail: see bench.py's
    ``curation_pipeline`` entry and the SCALING.md 10× row."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        dedup as D,
        sampling as SA,
        text as T,
    )

    if url_blocklist is not None or max_docs_per_domain is not None:
        # URL-level gates come FIRST (RefinedWeb's order: cheap URL
        # rules run before any byte of content is even parsed) —
        # requires a url column on the corpus (e.g. from
        # sources.warc.warc_to_documents)
        from bigdataproject_formula1_telemetry_spark.operators import (
            urls as UR,
        )

        if url_col not in docs.columns:
            raise ValueError(
                f"url gates need a {url_col!r} column; the corpus has "
                f"{docs.columns}"
            )
        if url_blocklist is not None:
            bl_domains, bl_keywords = url_blocklist
            docs = UR.url_filter(
                docs,
                blocked_domains=bl_domains,
                blocked_keywords=bl_keywords,
                url_col=url_col,
            )
        if max_docs_per_domain is not None:
            docs = UR.cap_per_domain(
                docs, max_docs_per_domain, url_col=url_col,
                id_cols=(id_col,),
            )
    if html:
        # html=True → tag-strip (keeps all text nodes); html="main" →
        # jusText/Readability-class link-density block classification
        # (drops nav/footer/related-links boilerplate structurally)
        extractor = (
            T.extract_main_content if html == "main" else T.strip_html
        )
        docs = docs.withColumn(text_col, extractor(F.col(text_col)))
    if c4_clean:
        docs = docs.withColumn(text_col, T.c4_line_filter(F.col(text_col)))
    if html or c4_clean:
        docs = docs.where(F.col(text_col) != "")
    if normalize is not None:
        # unicode NFC/NFKC + control/whitespace cleanup right after
        # extraction and BEFORE every hash/score/dedup key — the point
        # is that byte-different layouts of one page dedup together;
        # normalize="jvm" skips the unicode step (pure-JVM cleanup)
        docs = docs.withColumn(
            text_col,
            T.normalize_text(
                F.col(text_col),
                form=None if normalize == "jvm" else normalize,
            ),
        )
    if blocklist is not None:
        # C4 banned-words gate right after extraction (the published
        # order: the list must see extracted text, and everything
        # downstream must never see blocked pages/lines); pure JVM
        # word-boundary expression, see text.blocklist_filter
        blocked_words, bl_mode = blocklist
        docs = T.blocklist_filter(
            docs, blocked_words, text_col=text_col, mode=bl_mode
        )
        if bl_mode == "line":
            docs = docs.where(F.col(text_col) != "")
    if gopher:
        # the full Gopher quality rule set (published thresholds, or a
        # dict of overrides) — with the other quality gates, pre-dedup
        docs = T.gopher_filter(
            docs, text_col=text_col,
            **(gopher if isinstance(gopher, dict) else {}),
        )
    if fineweb:
        # the three FineWeb custom line filters, applied after the
        # C4/Gopher class gates (the paper's order)
        docs = T.fineweb_filter(
            docs, text_col=text_col,
            **(fineweb if isinstance(fineweb, dict) else {}),
        )
    if max_dup_line_frac is not None:
        # Gopher-style repetition gate BEFORE dedup: boilerplate-heavy
        # docs would otherwise flood the LSH buckets they deserve no
        # seat in (pure column expression — one extra predicate on the
        # same scan)
        docs = docs.where(
            T.repetition_stats(F.col(text_col))["dup_line_frac"]
            <= F.lit(max_dup_line_frac)
        )
    if max_ppl is not None:
        # CCNet-style quality gate: drop the high-perplexity tail under
        # a smoothed unigram LM (self-trained here if no model given —
        # at corpus scale pass lm_model trained on a deterministic
        # sample with vocab_size set, so the gate is one broadcast join)
        from bigdataproject_formula1_telemetry_spark.operators import lm as L

        model = (
            lm_model
            if lm_model is not None
            else L.unigram_lm(docs, text_col=text_col)
        )
        scored = L.doc_perplexity(
            docs, model, text_col=text_col, id_cols=(id_col,)
        ).where(F.col("ppl") <= F.lit(max_ppl))
        docs = docs.join(scored.select(id_col), id_col, "semi")
    if benchmark is not None:
        # eval-set decontamination: broadcast the benchmark's 8-gram
        # hash set, left-anti the corpus (see dedup.decontaminate)
        docs = D.decontaminate(
            docs, benchmark, text_col=text_col, id_col=id_col
        )
        if semantic_threshold is not None:
            # order-invariant second pass: hashed-BoW cosine vs the
            # benchmark matrix catches shuffled/reworded benchmark text
            # the 8-gram pass can't (one narrow kernel, see
            # embed.semantic_decontaminate)
            from bigdataproject_formula1_telemetry_spark.operators import (
                embed as EM,
            )

            docs = EM.semantic_decontaminate(
                docs, benchmark, threshold=semantic_threshold, text_col=text_col
            )
    if redact:
        # PII scrub before anything content-hashed downstream, so the
        # dedup keys and chunk hashes see the redacted text
        docs = docs.withColumn(text_col, T.redact_pii(F.col(text_col)))
    if max_line_occurrences is not None:
        # corpus-level boilerplate line removal BEFORE doc dedup: the
        # near-dup hashes must see content, not shared nav/banner lines
        docs = T.dedup_lines_across_corpus(
            docs, text_col=text_col, id_col=id_col,
            max_occurrences=max_line_occurrences,
        ).where(F.col(text_col) != "")
    if max_order_ppl is not None:
        # ORDER-sensitive twin of the max_ppl gate: stupid-backoff
        # bigram perplexity (lm.doc_order_perplexity_arrow) kills
        # word-salad/scrambled spam that passes every bag-of-words gate
        # (identical unigram ppl by construction).  Pass order_lm =
        # (bigram_dict, unigram_dict, unk_logp) pre-trained on a clean
        # sample for the production shape; self-training here is the
        # small-scale convenience (two count jobs + bounded collects).
        from bigdataproject_formula1_telemetry_spark.operators import lm as L2

        if order_lm is not None:
            big_d, uni_d, unk_d = order_lm
        else:
            uni_d, unk_d = L2.collect_lm(
                L2.unigram_lm(docs, text_col=text_col, vocab_size=100_000)
            )
            big_d = L2.collect_bigram_lm(
                L2.bigram_lm(docs, text_col=text_col, max_bigrams=1_000_000)
            )
        oscored = L2.doc_order_perplexity_arrow(
            docs, big_d, uni_d, unk_d, text_col=text_col, id_cols=(id_col,)
        ).where(F.col("ppl") <= F.lit(max_order_ppl))
        docs = docs.join(oscored.select(id_col), id_col, "semi")
    if quality_classifier is not None:
        # trained quality gate (FineWeb-Edu/DCLM class) before dedup,
        # like the other quality gates; one narrow scoring pass
        from bigdataproject_formula1_telemetry_spark.operators import (
            classifier as CL,
        )

        clf_weights, clf_min_prob = quality_classifier
        docs = CL.with_quality_probability(
            docs, clf_weights, min_prob=clf_min_prob, text_col=text_col
        )
    if soft_quality is not None:
        # FineWeb-style soft thinning before dedup (cheaper dedup, and
        # quality gates precede dedup in the published recipes)
        score_col, frac = soft_quality
        docs = SA.score_weighted_sample(
            docs, score_col, [id_col], frac, salt=f"{epoch_salt}-quality"
        )
    kept = D.near_dedup_minhash(
        docs, text_col=text_col, id_col=id_col, threshold=dedup_threshold
    )
    if minhash_index_path is not None:
        # steady-state form: today's batch also dedups against the
        # MATERIALIZED corpus state (minhash_index) — the broadcast
        # increment-vs-index search; admission stays with the caller
        # (incremental_near_dedup / the streaming admission own the
        # inc= write discipline)
        from bigdataproject_formula1_telemetry_spark.operators import (
            minhash_index as MIX,
        )

        kept = MIX.dedup_against_index(
            docs.sparkSession, kept, minhash_index_path,
            threshold=dedup_threshold, text_col=text_col, id_col=id_col,
        )
    if semdedup is not None:
        # SemDeDup (Abbas et al.) right after the lexical doc dedup —
        # the paraphrase/template axis MinHash shingles can't see.
        # semdedup=(n_clusters | centroids, threshold[, keep_fraction]):
        # pass trained centroids (similarity.ivf_centroids on a clean
        # sample) for the production shape; an int self-trains here on
        # the already-deduped corpus (small-scale convenience).  A third
        # element turns the gate into full D4 (Tirumala et al.):
        # SSL-prototypes pruning to ``keep_fraction`` after the dedup,
        # against the same centroids.  Embeddings are the deterministic
        # hashed-BoW vectors — zero-norm (token-less) docs are exempt by
        # semantic_dedup's contract.
        from bigdataproject_formula1_telemetry_spark.operators import (
            embed as EM2,
            semdedup as SD,
            similarity as SIM,
        )

        sd_spec, sd_threshold, *sd_rest = semdedup
        semb = EM2.hashed_embedding(kept, text_col=text_col, out_col="__semb")
        sd_centroids = (
            SIM.ivf_centroids(
                semb, n_clusters=sd_spec, id_col=id_col, vec_col="__semb"
            )
            if isinstance(sd_spec, int)
            else sd_spec
        )
        deduped = SD.semantic_dedup(
            semb, sd_centroids, threshold=sd_threshold,
            id_col=id_col, vec_col="__semb",
        )
        if sd_rest:
            deduped = SD.prototype_prune(
                deduped, sd_centroids, sd_rest[0],
                id_col=id_col, vec_col="__semb",
            )
        kept = deduped.drop("__semb")
    if span_dedup_tokens is not None:
        # ExactSubstr (Lee et al.) AFTER doc-level dedup: whole-document
        # near-dups are already gone, so the span stage only pays for
        # the partial overlaps it alone can see
        kept = D.remove_duplicate_spans(
            kept, text_col=text_col, id_col=id_col,
            span_tokens=span_dedup_tokens,
        ).where(F.col(text_col) != "")
    if mixture is not None:
        # temperature rebalance AFTER dedup: proportions should reflect
        # the deduped corpus, not the duplicate mass
        from bigdataproject_formula1_telemetry_spark.operators import (
            mixing as MX,
        )

        strata_col, tau, target_rows = mixture
        kept = MX.mixture_sample(
            kept, strata_col, [id_col], temperature=tau,
            target_rows=target_rows, salt=f"{epoch_salt}-mix",
        )
    if sentence_chunking:
        # sentence-aligned boundaries (r7): whole-sentence greedy
        # packing — no mid-sentence cuts at chunk seams.  ``overlap``
        # is a token-window concept and is ignored here (sentence
        # chunks don't window).
        chunks = T.sentence_chunks(
            kept, text_col=text_col, id_col=id_col,
            chunk_tokens=chunk_tokens,
        )
    else:
        chunks = T.chunk_documents(
            kept, text_col=text_col, id_col=id_col,
            chunk_tokens=chunk_tokens, overlap=overlap,
        )
    chunks = chunks.withColumn(
        "pack_shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_pack_shards))
    )
    if bpe_merges is not None:
        # budget the bins with REAL tokenizer counts: replace the
        # whitespace n_tokens with the trained-BPE piece count (one
        # memoized Arrow pass over the chunks)
        from bigdataproject_formula1_telemetry_spark.operators import bpe as B

        chunks = B.with_bpe_token_count(
            chunks, bpe_merges, text_col="chunk_text", out_col="n_tokens"
        )
    packed = T.pack_sequences(
        chunks,
        token_budget=token_budget,
        order_by=(id_col, "chunk_idx"),
        partition_by="pack_shard",
    )
    return SA.deterministic_shuffle(packed, [id_col, "chunk_idx"], salt=epoch_salt)


def web_curation_kwargs(
    benchmark_free: bool = True,
    blocked_words: list[str] | None = None,
) -> dict:
    """The reference configuration for curating a raw WEB crawl — the
    published recipes composed in their own order, as ready-to-splat
    ``curate_documents`` kwargs:

        main-content extraction (jusText class) → C4 line rules →
        banned words (if a list is supplied) → Gopher quality rules →
        FineWeb line rules → repetition gate → corpus line dedup →
        near-dedup → ExactSubstr span dedup → chunk/pack/shuffle

    This is a STARTING POINT, not policy: thresholds are the published
    defaults (note Gopher's 50-word minimum), and a real run adds
    ``benchmark=`` decontamination, a trained ``quality_classifier=``,
    and ``minhash_index_path=`` for the steady state.  Pin the dict you
    actually shipped via ``corpus_release``'s provenance config.

    >>> P.corpus_release(docs, path, **P.web_curation_kwargs())
    """
    kw: dict = {
        "html": "main",
        "c4_clean": True,
        "gopher": True,
        "fineweb": True,
        "max_dup_line_frac": 0.3,
        "max_line_occurrences": 1,
        "span_dedup_tokens": 50,
    }
    if blocked_words:
        kw["blocklist"] = (blocked_words, "page")
    if not benchmark_free:
        raise ValueError(
            "pass benchmark= directly to curate_documents/corpus_release; "
            "this preset only bundles the corpus-intrinsic gates"
        )
    return kw


_QUALITY_HIST_BINS = 100


def _quality_bin(t, q: Column | None = None) -> Column:
    """Fixed-bin index of the heuristic quality score over [0, 1]
    (bin width 1/``_QUALITY_HIST_BINS``; the score's top edge 1.0
    clamps into the last bin).  NULL text stays NULL — unscored rows
    are excluded from the histogram on both engines, because the
    score expression is undefined on NULL (its token count degrades
    to a sentinel, not a quality).  Pass ``q`` (an already-projected
    score column) when the plan evaluates the score anyway — the
    score's token/regex work dominates the histogram's cost, so it
    must never be computed twice in one pass."""
    if q is None:
        from bigdataproject_formula1_telemetry_spark.operators import (
            text as T,
        )

        q = T.quality_score(t)
    return F.when(
        t.isNotNull(),
        F.least(
            F.floor(q * _QUALITY_HIST_BINS).cast("int"),
            F.lit(_QUALITY_HIST_BINS - 1),
        ),
    )


def _quality_hist_counts(docs: DataFrame, t: Column) -> DataFrame:
    """Sparse fixed-bin counts of the quality score, as ``(__qbin, __c)``
    rows — the mergeable quality histogram, computed as ONE two-level
    groupBy (map-side partial aggregation reduces each task to ≤ 100
    rows before the exchange) instead of the previous 100
    conditional-sum aggregate columns.  Measured (r15, guide §1): the
    100-column aggregate form cost 2.0 s per run at sf0.1 — ~1.1 s of
    it fixed plan/codegen overhead independent of data size (the
    >100-field aggregate exceeds ``spark.sql.codegen.maxFields``, so
    whole-stage codegen bails out and the wide plan is re-derived per
    run) — vs 0.53 s for this shape, with bit-identical counts (NULL
    text stays unscored on both: the NULL bin group is filtered here
    exactly as the conditional sums never matched it)."""
    return (
        docs.select(_quality_bin(t).alias("__qbin"))
        .where(F.col("__qbin").isNotNull())
        .groupBy("__qbin")
        .agg(F.count(F.lit(1)).cast("double").alias("__c"))
    )


def _hist_percentile_rows(
    bins: dict[int, float], section: str, prefix: str, value_of
) -> list[tuple]:
    """Derive ``(section, key, value)`` card rows (n_scored +
    p10/p50/p90) from summed fixed-bin counts.  Ranks are PURE INTEGER
    math (``ceil(p*n)`` as ``(num*n + den-1) // den``) and the
    reported value is ``value_of(bin)`` (a bin midpoint in the
    measure's space), so the derivation is bit-reproducible across
    engines and the error is bounded by half a bin width."""
    n = int(sum(bins.values()))
    if n <= 0:
        return []
    rows = [(section, "n_scored", float(n))]
    items = sorted(bins.items())
    for pname, num, den in (("p10", 1, 10), ("p50", 1, 2), ("p90", 9, 10)):
        tgt = (num * n + den - 1) // den
        cum = 0
        b = items[-1][0]
        for i, c in items:
            cum += int(c)
            if cum >= tgt:
                b = i
                break
        rows.append((section, f"{prefix}{pname}_approx", value_of(b)))
    return rows


def _quality_percentile_rows(bins: dict[int, float]) -> list[tuple]:
    """quality_hist derivation: bin midpoints over [0, 1] (error ≤
    0.005 at 100 bins)."""
    return _hist_percentile_rows(
        bins,
        "quality_hist",
        "q_",
        lambda b: (b + 0.5) / _QUALITY_HIST_BINS,
    )


# perplexity histogram under a FROZEN reference LM (r14): log-space
# bins, ln(ppl) ∈ [0, 20) at width 0.1 (ppl is ≥ 1 by construction —
# it's exp(-mean(logp)) with logp ≤ 0), top bin clamps the unk-heavy
# tail.  Percentile error ≤ half a bin in ln-space ⇒ ≤ ~5.1% relative
# on the reported value.
_PPL_HIST_BINS = 200
_PPL_HIST_LN_WIDTH = 0.1


def _ppl_bin(ppl: Column) -> Column:
    return F.least(
        F.floor(F.log(ppl) / _PPL_HIST_LN_WIDTH).cast("int"),
        F.lit(_PPL_HIST_BINS - 1),
    )


def _ppl_percentile_rows(bins: dict[int, float]) -> list[tuple]:
    """ppl_hist derivation: bin midpoints mapped back from ln-space.
    Only meaningful when every contributing partial scored under the
    SAME frozen reference model (the release train guarantees this by
    persisting the model beside the release)."""
    import math

    return _hist_percentile_rows(
        bins,
        "ppl_hist",
        "ppl_",
        lambda b: math.exp((b + 0.5) * _PPL_HIST_LN_WIDTH),
    )


def _scalar_leg(
    agg_df: DataFrame,
    leg: str,
    doubles: list[str],
    sketches: list[str] | None = None,
) -> DataFrame:
    """One already-reduced aggregate row → tidy ``(leg, key, value,
    sketch)`` rows, built as EXPRESSIONS (no collect).  Independent
    measurement legs union into ONE Spark action instead of paying one
    sequential driver round trip each — the guide §2.6 idle-capacity
    overlap, done inside a single job: the legs' scans schedule
    concurrently, and per-job fixed overhead is paid once.  Measured on
    the release train (probe_release_stage_costs): the increment card
    partial was 4.15 s for a 500-doc increment — almost all sequential
    job overhead, not data."""
    structs = [
        F.struct(
            F.lit(k).alias("key"),
            F.col(k).cast("double").alias("value"),
            F.lit(None).cast("binary").alias("sketch"),
        )
        for k in doubles
    ] + [
        F.struct(
            F.lit(k).alias("key"),
            F.lit(None).cast("double").alias("value"),
            F.col(k).alias("sketch"),
        )
        for k in (sketches or [])
    ]
    return agg_df.select(F.explode(F.array(*structs)).alias("r")).select(
        F.lit(leg).alias("leg"),
        F.col("r.key").alias("key"),
        F.col("r.value").alias("value"),
        F.col("r.sketch").alias("sketch"),
    )


def _kv_leg(df: DataFrame, leg: str, key: Column, value: Column) -> DataFrame:
    """A many-row leg (e.g. per-bin counts) in the same union schema."""
    return df.select(
        F.lit(leg).alias("leg"),
        key.cast("string").alias("key"),
        value.cast("double").alias("value"),
        F.lit(None).cast("binary").alias("sketch"),
    )


def _collect_legs(legs: list[DataFrame]) -> dict:
    """Collect every measurement leg CONCURRENTLY (one driver thread per
    leg) and return ``{leg: {key: (value, sketch)}}``.

    r14 fused the legs into one union action (one driver round trip
    instead of N sequential).  r15 measured the union's single big plan
    carrying its own tax — Catalyst plans and AQE re-plans the whole
    8-subtree union as one query, and the per-run cost is fixed
    overhead, not data: the full-card union collected in 2.59 s at
    sf0.1 vs 1.42 s for the same legs as concurrent per-leg collects
    (guide §2.6 — the scheduler interleaves the small jobs exactly like
    the union interleaved their stages, while each plan stays small).
    Rows collected are identical either way."""
    if len(legs) == 1:
        rows = legs[0].collect()
    else:
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        with ThreadPoolExecutor(max_workers=len(legs)) as pool:
            futures = [
                pool.submit(inheritable_thread_target(leg.collect))
                for leg in legs
            ]
            rows = [r for f in futures for r in f.result()]
    out: dict = {}
    for r in rows:
        out.setdefault(r["leg"], {})[r["key"]] = (r["value"], r["sketch"])
    return out


def corpus_card(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str | None = "lang",
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    semantic: tuple | None = None,
    lm_model: DataFrame | None = None,
) -> DataFrame:
    """Dataset datasheet for a (curated) document corpus — the summary
    artifact a training-data release ships with (public practice:
    "Datasheets for Datasets", Gebru et al. 2021; model-card corpus
    sections).  Returns tidy ``(section, key, value)`` rows:

    - ``size``: docs, total whitespace tokens, total chars;
    - ``quality``: p10/p50/p90 of the heuristic quality score and of
      perplexity under a self-trained unigram LM (vocab-capped);
    - ``dup``: exact-duplicate fraction via ``approx_count_distinct``
      of the content hash (never a text shuffle); plus, when
      ``semantic=(centroids, threshold)`` is given, SEMANTIC family
      counts over hashed-BoW embeddings (the paraphrase-axis twin —
      word-shuffled copies are invisible to the exact row, counted
      here);
    - ``pii``: total email/ipv4/phone pattern hits;
    - ``lang``: per-language doc counts (when ``lang_col`` exists).

    ONE full scan computes every global measure in a single aggregate
    (the LM leg adds its own train+score pass), plus one tiny groupBy
    for the language breakdown; everything is already-reduced, so the
    frame feeds ``sinks.write_html_report`` directly."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        lm as L,
        text as T,
    )

    t = F.col(text_col)
    q = T.quality_score(t)
    pii = T.pii_counts(t)
    # ``lm_model``: a caller that has ALREADY trained the (same-recipe)
    # unigram LM passes it in to avoid a second train pass — the
    # release train does, because its frozen reference model at BASE
    # time is trained on exactly these docs with exactly these params,
    # so the card's "self-trained" semantics are unchanged there.
    model = (
        lm_model
        if lm_model is not None
        else L.unigram_lm(docs, text_col=text_col, vocab_size=50_000)
    )
    ppl = L.doc_perplexity(docs, model, text_col=text_col).select("ppl")

    key = F.when(t.isNotNull(), F.md5(t)).otherwise(F.lit("\x00null"))
    qtiles = F.array(F.lit(0.1), F.lit(0.5), F.lit(0.9))
    # fixed-bin quality histogram as its own groupBy leg (r15 — see
    # ``_quality_hist_counts``: the 100-column conditional-sum form
    # carried ~1.5 s of fixed plan/codegen overhead per refresh); the
    # derived ``quality_hist`` rows are emitted by the full card too so
    # an incrementally merged card and a full refresh agree on the
    # section (merged == full, pinned in tests).  Both legs ride the
    # same single action, so their scans schedule concurrently.
    dq = docs.withColumn("__q", q)
    glob = dq.agg(
        F.count(F.lit(1)).cast("double").alias("docs"),
        F.sum(T.token_count(t)).cast("double").alias("tokens"),
        F.sum(F.length(t)).cast("double").alias("chars"),
        F.percentile_approx(F.col("__q"), qtiles).alias("_q"),
        (
            1.0
            - F.approx_count_distinct(key, 0.02).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("exact_dup_frac_approx"),
        F.sum(pii["email"]).cast("double").alias("pii_emails"),
        F.sum(pii["ipv4"]).cast("double").alias("pii_ipv4"),
        F.sum(pii["phone"]).cast("double").alias("pii_phones"),
    ).select(
        "docs", "tokens", "chars",
        F.col("_q")[0].alias("q_p10"),
        F.col("_q")[1].alias("q_p50"),
        F.col("_q")[2].alias("q_p90"),
        "exact_dup_frac_approx", "pii_emails", "pii_ipv4", "pii_phones",
    )
    pplq = ppl.agg(F.percentile_approx("ppl", qtiles).alias("_p")).select(
        F.col("_p")[0].alias("ppl_p10"),
        F.col("_p")[1].alias("ppl_p50"),
        F.col("_p")[2].alias("ppl_p90"),
    )
    sections = {
        "docs": "size", "tokens": "size", "chars": "size",
        "q_p10": "quality", "q_p50": "quality", "q_p90": "quality",
        "ppl_p10": "quality", "ppl_p50": "quality", "ppl_p90": "quality",
        "exact_dup_frac_approx": "dup",
        "pii_emails": "pii", "pii_ipv4": "pii", "pii_phones": "pii",
        "contam_ngram_docs": "contamination",
        "contam_semantic_docs": "contamination",
        "sem_dup_families": "dup", "sem_dup_frac": "dup",
        "ngrams_13": "diversity",
        "distinct_13gram_frac_approx": "diversity",
        "distinct_domains": "domains", "top_domain_frac": "domains",
    }
    # Each global measure is an independent already-reduced leg; they
    # union into ONE collect so the full-card refresh pays one Spark
    # action (scans scheduled concurrently) instead of one sequential
    # job per section — the aggregate expressions are unchanged.
    legs = [
        _scalar_leg(
            glob,
            "glob",
            [
                "docs", "tokens", "chars", "q_p10", "q_p50", "q_p90",
                "exact_dup_frac_approx",
                "pii_emails", "pii_ipv4", "pii_phones",
            ],
        ),
        _kv_leg(
            _quality_hist_counts(docs, t), "q_bin",
            F.col("__qbin"), F.col("__c"),
        ),
        _scalar_leg(pplq, "ppl", ["ppl_p10", "ppl_p50", "ppl_p90"]),
    ]
    if benchmark is not None:
        # contamination accounting vs an eval set: verbatim (8-gram) and
        # order-invariant (hashed-BoW cosine) overlap counts — the two
        # decontamination passes' audit faces, reported side by side
        from bigdataproject_formula1_telemetry_spark.operators import (
            dedup as DD,
            embed as EM,
        )

        ngram_docs = (
            DD.contamination_hits(
                docs, benchmark, text_col=text_col, id_col=id_col,
                bench_text_col=bench_text_col,
            )
            .agg(F.count(F.lit(1)).cast("double").alias("contam_ngram_docs"))
        )
        sem_docs = (
            EM.semantic_contamination_pairs(
                docs, benchmark, threshold=0.95,
                text_col=text_col, id_col=id_col,
                bench_text_col=bench_text_col,
            )
            .select(id_col)
            .distinct()
            .agg(F.count(F.lit(1)).cast("double").alias("contam_semantic_docs"))
        )
        legs.append(_scalar_leg(ngram_docs, "contam_ngram", ["contam_ngram_docs"]))
        legs.append(_scalar_leg(sem_docs, "contam_sem", ["contam_semantic_docs"]))
    if semantic is not None:
        # semantic-duplicate accounting (``semantic=(centroids,
        # threshold)``): family counts over hashed-BoW embeddings via
        # ``semdedup.semantic_duplicate_clusters`` — the paraphrase-axis
        # twin of the exact_dup row (exact_dup sees verbatim copies
        # only; this sees bag-level near-copies and templates)
        from bigdataproject_formula1_telemetry_spark.operators import (
            embed as EM2,
            semdedup as SD2,
        )

        sd_cents, sd_thr = semantic
        semb = EM2.hashed_embedding(docs, text_col=text_col, out_col="__semb")
        fam = SD2.semantic_duplicate_clusters(
            semb, sd_cents, threshold=sd_thr, id_col=id_col, vec_col="__semb"
        )
        srow = fam.agg(
            F.count(F.lit(1)).cast("double").alias("__n"),
            F.countDistinct("cluster").cast("double").alias("sem_dup_families"),
        ).select(
            "sem_dup_families",
            (1.0 - F.col("sem_dup_families") / F.col("__n")).alias(
                "sem_dup_frac"
            ),
        )
        legs.append(_scalar_leg(srow, "semdup", ["sem_dup_families", "sem_dup_frac"]))
    # diversity / memorization-risk telemetry (r7): the corpus-distinct
    # fraction of per-doc-distinct 13-grams (Lee et al. 2022's dedup
    # analyses report long-n-gram duplication as the memorization
    # driver) — one explode + approx_count_distinct over xxhash64
    # shingles, never a text shuffle.  1.0 = no 13-gram appears in two
    # docs; low values mean documents share long spans verbatim
    # (within-doc repetition is the `dup`/repetition rows' job).
    from bigdataproject_formula1_telemetry_spark.operators import text as TD

    ng = docs.select(
        F.explode(TD.shingles_ngrams(t, 13)).alias("__g")
    ).select(F.xxhash64("__g").alias("__h"))
    drow = ng.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.approx_count_distinct("__h", 0.02).cast("double").alias("__d"),
    ).select(
        F.col("__n").alias("ngrams_13"),
        F.when(F.col("__n") > 0, F.col("__d") / F.col("__n"))
        .otherwise(F.lit(None))
        .alias("distinct_13gram_frac_approx"),
    )
    legs.append(
        _scalar_leg(
            drow, "diversity", ["ngrams_13", "distinct_13gram_frac_approx"]
        )
    )
    dom = None
    if "url" in docs.columns:
        # provenance section for web corpora (r7): registered-domain
        # concentration — distinct domains, top-domain share, and the
        # top-10 domains by doc count (the over-representation signal
        # ``urls.cap_per_domain`` exists to bound).  One groupBy(domain)
        # + one sorted limit; the domain key never carries text.
        from bigdataproject_formula1_telemetry_spark.operators import (
            urls as UR2,
        )

        dom = (
            UR2.url_parts(docs.select(id_col, "url"))
            .groupBy("domain")
            .agg(F.count(F.lit(1)).cast("double").alias("value"))
        )
        # scalars over REAL domains only — the NULL-host group is not a
        # domain: counting it inflates ``distinct_domains`` by one, and
        # on URL-less-heavy corpora it could even win ``max(value)``.
        # It stays in the top-10 listing below as ``<no-host>``.  Still
        # no second corpus scan: the filter runs on the tiny aggregate.
        dsum = dom.where(F.col("domain").isNotNull()).agg(
            F.count(F.lit(1)).cast("double").alias("distinct_domains"),
            (F.max("value") / F.sum("value")).alias("top_domain_frac"),
        )
        legs.append(
            _scalar_leg(dsum, "domains", ["distinct_domains", "top_domain_frac"])
        )
    got = _collect_legs(legs)
    glob_v = got["glob"]
    scalar_rows = [
        (sections[k], k, float(v) if v is not None else None)
        for k, (v, _s) in glob_v.items()
    ] + _quality_percentile_rows(
        {
            int(k): float(v)
            for k, (v, _s) in got.get("q_bin", {}).items()
            if v
        }
    )
    for leg in ("ppl", "contam_ngram", "contam_sem", "semdup", "diversity",
                "domains"):
        scalar_rows += [
            (sections[k], k, float(v) if v is not None else None)
            for k, (v, _s) in got.get(leg, {}).items()
        ]
    card = docs.sparkSession.createDataFrame(
        scalar_rows, schema="section string, key string, value double"
    )
    if lang_col is not None and lang_col in docs.columns:
        langs = docs.groupBy(F.col(lang_col).alias("key")).agg(
            F.count(F.lit(1)).cast("double").alias("value")
        )
        card = card.unionByName(
            langs.select(F.lit("lang").alias("section"), "key", "value")
        )
    if dom is not None:
        card = card.unionByName(
            dom.orderBy(F.col("value").desc(), F.col("domain").asc())
            .limit(10)
            .select(
                F.lit("domains").alias("section"),
                F.coalesce(F.col("domain"), F.lit("<no-host>")).alias("key"),
                "value",
            )
        )
    return card


def corpus_card_partial(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str | None = "lang",
    id_col: str = "doc_id",
    benchmark: DataFrame | None = None,
    bench_text_col: str = "text",
    token_budget: float | None = None,
    ppl_model: DataFrame | None = None,
) -> DataFrame:
    """One increment's MERGEABLE datasheet partial (r13) — the
    incremental face of :func:`corpus_card`.  At 100 TB the card
    recompute is the expensive half of a release append (it re-reads
    EVERY released row); this computes one increment's contribution in
    O(increment) as tidy ``(section, key, value double, sketch binary)``
    rows that :func:`merge_card_partials` combines in O(#increments):

    - sums (size docs/tokens/chars, pii counts, per-language counts,
      per-domain counts, contamination doc counts) merge exactly —
      every one is algebraic and per-doc independent (the
      contamination gates judge each doc against a FIXED broadcast
      benchmark, so pass the SAME benchmark to every partial);
    - distinct counts (exact-dup content hashes, corpus-distinct
      13-grams) ride as Apache DataSketches HLL sketches
      (``hll_sketch_agg``): sketch state is a register MAX, so the
      union of per-increment sketches IS the sketch of the union —
      bit-for-bit, order-independent (pinned in tests).

    Order statistics are not mergeable, but a FIXED-bin histogram of
    them is (r14): the ``quality_hist`` section carries sparse
    100-bin counts of the heuristic quality score over [0, 1] (bin
    width 0.01, same scan, 100 conditional sums — no extra pass), and
    the merge derives p10/p50/p90 from the summed counts by pure
    integer rank math, so an incrementally maintained card reports
    FRESH approximate quality percentiles (error ≤ half a bin width)
    instead of only stale-carried exact ones.

    ``ppl_model`` (r14) extends the same move to the perplexity axis:
    score this increment under a FROZEN reference unigram LM (the
    public CCNet practice — Wenzek et al. 2020 score every shard
    under one fixed KenLM, precisely so scores stay comparable as the
    corpus grows) and histogram ``ln(ppl)`` into fixed log-space bins
    (``ppl_hist`` section).  Because the model never drifts, the bins
    sum across increments; the release train persists the base-trained
    model beside the release and passes it to every partial.  This is
    a DIFFERENT statistic from the full card's corpus-trained
    perplexity percentiles (reference-relative vs self-descriptive) —
    both are published, the full-card one via scheduled refresh.

    NOT in partials — and therefore stale-carried in an incrementally
    maintained card — are the sections that are fundamentally
    non-mergeable even through a fixed binning: CORPUS-trained
    perplexity percentiles (the model itself drifts as the corpus
    grows, so per-increment bins would be scored by DIFFERENT models)
    and semantic-duplicate families (clusters span increments).
    Refresh those on a schedule with the full :func:`corpus_card`;
    the split is exactly Datasheets-for-Datasets practice for living
    datasets (algebraic sections per delta, model-backed sections per
    audit).

    ``token_budget`` (with packed chunk rows — ``pack_shard``/
    ``seq_id``/``n_tokens``/``oversize`` columns present) adds the
    PACKING section's mergeable components: bins never span increments
    (each increment packs separately), so bin counts, fills, and
    oversize flags sum, and the merged mean/occupancy derive from the
    summed components exactly as ``corpus_release`` derives them
    inline.  Component rows carry ``__``-prefixed keys the merge
    consumes and never emits."""
    from bigdataproject_formula1_telemetry_spark.operators import text as T

    spark = docs.sparkSession
    t = F.col(text_col)
    pii = T.pii_counts(t)
    key = F.when(t.isNotNull(), F.md5(t)).otherwise(F.lit("\x00null"))
    out_schema = (
        "section string, key string, value double, sketch binary"
    )
    # Every measurement below is an independent already-reduced leg;
    # they union into ONE collect (one Spark action) so the legs'
    # scans schedule concurrently and per-job overhead is paid once —
    # measured 4.15 s → sub-second for an increment-sized partial
    # (probe_release_stage_costs, r14 optimization round).  The
    # quality histogram is its own groupBy leg (r15 — see
    # ``_quality_hist_counts``); every other aggregate expression is
    # bit-identical to the sequential form.
    glob_agg = docs.agg(
        F.count(F.lit(1)).cast("double").alias("docs"),
        F.sum(T.token_count(t)).cast("double").alias("tokens"),
        F.sum(F.length(t)).cast("double").alias("chars"),
        F.sum(pii["email"]).cast("double").alias("pii_emails"),
        F.sum(pii["ipv4"]).cast("double").alias("pii_ipv4"),
        F.sum(pii["phone"]).cast("double").alias("pii_phones"),
        F.hll_sketch_agg(key).alias("__dup_sk"),
    )
    legs = [
        _scalar_leg(
            glob_agg,
            "glob",
            [
                "docs", "tokens", "chars",
                "pii_emails", "pii_ipv4", "pii_phones",
            ],
            ["__dup_sk"],
        ),
        _kv_leg(
            _quality_hist_counts(docs, t), "q_bin",
            F.col("__qbin"), F.col("__c"),
        ),
    ]
    ng = docs.select(
        F.explode(T.shingles_ngrams(t, 13)).alias("__g")
    ).select(F.xxhash64("__g").alias("__h"))
    legs.append(
        _scalar_leg(
            ng.agg(
                F.count(F.lit(1)).cast("double").alias("__n"),
                F.hll_sketch_agg("__h").alias("__sk"),
            ),
            "ngram",
            ["__n"],
            ["__sk"],
        )
    )
    if ppl_model is not None:
        # frozen-reference perplexity bins: one explode + broadcast
        # LM join + two-level count over THIS increment only.  Scored
        # per released ROW (a synthetic row id, not ``id_col`` — in
        # the release train rows are CHUNKS sharing a doc_id, and the
        # distribution a consumer trains on is over sequences), and
        # token-less rows are unscored, matching doc_perplexity's
        # contract.  The row id never leaves the plan, so its
        # nondeterminism across retries is irrelevant — only the bin
        # counts are kept.
        from bigdataproject_formula1_telemetry_spark.operators import (
            lm as L,
        )

        pb = (
            L.doc_perplexity(
                docs.withColumn("__rid", F.monotonically_increasing_id()),
                ppl_model,
                text_col=text_col,
                id_cols=("__rid",),
            )
            .groupBy(_ppl_bin(F.col("ppl")).alias("__b"))
            .agg(F.count(F.lit(1)).cast("double").alias("__c"))
        )
        legs.append(_kv_leg(pb, "ppl_bin", F.col("__b"), F.col("__c")))
        # content fingerprint of the model this partial scored under:
        # bins from DIFFERENT reference models are incomparable, and
        # nothing else records which model produced them — the merge
        # refuses to blend mixed fingerprints (the mixed-token-budget
        # rule's twin).  Order-independent sum of bounded row hashes
        # (coherence check, not crypto), exactly representable as a
        # double.
        legs.append(
            _scalar_leg(
                ppl_model.agg(
                    F.sum(
                        F.pmod(
                            F.xxhash64("tok", "logp", "unk_logp"),
                            F.lit(2_147_483_647),
                        )
                    ).alias("__fp")
                ),
                "fp",
                ["__fp"],
            )
        )
    has_packing = token_budget is not None and {
        "pack_shard", "seq_id", "n_tokens", "oversize"
    } <= set(docs.columns)
    if has_packing:
        bins = docs.groupBy("pack_shard", "seq_id").agg(
            F.sum("n_tokens").alias("__fill"),
            F.max(F.col("oversize").cast("int")).alias("__over"),
        )
        legs.append(
            _scalar_leg(
                bins.agg(
                    F.count(F.lit(1)).cast("double").alias("n_sequences"),
                    F.sum("__fill").cast("double").alias("__sum_fill"),
                    F.sum(
                        F.when(F.col("__over") == 0, F.lit(1)).otherwise(
                            F.lit(0)
                        )
                    ).cast("double").alias("__n_nonover"),
                    F.sum(
                        F.when(
                            F.col("__over") == 0,
                            F.col("__fill") / F.lit(float(token_budget)),
                        )
                    ).cast("double").alias("__sum_occ"),
                    F.sum("__over").cast("double").alias(
                        "oversize_sequences"
                    ),
                ),
                "packing",
                [
                    "n_sequences", "__sum_fill", "__n_nonover",
                    "__sum_occ", "oversize_sequences",
                ],
            )
        )
    got = _collect_legs(legs)
    glob = {k: v for k, (v, _s) in got["glob"].items()}
    ngrow = {k: v for k, (v, _s) in got["ngram"].items()}
    rows = [
        ("size", "docs", glob["docs"], None),
        ("size", "tokens", glob["tokens"], None),
        ("size", "chars", glob["chars"], None),
        ("pii", "pii_emails", glob["pii_emails"], None),
        ("pii", "pii_ipv4", glob["pii_ipv4"], None),
        ("pii", "pii_phones", glob["pii_phones"], None),
        ("diversity", "ngrams_13", ngrow["__n"], None),
    ]
    # sparse quality-score bin counts (merge-internal: summed across
    # increments, then merge_card_partials derives the percentiles and
    # never emits the raw bins)
    rows += [
        ("quality_hist", f"b{i:02d}", float(v), None)
        for i, v in sorted(
            (int(k), v) for k, (v, _s) in got.get("q_bin", {}).items()
        )
        if v
    ]
    if ppl_model is not None:
        rows += [
            ("ppl_hist", f"b{int(b):03d}", float(c), None)
            for b, c in sorted(
                ((int(k), v) for k, (v, _s) in got.get("ppl_bin", {}).items())
            )
        ]
        fp = got["fp"]["__fp"][0]
        rows.append(("ppl_hist", "__model_fp", float(fp or 0), None))
    # an empty frame aggregates to NULL sketches — omit the rows (the
    # merge treats a missing sketch as contributing nothing, exactly
    # like an empty increment contributes nothing to a sum)
    dup_sk = got["glob"]["__dup_sk"][1]
    if dup_sk is not None:
        rows.append(("dup", "exact_dup_hll", None, bytes(dup_sk)))
    ng_sk = got["ngram"]["__sk"][1]
    if ng_sk is not None:
        rows.append(
            ("diversity", "distinct_13gram_hll", None, bytes(ng_sk))
        )
    if has_packing:
        pk = {k: v for k, (v, _s) in got["packing"].items()}
        rows += [
            ("packing", "n_sequences", pk["n_sequences"], None),
            ("packing", "__sum_fill", pk["__sum_fill"], None),
            ("packing", "__n_nonover", pk["__n_nonover"], None),
            ("packing", "__sum_occ", pk["__sum_occ"], None),
            ("packing", "oversize_sequences", pk["oversize_sequences"], None),
            ("packing", "__budget_sum", float(token_budget), None),
            ("packing", "__budget_n", 1.0, None),
        ]
    if benchmark is not None:
        from bigdataproject_formula1_telemetry_spark.operators import (
            dedup as DD,
            embed as EM,
        )

        nh = (
            DD.contamination_hits(
                docs, benchmark, text_col=text_col, id_col=id_col,
                bench_text_col=bench_text_col,
            ).count()
        )
        ns = (
            EM.semantic_contamination_pairs(
                docs, benchmark, threshold=0.95,
                text_col=text_col, id_col=id_col,
                bench_text_col=bench_text_col,
            )
            .select(id_col)
            .distinct()
            .count()
        )
        rows += [
            ("contamination", "contam_ngram_docs", float(nh), None),
            ("contamination", "contam_semantic_docs", float(ns), None),
        ]
    partial = spark.createDataFrame(rows, out_schema)
    if lang_col is not None and lang_col in docs.columns:
        partial = partial.unionByName(
            docs.groupBy(F.col(lang_col).alias("key"))
            .agg(F.count(F.lit(1)).cast("double").alias("value"))
            .select(
                F.lit("lang").alias("section"),
                "key",
                "value",
                F.lit(None).cast("binary").alias("sketch"),
            )
        )
    if "url" in docs.columns:
        from bigdataproject_formula1_telemetry_spark.operators import (
            urls as UR,
        )

        partial = partial.unionByName(
            UR.url_parts(docs.select(id_col, "url"))
            .groupBy(F.col("domain").alias("key"))
            .agg(F.count(F.lit(1)).cast("double").alias("value"))
            .select(
                F.lit("domains").alias("section"),
                "key",
                "value",
                F.lit(None).cast("binary").alias("sketch"),
            )
        )
    return partial


def merge_card_partials(partials: DataFrame) -> DataFrame:
    """Combine :func:`corpus_card_partial` rows (any number of
    increments, unioned or read from a partials table) into card rows
    — same tidy ``(section, key, value)`` shape and same key names as
    :func:`corpus_card` for every covered section, so downstream
    consumers (``sinks.write_html_report``, the release invariants)
    read both interchangeably.  The merge is ONE groupBy over
    already-reduced rows (a few dozen per increment) — O(#increments),
    never a corpus scan; sums add, HLL sketches union losslessly
    (``hll_union_agg``: register max — associative, commutative,
    identical to the one-shot sketch, pinned in tests), and the derived
    rows (dup fraction, distinct-gram fraction, domain concentration)
    are recomputed from the merged components exactly as
    ``corpus_card`` derives them."""
    spark = partials.sparkSession
    sums = (
        partials.where(F.col("sketch").isNull())
        .groupBy("section", "key")
        .agg(F.sum("value").alias("value"))
    )
    # ONE probe action collects every scalar the derivations below need
    # (summed bins, sketch estimates, budget min/max/distinct, model-
    # fingerprint distinct count, domains presence) instead of five
    # sequential driver round trips — the values are identical, the
    # per-job overhead is paid once.  ``est`` guards on ``> 0``: a
    # union over a group with no sketches estimates 0 (a real sketch
    # always estimates ≥ 1; empty increments omit their sketch row).
    probe_agg = partials.groupBy("section", "key").agg(
        F.sum("value").alias("value"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count_distinct("value").cast("double").alias("nd"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch"))
        .cast("double")
        .alias("est"),
    )
    probe = probe_agg.where(
        F.col("section").isin(
            "size", "diversity", "packing", "quality_hist", "ppl_hist",
            "dup",
        )
    ).unionByName(
        partials.where(F.col("section") == F.lit("domains"))
        .limit(1)
        .select(
            F.lit("__has_domains").alias("section"),
            F.lit("").alias("key"),
            F.lit(1.0).alias("value"),
            F.lit(None).cast("double").alias("lo"),
            F.lit(None).cast("double").alias("hi"),
            F.lit(None).cast("double").alias("nd"),
            F.lit(None).cast("double").alias("est"),
        )
    ).collect()
    by_key = {(r["section"], r["key"]): r for r in probe}
    scal = {
        (s, k): r["value"]
        for (s, k), r in by_key.items()
        if s in ("size", "diversity", "packing", "quality_hist", "ppl_hist")
    }
    est = {
        (s, k): r["est"]
        for (s, k), r in by_key.items()
        if r["est"] is not None and r["est"] > 0
    }
    docs_n = scal.get(("size", "docs"), 0.0) or 0.0
    ngrams = scal.get(("diversity", "ngrams_13"), 0.0) or 0.0
    # summed fixed-bin quality counts → fresh approximate percentiles
    # (the mergeable face of an order statistic; bins never leave the
    # merge)
    qbins = {
        int(k[1:]): v
        for (s, k), v in scal.items()
        if s == "quality_hist" and k.startswith("b") and v
    }
    pbins = {
        int(k[1:]): v
        for (s, k), v in scal.items()
        if s == "ppl_hist" and k.startswith("b") and v
    }
    ppl_rows: list[tuple] = []
    if pbins:
        # refuse to blend bins scored under DIFFERENT reference models
        # (a swapped <release>/ppl_model would otherwise merge
        # incomparable log-bins with no trace) — the
        # mixed-token-budget rule's twin: emit a sentinel, derive
        # nothing
        fpr = by_key.get(("ppl_hist", "__model_fp"))
        n_models = fpr["nd"] if fpr is not None else None
        if n_models is not None and n_models > 1:
            ppl_rows = [("ppl_hist", "mixed_reference_models", n_models)]
        else:
            ppl_rows = list(_ppl_percentile_rows(pbins))
    derived = (
        list(_quality_percentile_rows(qbins)) + ppl_rows
    ) + [
        (
            "dup",
            "exact_dup_frac_approx",
            (1.0 - est[("dup", "exact_dup_hll")] / docs_n)
            if docs_n > 0 and ("dup", "exact_dup_hll") in est
            else None,
        ),
        ("diversity", "ngrams_13", ngrams),
        (
            "diversity",
            "distinct_13gram_frac_approx",
            (est[("diversity", "distinct_13gram_hll")] / ngrams)
            if ngrams > 0 and ("diversity", "distinct_13gram_hll") in est
            else None,
        ),
    ]
    n_seq = scal.get(("packing", "n_sequences"))
    if n_seq:
        n_nonover = scal.get(("packing", "__n_nonover")) or 0.0
        # each partial carries its OWN budget as one __budget_sum row
        # (with __budget_n = 1), so min/max/distinct over the raw rows
        # is exact per-increment.  Averaging differing budgets would
        # report a budget no increment used, and the occupancy sum
        # would mix fills normalized against different denominators
        # (ADVICE r13) — emit min/max + a mixed sentinel and NULL the
        # occupancy instead of silently blending.
        _b = by_key.get(("packing", "__budget_sum"))
        brow = {
            "lo": _b["lo"] if _b is not None else None,
            "hi": _b["hi"] if _b is not None else None,
            "n": _b["nd"] if _b is not None else 0.0,
        }
        mixed = brow["n"] is not None and brow["n"] > 1
        derived += [
            (
                "packing",
                "mean_seq_tokens",
                (scal[("packing", "__sum_fill")] or 0.0) / n_seq,
            ),
            (
                "packing",
                "occupancy",
                (scal[("packing", "__sum_occ")] / n_nonover)
                if n_nonover > 0 and not mixed
                else None,
            ),
        ]
        if mixed:
            derived += [
                ("packing", "token_budget_min", brow["lo"]),
                ("packing", "token_budget_max", brow["hi"]),
                ("packing", "mixed_token_budgets", brow["n"]),
            ]
        else:
            derived.append(("packing", "token_budget", brow["lo"]))
    card = sums.where(
        ~F.col("section").isin(
            "diversity", "domains", "quality_hist", "ppl_hist"
        )
        & ~F.col("key").startswith("__")
    ).unionByName(
        spark.createDataFrame(
            derived, "section string, key string, value double"
        )
    )
    dom = sums.where(F.col("section") == F.lit("domains"))
    if ("__has_domains", "") in by_key:
        dsum = dom.where(F.col("key").isNotNull()).agg(
            F.count(F.lit(1)).cast("double").alias("distinct_domains"),
            (F.max("value") / F.sum("value")).alias("top_domain_frac"),
        ).first()
        card = card.unionByName(
            spark.createDataFrame(
                [
                    ("domains", "distinct_domains", dsum["distinct_domains"]),
                    ("domains", "top_domain_frac", dsum["top_domain_frac"]),
                ],
                "section string, key string, value double",
            )
        ).unionByName(
            dom.orderBy(F.col("value").desc(), F.col("key").asc())
            .limit(10)
            .select(
                F.lit("domains").alias("section"),
                F.coalesce(F.col("key"), F.lit("<no-host>")).alias("key"),
                "value",
            )
        )
    return card


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    shingle_n: int = 8,
    semantic_threshold: float = 0.95,
    mmr_lambda: float | None = None,
    fetch_k: int | None = None,
    score_round: int | None = None,
    bm25_index_path: str | None = None,
) -> DataFrame:
    """The RETRIEVAL face of contamination auditing: for every benchmark
    item, the top-``k`` corpus docs by BM25 (``retrieval.bm25_topk``),
    each annotated with the two decontamination passes' verdicts —
    ``contam_ngrams`` (shared ``shingle_n``-gram count with the
    benchmark, ``dedup.contamination_hits``; 0 = verbatim-clean) and
    ``cos_sim`` (hashed-BoW cosine to THIS item when ≥ threshold,
    ``embed.semantic_contamination_pairs``; NULL = semantically clean).
    This is the published retrieval-based contamination-audit recipe:
    lexical search surfaces the near-miss neighborhood the exact gates
    don't flag, so a reviewer reads ranked evidence per eval item
    instead of a bare count (``corpus_card(benchmark=)`` reports those
    counts; this report names the docs).

    ``mmr_lambda`` diversifies the evidence: BM25 fetches a deeper
    ``fetch_k`` pool (default max(2k, 20)) and ``retrieval.mmr_rerank``
    cuts it to ``k`` over hashed-BoW embeddings, with relevance
    normalized to the per-query pool max so the λ trade is
    like-for-like against cosine — a benchmark item whose
    lexical neighborhood is one duplicate family then shows the family
    ONCE plus the distinct near-misses behind it, instead of k copies
    of the same evidence.  ``rank`` becomes the diverse pick order;
    ``score`` stays the doc's BM25 relevance.

    Returns ``(bench_id, rank, doc_id, score, contam_ngrams, cos_sim)``
    sorted by (bench_id, rank).  ``score_round`` applies the
    ``bm25_topk`` portable half-up rounding to the retrieval (and MMR)
    ranking — set it when the report must be engine-reproducible (the
    q57 ``contam_report`` oracle fold).

    100 TB shape: three independent single-corpus-scan passes (BM25
    tf/df with broadcast query vocabulary; broadcast benchmark gram
    set; broadcast benchmark embedding matrix) — everything joined
    AFTER reduction, on frames bounded by |benchmark|·k, the flagged
    docs, and the ≥threshold pairs.  No pass shuffles the corpus text;
    the MMR leg embeds ONLY the broadcast-semi-narrowed candidate pool
    (|benchmark|·fetch_k docs), never the corpus.

    ``bm25_index_path`` (r13, SCALING r12 residual 1) serves the
    retrieval leg from a MATERIALIZED serving index
    (``bm25_index.bm25_topk_indexed`` — bucket partition filter + term
    pushdown, no corpus scan) instead of scan-form ``bm25_topk``; the
    release train maintains exactly this index
    (``corpus_release(bm25_index_path=)``), so the steady-state audit
    of a release touches the corpus text ONLY for the report's own
    rows: the retrieved id cut (bounded by |benchmark|·fetch_k, the
    broadcast-small query contract) becomes a pushed ``isin`` literal
    filter on the docs scan and every remaining pass — gram overlap,
    semantic cosine, MMR embedding — runs over that sub-corpus slice.
    The ranked cut is COLLECTED once at call time (the only eager step;
    same boundedness), so the index is served exactly once however many
    legs reuse it.  Results are identical to the scan form by the
    index-over-the-same-docs contract, pinned end-to-end in tests —
    pass ``score_round`` whenever cross-form (or cross-engine)
    reproducibility matters, exactly as for ``bm25_topk``."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        dedup as DD,
        embed as EM,
        retrieval as RT,
    )

    if mmr_lambda is not None and fetch_k is not None and fetch_k <= k:
        # the docstring's contract is a DEEPER pool: fetch_k < k would
        # silently return fewer than k rows per query, fetch_k == k gives
        # MMR nothing beyond the plain cut to diversify with (ADVICE r11)
        raise ValueError(
            f"contamination_report: fetch_k ({fetch_k}) must exceed k "
            f"({k}) when mmr_lambda is set — MMR diversifies by cutting "
            "a deeper pool; omit fetch_k for the max(2k, 20) default"
        )
    btc = bench_text_col
    queries = benchmark.select(
        F.col(bench_id_col).cast("string").alias("query_id"),
        F.col(btc).alias("text"),
    )
    deep_k = k if mmr_lambda is None else (fetch_k or max(2 * k, 20))
    ann_docs = docs  # the annotation/MMR legs' doc source
    if bm25_index_path is None:
        top = RT.bm25_topk(
            docs.select(id_col, text_col), queries, k=deep_k,
            text_col=text_col, id_col=id_col, score_round=score_round,
        )
    else:
        from bigdataproject_formula1_telemetry_spark.operators.bm25_index import (
            bm25_topk_indexed,
        )

        spark = docs.sparkSession
        top = bm25_topk_indexed(
            spark, bm25_index_path, queries, k=deep_k,
            score_round=score_round,
        )
        if id_col != "doc_id":
            top = top.withColumnRenamed("doc_id", id_col)
        # serve the index exactly ONCE: localize the ranked cut (bounded
        # by |benchmark|·deep_k rows — the broadcast-small contract) so
        # the MMR and final-join consumers reuse local rows instead of
        # re-running the pruned scan
        cut = top.collect()
        top = spark.createDataFrame(cut, top.schema)
        # the annotation (and MMR-embedding) values are per-doc pure
        # (broadcast benchmark gram set / embedding matrix — nothing
        # corpus-global), so those legs only need the report's own rows:
        # an isin LITERAL id filter reaches the parquet scan as a pushed
        # filter and every downstream pass runs over the slice
        ids = sorted({r[id_col] for r in cut})
        ann_docs = (
            docs.where(F.col(id_col).isin(ids)) if ids else docs.limit(0)
        )
    if mmr_lambda is not None:
        from pyspark.sql import Window

        pool_ids = top.select(id_col).distinct()
        cand_docs = ann_docs.select(id_col, text_col).join(
            F.broadcast(pool_ids), id_col, "left_semi"
        )
        vecs = EM.hashed_embedding(
            cand_docs, text_col=text_col, out_col="__v"
        ).select(id_col, "__v")
        # BM25 scores (unbounded) and cosines ([-1, 1]) are incomparable
        # scales — normalize relevance to [0, 1] per query (divide by the
        # pool max) so mmr_lambda trades like-for-like; the report still
        # carries the RAW BM25 score.
        wq = Window.partitionBy("query_id")
        rel = top.withColumn(
            "__rel", F.col("score") / F.max("score").over(wq)
        )
        top = (
            RT.mmr_rerank(
                rel, vecs, k=k, lam=mmr_lambda,
                id_col=id_col, vec_col="__v", score_col="__rel",
                score_round=score_round,
            )
            .select("query_id", id_col, "rank")
            .join(top.select("query_id", id_col, "score"),
                  ["query_id", id_col])
        )
    # join the original (typed) bench id back via its string form
    bids = benchmark.select(
        F.col(bench_id_col).alias("bench_id"),
        F.col(bench_id_col).cast("string").alias("query_id"),
    ).distinct()
    hits = DD.contamination_hits(
        ann_docs, benchmark, text_col=text_col, id_col=id_col,
        shingle_n=shingle_n, bench_text_col=btc,
    )
    pairs = EM.semantic_contamination_pairs(
        ann_docs, benchmark, threshold=semantic_threshold,
        text_col=text_col, id_col=id_col,
        bench_id_col=bench_id_col, bench_text_col=btc,
    )
    return (
        top.join(F.broadcast(bids), "query_id")
        .join(hits, id_col, "left")
        .join(pairs, [id_col, "bench_id"], "left")
        .select(
            "bench_id",
            "rank",
            id_col,
            "score",
            F.coalesce("n_contaminated_ngrams", F.lit(0)).cast("long").alias(
                "contam_ngrams"
            ),
            "cos_sim",
        )
        .orderBy("bench_id", "rank")
    )


def corpus_diff(
    old_docs: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Release-to-release corpus accounting: one row per doc id in
    either release with ``change`` ∈ {added, removed, modified,
    unchanged} (modified = same id, different content hash) — what a
    release reviewer reads before signing off an updated dataset, and
    the input to incremental re-processing decisions (only added +
    modified need re-curation).

    Plan: each side reduces to narrow (id, md5) rows, ONE full outer
    join on the uniform id key classifies — text never shuffles and the
    join carries 16-byte hashes.  Summarize with
    ``.groupBy("change").count()``."""
    key = F.coalesce(F.md5(F.col(text_col)), F.lit("\x00null"))
    o = old_docs.select(F.col(id_col).alias("id"), key.alias("__oh"))
    n = new_docs.select(F.col(id_col).alias("id"), key.alias("__nh"))
    return o.join(n, "id", "full_outer").select(
        "id",
        F.when(F.col("__oh").isNull(), F.lit("added"))
        .when(F.col("__nh").isNull(), F.lit("removed"))
        .when(F.col("__oh") == F.col("__nh"), F.lit("unchanged"))
        .otherwise(F.lit("modified"))
        .alias("change"),
    )


def corpus_diff_near(
    old_docs: DataFrame,
    new_docs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """:func:`corpus_diff` with near-duplicate ATTRIBUTION of the churn:
    every ``added`` doc that is a ≥ ``threshold`` n-gram-Jaccard
    near-duplicate of some ``removed`` doc gets ``near_of`` = that
    removed doc's id and ``near_jaccard`` = the similarity (best
    Jaccard, then lowest removed id).  This is the release-review
    question ``corpus_diff`` alone can't answer: re-ided / lightly
    edited / moved content shows up as added+removed churn, and a
    reviewer counting "fresh data added" must subtract it.

    Output: one row per id in either release —
    ``(id, change, near_of, near_jaccard)``; the two new columns are
    non-NULL only on attributed ``added`` rows.  Same-id edits are
    already classified ``modified`` and are NOT re-attributed here.

    100 TB shape: the MinHash/LSH machinery runs over the CHURN only
    (added ∪ removed texts, disjoint id sets by construction), never a
    full release; candidate pairs come banded+bucket-capped from
    ``dedup.minhash_lsh_candidates`` and only cross-side pairs are
    Jaccard-verified."""
    from bigdataproject_formula1_telemetry_spark.operators import dedup as DD

    if not (0.0 < threshold <= 1.0):
        raise ValueError(
            f"corpus_diff_near: threshold must be in (0, 1], got {threshold}"
        )
    d = corpus_diff(old_docs, new_docs, text_col=text_col, id_col=id_col)
    added = d.where(F.col("change") == "added").select("id")
    removed = d.where(F.col("change") == "removed").select("id")
    a_txt = new_docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__t")
    ).join(added, "id", "left_semi")
    r_txt = old_docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__t")
    ).join(removed, "id", "left_semi")
    pool = a_txt.unionByName(r_txt)  # id sets disjoint by construction
    cands = DD.minhash_lsh_candidates(
        pool, text_col="__t", id_col="id",
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
    )
    jac = DD.jaccard_pairs(
        pool, cands, text_col="__t", id_col="id", shingle_n=shingle_n
    ).where(F.col("jaccard") >= F.lit(float(threshold)))
    # keep cross-side pairs only, oriented (added, removed): tag every
    # pool id once with its side, join the tag to both pair ends
    tags = added.select("id", F.lit(True).alias("__t")).unionByName(
        removed.select("id", F.lit(False).alias("__t"))
    )
    cross = (
        jac.join(
            tags.select(F.col("id").alias("id_a"), F.col("__t").alias("__ta")),
            "id_a",
        )
        .join(
            tags.select(F.col("id").alias("id_b"), F.col("__t").alias("__tb")),
            "id_b",
        )
        .where(F.col("__ta") != F.col("__tb"))
        .select(
            F.when(F.col("__ta"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("__add"),
            F.when(F.col("__ta"), F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("__rem"),
            "jaccard",
        )
    )
    w = Window.partitionBy("__add").orderBy(
        F.col("jaccard").desc(), F.col("__rem").asc()
    )
    best = (
        cross.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col("__add").alias("id"),
            F.col("__rem").alias("near_of"),
            F.col("jaccard").alias("near_jaccard"),
        )
    )
    return d.join(best, "id", "left").select(
        "id", "change", "near_of", "near_jaccard"
    )


def audit_warehouse(meta: DataFrame, warehouse: DataFrame) -> DataFrame:
    """§5 audit as a real assertable query (detailed_data_audit,
    F1_Data_Test.ipynb:135-240): expected races left-joined to per-round
    aggregates; missing rounds get zero rows/drivers."""
    actual = warehouse.groupBy(
        F.col("Year").alias("year"), F.col("Round").alias("round")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("Driver").alias("n_drivers"),
        F.countDistinct("LapNumber").alias("n_laps"),
    )
    audited = R.left_join_audit(
        meta, actual, ["year", "round"], ["n_rows", "n_drivers", "n_laps"]
    )
    return audited.withColumn(
        "status",
        F.when(F.col("n_rows") == 0, F.lit("MISSING"))
        .when(F.col("n_drivers") < 15, F.lit("INCOMPLETE"))
        .otherwise(F.lit("OK")),
    )


def write_training_shards(
    packed: DataFrame,
    path: str,
    shard_col: str = "pack_shard",
    seq_col: str = "seq_id",
    n_tokens_col: str = "n_tokens",
) -> DataFrame:
    """Deliver a curated+packed corpus as training shards: the chunk rows
    are written partitioned by ``shard_col`` (one directory per shard —
    the unit a data-loader worker claims), and a tiny manifest table
    (shard, n_sequences, n_chunks, n_tokens) is written next to them and
    returned.  The manifest is what a training job reads FIRST: worker
    assignment, token accounting, and progress denominators without
    scanning the data.  Reading one shard back is a partition-pruned
    scan (``spark.read.parquet(path/data).where(shard_col = k)`` — same
    pruning contract as ``io.read_partition``)."""
    import os as _os

    # STATIC overwrite per-write: a shard set is a complete artifact.
    # Under the session default (``partitionOverwriteMode=dynamic``, the
    # incremental-ETL setting) an overwrite only replaces the partitions
    # the NEW data produces — re-releasing onto a used path would leave
    # stale shards from the previous release mixed into the new one.
    packed.write.mode("overwrite").option(
        "partitionOverwriteMode", "static"
    ).partitionBy(shard_col).parquet(_os.path.join(path, "data"))
    spark = packed.sparkSession
    # explicit schema: a zero-row release writes a fileless directory
    # that schema inference cannot read; the manifest must still come
    # back (empty) so corpus_release can refuse from it
    written = spark.read.schema(packed.schema).parquet(
        _os.path.join(path, "data")
    )
    manifest = (
        written.groupBy(shard_col)
        .agg(
            F.countDistinct(seq_col).alias("n_sequences"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(n_tokens_col).cast("long").alias("n_tokens"),
        )
        .orderBy(shard_col)
    )
    manifest.write.mode("overwrite").parquet(_os.path.join(path, "manifest"))
    return spark.read.parquet(_os.path.join(path, "manifest"))


def _bm25_chunk_rows(packed: DataFrame, id_col: str) -> DataFrame:
    """Released chunk rows in the shape the lexical serving index wants:
    the chunk identity ``(id_col, chunk_idx)`` flattened to one string id
    (``<doc>#<idx>`` — unique per release lifetime because doc ids are)
    and ``chunk_text`` as the text column."""
    return packed.select(
        F.concat(
            F.col(id_col).cast("string"),
            F.lit("#"),
            F.col("chunk_idx").cast("string"),
        ).alias("chunk_id"),
        F.col("chunk_text").alias("text"),
    )


def corpus_release(
    docs: DataFrame,
    path: str,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    bm25_index_path: str | None = None,
    **curate_kwargs,
) -> dict[str, DataFrame]:
    """The end-to-end "corpus release" artifact a training run consumes:
    curate → write sharded data + manifest → datasheet card, composed
    as ONE pipeline and written under one root —

    - ``path/data``      partitioned training shards (chunk rows),
    - ``path/manifest``  (shard, n_sequences, n_chunks, n_tokens),
    - ``path/card``      the ``corpus_card`` datasheet computed over the
      RELEASED chunk rows (so its size section is the ground truth of
      what was shipped, not of the pre-curation input), including the
      contamination section when ``benchmark`` is given.

    Returns ``{"manifest": ..., "card": ...}``, both re-read from the
    written parquet (what a consumer will actually see).  Release
    invariant (pinned in tests and derivable by any consumer): the
    card's ``docs`` row equals the manifest's Σ n_chunks equals the
    packed row count, and — when token budgeting used whitespace counts
    — the card's ``tokens`` row equals the manifest's Σ n_tokens.

    ``bm25_index_path`` (r12) additionally builds the materialized
    LEXICAL SERVING index (``operators/bm25_index.py``) over the
    released chunk rows — ids ``<doc>#<chunk_idx>`` — so the
    steady-state audit (``bm25_topk_indexed`` /
    ``contamination_report``'s retrieval leg) never rescans the
    release; ``corpus_release_append`` keeps it fresh per increment
    under the same increment id.

    Scale shape: curation is the measured ``curate_documents`` plan; the
    shard write is one partitioned write; the manifest and card are
    single aggregate scans over the written shards.  See bench.py's
    ``corpus_release`` entry."""
    import os as _os

    # write-then-verify, NO full-release checkpoint (r6 verdict): the
    # shard write itself is the one materialization of the curated
    # corpus (curation's lineage runs exactly once, inside the write),
    # where localCheckpoint(eager) used to materialize a SECOND copy on
    # executor local storage and pin the job to those executors —
    # non-replicated, so losing one executor during the multi-minute
    # shard write killed the job.  Emptiness is derived from the
    # manifest afterwards: zero shards → delete the root and refuse, so
    # a consumer can never be pointed at an unreadable empty release.
    packed = curate_documents(
        docs,
        text_col=text_col,
        id_col=id_col,
        benchmark=benchmark,
        **curate_kwargs,
    )
    manifest = write_training_shards(packed, path)
    spark = docs.sparkSession
    if manifest.isEmpty():
        jvm = spark._jvm
        root = jvm.org.apache.hadoop.fs.Path(path)
        root.getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        ).delete(root, True)
        raise ValueError(
            "corpus_release: nothing survived curation — refusing to "
            "write an empty release (check gate thresholds)"
        )
    # a release is a FRESH artifact: clear any incremental state a
    # previous release left under this root (its increments/ and
    # manifest_full), or read_release would union STALE increments into
    # the new base.  The data overwrite above already replaced the base
    # (and with it any compaction marker), so in-place re-release was
    # never reader-safe mid-write — this just makes the end state clean.
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    for stale in ("increments", "manifest_full", "card_partials", "ppl_model"):
        fs.delete(jvm.org.apache.hadoop.fs.Path(_os.path.join(path, stale)), True)
    released = spark.read.parquet(_os.path.join(path, "data"))
    if bm25_index_path is not None:
        from bigdataproject_formula1_telemetry_spark.operators.bm25_index import (
            build_bm25_index,
        )

        # a release is a FRESH artifact, and build_bm25_index is a fresh
        # generation (it resets the index's lease/folded-id state), so
        # the serving index always mirrors exactly this base
        build_bm25_index(
            _bm25_chunk_rows(released, id_col),
            bm25_index_path,
            id_col="chunk_id",
        )
    # FROZEN reference LM (r14): trained once on the base release and
    # persisted beside it, so every future increment's card partial
    # scores perplexity under the SAME model — that's what makes the
    # ppl_hist bins mergeable (CCNet practice: one fixed reference LM,
    # scores comparable across shards and over time).  Vocab-capped, so
    # the artifact is broadcast-small.  At base time this model IS the
    # card's self-trained model (same docs, same recipe), so it feeds
    # the card's perplexity leg too — ONE train pass, not two.
    from bigdataproject_formula1_telemetry_spark.operators import lm as _L

    _L.unigram_lm(
        released, text_col="chunk_text", vocab_size=50_000
    ).write.mode("overwrite").parquet(_os.path.join(path, "ppl_model"))
    ref_lm = spark.read.parquet(_os.path.join(path, "ppl_model"))
    # Card + base card partial + packing section in ONE fused action
    # (r14 optimization round): the sequential form re-scanned the
    # released rows nine times across seven driver round trips — see
    # ``_release_card_and_partial``.  The partial (r13) is written
    # unconditionally so the release can switch to
    # refresh_card="incremental" appends at any point; it stays
    # benchmark-free (contamination is a full-card/audit feature), and
    # the packing section is what the data loader actually consumes —
    # bin counts, mean fill against the budget, and the oversize tail.
    budget = float(curate_kwargs.get("token_budget", 1024))
    card_rows, partial_rows = _release_card_and_partial(
        released, budget, ref_lm, id_col=id_col, benchmark=benchmark
    )
    # provenance: the curation config ships WITH the release (one-row
    # json table at path/config), and the card carries its hash — two
    # releases with the same card hash row were curated identically,
    # and corpus_diff + config diff together explain any delta.  Only
    # JSON-serializable kwargs are recorded verbatim; model/DataFrame
    # arguments record their type name (their content is already
    # pinned by the released data itself).
    import hashlib as _hl
    import json as _json

    def _jsonable(v):
        try:
            _json.dumps(v)
            return v
        except TypeError:
            return f"<{type(v).__name__}>"

    config = {
        "text_col": text_col,
        "id_col": id_col,
        "benchmark": benchmark is not None,
        **{k: _jsonable(v) for k, v in sorted(curate_kwargs.items())},
    }
    config_json = _json.dumps(config, sort_keys=True)
    config_hash = _hl.md5(config_json.encode()).hexdigest()
    card = spark.createDataFrame(
        card_rows, schema="section string, key string, value double"
    ).unionByName(
        spark.createDataFrame(
            [("provenance", f"config_md5:{config_hash}", 1.0)],
            schema="section string, key string, value double",
        )
    )
    # the three tail artifacts (base card partial, config, card) are
    # tiny already-reduced tables at DISJOINT paths whose contents are
    # all in hand (the card needs only the config HASH, computed
    # driver-side above, not the config WRITE) — write them overlapped
    # (guide §2.6, r15: three sequential tiny-parquet commits were
    # ~1.7 s of pure commit latency per release)
    _run_overlapped(
        [
            lambda: spark.createDataFrame(
                partial_rows,
                "section string, key string, value double, sketch binary",
            ).write.mode("overwrite").parquet(
                _os.path.join(path, "card_partials", "base")
            ),
            lambda: spark.createDataFrame(
                [(config_json, config_hash)],
                "config_json string, config_md5 string",
            ).write.mode("overwrite").parquet(_os.path.join(path, "config")),
            lambda: card.write.mode("overwrite").parquet(
                _os.path.join(path, "card")
            ),
        ]
    )
    return {
        "manifest": manifest,
        "card": spark.read.parquet(_os.path.join(path, "card")),
    }


def _release_card_and_partial(
    released: DataFrame,
    token_budget: float,
    ref_lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "chunk_text",
    benchmark: DataFrame | None = None,
    bench_text_col: str = "text",
) -> tuple[list[tuple], list[tuple]]:
    """Fused card + base-partial + packing measurement for
    ``corpus_release`` (r14 optimization round): the sequential form
    re-scanned the released rows NINE times across seven driver round
    trips (card glob / card ppl / card ngram / partial glob / partial
    ngram / partial ppl-bins / packing ×2); here every leg unions into
    ONE action, and the legs that compute the same measure for both
    artifacts (glob row-level sums, the 13-gram explode, the packing
    two-level aggregate) run ONCE as a superset aggregate — 5 scans in
    1 job.  Every aggregate expression is bit-identical to
    :func:`corpus_card` / :func:`corpus_card_partial`; the card's
    packing means derive from the partial's sums exactly as Spark's
    ``avg`` derives them (final ``sum/count`` division).

    Returns ``(card_rows, partial_rows)`` — plain tuples in the same
    row order the unfused functions emit."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        lm as L,
        text as T,
    )

    t = F.col(text_col)
    pii = T.pii_counts(t)
    key = F.when(t.isNotNull(), F.md5(t)).otherwise(F.lit("\x00null"))
    qtiles = F.array(F.lit(0.1), F.lit(0.5), F.lit(0.9))
    dq = released.withColumn("__q", T.quality_score(t))
    glob_super = dq.agg(
        F.count(F.lit(1)).cast("double").alias("docs"),
        F.sum(T.token_count(t)).cast("double").alias("tokens"),
        F.sum(F.length(t)).cast("double").alias("chars"),
        F.percentile_approx(F.col("__q"), qtiles).alias("_q"),
        (
            1.0
            - F.approx_count_distinct(key, 0.02).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("exact_dup_frac_approx"),
        F.sum(pii["email"]).cast("double").alias("pii_emails"),
        F.sum(pii["ipv4"]).cast("double").alias("pii_ipv4"),
        F.sum(pii["phone"]).cast("double").alias("pii_phones"),
        F.hll_sketch_agg(key).alias("__dup_sk"),
    ).select(
        "docs", "tokens", "chars",
        F.col("_q")[0].alias("q_p10"),
        F.col("_q")[1].alias("q_p50"),
        F.col("_q")[2].alias("q_p90"),
        "exact_dup_frac_approx", "pii_emails", "pii_ipv4", "pii_phones",
        "__dup_sk",
    )
    ng = released.select(
        F.explode(T.shingles_ngrams(t, 13)).alias("__g")
    ).select(F.xxhash64("__g").alias("__h"))
    ng_super = ng.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.approx_count_distinct("__h", 0.02).cast("double").alias("__d"),
        F.hll_sketch_agg("__h").alias("__sk"),
    )
    pplq = (
        L.doc_perplexity(released, ref_lm, text_col=text_col)
        .select("ppl")
        .agg(F.percentile_approx("ppl", qtiles).alias("_p"))
        .select(
            F.col("_p")[0].alias("ppl_p10"),
            F.col("_p")[1].alias("ppl_p50"),
            F.col("_p")[2].alias("ppl_p90"),
        )
    )
    pb = (
        L.doc_perplexity(
            released.withColumn("__rid", F.monotonically_increasing_id()),
            ref_lm,
            text_col=text_col,
            id_cols=("__rid",),
        )
        .groupBy(_ppl_bin(F.col("ppl")).alias("__b"))
        .agg(F.count(F.lit(1)).cast("double").alias("__c"))
    )
    fp_agg = ref_lm.agg(
        F.sum(
            F.pmod(F.xxhash64("tok", "logp", "unk_logp"), F.lit(2_147_483_647))
        ).alias("__fp")
    )
    bins = released.groupBy("pack_shard", "seq_id").agg(
        F.sum("n_tokens").alias("__fill"),
        F.max(F.col("oversize").cast("int")).alias("__over"),
    )
    pk_super = bins.agg(
        F.count(F.lit(1)).cast("double").alias("n_sequences"),
        F.sum("__fill").cast("double").alias("__sum_fill"),
        F.sum(
            F.when(F.col("__over") == 0, F.lit(1)).otherwise(F.lit(0))
        ).cast("double").alias("__n_nonover"),
        F.sum(
            F.when(
                F.col("__over") == 0,
                F.col("__fill") / F.lit(float(token_budget)),
            )
        ).cast("double").alias("__sum_occ"),
        F.sum("__over").cast("double").alias("oversize_sequences"),
    )
    legs = [
        _scalar_leg(
            glob_super,
            "glob",
            [
                "docs", "tokens", "chars", "q_p10", "q_p50", "q_p90",
                "exact_dup_frac_approx",
                "pii_emails", "pii_ipv4", "pii_phones",
            ],
            ["__dup_sk"],
        ),
        _kv_leg(
            _quality_hist_counts(released, t), "q_bin",
            F.col("__qbin"), F.col("__c"),
        ),
        _scalar_leg(ng_super, "ngram", ["__n", "__d"], ["__sk"]),
        _scalar_leg(pplq, "ppl", ["ppl_p10", "ppl_p50", "ppl_p90"]),
        _kv_leg(pb, "ppl_bin", F.col("__b"), F.col("__c")),
        _scalar_leg(fp_agg, "fp", ["__fp"]),
        _scalar_leg(
            pk_super,
            "packing",
            [
                "n_sequences", "__sum_fill", "__n_nonover",
                "__sum_occ", "oversize_sequences",
            ],
        ),
    ]
    if benchmark is not None:
        # the card's contamination section (the partial stays benchmark-
        # free by the release train's contract) — same expressions as
        # corpus_card, riding the same single action
        from bigdataproject_formula1_telemetry_spark.operators import (
            dedup as DD,
            embed as EM,
        )

        legs.append(
            _scalar_leg(
                DD.contamination_hits(
                    released, benchmark, text_col=text_col, id_col=id_col,
                    bench_text_col=bench_text_col,
                ).agg(
                    F.count(F.lit(1)).cast("double").alias(
                        "contam_ngram_docs"
                    )
                ),
                "contam_ngram",
                ["contam_ngram_docs"],
            )
        )
        legs.append(
            _scalar_leg(
                EM.semantic_contamination_pairs(
                    released, benchmark, threshold=0.95,
                    text_col=text_col, id_col=id_col,
                    bench_text_col=bench_text_col,
                )
                .select(id_col)
                .distinct()
                .agg(
                    F.count(F.lit(1)).cast("double").alias(
                        "contam_semantic_docs"
                    )
                ),
                "contam_sem",
                ["contam_semantic_docs"],
            )
        )
    got = _collect_legs(legs)
    glob = {k: v for k, (v, _s) in got["glob"].items()}
    ngrow = {k: v for k, (v, _s) in got["ngram"].items()}
    pk = {k: v for k, (v, _s) in got["packing"].items()}
    qbins = {
        int(k): float(v)
        for k, (v, _s) in got.get("q_bin", {}).items()
        if v
    }
    card_sections = {
        "docs": "size", "tokens": "size", "chars": "size",
        "q_p10": "quality", "q_p50": "quality", "q_p90": "quality",
        "ppl_p10": "quality", "ppl_p50": "quality", "ppl_p90": "quality",
        "exact_dup_frac_approx": "dup",
        "pii_emails": "pii", "pii_ipv4": "pii", "pii_phones": "pii",
    }
    n_seq = pk["n_sequences"] or 0.0
    n_nonover = pk["__n_nonover"] or 0.0
    card_rows = (
        [
            (card_sections[k], k, float(v) if v is not None else None)
            for k, v in glob.items()
            if not k.startswith("__")  # the __dup_sk sketch key
        ]
        + _quality_percentile_rows(qbins)
        + [
            (card_sections[k], k, float(v) if v is not None else None)
            for k, (v, _s) in got["ppl"].items()
        ]
        + [
            ("contamination", k, float(v) if v is not None else None)
            for leg in ("contam_ngram", "contam_sem")
            for k, (v, _s) in got.get(leg, {}).items()
        ]
        + [
            ("diversity", "ngrams_13", ngrow["__n"]),
            (
                "diversity",
                "distinct_13gram_frac_approx",
                (ngrow["__d"] / ngrow["__n"])
                if ngrow["__n"] and ngrow["__n"] > 0
                else None,
            ),
            ("packing", "n_sequences", pk["n_sequences"]),
            (
                "packing",
                "mean_seq_tokens",
                ((pk["__sum_fill"] or 0.0) / n_seq) if n_seq > 0 else None,
            ),
            (
                "packing",
                "occupancy",
                (pk["__sum_occ"] / n_nonover) if n_nonover > 0 else None,
            ),
            ("packing", "oversize_sequences", pk["oversize_sequences"]),
            ("packing", "token_budget", float(token_budget)),
        ]
    )
    partial_rows = [
        ("size", "docs", glob["docs"], None),
        ("size", "tokens", glob["tokens"], None),
        ("size", "chars", glob["chars"], None),
        ("pii", "pii_emails", glob["pii_emails"], None),
        ("pii", "pii_ipv4", glob["pii_ipv4"], None),
        ("pii", "pii_phones", glob["pii_phones"], None),
        ("diversity", "ngrams_13", ngrow["__n"], None),
    ] + [
        ("quality_hist", f"b{i:02d}", v, None) for i, v in sorted(qbins.items())
    ] + [
        ("ppl_hist", f"b{int(b):03d}", float(c), None)
        for b, c in sorted(
            ((int(k), v) for k, (v, _s) in got.get("ppl_bin", {}).items())
        )
    ]
    fp = got["fp"]["__fp"][0]
    partial_rows.append(("ppl_hist", "__model_fp", float(fp or 0), None))
    dup_sk = got["glob"]["__dup_sk"][1]
    if dup_sk is not None:
        partial_rows.append(("dup", "exact_dup_hll", None, bytes(dup_sk)))
    ng_sk = got["ngram"]["__sk"][1]
    if ng_sk is not None:
        partial_rows.append(
            ("diversity", "distinct_13gram_hll", None, bytes(ng_sk))
        )
    partial_rows += [
        ("packing", "n_sequences", pk["n_sequences"], None),
        ("packing", "__sum_fill", pk["__sum_fill"], None),
        ("packing", "__n_nonover", pk["__n_nonover"], None),
        ("packing", "__sum_occ", pk["__sum_occ"], None),
        ("packing", "oversize_sequences", pk["oversize_sequences"], None),
        ("packing", "__budget_sum", float(token_budget), None),
        ("packing", "__budget_n", 1.0, None),
    ]
    return card_rows, partial_rows


def read_release(spark, path: str) -> DataFrame:
    """Every released chunk row: the base shards plus each increment's
    (``corpus_release_append``) shards — schema-identical unions, each
    side a partition-pruned parquet scan.  The one reader consumers
    need after the release starts taking increments.

    Why a union-per-increment and not one multi-root scan: Spark's
    partition discovery REFUSES multiple hive-partitioned roots
    (CONFLICTING_DIRECTORY_STRUCTURES — probed directly, even with all
    roots at equal depth), and flattening via recursiveFileLookup would
    forfeit ``pack_shard`` partition pruning.  The union's cost is a
    plan that grows linearly with increment count — measured at the
    500k sweep scale (``--relread``): 0.32 s / 852 plan chars at 1
    increment → 9.29 s / 42,531 chars at 100, back to 0.63 s / 419
    after compaction.  Fine for tens; ``corpus_release_append``'s
    ``auto_compact_at`` (default 32, inside the measured 25–50 band)
    keeps the count bounded by folding automatically — SCALING.md pins
    the cadence evidence.

    Increments named in the base's compaction marker (see
    ``compact_release``) are SKIPPED: their rows already live in the
    base, and the directory only still exists because a compaction
    crashed between its data swap and its increment cleanup — reading
    both sides would double-count every folded row."""
    import os as _os

    out = spark.read.parquet(_os.path.join(path, "data"))
    folded = _read_folded_marker(spark, path)
    inc_root = _os.path.join(path, "increments")
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(inc_root)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(p):
        for st in fs.listStatus(p):
            inc = st.getPath().getName()
            if inc in folded:
                continue
            d = _os.path.join(inc_root, inc, "data")
            if fs.exists(jvm.org.apache.hadoop.fs.Path(d)):
                out = out.unionByName(spark.read.parquet(d))
    return out


def _run_overlapped(legs) -> None:
    """Run independent driver-side legs (each a zero-arg callable that
    issues its own Spark actions/writes to a DISJOINT destination)
    concurrently in driver threads — guide §2.6: Spark happily runs
    several jobs at once; sequential walls here were only sequential
    because the driver called them sequentially.  One or zero legs run
    inline (no thread overhead).  Every leg always runs to completion
    (no half-started siblings left behind on failure); the first
    failure is re-raised after all legs finish, with any additional
    failures attached as context, so the caller's error surface is a
    superset of the sequential form's."""
    legs = [leg for leg in legs if leg is not None]
    if not legs:
        return
    if len(legs) == 1:
        legs[0]()
        return
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    with ThreadPoolExecutor(max_workers=len(legs)) as pool:
        futures = [pool.submit(inheritable_thread_target(leg)) for leg in legs]
        errors = []
        for f in futures:
            try:
                f.result()
            except Exception as e:  # noqa: BLE001 — re-raised below
                errors.append(e)
    if errors:
        first = errors[0]
        for extra in errors[1:]:
            first.add_note(f"concurrent leg also failed: {extra!r}")
        raise first


def corpus_release_append(
    new_docs: DataFrame,
    path: str,
    increment_id: str,
    minhash_index_path: str | None = None,
    exact_index_path: str | None = None,
    minhash_kwargs: dict | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    refresh_card: "bool | str" = True,
    auto_compact_at: int | None = 32,
    bm25_index_path: str | None = None,
    **curate_kwargs,
) -> dict:
    """The release TRAIN: extend an existing ``corpus_release`` with an
    increment WITHOUT re-curating history — the steady-state shape at
    100 TB, where a full re-release per crawl is the thing you can't
    afford.  Composition of the standing parts:

    1. gate the increment against the materialized admission indexes
       (exact md5 + MinHash — ``exclude_inc=increment_id`` so a retried
       half-completed run never matches itself),
    2. curate the survivors with the SAME ``curate_documents`` gates as
       the base release,
    3. write their shards under ``path/increments/<id>/`` (a
       self-contained mini-release: data + manifest), cleared first so
       a retry replaces rather than duplicates,
    4. admit the surviving DOCS to the admission indexes and — when
       ``bm25_index_path`` is set — the increment's released CHUNK rows
       to the lexical SERVING index (clear-then-write ``inc=``
       discipline — an empty retry rolls back).  Caveat: a
       ``compact_bm25_index`` run between a failed append and its retry
       folds this increment id, and the retry then fails LOUDLY on the
       index's folded-id marker (pick a fresh release increment id, or
       rebuild the serving index from ``read_release``) — the
       alternative was a silent double-admit that corrupts served
       scores,
    5. refresh ``path/manifest_full`` (base + every increment, with an
       ``inc`` column) and ``path/card`` over ALL released rows — the
       datasheet always describes what a consumer will actually read
       via ``read_release``.

    An all-duplicates increment (a re-crawl) is NORMAL: nothing is
    written, the indexes roll back any prior partial state for this
    id, and the manifest is left as-is.

    ``refresh_card`` (r13) takes three values.  ``True`` recomputes the
    full :func:`corpus_card` over every released row — O(corpus), the
    only mode that refreshes the quality/perplexity sections.
    ``"incremental"`` merges the release's MERGEABLE card partials
    (:func:`merge_card_partials`) — O(increment + #increments), exact
    for every sum section and sketch-exact for the distinct counts;
    the quality/ppl sections are absent until the next ``True``
    refresh (schedule one, the datasheet-maintenance split).
    ``False`` defers entirely.  Whatever the mode, EVERY append writes
    its increment's partial (O(increment), next to the admission work)
    so partials always mirror the released content and any later
    append may choose ``"incremental"`` — and compaction needs no
    partial maintenance at all, because partials are CONTENT-based:
    folding moves rows between directories without changing the
    corpus, so the merge over base + every appended id stays correct
    across folds.

    ``auto_compact_at`` makes the compaction cadence ENGINE behavior
    instead of an operator runbook note: when the post-append count of
    live (unfolded) increments reaches the threshold, this append runs
    ``compact_release`` before returning — ``read_release``'s plan cost
    grows ~linearly with increment count (measured: 0.32 s/852 plan
    chars at 1 increment → 9.29 s at 100; SCALING.md), and the default
    of 32 sits inside the measured 25–50 sweet band.  ``None`` disables
    (schedule maintenance yourself).  Compaction is a pure move, so the
    triggering append's result — and every ``read_release`` row — is
    bit-identical either way.

    Returns ``{"manifest": manifest_full, "card": card,
    "admitted_docs": n, "compacted_increments": n_folded}``."""
    import os as _os

    spark = new_docs.sparkSession
    # the base release must exist (its manifest is the contract)
    base_manifest = spark.read.parquet(_os.path.join(path, "manifest"))
    if increment_id in _read_folded_marker(spark, path):
        # the compaction marker makes readers SKIP this name forever —
        # reusing it would silently hide the new increment's rows
        raise ValueError(
            f"increment id {increment_id!r} was already folded into the "
            "base by compact_release; increment ids are unique for a "
            "release's lifetime — pick a fresh id"
        )
    if increment_id in _read_compaction_lease(spark, path):
        # fail fast instead of racing an in-flight (or crashed)
        # compaction that is folding THIS id: our fresh rows would land
        # in a directory the compaction is about to mark folded and
        # delete — hidden from readers, then removed
        raise ValueError(
            f"increment id {increment_id!r} is leased by an in-flight "
            "compact_release (see _compacting.json); retry after the "
            "compaction completes — or, if it crashed, after a "
            "compact_release retry supersedes the stale lease"
        )
    if refresh_card == "incremental":
        # fail FAST, before any write: an unusable partials trail must
        # not surface only after the increment has published
        jvm0 = spark._jvm
        proot = _os.path.join(path, "card_partials")
        fs0 = jvm0.org.apache.hadoop.fs.Path(proot).getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )
        if not fs0.exists(
            jvm0.org.apache.hadoop.fs.Path(_os.path.join(proot, "base"))
        ):
            raise ValueError(
                "corpus_release_append(refresh_card='incremental'): this "
                "release has no card-partials trail (built before "
                "incremental cards) — run rebuild_card_partials(spark, "
                "path) once (or one refresh_card=True append after a "
                "re-release); partials are then maintained automatically"
            )
        have = {
            st.getPath().getName()
            for st in fs0.listStatus(jvm0.org.apache.hadoop.fs.Path(proot))
        }
        folded0 = _read_folded_marker(spark, path)
        live0 = list_release_increments(spark, path)
        missing = [
            i
            for i in live0
            if i not in folded0
            and i != increment_id  # a retried id rewrites its own
            and i not in have
        ]
        if missing:
            raise ValueError(
                "corpus_release_append(refresh_card='incremental'): "
                f"card partial missing for increment(s) {missing} — the "
                "partials trail was tampered with or partially deleted; "
                "run rebuild_card_partials(spark, path) to restore it "
                "(or refresh_card=True for a one-off full card)"
            )
        # orphan partials are as corrupting as missing ones (ADVICE
        # r13): a partial whose id is neither the base, a live
        # increment, a FOLDED id (those partials legitimately outlive
        # their directories — the base partial predates the fold), nor
        # this append's own id would fold content nobody released into
        # the card.  The known producer of orphans was
        # expire_release_increment (fixed to delete its partial), but
        # the trail must refuse to merge ANY unexplained extra.
        orphans = sorted(
            have - {"base", increment_id} - set(live0) - folded0
        )
        if orphans:
            raise ValueError(
                "corpus_release_append(refresh_card='incremental'): "
                f"orphan card partial(s) {orphans} — their ids are "
                "neither the base, a live increment, nor a folded "
                "increment, so merging them would overcount the card "
                "(expired-then-retained partial, or tampering); run "
                "rebuild_card_partials(spark, path) to reset the trail "
                "(or refresh_card=True for a one-off full card)"
            )

    gated = new_docs
    if exact_index_path is not None:
        from bigdataproject_formula1_telemetry_spark.operators.exact_index import (
            dedup_exact_against_index,
        )

        gated = dedup_exact_against_index(
            spark, gated, exact_index_path, text_col, id_col,
            exclude_inc=increment_id,
        )
    if minhash_index_path is not None:
        from bigdataproject_formula1_telemetry_spark.operators.minhash_index import (
            dedup_against_index,
        )

        gated = dedup_against_index(
            spark, gated, minhash_index_path,
            text_col=text_col, id_col=id_col,
            exclude_inc=increment_id,
            **(minhash_kwargs or {}),
        )

    packed = curate_documents(
        gated, text_col=text_col, id_col=id_col, **curate_kwargs
    ).localCheckpoint(eager=True)  # increment-sized by contract

    inc_dir = _os.path.join(path, "increments", increment_id)
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(inc_dir).getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    # retry replaces: clear this increment's directory before writing
    fs.delete(jvm.org.apache.hadoop.fs.Path(inc_dir), True)

    survivors = (
        new_docs.join(packed.select(id_col).distinct(), id_col, "semi")
        .localCheckpoint(eager=True)
    )
    n_admitted = survivors.count()

    if n_admitted > 0:
        write_training_shards(packed, inc_dir)
    # admission AFTER the data write (a crash in between leaves data
    # without admission; the retry re-gates — exclude_inc guarantees the
    # half-admitted state never matches — and rewrites both).  With an
    # EMPTY survivor set the appends still run: clear-then-write is the
    # rollback of any previous partial admission under this id.  The
    # per-index appends touch disjoint roots and are independent, so
    # with 2+ indexes configured they run in driver threads (guide
    # §2.6, r15 — each append is a chain of small driver-serialized
    # jobs, exactly the shape whose wall-clock adds instead of
    # overlapping; VERDICT r14 item 3, the anti-scaling append floor).
    admit_legs = []
    if exact_index_path is not None:
        from bigdataproject_formula1_telemetry_spark.operators.exact_index import (
            append_exact_index,
        )

        admit_legs.append(
            lambda: append_exact_index(
                survivors, exact_index_path, increment_id=increment_id,
                text_col=text_col, id_col=id_col,
            )
        )
    if minhash_index_path is not None:
        from bigdataproject_formula1_telemetry_spark.operators.minhash_index import (
            append_minhash_index,
        )

        admit_legs.append(
            lambda: append_minhash_index(
                survivors, minhash_index_path, text_col, id_col,
                increment_id=increment_id, **(minhash_kwargs or {}),
            )
        )
    if bm25_index_path is not None:
        from bigdataproject_formula1_telemetry_spark.operators.bm25_index import (
            append_bm25_index,
        )

        admit_legs.append(
            lambda: append_bm25_index(
                _bm25_chunk_rows(packed, id_col), bm25_index_path,
                increment_id=increment_id, id_col="chunk_id",
            )
        )
    _run_overlapped(admit_legs)

    # post-write double-check (shrinks the lease's residual race window,
    # VERDICT r10): the pre-write lease check can pass an instant before
    # a compaction leases this id — that compaction would then mark the
    # id folded and delete the directory, hiding rows we wrote AFTER its
    # snapshot read.  Re-reading the lease and marker here — after every
    # write of ours, before anything is PUBLISHED (manifest_full) —
    # turns the interleaving into a deterministic abort: roll back our
    # own writes and raise, so no append ever reports success while a
    # compaction is folding its id.  Still fail-fast, not a lock.
    if increment_id in (
        _read_compaction_lease(spark, path) | _read_folded_marker(spark, path)
    ):
        # roll back the increment dir (idempotent against the racing
        # compaction's own delete) and the index admission under this id
        # (clear-then-write of the EMPTY set is the established rollback
        # — an unadmitted doc can be re-sent; an admitted-but-unreleased
        # one would be silently lost forever).  Worst case after a retry
        # under a fresh id: docs the compaction DID manage to fold land
        # twice and the next dedup pass removes them — benign, loud.
        fs.delete(jvm.org.apache.hadoop.fs.Path(inc_dir), True)
        # a PRIOR attempt of this id may have published a card partial;
        # this attempt aborts before writing its own, so clear the
        # stale one — partials must mirror the released content
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(
                _os.path.join(path, "card_partials", increment_id)
            ),
            True,
        )
        none = survivors.limit(0)
        # every rollback leg runs under try/except: a leg CAN itself
        # raise (that index's OWN compaction lease held, or its folded
        # marker naming this id — guards on a different lease than the
        # release's), and an exception there must not MASK the abort
        # RuntimeError below (ADVICE r12) — the caller must always learn
        # the release append aborted, with the leg failures chained.
        rollback_errors = []
        if exact_index_path is not None:
            try:
                append_exact_index(
                    none, exact_index_path, increment_id=increment_id,
                    text_col=text_col, id_col=id_col,
                )
            except Exception as e:  # noqa: BLE001 — re-raised below
                rollback_errors.append(f"exact: {e}")
        if minhash_index_path is not None:
            try:
                append_minhash_index(
                    none, minhash_index_path, text_col, id_col,
                    increment_id=increment_id, **(minhash_kwargs or {}),
                )
            except Exception as e:  # noqa: BLE001 — re-raised below
                rollback_errors.append(f"minhash: {e}")
        if bm25_index_path is not None:
            # NOT an empty append (ADVICE r12): append_bm25_index's own
            # lifecycle guards can raise here, and even a clean empty
            # append leaves an inc= partition with a (0,0) stats row, so
            # the aborted id would show in list_bm25_increments and get
            # folded/blocked by a later bm25 compaction.  Clear the
            # serving index's inc= partitions DIRECTLY — the same
            # clear-the-write rollback the lifecycle abort itself uses.
            from bigdataproject_formula1_telemetry_spark.operators.bm25_index import (
                _clear_inc_partition,
            )

            try:
                for t in ("postings", "stats", "terms"):
                    td = _os.path.join(bm25_index_path, t)
                    _clear_inc_partition(spark, td, increment_id)
                    # deletes happen outside Spark: drop the cached file
                    # listing the append's own write left behind
                    spark.catalog.refreshByPath(td)
            except Exception as e:  # noqa: BLE001 — re-raised below
                rollback_errors.append(f"bm25: {e}")
        raise RuntimeError(
            f"corpus_release_append({increment_id!r}): a compact_release "
            "leased this id mid-append; the append rolled itself back "
            "(increment dir + index admission) and published nothing — "
            "retry with a FRESH id after the compaction completes"
            + (
                "  [rollback legs that themselves failed and may need "
                f"manual verification: {'; '.join(rollback_errors)}]"
                if rollback_errors
                else ""
            )
        )

    # card partial for THIS increment (r13): written on EVERY append —
    # O(increment), a rounding error next to the admission work — so
    # the partials table always mirrors the released content whatever
    # card mode this append runs.  Guarded on the base partial existing
    # (a release built before incremental cards has no partials trail;
    # its appends keep full-refresh semantics untouched).
    part_root = _os.path.join(path, "card_partials")
    jvm2 = spark._jvm
    fs2 = jvm2.org.apache.hadoop.fs.Path(part_root).getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    has_partials = fs2.exists(
        jvm2.org.apache.hadoop.fs.Path(_os.path.join(part_root, "base"))
    )

    def _write_inc_partial():
        pdir = _os.path.join(part_root, increment_id)
        fs2.delete(jvm2.org.apache.hadoop.fs.Path(pdir), True)
        if n_admitted > 0:
            # frozen reference LM (r14): score this increment under
            # the base-trained model when the release carries one, so
            # the merged card's ppl_hist stays comparable across every
            # increment.  A pre-r14 release has no model — its partials
            # simply omit the section (graceful, like pre-incremental
            # releases omit the whole trail).
            ref_dir = _os.path.join(path, "ppl_model")
            ref_lm = (
                spark.read.parquet(ref_dir)
                if fs2.exists(jvm2.org.apache.hadoop.fs.Path(ref_dir))
                else None
            )
            corpus_card_partial(
                spark.read.parquet(_os.path.join(inc_dir, "data")),
                text_col="chunk_text",
                lang_col=None,
                id_col=id_col,
                token_budget=float(curate_kwargs.get("token_budget", 1024)),
                ppl_model=ref_lm,
            ).write.mode("overwrite").parquet(pdir)

    # self-driving maintenance: once the live (unfolded) increment count
    # reaches the threshold, fold — compact_release refreshes both
    # manifests itself, so the separate refresh below is skipped.  NEVER
    # auto-fold while a compaction lease is held: the contract is ONE
    # maintenance writer, and a lease means one is in flight (or crashed
    # — a state an explicit compact_release retry must resolve, since
    # the leased ids are blocked until it does).  The compaction
    # decision runs FIRST (metadata-only when not folding) so the tail
    # legs below see a settled directory layout.
    n_compacted = 0
    partial_written = False
    if auto_compact_at is not None and not _read_compaction_lease(spark, path):
        folded_now = _read_folded_marker(spark, path)
        live = [
            i
            for i in list_release_increments(spark, path)
            if i not in folded_now
        ]
        if len(live) >= auto_compact_at:
            # the fold is about to MOVE this increment's rows into the
            # base and delete its directory — the partial (computed
            # from that directory) must land first; partials are
            # content-based, so they survive the fold unchanged
            if has_partials:
                _write_inc_partial()
                partial_written = True
            n_compacted = compact_release(spark, path)
    final = _os.path.join(path, "manifest_full")

    # Tail legs — this increment's card partial, the manifest_full
    # refresh (skipped when compaction just rebuilt it), and the full
    # card recompute — write to DISJOINT paths and are independent, so
    # they run overlapped (guide §2.6, r15; the full card is the
    # expensive half of an append and previously serialized behind the
    # partial + manifest refresh).  The incremental-card merge is the
    # one tail with an ordering edge (it READS this increment's
    # partial), so it runs after the overlapped legs complete.
    # ``refresh_card=False`` defers the card entirely for
    # high-frequency trains (refresh on a schedule instead); the
    # manifest is always refreshed — it is the consumer contract, and
    # it is cheap.
    tail_legs = []
    if has_partials and not partial_written:
        tail_legs.append(_write_inc_partial)
    if n_compacted == 0:
        # manifest_full: base + every increment, inc-tagged, staged swap
        tail_legs.append(lambda: _refresh_manifest_full(spark, path))
    if refresh_card and refresh_card != "incremental":
        released = read_release(spark, path)
        tail_legs.append(
            lambda: corpus_card(
                released, text_col="chunk_text", lang_col=None, id_col=id_col
            ).write.mode("overwrite").parquet(_os.path.join(path, "card"))
        )
    _run_overlapped(tail_legs)

    if refresh_card == "incremental":
        # readiness was validated up front (fail fast, before anything
        # published); this append's own partial landed above, so the
        # trail is complete by induction
        card = merge_card_partials(
            spark.read.parquet(_os.path.join(part_root, "*"))
        )
        # carry the NON-MERGEABLE sections forward (r14): the previous
        # card's model-backed rows (quality/perplexity percentiles —
        # and semantic families, when a release computes them) are
        # absent from the merge, so overwriting with the merged card
        # alone would make them VANISH from the published card on the
        # first incremental append.  Instead they ride forward verbatim
        # with one ``(section, "__stale", 1.0)`` marker row per carried
        # section — "as of the last full refresh" — which a
        # ``refresh_card=True`` append clears by recomputing them.
        # This is exactly Datasheets-for-Datasets practice for living
        # datasets: algebraic sections per delta, model-backed sections
        # per scheduled audit, staleness stated rather than implied.
        card_dir = _os.path.join(path, "card")
        if fs2.exists(jvm2.org.apache.hadoop.fs.Path(card_dir)):
            merged_secs = {
                r["section"]
                for r in card.select("section").distinct().collect()
            }
            # collect (tiny, already-reduced rows): the card dir is
            # about to be overwritten, and Spark refuses plans that
            # read a path they overwrite
            carried = [
                (r["section"], r["key"], r["value"])
                for r in spark.read.parquet(card_dir).collect()
                if r["section"] not in merged_secs and r["key"] != "__stale"
            ]
            if carried:
                marks = [
                    (s, "__stale", 1.0) for s in {c[0] for c in carried}
                ]
                card = card.unionByName(
                    spark.createDataFrame(
                        carried + sorted(marks),
                        "section string, key string, value double",
                    )
                )
        card.write.mode("overwrite").parquet(_os.path.join(path, "card"))
    return {
        "manifest": spark.read.parquet(final),
        "card": spark.read.parquet(_os.path.join(path, "card")),
        "admitted_docs": n_admitted,
        "compacted_increments": n_compacted,
    }


def rebuild_card_partials(
    spark, path: str, id_col: str = "doc_id", token_budget: float = 1024.0
) -> int:
    """One-time migration/repair for the incremental-card trail: wipe
    ``path/card_partials`` and rebuild it from the release's CURRENT
    layout — one base partial over ``path/data`` (which already
    contains everything compaction folded) plus one partial per live
    increment.  Content-complete by construction, whatever mix of
    pre-incremental appends, tampering, or folds came before; O(corpus)
    once, after which every append maintains the trail in
    O(increment).  Returns the number of partials written.  Pass the
    release's ``token_budget`` so the packing section's components
    match the card's."""
    import os as _os

    jvm = spark._jvm
    root = _os.path.join(path, "card_partials")
    fs = jvm.org.apache.hadoop.fs.Path(root).getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    fs.delete(jvm.org.apache.hadoop.fs.Path(root), True)

    # rebuild under the release's frozen reference LM when present, so
    # rebuilt partials carry the same ppl_hist bins an append would
    ref_dir = _os.path.join(path, "ppl_model")
    ref_lm = (
        spark.read.parquet(ref_dir)
        if fs.exists(jvm.org.apache.hadoop.fs.Path(ref_dir))
        else None
    )

    def _write(docs, name):
        corpus_card_partial(
            docs, text_col="chunk_text", lang_col=None, id_col=id_col,
            token_budget=token_budget, ppl_model=ref_lm,
        ).write.mode("overwrite").parquet(_os.path.join(root, name))

    _write(spark.read.parquet(_os.path.join(path, "data")), "base")
    n = 1
    folded = _read_folded_marker(spark, path)
    for inc in list_release_increments(spark, path):
        if inc in folded:
            continue  # its rows are in path/data — covered by base
        d = _os.path.join(path, "increments", inc, "data")
        if fs.exists(jvm.org.apache.hadoop.fs.Path(d)):
            _write(spark.read.parquet(d), inc)
            n += 1
    return n


def list_release_increments(spark, path: str) -> list[str]:
    """Increment ids present under ``path/increments`` (directory
    listing — metadata only)."""
    import os as _os

    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(_os.path.join(path, "increments"))
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(p))


# Compaction marker: a ``_``-prefixed file at the base data root (ignored
# by parquet listing exactly like ``_SUCCESS``) naming every increment id
# whose rows the CURRENT base already contains.  It is written into the
# STAGED directory before the swap, so it becomes visible atomically WITH
# the folded data — at no instant can a reader see folded rows in the
# base while still unioning the increment that produced them.
_FOLDED_MARKER = "_folded_incs.json"


def _read_folded_marker(spark, path: str) -> set:
    """Increment ids already folded into ``path/data`` — empty set for a
    base that has never been compacted."""
    import json as _json
    import os as _os

    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(
        _os.path.join(path, "data", _FOLDED_MARKER)
    )
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return set()
    return set(_json.loads(_read_small_file(spark, fs, p)))


def _read_small_file(spark, fs, p) -> str:
    """UTF-8 contents of one (small: marker/lease-sized) file through the
    Hadoop FS API.  JDK-only on the JVM side: ``InputStream.readAllBytes``
    (JDK 9+; Spark requires 17), which py4j hands back as Python bytes
    directly — commons-io is present in stock distributions but is NOT a
    declared dependency, and a slimmed classpath would otherwise break
    every release reader.  (A JVM-side byte[] fill à la
    ``o.a.h.io.IOUtils.readFully`` does NOT work from py4j: byte[] proxies
    convert to an immutable Python ``bytes`` copy, so the JVM fills a
    buffer Python never sees.)"""
    stream = fs.open(p)
    try:
        return bytes(stream.readAllBytes()).decode("utf-8")
    finally:
        stream.close()


def _write_folded_marker(spark, staged_data_dir: str, incs: list) -> None:
    """Write the compaction marker INTO the staged data directory (it
    rides the ``_swap_staged`` rename into place with the data)."""
    import json as _json
    import os as _os

    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(
        _os.path.join(staged_data_dir, _FOLDED_MARKER)
    )
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    try:
        out.write(bytearray(_json.dumps(sorted(incs)).encode("utf-8")))
    finally:
        out.close()


# Compaction lease: a file at the RELEASE root (never scanned by parquet
# readers, which only look under data/ and increments/) naming the
# increment ids an in-flight compaction is folding.  It turns the
# documented concurrency contract — "don't re-append an id a compaction
# is folding" — into enforcement: `corpus_release_append` fails fast on a
# leased id instead of racing the marker.  Written BEFORE the fold reads
# its snapshot, cleared AFTER cleanup; a stale lease (crashed compaction)
# keeps blocking exactly the folding ids until a compaction retry
# supersedes it — the safe default, since those ids' fold state is
# unknown until the retry completes.
_COMPACTING_LEASE = "_compacting.json"


def _lease_path(spark, path: str):
    import os as _os

    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(_os.path.join(path, _COMPACTING_LEASE))
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, p


def _read_compaction_lease(spark, path: str) -> set:
    """Increment ids an (in-flight or crashed) compaction is folding —
    empty set when no compaction is active."""
    import json as _json

    fs, p = _lease_path(spark, path)
    if not fs.exists(p):
        return set()
    return set(_json.loads(_read_small_file(spark, fs, p))["incs"])


def _write_compaction_lease(spark, path: str, incs: list) -> None:
    import json as _json
    import uuid as _uuid

    fs, p = _lease_path(spark, path)
    out = fs.create(p, True)  # overwrite: a retry supersedes a stale lease
    try:
        out.write(
            bytearray(
                _json.dumps(
                    {"incs": sorted(incs), "nonce": _uuid.uuid4().hex}
                ).encode("utf-8")
            )
        )
    finally:
        out.close()


def _clear_compaction_lease(spark, path: str) -> None:
    fs, p = _lease_path(spark, path)
    if fs.exists(p):
        fs.delete(p, False)


def _delete_increment_dirs(spark, path: str, incs: list) -> None:
    """Checked recursive delete of each ``path/increments/<id>`` (and the
    now-empty ``increments`` root when nothing is left).  Separate helper
    so fault-injection tests can interrupt compaction between its data
    swap and this cleanup."""
    import os as _os

    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    for inc in incs:
        p = jvm.org.apache.hadoop.fs.Path(_os.path.join(path, "increments", inc))
        if fs.exists(p) and not fs.delete(p, True):
            raise IOError(f"compact: delete of folded increment {inc!r} failed")
    root = jvm.org.apache.hadoop.fs.Path(_os.path.join(path, "increments"))
    if fs.exists(root) and len(fs.listStatus(root)) == 0:
        fs.delete(root, True)


def _refresh_manifest_full(spark, path: str) -> None:
    """Rebuild ``manifest_full`` from the base manifest + every present
    (not-yet-folded) increment's manifest, via the checked staged-rename
    swap (a readable manifest exists at every instant, and a failed
    rename raises instead of silently leaving a stale manifest)."""
    import os as _os

    from bigdataproject_formula1_telemetry_spark.operators.minhash_index import (
        _swap_staged,
    )

    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    mf = spark.read.parquet(_os.path.join(path, "manifest")).withColumn(
        "inc", F.lit("base")
    )
    folded = _read_folded_marker(spark, path)
    for inc in list_release_increments(spark, path):
        if inc in folded:  # rows already in the base (crashed compaction)
            continue
        mdir = _os.path.join(path, "increments", inc, "manifest")
        if fs.exists(jvm.org.apache.hadoop.fs.Path(mdir)):
            mf = mf.unionByName(
                spark.read.parquet(mdir).withColumn("inc", F.lit(inc))
            )
    staged = _os.path.join(path, "manifest_full.staged")
    final = _os.path.join(path, "manifest_full")
    mf.write.mode("overwrite").parquet(staged)
    _swap_staged(spark, staged, final)


def expire_release_increment(
    spark,
    path: str,
    increment_id: str,
    minhash_index_path: str | None = None,
    exact_index_path: str | None = None,
    bm25_index_path: str | None = None,
) -> None:
    """Retention: drop one increment from the release (its directory)
    and refresh ``manifest_full`` — the data-side twin of
    ``minhash_index.expire_increments``.

    Pass the release's paired index roots (r14) to expire the MATCHING
    index increments in the same call — the release train appends to
    every index under the release's own increment id, so retention is
    one ``keep = everything but this id`` expire per index.  Without
    them, expiring the DATA does not expire the ADMISSION (the indexes
    keep rejecting re-sends of the expired docs — conservative, never
    corrupting) and the bm25 SERVING index keeps ranking the expired
    chunks — so pass ``bm25_index_path`` whenever the release maintains
    one.  Order is data first, indexes last: a crash in between leaves
    the conservative state (gone from the release, still inadmissible),
    and retrying the expire converges (the data delete is idempotent;
    an index expire whose partitions are already gone is a no-op).
    Each index expire fails fast on that index's own compaction lease —
    retry after its compaction completes."""
    import os as _os

    if increment_id in _read_folded_marker(spark, path):
        # the increment's rows live in the BASE now (compaction folded
        # them; the dir, if present, is crash-window garbage readers
        # already skip) — deleting the dir would silently retain the
        # data, the opposite of what expire promises
        raise ValueError(
            f"increment {increment_id!r} was folded into the base by "
            "compact_release; expiring it now requires rewriting the "
            "base (filter read_release and re-release) — deleting the "
            "increment directory would not remove its rows"
        )
    if increment_id in _read_compaction_lease(spark, path):
        # an in-flight compaction is folding this id: deleting its dir
        # mid-fold would tear the union read, and the fold would resurrect
        # the rows in the base anyway — the opposite of expire
        raise ValueError(
            f"increment {increment_id!r} is leased by an in-flight "
            "compact_release; retry the expire after the compaction "
            "completes (it will then be folded — expiring requires a "
            "base rewrite)"
        )
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(
        _os.path.join(path, "increments", increment_id)
    )
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    fs.delete(p, True)
    # drop the increment's card partial WITH its data (ADVICE r13):
    # the incremental card merges card_partials/* — a partial that
    # outlives its expired increment would silently fold the expired
    # docs/tokens/pii/sketch counts back into every incremental card.
    # Safe to delete unconditionally here: expire refuses folded ids
    # above, and FOLDED increments are the only ones whose partials
    # must outlive their directories (the base partial predates the
    # fold).
    fs.delete(
        jvm.org.apache.hadoop.fs.Path(
            _os.path.join(path, "card_partials", increment_id)
        ),
        True,
    )
    _refresh_manifest_full(spark, path)
    keep_others = lambda i: i != increment_id  # noqa: E731
    if exact_index_path is not None:
        from bigdataproject_formula1_telemetry_spark.operators.exact_index import (
            expire_exact_increments,
        )

        expire_exact_increments(spark, exact_index_path, keep_others)
    if minhash_index_path is not None:
        from bigdataproject_formula1_telemetry_spark.operators.minhash_index import (
            expire_increments,
        )

        expire_increments(spark, minhash_index_path, keep_others)
    if bm25_index_path is not None:
        from bigdataproject_formula1_telemetry_spark.operators.bm25_index import (
            expire_bm25_increments,
        )

        expire_bm25_increments(spark, bm25_index_path, keep_others)


def compact_release(spark, path: str) -> int:
    """LSM-style release maintenance: fold every increment's shards into
    the base data (one partitioned rewrite of the UNION through the
    checked staged-rename swap — a readable base exists at every
    instant), delete the increment directories, and refresh both
    manifests.  Returns the number of increments newly folded.  Why:
    ``read_release`` unions one parquet scan per increment — fine for
    tens, plan-bloat for thousands; compaction restores the single-scan
    base the way ``minhash_index.compact_index`` folds ``inc=``
    partitions.  Chunk rows are self-contained, so the fold is a pure
    move — bit-identical ``read_release`` output (pinned in tests).

    Crash-safety: the ``_folded_incs.json`` marker is written INTO the
    staged base and swaps into place atomically with the folded data, so
    the window between the data swap and the increment cleanup is
    harmless — ``read_release`` / ``_refresh_manifest_full`` skip any
    increment named in the live base's marker, and a RETRIED compaction
    folds nothing twice (already-marked increments are stale garbage to
    delete, not rows to merge).  All renames go through ``_swap_staged``
    (raises on failure) instead of unchecked ``fs.rename``.

    Concurrency contract: ONE maintenance writer.  An append creating a
    NEW increment id while a compaction runs is safe (the id is not in
    the compaction's listing: not folded, not deleted, not marked — it
    simply rides as an increment into the next compaction).  A
    concurrent re-append of an id this compaction is FOLDING would race
    the marker (its fresh rows hidden), so the compaction LEASES its
    snapshot (``_compacting.json`` at the release root, written before
    the fold reads any data) and ``corpus_release_append`` /
    ``expire_release_increment`` fail fast on leased ids.  The lease is
    cleared only after cleanup succeeds; after a crash it keeps
    blocking exactly the in-flight ids until a compaction retry
    supersedes it.  (The lease is fail-fast enforcement, not a lock —
    but an append that was already past its pre-write lease check when
    the lease landed RE-reads the lease after its last write and before
    publishing, rolls its own writes back, and aborts, so no append
    ever reports success while a compaction folds its id; maintenance
    retries of the SAME id remain the operator's to serialize.)

    The fold set, the marker, and the deletion list are all built from
    ONE ``list_release_increments`` snapshot — an increment appended
    after the listing is invisible to every step of this compaction by
    construction (no re-list between the union and the marker write).
    The marker accumulates across compaction GENERATIONS (union with
    the prior marker), so the append guard's promise — increment ids
    are unique for a release's lifetime — holds forever, not just
    until the next compaction."""
    import os as _os

    from bigdataproject_formula1_telemetry_spark.operators.minhash_index import (
        _swap_staged,
    )

    existing = list_release_increments(spark, path)
    if not existing:
        # a compaction that crashed AFTER deleting its folded dirs but
        # BEFORE refreshing manifest_full / clearing its lease left a
        # stale lease and (possibly) a stale manifest_full — finish its
        # cleanup instead of returning with the release half-maintained
        if _read_compaction_lease(spark, path):
            _refresh_manifest_full(spark, path)
            _clear_compaction_lease(spark, path)
        return 0
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    # lease the snapshot FIRST: from here until the lease clears, appends
    # and expires of these ids fail fast instead of racing the fold
    _write_compaction_lease(spark, path, existing)
    already = _read_folded_marker(spark, path)
    to_fold = [i for i in existing if i not in already]
    if to_fold:
        # union built from the CAPTURED snapshot — base + each to-fold
        # increment's data — never a re-list (an increment appended after
        # the listing must not be folded: it would be absent from both
        # the marker and the deletion list, and its rows would be
        # double-counted forever).  Already-marked ids are crash-window
        # garbage: their rows live in the base, so they are deleted, not
        # merged.
        data = _os.path.join(path, "data")
        all_rows = spark.read.parquet(data)
        for inc in to_fold:
            d = _os.path.join(path, "increments", inc, "data")
            if fs.exists(jvm.org.apache.hadoop.fs.Path(d)):
                all_rows = all_rows.unionByName(spark.read.parquet(d))
        staged = data + ".staged"
        fs.delete(jvm.org.apache.hadoop.fs.Path(staged), True)
        all_rows.write.mode("overwrite").option(
            "partitionOverwriteMode", "static"
        ).partitionBy("pack_shard").parquet(staged)
        # marker = every id EVER folded into a base: this snapshot plus
        # every prior generation's (ids whose dirs are long deleted) —
        # the append-guard invariant outlives any one compaction
        _write_folded_marker(spark, staged, sorted(set(existing) | already))
        _swap_staged(spark, staged, data)
        # the folded base's manifest = aggregate over the new data
        manifest = (
            spark.read.parquet(data)
            .groupBy("pack_shard")
            .agg(
                F.countDistinct("seq_id").alias("n_sequences"),
                F.count(F.lit(1)).alias("n_chunks"),
                F.sum("n_tokens").cast("long").alias("n_tokens"),
            )
            .orderBy("pack_shard")
        )
        mstaged = _os.path.join(path, "manifest.staged")
        manifest.write.mode("overwrite").parquet(mstaged)
        _swap_staged(spark, mstaged, _os.path.join(path, "manifest"))
    # cleanup AFTER the swap: folded dirs are garbage the marker already
    # hides from readers — a crash anywhere past the swap loses nothing
    _delete_increment_dirs(spark, path, existing)
    _refresh_manifest_full(spark, path)
    # lease cleared LAST: only a fully-maintained release unblocks the
    # folded ids (which the marker now rejects permanently anyway)
    _clear_compaction_lease(spark, path)
    return len(to_fold)
