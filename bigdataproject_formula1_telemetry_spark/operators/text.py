"""Text analysis for training-data pipelines (north-star extension):
token counting, quality scoring, language-ID heuristic, fingerprinting.

Everything is JVM-side column expressions (regex + string intrinsics) so
these run inside whole-stage codegen over arbitrarily large corpora; no
Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword marker sets for the n-gram/stopword heuristic
#: language-ID (public common-word lists).
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "des", "est"],
    "de": ["der", "die", "das", "und", "ist"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization → non-empty tokens."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish sub-token estimate: count word chunks, digits runs, and
    punctuation marks separately (a cheap public proxy for tokenizer
    counts — one regex pass, no vocab)."""
    pieces = F.filter(
        F.split(F.lower(text), r"([^a-z0-9]+)"), lambda t: t != F.lit("")
    )
    # ~4 chars per sub-token within a word chunk, at least 1 per chunk.
    return F.aggregate(
        pieces,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.greatest(F.lit(1).cast("long"), F.ceil(F.length(w) / 4).cast("long")),
    )


#: matches every NON-punctuation char — stripping it leaves only the
#: punctuation (.,!?;:).  Kept deliberately simple & regex-dialect-portable.
NON_PUNCT_CLASS = "[^.,!?;:]"


def punct_ratio(text: Column) -> Column:
    """Punctuation density: punctuation chars / total chars."""
    n = F.length(text)
    p = F.length(F.regexp_replace(text, NON_PUNCT_CLASS, ""))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = F.transform(tokens(F.lower(text)), lambda t: t)
    markers = F.array(*[F.lit(m) for m in _LANG_MARKERS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
    total = F.size(toks)
    return F.when(total > 0, hits.cast("double") / total.cast("double")).otherwise(
        F.lit(0.0)
    )


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: length band + low punctuation
    density + stopword presence (the usual cheap pre-filter before
    model-based quality scoring)."""
    n_tok = token_count(text).cast("double")
    len_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    stop_score = F.least(stopword_ratio(text) * 10.0, F.lit(1.0))
    return (len_score + punct_score + stop_score) / F.lit(3.0)


def lang_id(text: Column) -> Column:
    """Stopword-marker language ID: score each candidate language by marker
    hits per token; highest wins, 'und' (undetermined) when no marker hits.
    Deterministic tie-break by language code order."""
    toks = tokens(F.lower(text))
    scores = []
    for code in sorted(_LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in _LANG_MARKERS[code]])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
        scores.append(F.struct(hits.alias("hits"), F.lit(code).alias("code")))
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    s["hits"].alias("hits"),
                    # invert code ordering so max prefers the alphabetically
                    # first code on tied hits
                    F.lit(-i).alias("prio"),
                    s["code"].alias("code"),
                )
                for i, s in enumerate(scores)
            ]
        )
    )
    return F.when(best["hits"] > 0, best["code"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: xxhash64 of the normalized token stream
    (lowercase, punctuation stripped, single-space joined) — the cheap
    rolling-hash-style identity for near-exact matching."""
    norm = F.array_join(
        F.filter(F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != F.lit("")),
        " ",
    )
    return F.xxhash64(norm)


def chunk_documents(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap: int = 0,
):
    """Context-window chunking for training-data prep: split each
    document into whitespace-token windows of ``chunk_tokens`` with
    ``overlap`` tokens shared between consecutive chunks — the standard
    pre-tokenization step before packing sequences into a context
    window.

    Pure JVM column expressions end to end (split → sequence of window
    starts → posexplode → slice/array_join): no Python in the hot path,
    one narrow transformation — chunking never shuffles, so it scales as
    a map stage over however the corpus is already partitioned, and
    ``(doc_id, chunk_idx)`` is a deterministic stable key for downstream
    dedup/shuffling.  Empty/NULL documents produce zero chunks."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )
    n = F.size(toks)
    starts = F.when(
        n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    exploded = df.select(
        F.col(id_col),
        n.alias("__n"),
        F.posexplode(starts).alias("chunk_idx", "__start"),
        toks.alias("__toks"),
    ).where(
        # windows that add no tokens beyond the previous chunk's overlap
        # region are fully redundant — drop them.  The violating starts
        # always form a SUFFIX of the start sequence (start+overlap >= n
        # is monotone in start), and every dropped window's tokens are
        # contained in the last kept chunk, so chunk_idx stays contiguous
        # and no token is lost (with overlap > stride there can be many
        # such trailing windows, not just one).
        (F.col("chunk_idx") == 0)
        | (F.col("__start") + F.lit(overlap) < F.col("__n"))
    )
    return exploded.select(
        id_col,
        "chunk_idx",
        F.array_join(
            F.slice("__toks", F.col("__start") + 1, chunk_tokens), " "
        ).alias("chunk_text"),
        F.least(F.lit(chunk_tokens), F.col("__n") - F.col("__start")).alias(
            "n_tokens"
        ),
    )


def pack_sequences(
    chunks,
    token_budget: int = 2048,
    n_tokens_col: str = "n_tokens",
    order_by: tuple[str, ...] = ("doc_id", "chunk_idx"),
    partition_by: str | None = None,
    strategy: str = "first_fit",
):
    """Greedy packing of chunks into fixed-budget training sequences.
    Guarantee (both strategies): no bin exceeds ``token_budget`` unless
    a single chunk alone does (flagged ``oversize``, monopolizing its
    bin); occupancy ≥ 50% whenever every chunk fits the budget.

    ``strategy``:

    - ``"first_fit"`` (default) — walk the chunks in the deterministic
      ``order_by`` order, open a new bin whenever the budget would
      overflow.  Preserves document contiguity: a doc's chunks stay
      adjacent and in order inside bins (what a curriculum or
      attention-mask-per-doc consumer wants).
    - ``"best_fit_decreasing"`` — classic BFD: sort by size descending
      (ties by ``order_by`` position — deterministic) and place each
      chunk into the fullest bin it still fits.  Higher occupancy
      (fewer padded tokens; BFD is the textbook offline bound ~11/9
      OPT) at the cost of scrambling doc order inside bins — right when
      sequences are independently shuffled samples anyway.

    The bin assignment carries loop state (current fill), which no
    window/cumsum expression can legally express once boundary pushes
    feed back into later assignments — a cumsum formulation was tried
    and packs 12 tokens into a 10-token bin on sizes (6,6,6).  So this
    is a grouped ``applyInPandas`` kernel (the resampler pattern): one
    shuffle on ``partition_by``, then a per-group pass (linear for
    first-fit; BFD keeps a sorted gap list — O(n log n) per group).
    With ``partition_by`` (a shard/language column the corpus already
    has) packing runs independently per group — the scale form; the
    ``partition_by=None`` convenience funnels everything through ONE
    task and is for small frames only (the kernel asserts nothing, the
    plan simply has a single group)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StructField as _SF,
        StructType as _ST,
    )

    if strategy not in ("first_fit", "best_fit_decreasing"):
        raise ValueError(
            f"strategy must be first_fit|best_fit_decreasing, got {strategy!r}"
        )
    order_cols = list(order_by)

    def _assign_first_fit(sizes: "np.ndarray") -> "np.ndarray":
        seq = np.empty(len(sizes), dtype=np.int64)
        fill = 0
        b = 0
        for i in range(len(sizes)):
            s = min(int(sizes[i]), token_budget)
            if fill > 0 and fill + s > token_budget:
                b += 1
                fill = 0
            seq[i] = b
            fill += s
        return seq

    def _assign_bfd(sizes: "np.ndarray") -> "np.ndarray":
        import bisect

        # descending size, stable on the order_by position for ties
        order = np.lexsort((np.arange(len(sizes)), -sizes))
        seq = np.empty(len(sizes), dtype=np.int64)
        gaps: list[tuple[int, int]] = []  # sorted (remaining, bin_id)
        nbins = 0
        for i in order:
            s = min(int(sizes[i]), token_budget)
            # tightest bin that still fits = first gap >= s
            j = bisect.bisect_left(gaps, (s, -1))
            if j < len(gaps):
                rem, b = gaps.pop(j)
                seq[i] = b
                rem -= s
            else:
                b = nbins
                nbins += 1
                seq[i] = b
                rem = token_budget - s
            if rem > 0:
                bisect.insort(gaps, (rem, b))
        return seq

    assign = _assign_first_fit if strategy == "first_fit" else _assign_bfd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
        sizes = pdf[n_tokens_col].to_numpy()
        pdf = pdf.assign(seq_id=assign(sizes), oversize=sizes > token_budget)
        if "__g" in pdf.columns:
            pdf = pdf.drop(columns="__g")
        return pdf

    out_schema = _ST(
        list(chunks.schema.fields)
        + [_SF("seq_id", LongType()), _SF("oversize", BooleanType())]
    )
    if partition_by:
        return chunks.groupBy(partition_by).applyInPandas(pack, out_schema)
    return (
        chunks.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(pack, out_schema)
    )


#: rolling-hash base for content-defined chunking — any odd 64-bit
#: multiplier works; this is splitmix64's golden-gamma (public domain).
_CDC_BASE = 0x9E3779B97F4A7C15


def _cdc_cuts(
    h,
    target_tokens: int,
    min_tokens: int,
    max_tokens: int,
    window: int,
):
    """Pure cut-point computation over a token-hash array (uint64 view):
    returns [(start, end), ...] spans that exactly partition [0, n).
    Factored out of the Spark kernel so the boundary logic — the subtle
    part of CDC — is directly property-testable without a session."""
    import numpy as np

    B = np.uint64(_CDC_BASE)
    D = np.uint64(target_tokens)
    cut_val = np.uint64(target_tokens - 1)
    n = len(h)
    if n == 0:
        return []
    with np.errstate(over="ignore"):
        # uint64 wraparound IS the hash semantics (mod 2^64), here and below
        bpow = np.empty(window, dtype=np.uint64)
        bpow[0] = np.uint64(1)
        for j in range(1, window):
            bpow[j] = bpow[j - 1] * B
        # H[i] = sum_{j<window} h[i-j] * B^j  (positions < window use the
        # partial prefix — cuts there are rare and legal)
        H = np.zeros(n, dtype=np.uint64)
        for j in range(min(window, n)):
            H[j:] += h[: n - j] * bpow[j]
    cand = np.nonzero(H % D == cut_val)[0]
    spans = []
    start = 0
    while start < n:
        lo, hi = start + min_tokens - 1, start + max_tokens - 1
        pos = cand.searchsorted(lo)
        if pos < len(cand) and cand[pos] <= hi and cand[pos] < n - 1:
            end = int(cand[pos]) + 1
        else:
            end = min(start + max_tokens, n)
        spans.append((start, end))
        start = end
    return spans


def cdc_chunks(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_tokens: int = 64,
    min_tokens: int | None = None,
    max_tokens: int | None = None,
    window: int = 8,
):
    """Content-defined chunking (LBFS/Rabin-style): chunk boundaries are
    placed where a rolling hash of the last ``window`` token hashes hits
    the cut condition (``H % target_tokens == target_tokens - 1``),
    bounded to ``[min_tokens, max_tokens]`` (defaults target/4 and
    target×4; the final chunk may run short).  Expected chunk length ≈
    ``target_tokens``.

    Why this exists next to ``chunk_documents``: fixed windows shift
    when content shifts — prepend one sentence and EVERY downstream
    chunk hash changes, so chunk-level dedup sees nothing.  CDC
    boundaries depend only on the local window of content, so after an
    insertion the cut points re-align at the next boundary and all
    later chunks keep their identity — the property that makes
    sub-document dedup (shared-chunk detection between near-identical
    documents) work.  Pair with ``exact_dedup`` on ``chunk_hash`` or a
    shared-chunk-fraction join to find partially-overlapping documents.

    Plan shape: token + token-hash arrays are built JVM-side
    (split + ``transform(xxhash64)``), then ONE ``mapInPandas`` pass
    computes the rolling hash and cut points per document (vectorized
    over the window, a short python loop over the cuts) — a narrow map
    stage at any corpus size, no shuffle, ``(doc_id, chunk_idx)`` stable.
    ``chunk_hash`` is a polynomial fold of the chunk's token hashes
    (content identity, independent of the chunking parameters).
    Empty/NULL documents produce zero chunks.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField as _SF,
        StructType as _ST,
    )

    if min_tokens is None:
        min_tokens = max(1, target_tokens // 4)
    if max_tokens is None:
        max_tokens = target_tokens * 4
    if not 1 <= min_tokens <= target_tokens <= max_tokens:
        raise ValueError("need 1 <= min_tokens <= target_tokens <= max_tokens")
    if window < 1:
        raise ValueError("window must be >= 1")

    toks = tokens(F.col(text_col))
    src = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.transform(toks, lambda t: F.xxhash64(t)).alias("__h"),
    )
    out_schema = _ST(
        [
            _SF(id_col, df.schema[id_col].dataType),
            _SF("chunk_idx", IntegerType()),
            _SF("n_tokens", IntegerType()),
            _SF("chunk_hash", LongType()),
            _SF("chunk_text", StringType()),
        ]
    )
    B = np.uint64(_CDC_BASE)

    def chunker(batches):
        with np.errstate(over="ignore"):
            for pdf in batches:
                out = {
                    id_col: [],
                    "chunk_idx": [],
                    "n_tokens": [],
                    "chunk_hash": [],
                    "chunk_text": [],
                }
                for did, tk, hh in zip(pdf[id_col], pdf["__toks"], pdf["__h"]):
                    if tk is None or len(tk) == 0:
                        continue
                    h = np.asarray(hh, dtype=np.int64).view(np.uint64)
                    spans = _cdc_cuts(
                        h, target_tokens, min_tokens, max_tokens, window
                    )
                    for idx, (start, end) in enumerate(spans):
                        fold = np.uint64(0)
                        for v in h[start:end]:
                            fold = fold * B + v
                        out[id_col].append(did)
                        out["chunk_idx"].append(idx)
                        out["n_tokens"].append(end - start)
                        out["chunk_hash"].append(int(fold.view(np.int64)))
                        out["chunk_text"].append(" ".join(tk[start:end]))
                if out["chunk_idx"]:
                    yield pd.DataFrame(out).astype(
                        {
                            "chunk_idx": "int32",
                            "n_tokens": "int32",
                            "chunk_hash": "int64",
                        }
                    )

    return src.mapInPandas(chunker, out_schema)


def shared_chunk_fraction(
    chunks,
    id_col: str = "doc_id",
    hash_col: str = "chunk_hash",
):
    """Sub-document overlap detection over ``cdc_chunks`` output: for
    every document pair sharing at least one chunk hash, the fraction of
    the smaller document's chunks found in the larger — containment, the
    natural score for partial duplication (boilerplate shells, quoted
    articles, near-identical mirrors with different headers).

    The pair join is keyed on ``chunk_hash`` — exactly the LSH-bucket
    shape: only documents that actually share content ever meet, never
    all-pairs.  Sets are DISTINCT chunk hashes (a chunk repeated inside
    one document counts once).  Returns (id_a, id_b, shared,
    containment) with id_a < id_b."""
    uniq = chunks.select(id_col, hash_col).distinct()
    sizes = uniq.groupBy(id_col).agg(F.count(F.lit(1)).alias("__sz"))
    c = uniq.select(F.col(id_col).alias("id_a"), hash_col)
    d = uniq.select(F.col(id_col).alias("id_b"), hash_col)
    shared = (
        c.join(d, hash_col)
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed(id_col, "id_a"), "id_a")
        .withColumnRenamed("__sz", "__sz_a")
        .join(sizes.withColumnRenamed(id_col, "id_b"), "id_b")
        .withColumnRenamed("__sz", "__sz_b")
        .select(
            "id_a",
            "id_b",
            "shared",
            (
                F.col("shared")
                / F.least(F.col("__sz_a"), F.col("__sz_b")).cast("double")
            ).alias("containment"),
        )
    )


# --------------------------------------------------------------------------
# Curation rules: PII redaction + repetition filters (Gopher-style)
# --------------------------------------------------------------------------

#: conservative, regex-dialect-portable PII patterns (the cheap scrub
#: pass every public curation recipe runs before anything model-based);
#: each maps to its replacement token.
_PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # 7+ DIGITS with at most two separator chars between consecutive
    # digits — phones and account-ish ids.  Deliberately errs toward
    # redaction: an 8-digit date like 2026-08-14 matches too (the safe
    # direction for a PII scrub); prose year ranges ("2020 - 2024",
    # three separator chars) do not.
    ("phone", r"(?<![\dA-Za-z])\+?(?:\d[ ().-]{0,2}){6,}\d(?![\dA-Za-z])", "<PHONE>"),
]


def redact_pii(text: Column) -> Column:
    """Scrub emails, IPv4 addresses, and phone-like digit runs with
    typed placeholder tokens — one chained ``regexp_replace`` pass per
    pattern, all JVM-side.  Order matters: emails first (an email's
    digits must not half-match the phone pattern afterward)."""
    out = text
    for _, pat, repl in _PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column) -> Column:
    """struct(email, ipv4, phone) match counts per document — the audit
    column pipelines keep next to the redacted text."""
    return F.struct(
        *[
            F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).alias(name)
            for name, pat, _ in _PII_PATTERNS
        ]
    )


def repetition_stats(text: Column) -> Column:
    """Gopher-style within-document repetition signals, pure JVM:

    - ``dup_line_frac``: 1 − distinct/total over newline-split lines
      (trimmed, empties dropped),
    - ``dup_3gram_frac``: 1 − distinct/total over normalized-token
      3-grams (``dedup.shingles``'s lowercase/punctuation-stripped view),
    - ``top_word_frac``: share of the single most frequent token.

    High values on any of them are the canonical boilerplate/spam marks
    (C4/Gopher/RefinedWeb publish thresholds like dup_line_frac > 0.30).
    Empty documents score 0.0 everywhere."""
    lines = F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    from .dedup import shingles

    n_lines = F.size(lines)
    dup_line = F.when(
        n_lines > 0,
        1.0 - F.size(F.array_distinct(lines)).cast("double") / n_lines,
    ).otherwise(F.lit(0.0))

    grams = shingles(text, 3)  # distinct 3-grams (dedup.shingles is distinct)
    toks = tokens(F.lower(text))
    n_tok = F.size(toks)
    n_grams_total = F.greatest(n_tok - F.lit(2), F.lit(0))
    dup_gram = F.when(
        n_grams_total > 0,
        1.0 - F.size(grams).cast("double") / n_grams_total,
    ).otherwise(F.lit(0.0))

    counts = F.aggregate(
        F.array_distinct(toks),
        F.array().cast("array<int>"),
        lambda acc, w: F.array_append(
            acc, F.size(F.filter(toks, lambda t: t == w))
        ),
    )
    top_word = F.when(
        n_tok > 0,
        F.array_max(F.array_append(counts, F.lit(0))).cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    return F.struct(
        dup_line.alias("dup_line_frac"),
        dup_gram.alias("dup_3gram_frac"),
        top_word.alias("top_word_frac"),
    )


#: C0/C1-ish control characters that are never content: everything
#: below 0x20 EXCEPT tab/LF/CR (those are whitespace, handled by the
#: collapse step), plus DEL.  Portable \xNN escapes (Java regex + RE2).
CONTROL_CHAR_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def unicode_normalize(text: Column, form: str = "NFC") -> Column:
    """Unicode normalization to ``form`` (NFC/NFKC/NFD/NFKD) — Spark has
    no JVM builtin, so this is ONE Arrow-batched pandas UDF over stdlib
    ``unicodedata`` (no package import on executors; NULLs pass
    through).  NFC is the web canonical form; NFKC is what tokenizer
    pipelines apply (folds ligatures/width variants — lossy by design,
    so it is opt-in, not the default)."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unicode_normalize: unknown form {form!r}")
    import pandas as pd  # noqa: F401 (signature type only)

    @F.pandas_udf("string")
    def _norm(s):  # pd.Series -> pd.Series
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return _norm(text)


def normalize_text(
    text: Column,
    form: str | None = "NFC",
    strip_control: bool = True,
    collapse_whitespace: bool = True,
) -> Column:
    """The standard text-cleaning pre-step of a curation pipeline (CCNet
    normalizes before LM scoring; tokenizers normalize before BPE; two
    byte-different crawls of one page hash apart without it):

    1. unicode normalization to ``form`` (``None`` skips it — the rest
       is then pure JVM, no Arrow pass),
    2. control-char strip (``CONTROL_CHAR_CLASS``: C0 minus tab/LF/CR,
       plus DEL — they are never content),
    3. whitespace-run collapse to single spaces + trim (so the hash/
       shingle view of a doc is layout-invariant).

    Composes in front of ``fingerprint``/``dedup.shingles``/LM scoring;
    each step is independently optional."""
    out = text
    if form is not None:
        out = unicode_normalize(out, form)
    if strip_control:
        out = F.regexp_replace(out, CONTROL_CHAR_CLASS, "")
    if collapse_whitespace:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return out


#: minimal HTML entity map — the handful that dominate scraped text;
#: other numeric entities are REMOVED (replaced with a space) below,
#: not decoded — acceptable for a heuristic extractor feeding hashes
#: and quality stats, where a rare dropped glyph beats a parser dep.
_HTML_ENTITIES = [
    ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
]


def strip_html(text: Column) -> Column:
    """Tag-strip + entity decode for scraped documents, pure JVM regex:
    drop ``<script>``/``<style>`` elements with their contents, replace
    block-level tags with newlines (so line-based heuristics still see
    line structure), strip every remaining tag, decode the common
    entities, and collapse horizontal whitespace runs.  A heuristic
    extractor (the published C4/CCNet preprocessing class), not an HTML
    parser — malformed markup degrades to text passthrough, never an
    error."""
    out = F.regexp_replace(
        text, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " "
    )
    out = F.regexp_replace(out, r"(?i)<!--.*?-->", " ")
    out = F.regexp_replace(
        out, r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article)\b[^>]*>", "\n"
    )
    out = F.regexp_replace(out, r"<[^>]{0,512}>", " ")
    for ent, repl in _HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(repl))
    out = F.regexp_replace(out, r"&#(\d{1,7});", " ")  # rare numeric entities
    return F.trim(F.regexp_replace(out, r"[ \t\x0b\f\r]+", " "))


def c4_line_filter(
    text: Column,
    min_words: int = 3,
    require_terminal_punct: bool = True,
) -> Column:
    """The C4 line-level cleanup (Raffel et al. 2020 §2.2, public
    recipe), pure JVM: keep only lines that (a) have at least
    ``min_words`` words, (b) end in terminal punctuation (. ! ? "), and
    (c) contain neither a curly brace (code/templating) nor the
    lowercase phrase "lorem ipsum" nor the word "javascript".  Returns
    the document rebuilt from the surviving lines (newline-joined);
    documents with no surviving line become the empty string — pair
    with a ``!= ''`` predicate to drop them."""
    lines = F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    def _ok(l: Column) -> Column:
        low = F.lower(l)
        cond = F.size(F.filter(F.split(l, r"\s+"), lambda w: w != F.lit(""))) >= F.lit(min_words)
        if require_terminal_punct:
            cond = cond & low.rlike(r'[.!?"]$')
        return (
            cond
            & ~low.contains("{") & ~low.contains("}")
            & ~low.contains("lorem ipsum")
            & ~low.contains("javascript")
        )
    return F.array_join(F.filter(lines, _ok), "\n")


def dedup_lines_across_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_occurrences: int = 1,
    min_line_chars: int = 10,
) -> DataFrame:
    """RefinedWeb-style corpus-level line dedup: a line that appears in
    more than ``max_occurrences`` documents is boilerplate (cookie
    banners, nav text, signatures) and is removed from EVERY document;
    short lines (< ``min_line_chars``) are exempt (headings, list
    bullets — too collision-prone to count).

    Plan shape: posexplode lines → ONE hash-agg on xxhash64(line) for
    corpus counts → broadcast the boilerplate hash set (bounded: lines
    crossing the threshold, not all lines) → reassemble surviving lines
    per document with an order-preserving sort inside
    ``array_agg``-equivalent (collect after a window sort is avoided:
    group + ``array_sort`` on (pos, line) structs keeps it one
    exchange).  Documents whose every line was boilerplate come back as
    the empty string.

    The boilerplate set must be broadcast-small; with web-scale corpora
    raise ``max_occurrences`` (the set shrinks as the threshold rises)
    or pre-shard.  Count semantics are per-document occurrence (a line
    repeated inside ONE doc counts once — within-doc repetition is
    ``repetition_stats``'s job)."""
    lines = docs.select(
        F.col(id_col).alias("__ld_id"),
        F.posexplode(
            F.filter(
                F.transform(F.split(F.col(text_col), r"\n"), lambda l: F.trim(l)),
                lambda l: l != F.lit(""),
            )
        ).alias("__pos", "__line"),
    )
    counted = F.length(F.col("__line")) >= min_line_chars
    boiler = (
        lines.where(counted)
        .select("__ld_id", F.xxhash64("__line").alias("__lh"))
        .distinct()  # per-document occurrence
        .groupBy("__lh")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > max_occurrences)
        .select("__lh")
    )
    kept_lines = lines.join(
        F.broadcast(boiler),
        (F.length(F.col("__line")) >= min_line_chars)
        & (F.xxhash64("__line") == F.col("__lh")),
        "left_anti",
    )
    rebuilt = (
        kept_lines.groupBy("__ld_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__line"))
                    ),
                    lambda s: s["__line"],
                ),
                "\n",
            ).alias("__new_text")
        )
    )
    out = (
        docs.join(rebuilt, docs[id_col] == rebuilt["__ld_id"], "left")
        .withColumn(text_col, F.coalesce(F.col("__new_text"), F.lit("")))
        .drop("__ld_id", "__new_text")
    )
    return out


def top_ngrams(
    docs,
    n: int = 3,
    k: int = 100,
    text_col: str = "text",
    min_count: int = 2,
):
    """(ngram, c): the ``k`` most frequent word n-grams of the corpus —
    the boilerplate-phrase miner (nav text, cookie banners, license
    headers surface at the top by construction), whose output feeds
    blocklists and ``dedup_lines_across_corpus`` thresholds.

    Plan: the ``shingles`` n-gram expression (distinct per doc — each
    DOCUMENT votes once per phrase, so a single phrase-spamming doc
    cannot inflate the corpus ranking) → explode → one combinable hash
    agg → ``min_count`` filter → global sorted-limit top-k (TakeOrdered:
    only k rows per partition reach the driver-side merge).  Linear at
    any corpus size; the ranking domain is bounded by distinct n-grams,
    never rows."""
    from pyspark.sql import functions as F

    return (
        docs.select(F.explode(shingles_ngrams(F.col(text_col), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= F.lit(min_count))
        .orderBy(F.col("c").desc(), F.col("ngram").asc())
        .limit(k)
    )


def shingles_ngrams(text, n: int):
    """The word n-gram set of a text column (distinct) — re-exported
    from ``dedup.shingles`` so text-analysis callers need not import
    the dedup module."""
    from bigdataproject_formula1_telemetry_spark.operators.dedup import shingles

    return shingles(text, n)


def blocklist_filter(
    docs,
    blocked_words,
    text_col: str = "text",
    mode: str = "page",
    min_hits: int = 1,
):
    """The C4 banned-words gate (Raffel et al. 2020 §2.2: pages
    containing any word from a blocklist are removed; the canonical
    list is public — supply it, or a domain-specific one).  Matching is
    case-insensitive on WORD boundaries (split on non-alphanumerics, so
    "assess" never matches a blocked "ass" — the classic scunthorpe
    failure of substring blocklists).

    ``mode="page"`` drops any document with ≥ ``min_hits`` blocked-word
    occurrences (the published C4 behavior); ``mode="line"`` removes
    only the offending lines and keeps the rest of the document
    (documents emptied entirely become '' — pair with a != ''
    predicate, like ``c4_line_filter``).

    Scale: the blocklist rides as one lowercase literal array in the
    plan (hundreds of words by contract — it is a curated list, not a
    corpus); the gate is a pure JVM size(array_intersect(tokens,
    blocked)) expression, no UDF, no shuffle, pushdown-friendly."""
    from pyspark.sql import functions as F

    if mode not in ("page", "line"):
        raise ValueError(f"mode must be page|line, got {mode!r}")
    if not blocked_words:
        return docs
    blocked = F.array(
        *[F.lit(w.lower()) for w in sorted(set(blocked_words))]
    )

    def _words(col):
        return F.filter(
            F.split(F.lower(col), r"[^a-z0-9]+"), lambda t: t != F.lit("")
        )

    # OCCURRENCES, not distinct blocked words: a page repeating one
    # blocked word ``min_hits`` times must trip the gate, which
    # array_intersect (set semantics) would never count past 1.
    def _hits(col):
        return F.size(
            F.filter(_words(col), lambda t: F.array_contains(blocked, t))
        )

    if mode == "page":
        return docs.where(
            F.col(text_col).isNull() | (_hits(F.col(text_col)) < F.lit(min_hits))
        )
    lines = F.split(F.col(text_col), r"\n")
    kept = F.filter(lines, lambda l: _hits(l) < F.lit(min_hits))
    return docs.withColumn(
        text_col,
        F.when(F.col(text_col).isNull(), F.col(text_col)).otherwise(
            F.array_join(kept, "\n")
        ),
    )


def extract_main_content(
    html: Column,
    min_block_chars: int = 80,
    max_link_density: float = 0.33,
) -> Column:
    """Main-content extraction by block-level link-density
    classification — the jusText/Readability class of heuristic
    (Pomikálek 2011; Arc90 Readability — both public): navigation,
    menus, footers and "related links" are short and link-dense, body
    text is long and link-sparse.  ``strip_html`` keeps every text node
    (nav labels included); this keeps only blocks that read like
    content:

    1. drop script/style/comments (they are not content of any block);
    2. split into candidate blocks on block-level tags;
    3. per block, measure text length (tags stripped) and LINK DENSITY
       = anchor-text chars / text chars (computed BEFORE stripping the
       inline ``<a>`` tags — the signal the tag-stripper destroys);
    4. keep blocks with ≥ ``min_block_chars`` of text and link density
       ≤ ``max_link_density``; newline-join the survivors.

    Pure JVM expressions (split → transform/aggregate over the block
    array), no UDF, no shuffle.  A heuristic, not a parser: malformed
    markup degrades to over/under-keeping, never an error.  Documents
    with no qualifying block become '' — pair with a != '' predicate."""
    cleaned = F.regexp_replace(
        html, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " "
    )
    cleaned = F.regexp_replace(cleaned, r"(?i)<!--.*?-->", " ")
    blocks = F.split(
        cleaned,
        r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|td|table|section|article|"
        r"header|footer|nav|aside|main)\b[^>]*>",
    )

    def _text_len(b: Column) -> Column:
        txt = F.trim(F.regexp_replace(b, r"<[^>]{0,512}>", " "))
        return F.length(F.regexp_replace(txt, r"\s+", " "))

    def _anchor_len(b: Column) -> Column:
        anchors = F.regexp_extract_all(b, F.lit(r"(?is)<a\b[^>]*>(.*?)</a>"), 1)
        return F.aggregate(
            anchors,
            F.lit(0),
            lambda acc, a: acc + _text_len(a),
        )

    def _keep(b: Column) -> Column:
        n = _text_len(b)
        return (n >= F.lit(min_block_chars)) & (
            _anchor_len(b).cast("double")
            <= F.lit(float(max_link_density)) * n.cast("double")
        )

    kept = F.filter(blocks, _keep)
    stripped = F.transform(
        kept,
        lambda b: F.trim(
            F.regexp_replace(
                F.regexp_replace(b, r"<[^>]{0,512}>", " "), r"[ \t\x0b\f\r]+", " "
            )
        ),
    )
    return F.array_join(F.filter(stripped, lambda t: t != F.lit("")), "\n")


#: the Gopher rule's required-stopword list (Rae et al. 2021, A1.1 —
#: public): a real-language English document contains at least two.
_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_stats(text: Column) -> Column:
    """The Gopher quality-rule inputs (Rae et al., "Scaling Language
    Models: ... Gopher", 2021, Appendix A1.1 — public recipe) as one
    JVM struct; the repetition half lives in ``repetition_stats``:

    - ``n_words``, ``mean_word_len`` — length band inputs;
    - ``symbol_ratio`` — ('#' + '...') occurrences per word;
    - ``bullet_line_frac`` / ``ellipsis_line_frac`` — lines starting
      with a bullet / ending with an ellipsis;
    - ``alpha_word_frac`` — words containing ≥ 1 alphabetic char;
    - ``stopword_hits`` — how many of the rule's 8 required English
      stopwords appear.

    Empty documents score zeros.  Pure expressions, no UDF."""
    toks = tokens(text)
    n = F.size(toks)
    nd = n.cast("double")
    mean_len = F.when(
        n > 0,
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
        ).cast("double") / nd,
    ).otherwise(F.lit(0.0))
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ell = (
        F.length(text) - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = F.when(
        n > 0, (n_hash + n_ell).cast("double") / nd
    ).otherwise(F.lit(0.0))
    lines = F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    nl = F.size(lines).cast("double")
    bullet_frac = F.when(
        F.size(lines) > 0,
        F.size(
            F.filter(lines, lambda l: l.rlike(r"^[•‣▪*\-]"))
        ).cast("double") / nl,
    ).otherwise(F.lit(0.0))
    ell_line_frac = F.when(
        F.size(lines) > 0,
        F.size(
            F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$"))
        ).cast("double") / nl,
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n > 0,
        F.size(F.filter(toks, lambda t: t.rlike(r"[a-zA-Z]"))).cast("double")
        / nd,
    ).otherwise(F.lit(0.0))
    req = F.array(*[F.lit(w) for w in _GOPHER_STOPWORDS])
    stop_hits = F.size(
        F.array_intersect(F.array_distinct(tokens(F.lower(text))), req)
    )
    return F.struct(
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_line_frac"),
        ell_line_frac.alias("ellipsis_line_frac"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
    )


def gopher_filter(
    docs,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
):
    """Apply the full Gopher quality rule set (published thresholds as
    defaults) — a document survives only if EVERY rule passes.  Compose
    with ``repetition_stats`` gates (``curate_documents(
    max_dup_line_frac=)``) for the complete Gopher filter."""
    s = gopher_stats(F.col(text_col))
    return docs.where(
        (s["n_words"] >= F.lit(min_words))
        & (s["n_words"] <= F.lit(max_words))
        & (s["mean_word_len"] >= F.lit(min_mean_word_len))
        & (s["mean_word_len"] <= F.lit(max_mean_word_len))
        & (s["symbol_ratio"] <= F.lit(max_symbol_ratio))
        & (s["bullet_line_frac"] <= F.lit(max_bullet_line_frac))
        & (s["ellipsis_line_frac"] <= F.lit(max_ellipsis_line_frac))
        & (s["alpha_word_frac"] >= F.lit(min_alpha_word_frac))
        & (s["stopword_hits"] >= F.lit(min_stopword_hits))
    )


def fineweb_line_stats(text: Column) -> Column:
    """The FineWeb custom line-level signals (Penedo et al. 2024,
    "The FineWeb Datasets" — public recipe; these three filters were
    derived there by inspecting what C4/Gopher still let through):

    - ``punct_line_frac``: fraction of lines ENDING in terminal
      punctuation (FineWeb drops docs where < 0.12);
    - ``short_line_frac``: fraction of lines with < 30 characters
      (drop when > 0.67);
    - ``dup_line_char_frac``: fraction of CHARACTERS sitting in
      duplicated lines — the character-weighted complement of
      ``repetition_stats.dup_line_frac`` (drop when > 0.1; a few
      repeated long lines weigh more than many repeated short ones).

    Empty documents score zeros.  Pure JVM expressions; the dup-char
    measure is O(distinct_lines × lines) WITHIN each document —
    bounded by per-doc line counts (tens to hundreds on web pages),
    never corpus size."""
    lines = F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    nl = F.size(lines)
    nld = nl.cast("double")
    punct_frac = F.when(
        nl > 0,
        F.size(F.filter(lines, lambda l: l.rlike(r'[.!?"’”]$'))).cast(
            "double"
        )
        / nld,
    ).otherwise(F.lit(0.0))
    short_frac = F.when(
        nl > 0,
        F.size(F.filter(lines, lambda l: F.length(l) < 30)).cast("double") / nld,
    ).otherwise(F.lit(0.0))
    total_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda a, l: a + F.length(l)
    )
    # chars in duplicated lines = total - chars of one copy of each
    # distinct line that appears exactly once... computed as: for each
    # DISTINCT line, if it repeats, ALL its occurrences count as dup
    # mass (the FineWeb definition: characters in duplicated lines)
    distinct_lines = F.array_distinct(lines)
    dup_chars = F.aggregate(
        distinct_lines,
        F.lit(0).cast("long"),
        lambda a, d: a
        + F.when(
            F.size(F.filter(lines, lambda l: l == d)) > 1,
            F.size(F.filter(lines, lambda l: l == d)).cast("long")
            * F.length(d).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    dup_char_frac = F.when(
        total_chars > 0, dup_chars.cast("double") / total_chars.cast("double")
    ).otherwise(F.lit(0.0))
    return F.struct(
        punct_frac.alias("punct_line_frac"),
        short_frac.alias("short_line_frac"),
        dup_char_frac.alias("dup_line_char_frac"),
    )


def fineweb_filter(
    docs,
    text_col: str = "text",
    min_punct_line_frac: float = 0.12,
    max_short_line_frac: float = 0.67,
    max_dup_line_char_frac: float = 0.1,
):
    """Apply the three FineWeb custom line filters with the published
    thresholds as defaults — compose after the C4/Gopher gates, as the
    paper does."""
    s = fineweb_line_stats(F.col(text_col))
    return docs.where(
        (s["punct_line_frac"] >= F.lit(min_punct_line_frac))
        & (s["short_line_frac"] <= F.lit(max_short_line_frac))
        & (s["dup_line_char_frac"] <= F.lit(max_dup_line_char_frac))
    )


def sentence_chunks(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
):
    """Sentence-ALIGNED chunking (r7): like ``chunk_documents`` but
    boundaries land on sentence edges — greedy in-order packing of
    whole sentences up to ``chunk_tokens`` whitespace tokens.  Training
    chunks that never cut mid-sentence lose less supervision at the
    seams; a single sentence longer than the budget becomes its own
    over-budget chunk (visible via ``n_tokens`` — hard-split it with
    ``chunk_documents`` downstream if the consumer can't take it;
    silently truncating text mid-sentence is the failure mode this
    operator exists to avoid).

    Pure JVM end to end: sentence split is a lookbehind regex on
    terminal punctuation (``(?<=[.!?…])\\s+``), the greedy fold is ONE
    ``F.aggregate`` over the sentence array (struct accumulator:
    finished chunks + the open chunk + its token count), then a
    posexplode.  No Python, no shuffle — a map stage over the existing
    partitioning, same contract as ``chunk_documents``, and
    ``(doc_id, chunk_idx)`` stays a deterministic key."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    sents = F.filter(
        F.transform(
            F.split(
                F.regexp_replace(
                    F.trim(F.col(text_col)), r"(?<=[.!?…])\s+", "\x1e"
                ),
                "\x1e",
            ),
            lambda s: F.trim(s),
        ),
        lambda s: s != F.lit(""),
    )
    ntok = token_count  # whitespace token count of one sentence

    empty_chunks = F.array().cast("array<string>")
    init = F.struct(
        empty_chunks.alias("done"),
        F.lit("").alias("cur"),
        F.lit(0).alias("n"),
    )

    def step(acc, s):
        sn = ntok(s)
        fits = (acc["n"] + sn <= F.lit(chunk_tokens)) | (acc["n"] == 0)
        return F.when(
            fits,
            F.struct(
                acc["done"].alias("done"),
                F.when(acc["n"] == 0, s)
                .otherwise(F.concat_ws(" ", acc["cur"], s))
                .alias("cur"),
                (acc["n"] + sn).alias("n"),
            ),
        ).otherwise(
            F.struct(
                F.concat(acc["done"], F.array(acc["cur"])).alias("done"),
                s.alias("cur"),
                sn.alias("n"),
            )
        )

    def finish(acc):
        return F.when(
            acc["n"] > 0, F.concat(acc["done"], F.array(acc["cur"]))
        ).otherwise(acc["done"])

    chunks = F.aggregate(sents, init, step, finish)
    out = df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    )
    return out.withColumn("n_tokens", token_count(F.col("chunk_text")))
