"""Property-based checks (hypothesis) for the LM perplexity and hashed
embedding kernels: the Spark pipelines against slow, obviously-correct
pure-python references on random corpora."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row

from bigdataproject_formula1_telemetry_spark.operators import embed as E
from bigdataproject_formula1_telemetry_spark.operators import lm as L

#: tokens from a small alphabet → dense collision structure; plus
#: whitespace-only and empty entries to exercise the degenerate paths
_token = st.text(alphabet="abcXYZ09", min_size=1, max_size=4)
_doc = st.lists(_token, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=10)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _py_ppl(corpus: list[str]) -> dict[int, float]:
    """Reference implementation: add-1-smoothed unigram ppl, full vocab."""
    toks = [d.lower().split() for d in corpus]
    counts: dict[str, int] = {}
    for ts in toks:
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
    n, v = sum(counts.values()), len(counts)
    if n == 0:
        return {}
    denom = n + (v + 1)
    out = {}
    for i, ts in enumerate(toks):
        if not ts:
            continue
        lp = sum(math.log((counts[t] + 1) / denom) for t in ts)
        out[i] = math.exp(-lp / len(ts))
    return out


@settings(**_SETTINGS)
@given(corpus=_corpus)
def test_perplexity_matches_python_reference(spark, corpus):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(corpus)],
        schema="doc_id long, text string",
    )
    expected = _py_ppl(corpus)
    model = L.unigram_lm(df)
    got = {r["doc_id"]: r["ppl"] for r in L.doc_perplexity(df, model).collect()}
    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == pytest.approx(expected[k], rel=1e-9)
    # and the Arrow serving form agrees with both
    logp, unk = L.collect_lm(model)
    arrow = {
        r["doc_id"]: r["ppl"]
        for r in L.doc_perplexity_arrow(df, logp, unk).collect()
    }
    assert set(arrow) == set(expected)
    for k in expected:
        assert arrow[k] == pytest.approx(expected[k], rel=1e-9)


def _py_embed(text: str, dim: int, salt: str) -> np.ndarray:
    v = np.zeros(dim)
    for tok in text.lower().split():
        b, s = E.token_bucket_sign(tok, dim, salt)
        v[b] += s
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


@settings(**_SETTINGS)
@given(corpus=_corpus, dim=st.sampled_from([8, 32, 64]))
def test_hashed_embedding_matches_python_reference(spark, corpus, dim):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(corpus)],
        schema="doc_id long, text string",
    )
    got = {
        r["doc_id"]: np.array(r["embedding"])
        for r in E.hashed_embedding(df, dim=dim, salt="p").collect()
    }
    for i, t in enumerate(corpus):
        assert np.allclose(got[i], _py_embed(t, dim, "p"), atol=1e-12), (i, t)


def _py_remove_duplicate_spans(corpus: dict[int, str], span: int) -> dict[int, str]:
    """Brute-force reference: enumerate every span occurrence, group by
    the token tuple, keep the global-first (doc,pos) per group with >1
    occurrences, drop the union of other occurrences' token ranges."""
    occ: dict[tuple, list[tuple[int, int]]] = {}
    toks = {d: t.split() for d, t in corpus.items()}
    for d in sorted(toks):
        tt = toks[d]
        for p in range(len(tt) - span + 1):
            occ.setdefault(tuple(tt[p : p + span]), []).append((d, p))
    cuts: dict[int, set] = {d: set() for d in toks}
    for places in occ.values():
        if len(places) < 2:
            continue
        for d, p in sorted(places)[1:]:
            cuts[d].update(range(p, p + span))
    return {
        d: " ".join(t for i, t in enumerate(tt) if i not in cuts[d])
        for d, tt in toks.items()
    }


@settings(**_SETTINGS)
@given(
    corpus=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=0, max_size=20).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    span=st.sampled_from([2, 3]),
)
def test_remove_duplicate_spans_matches_bruteforce(spark, corpus, span):
    """Tiny alphabet + short spans → dense collisions, overlapping and
    nested duplicate regions — the adversarial regime for the rolling
    hash + union-of-ranges excision."""
    from bigdataproject_formula1_telemetry_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    docs = {i: t for i, t in enumerate(corpus)}
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in docs.items()],
        schema="doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(df, span_tokens=span).collect()
    }
    exp = _py_remove_duplicate_spans(docs, span)
    assert got == exp


@settings(**_SETTINGS)
@given(blob=st.binary(min_size=0, max_size=200))
def test_image_stream_info_never_crashes_on_garbage(spark, blob):
    """Scraped corpora contain truncated/corrupt blobs — the triage pass
    must emit dead-letter rows, never raise.  Prefixing real magics makes
    the parser walk partial structures, the adversarial case."""
    from bigdataproject_formula1_telemetry_spark.sources import multimodal as M

    rows = [
        (1, "image", "png", bytearray(blob), 8, 8, 3, None, None),
        (2, "image", "jpeg", bytearray(blob), 8, 8, 3, None, None),
        (3, "image", "png", bytearray(b"\x89PNG\r\n\x1a\n" + blob), 8, 8, 3, None, None),
        (4, "image", "jpeg", bytearray(b"\xff\xd8" + blob), 8, 8, 3, None, None),
    ]
    df = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    out = M.image_stream_info(df).collect()
    assert len(out) == 4
    for r in out:
        assert r["decodable"] in ("pixels", "metadata_only", "error")


@settings(**_SETTINGS)
@given(
    text=st.text(
        alphabet=st.sampled_from(list("<>/ab &;#1x\n\"'=-!")), max_size=120
    )
)
def test_strip_html_and_c4_never_crash(spark, text):
    """Malformed markup degrades to text passthrough — no regex blowup,
    no exception, output is always a string."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F
    from bigdataproject_formula1_telemetry_spark.operators import text as T

    df = spark.createDataFrame([Row(text=text)], schema="text string")
    [r] = df.select(
        T.strip_html(F.col("text")).alias("s"),
        T.c4_line_filter(F.col("text")).alias("c"),
    ).collect()
    assert isinstance(r["s"], str) and isinstance(r["c"], str)


@settings(**_SETTINGS)
@given(
    hashes=st.lists(
        st.integers(-(2**63), 2**63 - 1), min_size=2, max_size=25, unique=True
    ),
    max_h=st.integers(0, 6),
)
def test_hamming_pairs_property(spark, hashes, max_h):
    from bigdataproject_formula1_telemetry_spark.operators.dedup import (
        hamming_near_dup_pairs,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, simhash=h) for i, h in enumerate(hashes)],
        schema="doc_id long, simhash long",
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_dup_pairs(df, max_hamming=max_h).collect()
    }
    exp = set()
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            hd = bin((hashes[i] ^ hashes[j]) & 0xFFFFFFFFFFFFFFFF).count("1")
            if hd <= max_h:
                exp.add((i, j, hd))
    assert got == exp


@settings(**_SETTINGS)
@given(
    counts=st.lists(st.integers(1, 500), min_size=1, max_size=6),
    tau=st.sampled_from([0.0, 0.3, 0.7, 1.0]),
    target=st.integers(1, 800),
)
def test_temperature_fractions_property(spark, counts, tau, target):
    """f_c = min(1, target·p_c/n_c) with p_c = n^τ/Σn^τ — checked
    against direct math on a frame built to have exactly those counts."""
    import math

    from bigdataproject_formula1_telemetry_spark.operators import mixing as MX

    rows = [
        Row(doc_id=i * 1000 + j, lang=f"d{i}")
        for i, n in enumerate(counts)
        for j in range(n)
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, lang string")
    got = MX.temperature_fractions(df, "lang", tau, target)
    z = sum(n**tau for n in counts)
    for i, n in enumerate(counts):
        exp = min(1.0, target * (n**tau / z) / n)
        assert math.isclose(got[f"d{i}"], exp, rel_tol=1e-12), (i, n)


@settings(**_SETTINGS)
@given(
    scores=st.lists(st.floats(0.1, 10.0), min_size=30, max_size=120),
    frac=st.sampled_from([0.2, 0.5, 0.8]),
)
def test_score_weighted_sample_rate_property(spark, scores, frac):
    """With the cap not binding (c·s_max ≤ 1 enforced by construction is
    NOT guaranteed here — the bisection handles capped regimes too), the
    realized keep-rate must land inside a generous binomial band of the
    target for ANY positive score distribution."""
    import math

    from bigdataproject_formula1_telemetry_spark.operators.sampling import (
        score_weighted_sample,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, s=float(v)) for i, v in enumerate(scores)],
        schema="doc_id long, s double",
    )
    n = len(scores)
    kept = score_weighted_sample(df, "s", ["doc_id"], frac).count()
    exp = frac * n
    band = 4 * math.sqrt(exp * (1 - frac)) + 2
    assert abs(kept - exp) <= band, (kept, exp, band)
