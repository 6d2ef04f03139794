"""URL-level curation (operators/urls.py): part extraction, blocklist
suffix semantics, keyword gate, expected-count domain capping."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.operators import urls as U


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        (1, "https://www.example.com/a/b?q=1"),
        (2, "http://sub.example.com/x"),
        (3, "https://news.site.org/article"),
        (4, "https://shop.example.co.uk/item"),
        (5, "example.com/bare-no-scheme"),
        (6, None),
        (7, "https://casino-fun.net/spin"),
        (8, "https://blog.okdomain.io/post?ref=CASINO"),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_url_parts(spark, pages):
    got = {r["doc_id"]: r for r in U.url_parts(pages).collect()}
    assert got[1]["host"] == "example.com"          # www. stripped
    assert got[1]["domain"] == "example.com"
    assert got[1]["path"] == "/a/b"
    assert got[2]["host"] == "sub.example.com"
    assert got[2]["domain"] == "example.com"        # registered domain
    assert got[4]["host"] == "shop.example.co.uk"
    assert got[4]["domain"] == "example.co.uk"      # 2-level TLD aware
    assert got[5]["host"] == "example.com"          # scheme-less fallback
    assert got[6]["host"] is None and got[6]["domain"] is None


def test_url_filter_domain_suffix_semantics(spark, pages):
    kept = U.url_filter(pages, blocked_domains=["example.com"])
    ids = sorted(r["doc_id"] for r in kept.collect())
    # 1 (www.example.com), 2 (sub.example.com), 5 (bare) all blocked;
    # example.co.uk is a DIFFERENT registered domain and survives
    assert ids == [3, 4, 6, 7, 8]
    # blocking the subdomain only must NOT block the apex
    kept2 = U.url_filter(pages, blocked_domains=["sub.example.com"])
    ids2 = sorted(r["doc_id"] for r in kept2.collect())
    assert 1 in ids2 and 5 in ids2 and 2 not in ids2


def test_url_filter_keywords_case_insensitive(spark, pages):
    kept = U.url_filter(pages, blocked_keywords=["casino"])
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert 7 not in ids and 8 not in ids            # path AND query hit
    assert set(ids) == {1, 2, 3, 4, 5, 6}


def test_url_filter_null_urls_kept_and_row_count_stable(spark, pages):
    kept = U.url_filter(
        pages, blocked_domains=["nomatch.example.zz"], blocked_keywords=["zzz"]
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == list(range(1, 9))
    # multiple blocklist entries of ONE registered domain never
    # duplicate surviving rows (array-per-domain join)
    kept2 = U.url_filter(
        pages, blocked_domains=["a.example.com", "b.example.com"]
    )
    got = [r["doc_id"] for r in kept2.collect()]
    assert sorted(got) == sorted(set(got)) == list(range(1, 9))


def test_cap_per_domain_expected_count_and_determinism(spark):
    rows = [(i, f"https://farm.example.com/p{i}") for i in range(4000)] + [
        (10_000 + i, f"https://small.org/p{i}") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    capped = U.cap_per_domain(df, max_docs=400)
    by_dom = {
        r["d"]: r["n"]
        for r in U.url_parts(capped)
        .groupBy(F.col("domain").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # small domain passes whole; farm lands near 400 (3 sigma ~ 59)
    assert by_dom["small.org"] == 5
    assert abs(by_dom["example.com"] - 400) < 60
    # deterministic + partitioning-invariant kept set
    a = sorted(r["doc_id"] for r in capped.collect())
    b = sorted(
        r["doc_id"]
        for r in U.cap_per_domain(df.repartition(13), max_docs=400).collect()
    )
    assert a == b
    # engine-independent gate: the kept set is exactly the md5 rule
    frac = 400 / 4000
    thresh = format(int(frac * 16**8), "08x")
    expect = sorted(
        i
        for i, _ in rows
        if i >= 10_000
        or hashlib.md5(f"domcap|{i}".encode()).hexdigest()[:8] < thresh
    )
    assert a == expect


def test_cap_per_domain_null_domain_rows_kept(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "https://x.com/a")], "doc_id long, url string"
    )
    out = U.cap_per_domain(df, max_docs=10)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2]


def test_cap_bad_args(spark, pages):
    with pytest.raises(ValueError):
        U.cap_per_domain(pages, max_docs=0)


def test_warc_bridge_composes_with_url_filter(spark, tmp_path):
    # end-to-end: WARC -> documents(url) -> url_filter
    from tests.test_warc import _record, _http
    from bigdataproject_formula1_telemetry_spark.sources import warc as W

    data = b"".join(
        [
            _record(
                "response",
                _http(b"<html><p>good page content here</p></html>"),
                uri="https://good.example.org/a",
                rec_id="<urn:uuid:1111>",
                content_type="application/http;msgtype=response",
            ),
            _record(
                "response",
                _http(b"<html><p>spam page</p></html>"),
                uri="https://bad.spamfarm.biz/b",
                rec_id="<urn:uuid:2222>",
                content_type="application/http;msgtype=response",
            ),
        ]
    )
    p = tmp_path / "mix.warc"
    p.write_bytes(data)
    docs = W.warc_to_documents(W.read_warc(spark, str(p)))
    kept = U.url_filter(docs, blocked_domains=["spamfarm.biz"])
    urls = [r["url"] for r in kept.collect()]
    assert urls == ["https://good.example.org/a"]


def test_corpus_card_domains_section(spark):
    rows = [
        (i, f"doc text {i} with enough words to score", f"https://{'big' if i < 7 else 'small'}.example.org/p{i}")
        for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    from bigdataproject_formula1_telemetry_spark.plans import pipelines as P

    card = P.corpus_card(docs, lang_col=None)
    dom = {
        r["key"]: r["value"]
        for r in card.where(F.col("section") == "domains").collect()
    }
    assert dom["distinct_domains"] == 1.0  # one registered domain
    assert dom["top_domain_frac"] == 1.0
    assert dom["example.org"] == 10.0
    # without a url column the section is absent (non-web corpora keep
    # their card shape unchanged)
    card2 = P.corpus_card(docs.drop("url"), lang_col=None)
    assert card2.where(F.col("section") == "domains").count() == 0


def test_corpus_card_diversity_section(spark):
    from bigdataproject_formula1_telemetry_spark.plans import pipelines as P

    base = " ".join(f"w{i}" for i in range(30))
    uniq = " ".join(f"u{i}" for i in range(30))
    # two docs sharing one long span verbatim + one fully unique doc
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, uniq)], "doc_id long, text string"
    )
    card = {
        r["key"]: r["value"]
        for r in P.corpus_card(docs, lang_col=None)
        .where(F.col("section") == "diversity")
        .collect()
    }
    # 18 per-doc 13-grams each: docs 1+2 duplicate all theirs, doc 3
    # unique -> distinct fraction ~ 36/54 = 2/3 (approx sketch, 2% rel)
    assert card["ngrams_13"] == 54.0
    assert abs(card["distinct_13gram_frac_approx"] - 2 / 3) < 0.05


def test_url_filter_www_prefixed_blocklist_entries(spark, pages):
    """UT1-class lists carry thousands of ``www.example.com`` entries;
    the corpus side strips ``www.`` (``_host``), so the blocklist side
    must normalize identically or such entries silently block nothing."""
    kept = U.url_filter(pages, blocked_domains=["www.example.com"])
    ids = sorted(r["doc_id"] for r in kept.collect())
    # identical outcome to blocking "example.com": the www page (1), the
    # subdomain (2) and the bare host (5) are all gone
    assert ids == [3, 4, 6, 7, 8]
    # both spellings in one list: no duplicate-row blowup, same outcome
    kept2 = U.url_filter(
        pages, blocked_domains=["www.example.com", "example.com"]
    )
    got = sorted(r["doc_id"] for r in kept2.collect())
    assert got == [3, 4, 6, 7, 8]


def test_corpus_card_null_domain_not_counted_as_domain(spark):
    """URL-less rows group under the NULL domain: they must appear in
    the top-10 listing as ``<no-host>`` but never inflate
    ``distinct_domains`` or the ``top_domain_frac`` denominator."""
    from bigdataproject_formula1_telemetry_spark.plans import pipelines as P

    rows = [
        (i, f"doc text {i} with enough words to score",
         f"https://one.example.org/p{i}" if i < 6 else None)
        for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string")
    dom = {
        r["key"]: r["value"]
        for r in P.corpus_card(docs, lang_col=None)
        .where(F.col("section") == "domains")
        .collect()
    }
    assert dom["distinct_domains"] == 1.0   # <no-host> is not a domain
    assert dom["top_domain_frac"] == 1.0    # 6/6 URL-bearing, not 6/10
    assert dom["example.org"] == 6.0
    assert dom["<no-host>"] == 4.0          # still listed for visibility


CANON_CASES = [
    # (input, expected) — one rule per case, then compositions
    ("https://Example.COM/a", "https://example.com/a"),          # host case
    ("HTTPS://example.com/a", "https://example.com/a"),          # scheme case
    ("https://www.example.com/a", "https://example.com/a"),      # www strip
    ("https://example.com./a", "https://example.com/a"),         # DNS root dot
    ("https://example.com:443/a", "https://example.com/a"),      # default port
    ("http://example.com:80/a", "http://example.com/a"),
    ("http://example.com:443/a", "http://example.com:443/a"),    # NON-default kept
    ("https://example.com:8080/a", "https://example.com:8080/a"),
    ("https://example.com", "https://example.com/"),              # empty path
    ("https://example.com/a#sec-2", "https://example.com/a"),     # fragment
    ("https://example.com/a?z=2&a=1", "https://example.com/a?a=1&z=2"),  # sort
    ("https://example.com/a?utm_source=x&b=1&fbclid=q&gclid=g&msclkid=m"
     "&mc_cid=c&mc_eid=e", "https://example.com/a?b=1"),          # tracking
    ("https://example.com/a?utm_source=x", "https://example.com/a"),  # all dropped
    ("https://example.com/a?utm=keepme", "https://example.com/a?utm=keepme"),
    ("https://example.com/a?butm_source=x", "https://example.com/a?butm_source=x"),
    ("https://example.com/a?&&b=1&", "https://example.com/a?b=1"),  # empty params
    ("https://example.com/A/B?x=1", "https://example.com/A/B?x=1"),  # path case KEPT
    ("relative/path?utm_source=x", "relative/path?utm_source=x"),  # no scheme: as-is
    ("mailto:a@b.com", "mailto:a@b.com"),                          # no ://: as-is
    ("HTTP://WWW.Example.com.:80?Z=1&utm_campaign=c#f", "http://example.com/?Z=1"),
]


def test_canonicalize_url_rules(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CANON_CASES)], "i long, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", U.canonicalize_url(F.col("url")).alias("c")).collect()
    }
    for i, (u, want) in enumerate(CANON_CASES):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"


def test_canonicalize_url_idempotent_and_null(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CANON_CASES)] + [(99, None)],
        "i long, url string",
    )
    once = df.select("i", U.canonicalize_url(F.col("url")).alias("url"))
    twice = once.select("i", U.canonicalize_url(F.col("url")).alias("url"))
    a = {r["i"]: r["url"] for r in once.collect()}
    b = {r["i"]: r["url"] for r in twice.collect()}
    assert a == b          # idempotent on every case
    assert a[99] is None   # NULL in, NULL out


def test_canonicalize_url_keep_www(spark):
    df = spark.createDataFrame([("https://www.example.com/a",)], "url string")
    got = df.select(
        U.canonicalize_url(F.col("url"), strip_www=False).alias("c")
    ).first()["c"]
    assert got == "https://www.example.com/a"


def test_canonicalize_feeds_exact_url_dedup(spark):
    """The point of the operator: crawl variants of one page collapse to
    one canonical key, distinct pages stay distinct."""
    variants = [
        "https://www.example.com/page?utm_source=tw&id=1",
        "HTTPS://EXAMPLE.COM:443/page?id=1#top",
        "https://example.com./page?id=1&fbclid=x",
    ]
    df = spark.createDataFrame(
        [(u,) for u in variants + ["https://example.com/page?id=2"]],
        "url string",
    )
    canon = df.select(U.canonicalize_url(F.col("url")).alias("c"))
    assert canon.distinct().count() == 2
    top = canon.groupBy("c").count().orderBy(F.col("count").desc()).first()
    assert top["c"] == "https://example.com/page?id=1" and top["count"] == 3
