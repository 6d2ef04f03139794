"""URL-level curation — the FIRST stage of a published web-corpus
pipeline (RefinedWeb §3.1 / Penedo et al. 2023 run URL filtering before
any text is even fetched; C4 and the UT1 blocklists are the standard
public rule sources).  Three operators, all pure JVM column pipelines:

- ``url_parts``     — host / registered-domain / path extraction,
- ``url_filter``    — blocked-domain (suffix-aware) + blocked-keyword
                      gate,
- ``cap_per_domain``— over-representation capping via the engine's
                      deterministic hash gate.

Scale notes (100 TB): domain blocklists (UT1 adult ≈ 4M lines) are
broadcast-joined — the corpus never shuffles on a content key; the
per-domain cap deliberately uses EXPECTED-count capping (count join +
hash-gate fraction) instead of exact rank-per-domain, because an exact
top-N-per-domain is a window over the domain key — and domains are the
textbook hot key (one host can be 10⁸ pages of a 10¹¹-page crawl; the
round-6 hot-key audit class).  The expected-count form is one
AQE-splittable count join + a pure filter, reproducible under retries.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.operators import sampling

__all__ = [
    "url_parts",
    "url_filter",
    "cap_per_domain",
    "canonicalize_url",
    "COMMON_SECOND_LEVEL_TLDS",
    "TRACKING_PARAM_PATTERN",
]

#: Common two-label public suffixes (documented APPROXIMATION of the
#: Mozilla Public Suffix List — the full PSL is an external artifact we
#: don't vendor; these cover the high-traffic ccTLD conventions, and
#: ``registered_domain`` degrades to last-two-labels elsewhere).
COMMON_SECOND_LEVEL_TLDS = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "com.tr", "com.ar",
    "co.in", "co.kr", "co.za", "co.nz",
)


def _host(url: Column) -> Column:
    """Lowercased host with any ``www.`` prefix stripped.  parse_url
    needs a scheme; scheme-less inputs fall back to a regex cut at the
    first ``/``, ``?``, ``#`` or ``:`` (port)."""
    parsed = F.parse_url(url, F.lit("HOST"))
    bare = F.regexp_extract(url, r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?([^/?#:]+)", 1)
    return F.lower(F.regexp_replace(F.coalesce(parsed, bare), r"^www\.", ""))


def _registered_domain(host: Column) -> Column:
    """Last-two-labels, or last-three when the two-label tail is a
    known second-level public suffix (``example.co.uk`` →
    ``example.co.uk``, not ``co.uk``)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    two_level = last2.isin(*COMMON_SECOND_LEVEL_TLDS)
    return (
        F.when(n <= 2, host)
        .when(two_level & (n >= 3), last3)
        .otherwise(last2)
    )


def url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds ``host``, ``domain`` (registered domain) and ``path``
    columns — the keys every URL-level rule operates on.  Pure
    expressions; NULL/unparseable URLs yield NULL parts (dead-letter
    columns, not dropped rows)."""
    u = F.col(url_col)
    host = _host(u)
    host = F.when(host == "", F.lit(None)).otherwise(host)
    return (
        df.withColumn("host", host)
        .withColumn("domain", _registered_domain(F.col("host")))
        .withColumn("path", F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit("")))
    )


#: Query parameters that carry no content identity — the standard
#: analytics/click-tracking families every public canonicalizer strips
#: (utm_* per Google Analytics docs; fbclid/gclid/msclkid click ids;
#: Mailchimp mc_cid/mc_eid).  Matched against the full ``key=`` prefix
#: (or a bare valueless key), never a substring of another key.
TRACKING_PARAM_PATTERN = (
    r"^(utm_[a-z0-9]+|fbclid|gclid|msclkid|mc_cid|mc_eid)(=|$)"
)


def canonicalize_url(url: Column, strip_www: bool = True) -> Column:
    """Canonical form of an absolute URL — the pre-dedup normalization
    step of a web-curation pipeline (two crawls of the same page differ
    by case, tracking params, param order, default ports, fragments;
    URL-level dedup without canonicalization misses all of them).
    Pure JVM expressions, engine-portable (no lookarounds):

    - scheme and host lowercased; a trailing ``.`` on the host dropped
      (DNS root); ``www.`` prefix dropped when ``strip_www``;
    - the scheme's DEFAULT port dropped (``:80`` http / ``:443``
      https) — non-default ports are identity and kept;
    - empty path with an authority becomes ``/``;
    - query: empty and tracking params (``TRACKING_PARAM_PATTERN``)
      dropped, the rest sorted bytewise and rejoined (param order is
      presentation, not identity); an emptied query drops its ``?``;
    - the fragment is always dropped (client-side only).

    Inputs without a ``://`` scheme (relative refs, mailto:) and NULLs
    are returned unchanged/NULL — canonicalization never invents a
    scheme.  Idempotent by construction (pinned in tests).
    percent-encoding normalization is deliberately NOT attempted:
    case-folding %XX without decoding reserved characters is unsafe,
    and full decoding changes identity (documented non-goal)."""
    scheme = F.lower(
        F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    )
    # everything after ://, with the fragment cut (regex stops at '#')
    rest = F.regexp_extract(
        url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^#]*)", 1
    )
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    path = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)

    host = F.lower(authority)
    host = F.regexp_replace(host, r"\.(:\d+)?$", "$1")  # drop DNS-root dot
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(
        scheme == "http", F.regexp_replace(host, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host, r":443$", "")
    ).otherwise(host)

    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit(""))
            & ~p.rlike(TRACKING_PARAM_PATTERN),
        )
    )
    q2 = F.array_join(kept, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)),
    )
    return F.when(url.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), canon).otherwise(
        url
    )


def url_filter(
    df: DataFrame,
    blocked_domains: Sequence[str] = (),
    blocked_keywords: Sequence[str] = (),
    url_col: str = "url",
    keep_parts: bool = False,
) -> DataFrame:
    """Drop rows whose URL matches a blocked domain (the domain itself
    or any subdomain of it — suffix semantics, the UT1/RefinedWeb
    convention) or contains a blocked keyword anywhere in the full URL
    (case-insensitive substring — C4's wordlist behavior).

    The domain list rides as a BROADCAST relation (UT1-class lists are
    millions of rows — too big for one literal expression, trivially
    broadcast-small), joined on the registered domain, with the
    finer subdomain suffix check as a residual condition; the corpus
    never shuffles.  Keyword matching is one JVM regex alternation.
    Rows with NULL/unparseable hosts are KEPT (a missing URL is not
    evidence of a bad page; filter them explicitly upstream if the
    contract says otherwise)."""
    import re

    out = url_parts(df, url_col)
    if blocked_domains:
        spark = df.sparkSession
        # ONE row per registered domain, its blocklist entries as an
        # array (a domain's entries are few even in UT1-class lists) —
        # the left join then never multiplies corpus rows, so no
        # post-join dedup pass is needed.  Entries are normalized the
        # same way ``_host`` normalizes corpus hosts (lowercase, strip a
        # leading ``www.``): real UT1 lists carry thousands of
        # ``www.example.com`` entries, and without the strip such an
        # entry matches NOTHING (the corpus side never keeps ``www.``).
        bl = spark.createDataFrame(
            [
                (e,)
                for e in {
                    re.sub(r"^www\.", "", d.lower().lstrip("."))
                    for d in blocked_domains
                }
            ],
            "bad string",
        )
        blk = (
            bl.select("bad", _registered_domain(F.col("bad")).alias("domain"))
            .groupBy("domain")
            .agg(F.collect_list("bad").alias("__bads"))
        )
        hit = F.exists(
            F.col("__bads"),
            lambda b: (F.col("host") == b)
            | F.col("host").endswith(F.concat(F.lit("."), b)),
        )
        out = (
            out.join(F.broadcast(blk), "domain", "left")
            .where(F.col("__bads").isNull() | ~hit)
            .drop("__bads")
        )
    if blocked_keywords:
        pat = "(?i)(" + "|".join(re.escape(k) for k in blocked_keywords) + ")"
        out = out.where(~F.coalesce(F.col(url_col), F.lit("")).rlike(pat))
    if not keep_parts:
        out = out.drop("host", "domain", "path")
    return out


def cap_per_domain(
    df: DataFrame,
    max_docs: int,
    url_col: str = "url",
    id_cols: Sequence[str] = ("doc_id",),
    salt: str = "domcap",
) -> DataFrame:
    """Cap each registered domain's contribution at ~``max_docs``
    documents — the over-representation guard (a handful of template
    farms can dominate a crawl).

    EXPECTED-count semantics: one map-side-combinable
    ``groupBy(domain).count``, joined back (AQE-splittable equi-join,
    never broadcast — #domains is corpus-scale), then the engine's
    deterministic hash gate at ``max_docs / n_dom``.  Exact top-N per
    domain would be a window over the hot domain key; this form has no
    per-group sort anywhere and keeps every domain's surviving set
    reproducible under retries/partitioning.  Domains at or under the
    cap pass whole (fraction ≥ 1)."""
    if max_docs < 1:
        raise ValueError(f"max_docs must be >= 1, got {max_docs}")
    parts = url_parts(df, url_col)
    counts = parts.groupBy("domain").agg(F.count(F.lit(1)).alias("__n_dom"))
    joined = parts.join(counts, "domain", "left")
    frac = F.least(F.lit(1.0), F.lit(float(max_docs)) / F.col("__n_dom"))
    gate = sampling._gate(list(id_cols), salt)
    # same threshold arithmetic as sampling._threshold_hex, inlined as
    # an expression because the fraction varies per row (per domain)
    hexdig = sampling._HEX_DIGITS
    thresh = F.lpad(
        F.conv(
            F.floor(frac * F.lit(float(16**hexdig))).cast("long").cast("string"),
            10,
            16,
        ),
        hexdig,
        "0",
    )
    kept = joined.where(
        (F.col("domain").isNull())
        | (frac >= 1.0)
        | (gate < F.lower(thresh))
    )
    return kept.drop("host", "domain", "path", "__n_dom")
