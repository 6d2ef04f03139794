"""WARC source (sources/warc.py): spec-compliant fixtures built by
hand, raw and per-member-gzip parses compared, dead-letter + resync,
and the bridge into the curation pipeline's documents shape."""

from __future__ import annotations

import gzip

import pytest

from pyspark.sql import functions as F

from bigdataproject_formula1_telemetry_spark.sources import warc as W


def _record(
    rtype: str,
    content: bytes,
    uri: str | None = None,
    rec_id: str = "<urn:uuid:0000>",
    content_type: str | None = None,
    extra: dict | None = None,
) -> bytes:
    heads = [
        b"WARC/1.0",
        f"WARC-Type: {rtype}".encode(),
        f"WARC-Record-ID: {rec_id}".encode(),
        b"WARC-Date: 2026-08-15T00:00:00Z",
        f"Content-Length: {len(content)}".encode(),
    ]
    if uri:
        heads.append(f"WARC-Target-URI: {uri}".encode())
    if content_type:
        heads.append(f"Content-Type: {content_type}".encode())
    for k, v in (extra or {}).items():
        heads.append(f"{k}: {v}".encode())
    return b"\r\n".join(heads) + b"\r\n\r\n" + content + b"\r\n\r\n"


def _http(
    body: bytes, status: int = 200, ctype: str = "text/html; charset=utf-8"
) -> bytes:
    return (
        f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n".encode() + body
    )


HTML = "<html><body><p>Hello wörld — unicode ok.</p></body></html>".encode()
PNG = b"\x89PNG\r\n\x1a\n" + bytes(range(32))


def _corpus() -> bytes:
    return b"".join(
        [
            _record("warcinfo", b"software: test\r\n", content_type="application/warc-fields"),
            _record(
                "response",
                _http(HTML),
                uri="https://example.com/a",
                rec_id="<urn:uuid:aaaa>",
                content_type='application/http;msgtype=response',
            ),
            _record(
                "request",
                b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n",
                uri="https://example.com/a",
                content_type='application/http;msgtype=request',
            ),
            _record(
                "response",
                _http(PNG, ctype="image/png"),
                uri="https://example.com/logo.png",
                rec_id="<urn:uuid:bbbb>",
                content_type='application/http;msgtype=response',
            ),
            _record(
                "response",
                _http("café".encode("latin-1"), ctype="text/plain; charset=latin-1"),
                uri="https://example.com/c",
                rec_id="<urn:uuid:cccc>",
                content_type='application/http;msgtype=response',
            ),
        ]
    )


def _write(tmp_path, name: str, data: bytes) -> str:
    p = tmp_path / name
    p.write_bytes(data)
    return str(p)


def test_iter_warc_records_walks_all(tmp_path):
    recs = list(W.iter_warc_records(_corpus()))
    assert len(recs) == 5
    assert [r["headers"]["warc-type"] for r in recs] == [
        "warcinfo", "response", "request", "response", "response",
    ]
    assert recs[1]["headers"]["warc-target-uri"] == "https://example.com/a"
    assert recs[1]["content"] == _http(HTML)


def test_read_warc_rows_and_http_split(spark, tmp_path):
    path = _write(tmp_path, "a.warc", _corpus())
    df = W.read_warc(spark, path).orderBy("record_idx")
    rows = df.collect()
    assert len(rows) == 5
    assert [r["record_type"] for r in rows] == [
        "warcinfo", "response", "request", "response", "response",
    ]
    html = rows[1]
    assert html["http_status"] == 200
    assert html["mime"].startswith("text/html")
    assert bytes(html["payload"]) == HTML
    assert "Hello wörld" in html["text"]
    png = rows[3]
    assert png["mime"] == "image/png"
    assert bytes(png["payload"]) == PNG
    assert png["text"] is None  # binary mime never decoded
    latin = rows[4]
    assert latin["text"] == "café"  # charset honored
    assert all(r["error"] is None for r in rows)


def test_gzip_members_parse_identically(spark, tmp_path):
    raw = _corpus()
    # per-record gzip members — the .warc.gz convention
    corpus_parts = [
        _record("warcinfo", b"software: test\r\n", content_type="application/warc-fields"),
        _record("response", _http(HTML), uri="https://example.com/a",
                rec_id="<urn:uuid:aaaa>", content_type='application/http;msgtype=response'),
        _record("request", b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n",
                uri="https://example.com/a", content_type='application/http;msgtype=request'),
        _record("response", _http(PNG, ctype="image/png"), uri="https://example.com/logo.png",
                rec_id="<urn:uuid:bbbb>", content_type='application/http;msgtype=response'),
        _record("response", _http("café".encode("latin-1"), ctype="text/plain; charset=latin-1"),
                uri="https://example.com/c", rec_id="<urn:uuid:cccc>",
                content_type='application/http;msgtype=response'),
    ]
    gz = b"".join(gzip.compress(p) for p in corpus_parts)
    p_raw = _write(tmp_path, "r.warc", raw)
    p_gz = _write(tmp_path, "r.warc.gz", gz)
    a = W.read_warc(spark, p_raw).drop("warc_path").orderBy("record_idx").collect()
    b = W.read_warc(spark, p_gz).drop("warc_path").orderBy("record_idx").collect()
    assert a == b


def test_malformed_record_dead_letters_and_resyncs(spark, tmp_path):
    good = _record(
        "response", _http(HTML), uri="https://example.com/a",
        rec_id="<urn:uuid:aaaa>", content_type='application/http;msgtype=response',
    )
    bad = (
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: notanumber\r\n"
        b"\r\njunk\r\n\r\n"
    )
    path = _write(tmp_path, "m.warc", bad + good)
    rows = W.read_warc(spark, path).orderBy("record_idx").collect()
    assert len(rows) == 2
    assert rows[0]["error"] is not None and "Content-Length" in rows[0]["error"]
    # the resync salvaged the good record after the dead letter
    assert rows[1]["error"] is None
    assert rows[1]["target_uri"] == "https://example.com/a"
    assert "Hello wörld" in rows[1]["text"]


def test_truncated_record_dead_letters(spark, tmp_path):
    full = _record(
        "response", _http(HTML), uri="https://example.com/a",
        content_type='application/http;msgtype=response',
    )
    path = _write(tmp_path, "t.warc", full[: len(full) // 2])
    rows = W.read_warc(spark, path).collect()
    assert len(rows) == 1
    assert rows[0]["error"] is not None


def test_warc_to_documents_bridge(spark, tmp_path):
    corpus = _corpus() + _record(
        "response",
        _http(b"gone", status=404, ctype="text/html"),
        uri="https://example.com/404",
        rec_id="<urn:uuid:dddd>",
        content_type='application/http;msgtype=response',
    )
    path = _write(tmp_path, "d.warc", corpus)
    docs = W.warc_to_documents(W.read_warc(spark, path))
    rows = {r["url"]: r for r in docs.collect()}
    # textual 200s only: the html page and the latin-1 page; never the
    # png (no text), the 404, warcinfo or request records
    assert set(rows) == {"https://example.com/a", "https://example.com/c"}
    assert rows["https://example.com/a"]["doc_id"] is not None
    # deterministic doc_id: re-parse gives the same ids
    again = {
        r["url"]: r["doc_id"]
        for r in W.warc_to_documents(W.read_warc(spark, path)).collect()
    }
    assert {u: r["doc_id"] for u, r in rows.items()} == again


def test_bridge_composes_with_main_content_extraction(spark, tmp_path):
    page = (
        "<html><head><title>t</title></head><body>"
        "<nav>Home | About | Contact</nav>"
        "<p>" + "Genuinely long article text with many words. " * 30 + "</p>"
        "<footer>© 2026 example.com</footer></body></html>"
    ).encode()
    path = _write(
        tmp_path,
        "w.warc",
        _record(
            "response", _http(page), uri="https://example.com/art",
            rec_id="<urn:uuid:eeee>",
            content_type='application/http;msgtype=response',
        ),
    )
    from bigdataproject_formula1_telemetry_spark.operators import text as T

    docs = W.warc_to_documents(W.read_warc(spark, path))
    cleaned = docs.withColumn("text", T.extract_main_content(F.col("text")))
    out = cleaned.collect()
    assert len(out) == 1
    body = out[0]["text"]
    assert "Genuinely long article text" in body
    assert "Home | About" not in body


def test_crawl_to_release_end_to_end(spark, tmp_path):
    """The full web path in one artifact: WARC segments → documents
    bridge → URL gates → main-content extraction → dedup/chunk/pack →
    corpus_release shards+manifest+card.  The blocked page never
    reaches the release; the article text does; the release invariant
    (card docs == Σ n_chunks == data rows) holds on crawl input."""
    from bigdataproject_formula1_telemetry_spark.plans import pipelines as P

    art = (
        "<html><body><nav>Home | About | Contact</nav>"
        "<p>{}</p><footer>© 2026</footer></body></html>"
    )
    pages = [
        (f"https://news-{i}.example.org/a",
         art.format(f"Article number {i}. " + "Solid long-form body text with many words here. " * 25))
        for i in range(4)
    ] + [
        ("https://bad.spamfarm.biz/x", art.format("spam " * 200)),
        ("https://fine.example.org/casino-bonus", art.format("gambling " * 200)),
    ]
    data = b"".join(
        _record(
            "response",
            _http(html.encode()),
            uri=url,
            rec_id=f"<urn:uuid:{j:04d}>",
            content_type="application/http;msgtype=response",
        )
        for j, (url, html) in enumerate(pages)
    )
    p = tmp_path / "seg.warc"
    p.write_bytes(data)
    from bigdataproject_formula1_telemetry_spark.sources import warc as W2

    docs = W2.warc_to_documents(W2.read_warc(spark, str(p)))
    root = str(tmp_path / "release")
    out = P.corpus_release(
        docs,
        root,
        url_blocklist=(["spamfarm.biz"], ["casino"]),
        max_docs_per_domain=100,
        html="main",
        chunk_tokens=64,
        overlap=0,
        token_budget=256,
        n_pack_shards=2,
    )
    man = out["manifest"].collect()
    card = {r["section"] + "/" + r["key"]: r["value"] for r in out["card"].collect()}
    assert card  # datasheet written and re-readable
    data_rows = spark.read.parquet(root + "/data").collect()
    assert sum(int(r["n_chunks"]) for r in man) == len(data_rows) > 0
    texts = " ".join(r["chunk_text"] for r in data_rows)
    assert "Solid long-form body text" in texts
    assert "spam spam" not in texts and "gambling" not in texts
    assert "Home | About" not in texts  # nav boilerplate extracted away


def test_read_warc_stream_matches_batch_and_arrives_incrementally(spark, tmp_path):
    """Streaming WARC ingest (the live-crawl shape): segments dropped
    into a directory become record rows, one file per trigger; the
    stream's rows equal the batch parse of the same segments, and the
    documents bridge composes unchanged."""
    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    segs = []
    for s in range(3):
        seg = b"".join(
            _record(
                "response",
                _http(f"<html><p>page {s}-{i} body text</p></html>".encode()),
                uri=f"https://ex.org/{s}/{i}",
                rec_id=f"<urn:uuid:{s:02d}{i:02d}>",
                content_type="application/http;msgtype=response",
            )
            for i in range(4)
        )
        # segment 1 additionally carries a malformed record: the stream
        # must dead-letter it, not die
        if s == 1:
            seg = (
                b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"Content-Length: nope\r\n\r\nbroken\r\n\r\n" + seg
            )
        (seg_dir / f"crawl-{s:03d}.warc").write_bytes(seg)
        segs.append(seg)

    stream = W.read_warc_stream(spark, str(seg_dir))
    assert stream.isStreaming
    name = f"warc_{abs(hash(str(tmp_path))) % 10**8}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("maxFilesPerTrigger", "1")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(f"SELECT * FROM {name}")
    batch = W.read_warc(spark, str(seg_dir))
    key = ["warc_path", "record_idx"]
    g = sorted(
        (r["warc_path"].rsplit("/", 1)[-1], r["record_idx"], r["target_uri"], r["error"] is None)
        for r in got.collect()
    )
    b = sorted(
        (r["warc_path"].rsplit("/", 1)[-1], r["record_idx"], r["target_uri"], r["error"] is None)
        for r in batch.collect()
    )
    assert g == b and len(g) == 13  # 12 pages + 1 dead letter
    # the bridge is streaming-safe (pure column ops): batch equality on
    # the same memory-sink rows
    docs = W.warc_to_documents(got).collect()
    assert len(docs) == 12


def test_streaming_crawl_admission_against_exact_index(spark, tmp_path):
    """The live-crawl → steady-state-corpus path end to end: WARC
    segments land → stream-parse → documents bridge → foreachBatch
    admission against the SAME materialized exact-dedup index a batch
    backfill built.  Verbatim re-crawls of backfilled or
    earlier-segment pages are rejected; fresh pages are admitted and
    extend the index."""
    from bigdataproject_formula1_telemetry_spark.operators import (
        exact_index as EI,
    )
    from bigdataproject_formula1_telemetry_spark.streaming import (
        curation as SC,
    )

    backfill_text = "backfilled article body " * 20
    seg_a_text = "segment a fresh article " * 20
    seg_b_text = "segment b fresh article " * 20

    idx = str(tmp_path / "eidx")
    backfill = spark.createDataFrame(
        [(1000, backfill_text)], "doc_id long, text string"
    )
    EI.build_exact_index(backfill, idx, expected_items=10_000)

    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()

    def page(s, i, body):
        # text/plain so the bridge text IS the body byte-for-byte —
        # content identity must survive into the index
        return _record(
            "response",
            _http(body.encode(), ctype="text/plain; charset=utf-8"),
            uri=f"https://ex.org/{s}/{i}",
            rec_id=f"<urn:uuid:{s}{i:03d}>",
            content_type="application/http;msgtype=response",
        )

    # A: one fresh page + a verbatim re-crawl of the backfilled page
    (seg_dir / "crawl-000.warc").write_bytes(
        page("a", 0, seg_a_text) + page("a", 1, backfill_text)
    )
    # B: one fresh page + a verbatim copy of A's fresh page
    (seg_dir / "crawl-001.warc").write_bytes(
        page("b", 0, seg_b_text) + page("b", 1, seg_a_text)
    )

    docs = W.warc_to_documents(W.read_warc_stream(spark, str(seg_dir)))

    out = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "ckpt")
    q = (
        SC.admit_stream_exact_against_index(
            docs.select("doc_id", "text"), idx, out, ckpt
        )
        .option("maxFilesPerTrigger", "1")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    admitted = [
        r["text"] for r in spark.read.parquet(out).select("text").collect()
    ]
    assert sorted(admitted) == sorted(
        [seg_a_text, seg_b_text]
    ), "exactly the two fresh pages are admitted"
    # and the index now rejects everything already seen
    probe = spark.createDataFrame(
        [(1, backfill_text), (2, seg_a_text), (3, "genuinely new text")],
        "doc_id long, text string",
    )
    kept = EI.dedup_exact_against_index(spark, probe, idx).collect()
    assert [r["doc_id"] for r in kept] == [3]


def test_parser_never_crashes_on_arbitrary_bytes():
    """Fuzz property: iter_warc_records must TERMINATE and never raise
    on any byte garbage — corrupt crawl segments are a certainty at
    100 TB, and the dead-letter contract says rows, not exceptions."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=4096))
    def run(data):
        out = list(W.iter_warc_records(data))
        for rec in out:
            assert ("error" in rec) or ("headers" in rec)

    run()


def test_parser_fuzz_valid_records_with_injected_corruption():
    """Stronger property: a valid record stream with random bytes
    spliced in still yields every record strictly AFTER the corruption
    point (resync finds the next intact record) and never raises."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    recs = [
        _record(
            "response",
            _http(f"body {i} text".encode(), ctype="text/plain"),
            uri=f"https://ex.org/{i}",
            rec_id=f"<urn:uuid:{i:04d}>",
            content_type="application/http;msgtype=response",
        )
        for i in range(5)
    ]

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(min_value=0, max_value=4),
        st.binary(min_size=1, max_size=64),
    )
    def run(pos, junk):
        data = b"".join(recs[:pos]) + junk + b"\r\n" + b"".join(recs[pos:])
        out = list(W.iter_warc_records(data))
        uris = [
            r["headers"].get("warc-target-uri")
            for r in out
            if "headers" in r
        ]
        # every record after the splice point survives: resync can cost
        # at most the record the junk bled into, never the tail
        tail = [f"https://ex.org/{i}" for i in range(pos, 5)]
        assert uris[-len(tail):] == tail if tail else True

    run()


def test_release_bm25_contamination_audit_end_to_end(spark, tmp_path):
    """VERDICT r10 item 4: the retrieval face of contamination auditing
    composed over the full web path — WARC segments → documents bridge →
    curate/release → ``pipelines.contamination_report`` over the
    released chunks.  A benchmark item that verbatim-copies a released
    chunk must come back rank-1 with shared 8-grams and cosine 1.0; a
    disjoint-vocabulary item must surface nothing flagged."""
    from bigdataproject_formula1_telemetry_spark.plans import pipelines as P

    art = "<html><body><p>{}</p></body></html>"
    pages = [
        (f"https://news-{i}.example.org/a",
         art.format(f"Article number {i}. "
                    + f"Solid body text about topic {i} with many words here. " * 20))
        for i in range(4)
    ]
    data = b"".join(
        _record(
            "response",
            _http(html.encode()),
            uri=url,
            rec_id=f"<urn:uuid:{j:04d}>",
            content_type="application/http;msgtype=response",
        )
        for j, (url, html) in enumerate(pages)
    )
    p = tmp_path / "seg.warc"
    p.write_bytes(data)
    docs = W.warc_to_documents(W.read_warc(spark, str(p)))
    root = str(tmp_path / "release")
    P.corpus_release(
        docs, root, chunk_tokens=64, overlap=0, token_budget=256,
        n_pack_shards=2,
    )

    released = P.read_release(spark, root).select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("chunk_uid"),
        "chunk_text",
    )
    # benchmark: one item verbatim-copies a released chunk (the planted
    # contamination), one has fully disjoint vocabulary (clean)
    src = released.orderBy("chunk_uid").first()
    bench = spark.createDataFrame(
        [
            (1, src["chunk_text"]),
            (2, "quantum entanglement superconducting qubit decoherence"),
        ],
        "bench_id long, text string",
    )
    rep = P.contamination_report(
        released, bench, k=3,
        text_col="chunk_text", id_col="chunk_uid",
        bench_id_col="bench_id",
    ).collect()
    assert [f.name for f in P.contamination_report(
        released, bench, k=1, text_col="chunk_text", id_col="chunk_uid",
        bench_id_col="bench_id",
    ).schema.fields] == [
        "bench_id", "rank", "chunk_uid", "score", "contam_ngrams", "cos_sim"
    ]
    b1 = sorted((r for r in rep if r["bench_id"] == 1), key=lambda r: r["rank"])
    assert b1 and b1[0]["chunk_uid"] == src["chunk_uid"]  # source wins rank 1
    assert b1[0]["contam_ngrams"] > 0  # verbatim 8-gram overlap flagged
    assert b1[0]["cos_sim"] == pytest.approx(1.0)  # exact copy
    b2 = [r for r in rep if r["bench_id"] == 2]
    # disjoint vocabulary: nothing retrieved, or retrieved but unflagged
    assert all(r["contam_ngrams"] == 0 and r["cos_sim"] is None for r in b2)
