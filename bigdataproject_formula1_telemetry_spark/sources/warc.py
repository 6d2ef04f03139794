"""WARC web-archive ingestion (ISO 28500 / WARC 1.0–1.1, public spec;
the CommonCrawl interchange format — the shape a real 100 TB web corpus
actually arrives in).

A WARC file is a concatenation of records; each record is a CRLF header
block (``WARC/1.0`` version line + ``Name: value`` fields), one blank
line, exactly ``Content-Length`` bytes of content, and a CRLF CRLF
terminator.  The ``.warc.gz`` convention compresses EACH record as its
own gzip member so readers can stream and seek member-wise — this
parser walks members with ``zlib.decompressobj`` (``unused_data``
marks the member boundary), so peak memory is one record, never one
file.

Spark shape (100 TB): ``spark.read.format("binaryFile")`` gives one
task per archive file — CommonCrawl ships ~1 GB segments in the tens of
thousands per crawl, so file-level parallelism IS the partitioning, no
shuffle anywhere; record parsing and HTTP splitting run in one
``mapInPandas`` pass (Arrow batches of whole files).  Malformed records
become dead-letter rows (``error`` column) and the parser RESYNCS to
the next ``WARC/`` magic so one truncated record doesn't sink the rest
of its file — never a pipeline crash (the ``audio_stream_info``
dead-letter pattern).

Reference parity: the reference engine has no web-archive source; this
extends the ingestion surface for the LLM-curation pipeline
(``warc_to_documents`` bridges response records into the ``documents``
schema that ``text.extract_main_content`` and the curation gates
consume).
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "iter_warc_records",
    "parse_http_response",
    "read_warc",
    "read_warc_stream",
    "warc_to_documents",
    "WARC_RECORD_SCHEMA",
]

_CRLF = b"\r\n"
_MAGIC = b"WARC/"


def _split_members(data: bytes) -> Iterator[bytes]:
    """Yield decompressed gzip members one at a time (the .warc.gz
    record-per-member convention), or the whole buffer if it isn't
    gzip.  Concatenated-member walking via ``unused_data`` — no
    full-file inflate."""
    if data[:2] != b"\x1f\x8b":
        yield data
        return
    rest = data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        yield d.decompress(rest)
        rest = d.unused_data
    # trailing non-gzip garbage is ignored (ARC/WARC writers pad with
    # zero bytes occasionally); a structurally broken member raises in
    # decompress and is handled by the caller's dead-letter path


def _parse_record(buf: bytes, start: int) -> tuple[dict, int]:
    """Parse one record at ``start``.  Returns (record, next_offset).
    Raises ValueError on malformation; the caller resyncs."""
    if buf[start : start + len(_MAGIC)] != _MAGIC:
        raise ValueError(f"no WARC magic at offset {start}")
    head_end = buf.find(_CRLF + _CRLF, start)
    if head_end < 0:
        raise ValueError("unterminated WARC header block")
    head = buf[start:head_end].decode("utf-8", errors="replace")
    lines = head.split("\r\n")
    version = lines[0].strip()
    fields: dict[str, str] = {}
    for ln in lines[1:]:
        if ":" in ln:
            k, v = ln.split(":", 1)
            fields[k.strip().lower()] = v.strip()
    try:
        clen = int(fields["content-length"])
    except (KeyError, ValueError):
        raise ValueError("missing/invalid Content-Length") from None
    if clen < 0:
        raise ValueError("negative Content-Length")
    body_start = head_end + 4
    body_end = body_start + clen
    if body_end > len(buf):
        raise ValueError("truncated record content")
    content = buf[body_start:body_end]
    # spec: two CRLFs after the content block; tolerate their absence at
    # EOF (some writers omit the final terminator)
    nxt = body_end
    while buf[nxt : nxt + 2] == _CRLF:
        nxt += 2
    return (
        {
            "version": version,
            "headers": fields,
            "content": content,
            "offset": start,
        },
        nxt,
    )


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """All records of one WARC file (raw or per-member gzip), with
    dead-letter dicts (``{"error": ...}``) for malformed stretches.
    After an error the scan resyncs to the next ``WARC/`` magic, so
    one bad record costs itself, not the file."""
    for member in _split_members(data):
        pos = 0
        n = len(member)
        while pos < n:
            # skip inter-record padding
            while pos < n and member[pos : pos + 2] == _CRLF:
                pos += 2
            if pos >= n:
                break
            try:
                rec, pos = _parse_record(member, pos)
                yield rec
            except ValueError as e:
                yield {"error": str(e), "offset": pos}
                resync = member.find(_CRLF + _MAGIC, pos + 1)
                if resync < 0:
                    break
                pos = resync + 2


_STATUS_RE = re.compile(rb"^HTTP/\d\.\d\s+(\d{3})")
_CHARSET_RE = re.compile(r"charset=([A-Za-z0-9_\-]+)", re.IGNORECASE)


def parse_http_response(payload: bytes) -> tuple[int, dict, bytes] | None:
    """Split an ``application/http;msgtype=response`` record content
    into (status, headers, body); None when the payload isn't HTTP."""
    m = _STATUS_RE.match(payload)
    if not m:
        return None
    head_end = payload.find(b"\r\n\r\n")
    if head_end < 0:
        head_end = len(payload)
        body = b""
    else:
        body = payload[head_end + 4 :]
    status = int(m.group(1))
    headers: dict[str, str] = {}
    for ln in payload[:head_end].split(b"\r\n")[1:]:
        if b":" in ln:
            k, v = ln.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1", errors="replace"
            )
    return status, headers, body


WARC_RECORD_SCHEMA = StructType(
    [
        StructField("warc_path", StringType()),
        StructField("record_idx", LongType()),
        StructField("record_type", StringType()),
        StructField("record_id", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_length", LongType()),
        StructField("http_status", IntegerType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("text", StringType()),
        StructField("error", StringType()),
    ]
)


def _decode_text(body: bytes, mime: str | None) -> str | None:
    """Best-effort text for textual mimes; None for binaries."""
    if not mime or not (
        mime.startswith("text/")
        or mime.startswith("application/xhtml")
        or mime.startswith("application/json")
    ):
        return None
    cs = "utf-8"
    m = _CHARSET_RE.search(mime)
    if m:
        cs = m.group(1)
    try:
        return body.decode(cs, errors="replace")
    except LookupError:
        return body.decode("utf-8", errors="replace")


def _parse_files(files: DataFrame, decode_text: bool) -> DataFrame:
    """The shared (path, content) → record-rows stage behind both the
    batch and streaming readers."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_RECORD_SCHEMA.fields]
        # dead-letter rows carry every column as a real None (a reindex
        # NaN would crash the Arrow conversion on the binary column)
        blank = {c: None for c in cols}
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                idx = 0
                try:
                    records = iter_warc_records(bytes(r.content))
                    for rec in records:
                        if "error" in rec:
                            rows.append(
                                {
                                    **blank,
                                    "warc_path": r.path,
                                    "record_idx": idx,
                                    "error": rec["error"],
                                }
                            )
                            idx += 1
                            continue
                        h = rec["headers"]
                        rtype = h.get("warc-type")
                        content = rec["content"]
                        status = None
                        mime = h.get("content-type")
                        body = content
                        if rtype == "response" and (
                            mime or ""
                        ).startswith("application/http"):
                            http = parse_http_response(content)
                            if http is not None:
                                status, hh, body = http
                                mime = hh.get("content-type")
                        text = (
                            _decode_text(body, mime) if decode_text else None
                        )
                        rows.append(
                            {
                                "warc_path": r.path,
                                "record_idx": idx,
                                "record_type": rtype,
                                "record_id": h.get("warc-record-id"),
                                "target_uri": h.get("warc-target-uri"),
                                "warc_date": h.get("warc-date"),
                                "content_length": len(content),
                                "http_status": status,
                                "mime": mime,
                                "payload": body,
                                "text": text,
                                "error": None,
                            }
                        )
                        idx += 1
                except zlib.error as e:
                    rows.append(
                        {
                            **blank,
                            "warc_path": r.path,
                            "record_idx": idx,
                            "error": f"gzip: {e}",
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(parse, WARC_RECORD_SCHEMA)


def read_warc(
    spark: SparkSession, path: str, decode_text: bool = True
) -> DataFrame:
    """WARC records as a DataFrame — one row per record, response
    records split into status/mime/body, textual bodies decoded
    (charset from Content-Type, utf-8-replace fallback), malformed
    stretches as dead-letter rows with ``error`` set.

    One ``binaryFile`` scan → one ``mapInPandas`` — file-level
    parallelism, no shuffle; use a path glob to prune segments the way
    a parquet reader prunes partitions."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return _parse_files(files, decode_text)


_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_warc_stream(
    spark: SparkSession,
    path: str,
    decode_text: bool = True,
    **options: str,
) -> DataFrame:
    """STREAMING WARC ingestion: segments landing in ``path`` become
    record rows incrementally — the live-crawl shape (a fetcher drops
    finished ``.warc.gz`` segments; this side parses, bridges and
    admits them without re-reading history).  Same parser, dead-letter
    and resync semantics as ``read_warc``; each segment is processed
    exactly once per the file-source's checkpoint contract.  Compose
    ``warc_to_documents`` (pure column ops, streaming-safe) and a
    ``foreachBatch`` admission step (``streaming/curation.py``) for
    crawl → steady-state-corpus ingest."""
    reader = spark.readStream.format("binaryFile").schema(_BINARY_FILE_SCHEMA)
    for k, v in options.items():
        # file-SOURCE options (maxFilesPerTrigger etc.) belong here, not
        # on the sink — a writeStream.option of the same name is ignored
        reader = reader.option(k, v)
    files = reader.load(path).select("path", "content")
    return _parse_files(files, decode_text)


def warc_to_documents(records: DataFrame) -> DataFrame:
    """Bridge OK textual response records into the ``documents`` shape
    the curation pipeline consumes: (doc_id, url, fetch_date, text).
    ``doc_id`` is the xxhash64 of the WARC record id — deterministic,
    collision-safe at corpus scale, and stable across re-parses of the
    same crawl.  Pure column pipeline on the parse output; compose
    ``text.extract_main_content`` + ``pipelines.curate_documents``
    downstream for the full web pipeline."""
    return (
        records.where(
            (F.col("error").isNull())
            & (F.col("record_type") == "response")
            & (F.col("http_status") == 200)
            & F.col("text").isNotNull()
        )
        .select(
            F.xxhash64("record_id").alias("doc_id"),
            F.col("target_uri").alias("url"),
            F.col("warc_date").alias("fetch_date"),
            "text",
        )
    )
