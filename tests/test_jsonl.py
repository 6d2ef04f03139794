"""JSONL interchange IO (io.read_jsonl / write_jsonl): schema pinning,
dead-letter contract, gzip shards, round trip."""

from __future__ import annotations

import gzip
import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from bigdataproject_formula1_telemetry_spark import io

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def test_read_parses_and_dead_letters(spark, tmp_path):
    p = tmp_path / "shard-000.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello", "lang": "en"}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "welt", "lang": "de"}\n'
        '{"doc_id": 3, "text": "truncated...\n'
    )
    df = io.read_jsonl(spark, str(p), SCHEMA)
    rows = df.collect()
    assert len(rows) == 4
    good = {r["doc_id"]: r for r in rows if r["_corrupt_record"] is None}
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert set(good) == {1, 2}
    assert good[1]["text"] == "hello" and good[2]["lang"] == "de"
    assert len(bad) == 2
    assert "not json" in bad[0]["_corrupt_record"] or "not json" in bad[1]["_corrupt_record"]
    # dead letters carry null schema fields, never crash
    assert all(r["text"] is None for r in bad)


def test_gzip_shards_roundtrip_and_shard_count(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"text {i}", "en") for i in range(200)], SCHEMA
    )
    out = str(tmp_path / "rel")
    io.write_jsonl(docs, out, n_shards=4)
    files = [f for f in os.listdir(out) if f.endswith(".json.gz")]
    assert len(files) == 4
    back = io.read_jsonl(spark, out, SCHEMA)
    # keep a data column in the dead-letter audit (the documented Spark
    # corrupt-col-only-scan refusal)
    assert (
        back.select("doc_id", "_corrupt_record")
        .where(F.col("_corrupt_record").isNotNull())
        .count()
        == 0
    )
    got = sorted(
        (r["doc_id"], r["text"], r["lang"])
        for r in back.select("doc_id", "text", "lang").collect()
    )
    assert got == [(i, f"text {i}", "en") for i in range(200)]


def test_corrupt_col_collision_rejected(spark):
    bad = StructType([StructField("_corrupt_record", StringType())])
    with pytest.raises(ValueError):
        io.read_jsonl(spark, "/nowhere", bad)


def test_schema_pinning_types_are_exact(spark, tmp_path):
    # a field that LOOKS numeric in one line and string in another
    # would flip under inference; the pinned schema keeps LongType and
    # dead-letters the non-conforming line
    p = tmp_path / "x.jsonl"
    p.write_text(
        '{"doc_id": 7, "text": "a", "lang": "en"}\n'
        '{"doc_id": "seven", "text": "b", "lang": "en"}\n'
    )
    df = io.read_jsonl(spark, str(p), SCHEMA)
    assert dict(df.dtypes)["doc_id"] == "bigint"
    ok = df.where(F.col("_corrupt_record").isNull()).collect()
    assert [r["doc_id"] for r in ok] == [7]
