"""Explicit StructType schemas for every table the engine touches.

The reference relies on schemaless Mongo + pandas inference (SURVEY §1.3);
this engine declares every schema so production paths never infer.  Types
mirror what was physically observed in the reference's parquet artifacts
(SURVEY §1.2; f1_processed_warehouse/year=2022/round=18/telemetry.parquet).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# --- Reference-shaped tables (FIXTURES.md §A) -------------------------------

#: Bronze telemetry lake row — irregular distance spacing, nullable physics
#: channels (mirror of Mongo ``telemetry_raw`` after the 14-column projection
#: at F1_Data_PreProcessing.ipynb:43-49).
TELEMETRY_RAW = _st(
    ("Year", LongType()),
    ("Round", LongType()),
    ("Driver", LongType()),
    ("LapNumber", LongType()),
    ("Time", DoubleType()),
    ("Distance", DoubleType()),
    ("Speed", DoubleType()),
    ("RPM", DoubleType()),
    ("Throttle", DoubleType()),
    ("Brake", DoubleType()),
    ("nGear", DoubleType()),
    ("DRS", DoubleType()),
    ("Compound", StringType()),
    ("TyreLife", DoubleType()),
)

#: Silver warehouse row — exact 10 m distance grid per lap; float32 physics
#: channels per the reference's downcasts (F1_Data_PreProcessing.ipynb:128-131).
TELEMETRY_WAREHOUSE = _st(
    ("Distance", FloatType()),
    ("Speed", FloatType()),
    ("RPM", FloatType()),
    ("Throttle", FloatType()),
    ("Brake", DoubleType()),
    ("nGear", DoubleType()),
    ("DRS", DoubleType()),
    ("TyreLife", DoubleType()),
    ("LapTime_Sec", DoubleType()),
    ("Year", LongType()),
    ("Round", LongType()),
    ("Driver", LongType()),
    ("LapNumber", LongType()),
    ("Compound", StringType()),
)

#: Gold lap-summary row (mirror of f1_training_dataset_v2.parquet).
LAP_SUMMARY = _st(
    ("Year", LongType()),
    ("Round", LongType()),
    ("Driver", LongType()),
    ("LapNumber", LongType()),
    ("Speed_mean", FloatType()),
    ("Throttle_mean", FloatType()),
    ("Brake_mean", DoubleType()),
    ("TyreLife_max", DoubleType()),
    ("LapTime_Sec", DoubleType()),
    ("Compound", StringType()),
    ("Compound_Encoded", LongType()),
)

#: Race metadata dimension (mirror of Mongo ``race_meta``,
#: F1_Data_Collect.ipynb:109-113). Broadcastable.
RACE_META = _st(
    ("year", LongType()),
    ("round", LongType()),
    ("event_name", StringType()),
    ("circuit", StringType()),
    ("date", StringType()),
)

#: Raw live UDP packet (S13): arrival time + opaque payload.
LIVE_PACKET_RAW = _st(
    ("arrival_ts", TimestampType()),
    ("payload", BinaryType()),
)

#: Decoded live telemetry record — mirror of the doc written at
#: F1-25_Telemetry_DB_Record.py:184-189.
LIVE_DECODED = _st(
    ("Timestamp", DoubleType()),
    ("Driver", LongType()),
    ("Speed", DoubleType()),
    ("Throttle", DoubleType()),
    ("Brake", DoubleType()),
    ("Gear", LongType()),
    ("RPM", DoubleType()),
    ("Distance", DoubleType()),
    ("LapNumber", LongType()),
)

# --- Driver-generated generic tables (/root/testdata, TESTDATA.md) ----------

REGION = _st(("r_regionkey", IntegerType()), ("r_name", StringType()))

NATION = _st(
    ("n_nationkey", IntegerType()),
    ("n_name", StringType()),
    ("n_regionkey", IntegerType()),
)

CUSTOMER = _st(
    ("c_custkey", LongType()),
    ("c_name", StringType()),
    ("c_nationkey", IntegerType()),
    ("c_acctbal", DoubleType()),
    ("c_mktsegment", StringType()),
)

SUPPLIER = _st(
    ("s_suppkey", LongType()),
    ("s_name", StringType()),
    ("s_nationkey", IntegerType()),
    ("s_acctbal", DoubleType()),
)

PART = _st(
    ("p_partkey", LongType()),
    ("p_name", StringType()),
    ("p_brand", StringType()),
    ("p_type", StringType()),
    ("p_size", IntegerType()),
    ("p_retailprice", DoubleType()),
)

ORDERS = _st(
    ("o_orderkey", LongType()),
    ("o_custkey", LongType()),
    ("o_orderstatus", StringType()),
    ("o_totalprice", DoubleType()),
    ("o_orderdate", TimestampType()),
    ("o_orderpriority", StringType()),
)

LINEITEM = _st(
    ("l_orderkey", LongType()),
    ("l_partkey", LongType()),
    ("l_suppkey", LongType()),
    ("l_linenumber", IntegerType()),
    ("l_quantity", DoubleType()),
    ("l_extendedprice", DoubleType()),
    ("l_discount", DoubleType()),
    ("l_tax", DoubleType()),
    ("l_returnflag", StringType()),
    ("l_linestatus", StringType()),
    ("l_shipdate", TimestampType()),
)

EVENTS = _st(
    ("event_id", LongType()),
    ("ts", TimestampType()),
    ("user_id", LongType()),
    ("event_type", StringType()),
    ("value", DoubleType()),
    ("props", StringType()),
)

DOCUMENTS = _st(
    ("doc_id", LongType()),
    ("text", StringType()),
    ("lang", StringType()),
    ("source", StringType()),
    ("n_chars", LongType()),
)

EMBEDDINGS = _st(
    ("vec_id", LongType()),
    ("embedding", ArrayType(FloatType())),
    ("label", IntegerType()),
)

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
