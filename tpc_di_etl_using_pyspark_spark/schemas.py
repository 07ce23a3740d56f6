"""Explicit StructType schemas (SURVEY §1.3: schema-on-read, never infer).

Two groups:

1. The driver test tables (FIXTURES.md — extracted from parquet
   footers; parquet carries its own schema so these are for CSV
   round-trips and validation).
2. TPC-DI-shaped source-file schemas for the parity pipelines in
   ``tpcdi/`` — FINWIRE fixed-width record layouts and the flattened
   CustomerMgmt action schema. [SPEC: TPC-DI v1.1.0 source file
   layouts]; /root/reference is empty so no file:line citation is
   possible (SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


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

TEST_TABLES = {
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

# --- TPC-DI-shaped source schemas (parity pipelines, tpcdi/) ---------------

# FINWIRE fixed-width record layouts [SPEC: FINWIRE CMP/SEC/FIN record
# types, discriminated by RecType char(3) at offset 15 after PTS char(15)].
# (offset, length) pairs are 0-based; the spec's field list is abridged to
# the fields the parity pipeline consumes.
FINWIRE_CMP_LAYOUT = [
    ("pts", 0, 15),
    ("rec_type", 15, 3),
    ("company_name", 18, 60),
    ("cik", 78, 10),
    ("status", 88, 4),
    ("industry_id", 92, 2),
    ("founding_date", 94, 8),
]

FINWIRE_SEC_LAYOUT = [
    ("pts", 0, 15),
    ("rec_type", 15, 3),
    ("symbol", 18, 15),
    ("issue_type", 33, 6),
    ("status", 39, 4),
    ("name", 43, 70),
    ("ex_id", 113, 6),
    ("sh_out", 119, 13),
    ("co_name_or_cik", 132, 60),
]

FINWIRE_FIN_LAYOUT = [
    ("pts", 0, 15),
    ("rec_type", 15, 3),
    ("year", 18, 4),
    ("quarter", 22, 1),
    ("qtr_start_date", 23, 8),
    ("revenue", 31, 17),
    ("earnings", 48, 17),
    ("eps", 65, 12),
    ("co_name_or_cik", 77, 60),
]

# Flattened CustomerMgmt action row [SPEC: CustomerMgmt.xml transformation]
CUSTOMER_MGMT_ACTION = _st(
    ("action_type", StringType()),
    ("action_ts", TimestampType()),
    ("c_id", LongType()),
    ("c_tax_id", StringType()),
    ("c_first", StringType()),
    ("c_last", StringType()),
    ("acct_id", LongType()),
    ("acct_tax_status", IntegerType()),
)
