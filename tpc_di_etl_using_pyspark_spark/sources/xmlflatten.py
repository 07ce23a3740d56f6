"""Hierarchical XML → flat typed rows (CustomerMgmt-shaped).

[SPEC: CustomerMgmt.xml — nested Action/Customer/Account elements with
attributes; flattened to one row per Action during parse]. No spark-xml
jar is available offline (SURVEY §7.4), so the parser is a
``mapInPandas`` over whole-file rows using stdlib ElementTree: each XML
*file* is one unit of parallelism (TPC-DI ships one CustomerMgmt.xml
per batch; a 100 TB deployment has many files/batches → scales by file
count). The Spark-side plumbing — wholetext scan, Arrow-batched pandas
iterator, explicit output StructType — is the real engine surface.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..schemas import CUSTOMER_MGMT_ACTION


def _parse_doc(xml_text: str) -> list[dict]:
    rows = []
    root = ET.fromstring(xml_text)
    for action in root.iter("Action"):
        cust = action.find("Customer")
        name = cust.find("Name") if cust is not None else None
        acct = cust.find("Account") if cust is not None else None
        rows.append(
            {
                "action_type": action.get("type"),
                "action_ts": pd.Timestamp(action.get("ts")),
                "c_id": int(cust.get("id")) if cust is not None else None,
                "c_tax_id": cust.get("taxId") if cust is not None else None,
                "c_first": name.get("first") if name is not None else None,
                "c_last": name.get("last") if name is not None else None,
                "acct_id": int(acct.get("id")) if acct is not None else None,
                "acct_tax_status": int(acct.get("taxStatus")) if acct is not None else None,
            }
        )
    return rows


def flatten_customer_mgmt(spark: SparkSession, path: str) -> DataFrame:
    """Read CustomerMgmt-shaped XML file(s) → one row per Action."""
    docs = spark.read.text(path, wholetext=True)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for xml_text in pdf["value"]:
                rows = _parse_doc(xml_text)
                if rows:
                    yield pd.DataFrame(rows)

    return docs.mapInPandas(parse, schema=CUSTOMER_MGMT_ACTION)
