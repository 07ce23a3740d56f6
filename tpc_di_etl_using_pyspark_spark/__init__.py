"""PySpark-native analytics engine with the capability surface of
``mostafa-k-m/TPC-DI-ETL-using-pyspark`` (see SURVEY.md).

The reference repo is a TPC-DI ETL implemented on PySpark; this package
re-expresses that capability Spark-first as a library of composable
DataFrame operators plus LLM-data-pipeline extensions. Reference
citations: /root/reference is empty (SURVEY.md §0) — semantics are
grounded in the public TPC-DI v1.1.0 spec and the PySpark 4.x API.
"""

__version__ = "0.1.0"
