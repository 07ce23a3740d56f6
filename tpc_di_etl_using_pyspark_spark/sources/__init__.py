"""Source connectors beyond Spark's built-ins: fixed-width (FINWIRE)
and hierarchical-XML (CustomerMgmt) parsing [SPEC: TPC-DI source file
formats]."""
