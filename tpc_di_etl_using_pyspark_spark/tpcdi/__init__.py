"""TPC-DI parity pipelines [SPEC: TPC-DI v1.1.0 transformations].

The reference repo implements the TPC-DI ETL in PySpark; /root/reference
is empty (SURVEY §0) so these pipelines are grounded in the public spec:
FINWIRE fixed-width parsing → DimCompany/DimSecurity/Financial,
CustomerMgmt XML → SCD2 DimCustomer/DimAccount, cash-transaction →
FactCashBalances (running balance), market history → 52-week windows,
CDC incremental batches, and the DImessages batch-validation audit.

Inputs are synthetic TPC-DI-shaped files generated deterministically
from the driver test tables (FIXTURES.md auxiliary fixtures pattern).
"""
