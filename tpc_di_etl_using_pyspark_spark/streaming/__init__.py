"""Structured Streaming surface (SURVEY §2.I — an extension; the
reference/TPC-DI is batch-only, its incremental updates are file
batches re-run through the batch pipeline)."""
