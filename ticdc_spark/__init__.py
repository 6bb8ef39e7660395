"""ticdc_spark — a brand-new PySpark-native CDC / incremental-ingest engine.

Re-creates the capabilities of TiCDC (reference: /root/reference, ti-chi-bot/ticdc)
as an idiomatic Spark design: Structured Streaming micro-batches over a binlog
table, key-partitioned last-write-wins dedup, MERGE-style copy-on-write upserts
into a versioned bucket-partitioned parquet lake table with idempotent
epoch commits, DDL-barrier-driven schema evolution, and per-partition lineage.

Nothing in here is a port of the reference's Go actor pipeline; what we keep is
its *semantics* (ordering, tie-break, resolved-ts, barrier, exactly-once rules),
each cited by reference file:line in docstrings.
"""

__version__ = "0.1.0"
