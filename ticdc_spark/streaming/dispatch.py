"""Sink partition dispatchers + rule switcher (SURVEY.md §2.10).

Reference: cdc/sink/dispatcher/ts.go:28-30 (commit-ts % N), table.go:33-38
(hash of table name), index_value.go:33-53 (hash of handle key — per-key
ordering), default.go:36-44 (index-value when exactly one handle column and
old-value off, else table), interface.go:43-59 (unknown rule name → default
with a warning) and interface.go:84-128 (ordered matcher rules, first match
wins, implicit trailing "*.*" → default).

Spark-first: each dispatcher is a Column EXPRESSION, so routing happens
JVM-side inside the same stage as the encode — no shuffle is introduced by
dispatch itself (the MQ writer repartitions once on the resulting column).
The rule switcher compiles the ordered matcher list into one nested CASE —
per-row glob matching without Python.
"""

from __future__ import annotations

import fnmatch
import warnings

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.hashing import bucket, h60

DISPATCH_RULES = ("default", "ts", "table", "index-value", "rowid")


def ts_partition(n: int) -> Column:
    """commit-ts % N (ts.go:28-30): spreads a hot table over partitions at
    the cost of per-key ordering — consumers get ts-ordered replay only."""
    return (F.col("commit_ts") % F.lit(n)).cast("int")


def table_partition(n: int) -> Column:
    """hash(table name) % N (table.go:33-38): all rows of one table share a
    partition — total order per table."""
    return (h60(F.col("table")) % F.lit(n)).cast("int")


def index_value_partition(n: int, key_col: str = "doc_id") -> Column:
    """hash(handle key value) % N (index_value.go:33-53): per-key ordering
    survives fan-out — the property the LWW sink relies on."""
    return bucket(key_col, n).cast("int")


def default_partition(
    n: int, key_col: str = "doc_id", single_handle: bool = True, old_value: bool = False
) -> Column:
    """default.go:36-44: index-value iff exactly one handle column and
    old-value mode off; otherwise table."""
    if old_value or not single_handle:
        return table_partition(n)
    return index_value_partition(n, key_col)


def dispatcher_for(rule: str, n: int, key_col: str = "doc_id") -> Column:
    r = (rule or "default").lower()
    if r not in DISPATCH_RULES:
        # interface.go:55-58 — unknown rule falls back to default, warn
        warnings.warn(f"unsupported dispatch rule {rule!r}, using default")
        r = "default"
    if r == "ts":
        return ts_partition(n)
    if r == "table":
        return table_partition(n)
    if r in ("index-value", "rowid"):
        return index_value_partition(n, key_col)
    return default_partition(n, key_col)


def compile_dispatch_rules(
    rules: list[tuple[str, str]], n: int, key_col: str = "doc_id"
) -> Column:
    """Ordered [(table-matcher glob, rule name)] → one partition Column.
    First matching rule wins; a trailing ("*", "default") is appended, so
    every table is covered (interface.go:84-92, 71-81)."""
    expr: Column | None = None
    for pat, rule in reversed(list(rules) + [("*", "default")]):
        d = dispatcher_for(rule, n, key_col)
        if expr is None:
            expr = d
        else:
            # rlike is a find(), not a full match — anchor the translated
            # glob at ^ (translate() already anchors the tail with \Z)
            expr = F.when(
                F.col("table").rlike("^" + fnmatch.translate(pat)), d
            ).otherwise(expr)
    return expr.cast("int")


# --- one-dir-per-task repartition for the MQ writers ---------------------
# (shared with the lake bucket writers — see functions/partitioning.py for
# the measured collision distribution; re-exported for the MQ sink sites)
from ..functions.partitioning import (  # noqa: E402,F401
    identity_repartition,
    slot_representatives,
)
