"""Audit RAW pandas dtype + repr parity between each queries() entry
(spark .toPandas()) and its oracle (duckdb .df()) — BEFORE any
normalization. Hypothesis for the r3 driver-red rows: local check
normalizes dtypes (int64-cast, float round) but the driver hashes a less
normalized representation, so e.g. DuckDB sum(BIGINT)->HUGEINT->float64
vs Spark BIGINT->int64 hash-mismatches even when numerically equal.

Usage: python tools/dtype_audit.py [query ...]
Prints one line per query: OK / MISMATCH with per-column dtype pairs.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(only):
    import __spark_entry__ as entrymod
    from ticdc_spark.session import build_session

    spark = build_session("dtype-audit")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = only or [n for n in qs if n in oracles]
    bad = []
    for name in names:
        if name not in oracles:
            print(f"{name}: NO-ORACLE (skipped)")
            continue
        try:
            spdf = qs[name](spark, SF_DIR).toPandas()
            dpdf = con.execute(oracles[name]).df()
        except Exception as e:  # pragma: no cover - diagnostic tool
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            bad.append(name)
            continue
        cols = sorted(spdf.columns)
        if cols != sorted(dpdf.columns):
            print(f"{name}: COLUMN MISMATCH {cols} vs {sorted(dpdf.columns)}")
            bad.append(name)
            continue
        diffs = []
        for c in cols:
            a, b = str(spdf[c].dtype), str(dpdf[c].dtype)
            if a != b:
                diffs.append(f"{c}: spark={a} duck={b}")
        if diffs:
            print(f"{name}: DTYPE-MISMATCH  " + "; ".join(diffs))
            bad.append(name)
        else:
            print(f"{name}: OK ({len(spdf)} rows)")
    print(f"\n{len(bad)} queries with raw dtype divergence: {bad}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
