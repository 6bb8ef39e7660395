"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01; compare row count, schema
(by sorted column names), and order-insensitive values.

Usage: python tools/check_oracle.py [--twice] [query ...]

--twice additionally evaluates each Spark query a second time after
spark.catalog.clearCache() (simulating the driver's long 50-query session
where cached plan fragments get evicted and recomputed) and compares the two
Spark results value-for-value — the r2 `cdc_training_order` flake class:
plans that pass a single oracle run but are not stable across re-execution.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object and len(s) and isinstance(s.iloc[0], (bytes, bytearray)):
            df[c] = s.map(lambda b: b.hex())
        elif s.dtype == bool or str(s.dtype) == "boolean":
            df[c] = s.astype("int64")
        elif str(s.dtype).startswith("float"):
            df[c] = s.astype("float64").round(9)
        elif str(s.dtype).startswith(("int", "uint", "Int")):
            df[c] = s.astype("int64")
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name, spark_pdf, duck_pdf):
    errs = []
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        errs.append(f"columns spark={sc} duck={dc}")
        return errs
    # RAW dtype-class parity BEFORE normalization: the driver hashes a less
    # normalized representation than we do, so float64-vs-int64 (e.g. DuckDB
    # sum(BIGINT)->HUGEINT->float64) hash-mismatches there even when values
    # are numerically equal — the r3 red-row class. Int-width skew (int32 vs
    # int64) is tolerated by the driver; a float/int CLASS split is not.
    def _cls(dt):
        s = str(dt)
        if s.startswith("float"):
            return "float"
        if s.startswith(("int", "uint", "Int")) or s == "bool" or s == "boolean":
            return "int"
        return "other"

    for c in sc:
        a, b = _cls(spark_pdf[c].dtype), _cls(duck_pdf[c].dtype)
        if a != b:
            errs.append(
                f"col {c}: raw dtype class spark={spark_pdf[c].dtype} "
                f"duck={duck_pdf[c].dtype} — driver hash would diverge; "
                "CAST the oracle (or the Spark column) to align"
            )
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            if str(a[c].dtype).startswith("float"):
                bad = ~np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True)
            else:
                bad = ~((pd.isna(av) & pd.isna(bv)) | (av == bv))
            if bad.any():
                i = int(np.argmax(bad))
                errs.append(f"col {c}: {int(bad.sum())} diffs, first at row {i}: spark={av[i]!r} duck={bv[i]!r}")
    return errs


def main(only: list[str], twice: bool = False) -> int:
    import __spark_entry__ as entrymod
    from ticdc_spark.session import build_session

    spark = build_session("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = only or list(qs)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            spdf = qs[name](spark, SF_DIR).toPandas()
            if twice:
                spark.catalog.clearCache()
                spdf2 = qs[name](spark, SF_DIR).toPandas()
                errs2 = compare(name, spdf, spdf2)
                if errs2:
                    print(f"FAIL {name}: NONDETERMINISTIC across re-execution:")
                    for e in errs2:
                        print(f"   {e}")
                    failed.append(name)
                    continue
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only check: {len(spdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            dpdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            failed.append(name)
            continue
        errs = compare(name, spdf, dpdf)
        if errs:
            print(f"FAIL {name} ({time.time()-t0:.1f}s):")
            for e in errs:
                print(f"   {e}")
            failed.append(name)
        else:
            print(f"PASS {name}: {len(spdf)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(names)-len(failed)}/{len(names)} pass")
    return 1 if failed else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    twice = "--twice" in argv
    sys.exit(main([a for a in argv if a != "--twice"], twice=twice))
