"""Self-describing canonical fingerprints for every queries() entry.

For each query: run the Spark side at sf0.01, canonicalize (columns sorted
by name, rows sorted by all columns, values rendered via repr-stable rules)
and emit a PER-COLUMN sha256 digest plus row count and dtype. Also records
engine versions (pyspark/duckdb/pandas/numpy/python). When a driver red row
appears, diffing its FINGERPRINTS.json column digests against a rerun
localizes the divergence to a column without driver access.

Usage: python tools/dump_fingerprints.py [query ...]   (default: all)
Writes FINGERPRINTS.json at the repo root.
"""

from __future__ import annotations

import hashlib
import json
import platform
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

SF_DIR = "/root/testdata/sf0.01"


def canon_series(s: pd.Series) -> list[str]:
    """Repr-stable canonical strings: ints as decimal, floats via repr of
    float64 (shortest round-trip), bytes as hex, None as 'NULL'."""
    out = []
    for v in s:
        if v is None or (isinstance(v, float) and np.isnan(v)) or v is pd.NA:
            out.append("NULL")
        elif isinstance(v, (bytes, bytearray)):
            out.append(v.hex())
        elif isinstance(v, (bool, np.bool_)):
            out.append(str(int(v)))
        elif isinstance(v, (int, np.integer)):
            out.append(str(int(v)))
        elif isinstance(v, (float, np.floating)):
            out.append(repr(float(v)))
        elif isinstance(v, (list, np.ndarray)):
            out.append(json.dumps(list(map(str, v))))
        else:
            out.append(str(v))
    return out


def fingerprint(pdf: pd.DataFrame) -> dict:
    pdf = pdf[sorted(pdf.columns)].copy()
    canon = {c: canon_series(pdf[c]) for c in pdf.columns}
    order = sorted(range(len(pdf)), key=lambda i: [canon[c][i] for c in pdf.columns])
    cols = {}
    for c in pdf.columns:
        h = hashlib.sha256()
        for i in order:
            h.update(canon[c][i].encode())
            h.update(b"\x1f")
        cols[c] = {"dtype": str(pdf[c].dtype), "sha256": h.hexdigest()[:16]}
    return {"n_rows": len(pdf), "columns": cols}


def main(only):
    import pyspark

    import __spark_entry__ as entrymod
    from ticdc_spark.session import build_session

    spark = build_session("fingerprints")
    qs = entrymod.queries()
    names = only or list(qs)
    out = {
        "engines": {
            "python": platform.python_version(),
            "pyspark": pyspark.__version__,
            "duckdb": duckdb.__version__,
            "pandas": pd.__version__,
            "numpy": np.__version__,
        },
        "sf_dir": SF_DIR,
        "queries": {},
    }
    for name in names:
        try:
            out["queries"][name] = fingerprint(qs[name](spark, SF_DIR).toPandas())
            print(f"{name}: {out['queries'][name]['n_rows']} rows")
        except Exception as e:  # pragma: no cover - diagnostic tool
            out["queries"][name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"{name}: ERROR {e}")
    with open("/root/repo/FINGERPRINTS.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote FINGERPRINTS.json ({len(out['queries'])} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
