"""Interleaved-trial micro-benchmark for specific queries() entries.

Runs the named queries round-robin for N trials each (interleaved, so box
noise hits all alike), reporting per-trial wall seconds + median. Used to
adjudicate driver-bench regressions where the code path is textually
unchanged (e.g. r3's codec_roundtrip 2.83x: encode/decode_open_protocol,
q_codec_roundtrip and changelog() are identical to the r2 tree, verified
via git diff 0cae394..HEAD).

Usage: python tools/bench_interleaved.py [-n TRIALS] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from ticdc_spark.session import build_session

    spark = build_session("bench-interleaved")
    qs = entrymod.queries()
    # one untimed warm-up apiece (JVM/JIT + parquet footer cache parity)
    for name in args.queries:
        qs[name](spark, args.sf_dir).count()
    times: dict[str, list[float]] = {q: [] for q in args.queries}
    for _ in range(args.n):
        for name in args.queries:
            spark.catalog.clearCache()
            t0 = time.time()
            qs[name](spark, args.sf_dir).count()
            times[name].append(round(time.time() - t0, 3))
    out = {
        q: {"trials": ts, "median": round(statistics.median(ts), 3)}
        for q, ts in times.items()
    }
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
