"""10^8-event scale soak (VERDICT r4 item 3): the first direct evidence that
manifest/metadata growth does not bend the throughput curve between the
bench's 10^6-10^7 regime and the 10^10 design point.

Two phases over one lake table:

  1. BULK: a chunked deterministic binlog (default 100M events, 10M keys,
     32 source partitions) streamed through ChangeFeed availableNow in
     --epochs micro-batches with lineage on. Reports events/s, per-batch
     wall (mean/min/max/CV — the "does epoch k cost more than epoch 1"
     curve), and manifest growth per version (file counts, manifest bytes).
  2. TRICKLE (old-value): key blooms on, 4 trickle batches of --trickle
     updates each against the now-10M-key snapshot through the MQ old-value
     feed — the sparse key-pruned pre-image read exercised AT SCALE,
     reporting pruned-vs-total pre-image file counts and the bloom sidecar
     bytes the manifest carries.

Deliberately NOT part of bench.py's driver suite (30-60 min wall): run
manually / via the SPARK_GRAFT_SOAK=1 wrapper. Results land as one JSON
line on stdout (detail to --out).

    python tools/soak_bench.py --events 100000000 --epochs 8 \
        --work /tmp/ticdc_soak --out /root/repo/SOAK_r5.json

Reference analog: tests/dailytest sustained-workload methodology.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def manifest_report(root: str) -> dict:
    """File counts + manifest bytes per version, and bloom sidecar bytes in
    the CURRENT manifest — all from the JSON metadata, no Spark."""
    mdir = os.path.join(root, "_manifests")
    versions = sorted(glob.glob(os.path.join(mdir, "v*.json")))
    growth = []
    for p in versions:
        with open(p) as f:
            m = json.load(f)
        n_files = sum(len(es) for es in m.get("buckets", {}).values())
        growth.append(
            {
                "version": int(m.get("version", 0)),
                "files": n_files,
                "manifest_bytes": os.path.getsize(p),
            }
        )
    bloom_bytes = 0
    if versions:
        with open(versions[-1]) as f:
            cur = json.load(f)
        for es in cur.get("buckets", {}).values():
            for e in es:
                bl = e.get("bloom")
                if bl:
                    # b64 inflates 4/3 over the raw sidecar
                    bloom_bytes += len(bl["b64"]) * 3 // 4
    return {"versions": growth, "bloom_sidecar_bytes": bloom_bytes}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--events", type=int, default=100_000_000)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--parts", type=int, default=32)
    ap.add_argument("--trickle", type=int, default=2_000)
    ap.add_argument("--trickle-batches", type=int, default=4)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--work", default="/tmp/ticdc_soak")
    ap.add_argument("--out", default=None)
    ap.add_argument("--keep", action="store_true", help="keep work dir")
    args = ap.parse_args()

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ticdc_spark.lake.table import LakeTable
    from ticdc_spark.session import build_session
    from ticdc_spark.streaming.changefeed import ChangeFeed
    from ticdc_spark.testgen import (
        BinlogSpec,
        write_binlog_chunks,
        write_resolved_events,
    )

    spark = build_session("ticdc-soak", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.work, exist_ok=True)

    # -- generate (cached across reruns) ------------------------------------
    binlog = os.path.join(args.work, f"binlog_{args.events}")
    t0 = time.time()
    if not os.path.exists(os.path.join(binlog, "_DONE")):
        shutil.rmtree(binlog, ignore_errors=True)
        spec = BinlogSpec(
            n_events=args.events,
            n_keys=max(1000, args.events // 10),
            seed=101,
            hot_frac=0.05,
            hot_keys=8,
            n_parts=args.parts,
        )
        write_binlog_chunks(
            spec, binlog, n_chunks=args.epochs, files_per_chunk=args.parts
        )
        open(os.path.join(binlog, "_DONE"), "w").write("ok")
    gen_sec = round(time.time() - t0, 1)

    # -- phase 1: bulk streaming apply --------------------------------------
    tbl_dir = os.path.join(args.work, "tbl")
    ckpt = os.path.join(args.work, "ckpt")
    shutil.rmtree(tbl_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    table = LakeTable.create(spark, tbl_dir, n_buckets=args.buckets)
    n_files = len(glob.glob(os.path.join(binlog, "chunk-*", "*.parquet")))
    cf = ChangeFeed(
        table,
        os.path.join(binlog, "chunk-*"),
        checkpoint_dir=ckpt,
        mode="typed",
        lineage_dir=os.path.join(ckpt, "lineage"),
        max_files_per_trigger=max(1, n_files // args.epochs),
    )
    t0 = time.time()
    summaries = cf.run_available()
    bulk_sec = time.time() - t0
    batch_walls = [
        round(sum(s["timings"].values()), 2) for s in summaries
    ]
    mean_w = statistics.mean(batch_walls)
    report = {
        "events": args.events,
        "epochs": len(summaries),
        "buckets": args.buckets,
        "cpus": int(args.cpus),
        "gen_sec": gen_sec,
        "bulk_sec": round(bulk_sec, 1),
        "events_per_sec": round(args.events / bulk_sec, 1),
        "batch_walls": batch_walls,
        "batch_wall_cv": round(statistics.pstdev(batch_walls) / mean_w, 3)
        if mean_w
        else None,
        "final_rows": table.read().count(),
    }

    # -- phase 1.5: compact (the steady-state posture) ----------------------
    # Without it every trickle's pre-image read pays ALL epochs' delta
    # files in each probe-hit bucket (MOR read amplification — measured
    # 15-49 s per 200-event trickle over 8 uncompacted bulk epochs);
    # compaction folds each bucket to one tombstone-free file, so a hit
    # bucket costs one file read. Production runs compaction continuously
    # (compact_max_deltas); the soak does it once at the phase boundary.
    t0 = time.time()
    table.compact()
    report_compact_sec = round(time.time() - t0, 1)

    # -- phase 2: trickle old-value batches against the big snapshot --------
    table.set_key_blooms(True)
    tdir = os.path.join(args.work, "trickle")
    shutil.rmtree(tdir, ignore_errors=True)
    mq_dir = os.path.join(args.work, "trickle_mq")
    ck2 = os.path.join(args.work, "trickle_ckpt")
    shutil.rmtree(mq_dir, ignore_errors=True)
    shutil.rmtree(ck2, ignore_errors=True)
    # existing keys + the bulk frontier, from one column-pruned file read
    one = sorted(glob.glob(os.path.join(binlog, "chunk-*", "*.parquet")))[0]
    keys = pq.read_table(one, columns=["doc_id"]).column("doc_id").to_pylist()
    hi = max(s["resolved_ts"] for s in summaries)
    rng = np.random.default_rng(11)
    trickle_walls, prune = [], []
    for b in range(args.trickle_batches):
        ks = keys[b * args.trickle : (b + 1) * args.trickle]
        n = len(ks)
        ts0 = hi + 1 + b * (n + 10)
        ch = os.path.join(tdir, f"chunk-{b:05d}")
        os.makedirs(ch, exist_ok=True)
        cols = {
            "commit_ts": pa.array([ts0 + i for i in range(n)], pa.int64()),
            "seq": pa.array(list(range(n)), pa.int64()),
            "table": pa.array(["target_tokens"] * n, pa.string()),
            "op": pa.array(["U"] * n, pa.string()),
            "doc_id": pa.array(ks, pa.string()),
            "tokens": pa.array(
                [rng.integers(0, 50000, size=32).tolist() for _ in ks],
                pa.list_(pa.int32()),
            ),
            "n_tok": pa.array([32] * n, pa.int32()),
            "source": pa.array(["trickle"] * n, pa.string()),
            "part": pa.array([i % args.parts for i in range(n)], pa.int32()),
            "schema_version": pa.array([0] * n, pa.int32()),
        }
        pq.write_table(pa.table(cols), os.path.join(ch, "data.parquet"))
        write_resolved_events(
            ch, {p: ts0 + n for p in range(args.parts)}, fname="hb.parquet"
        )
        cf2 = ChangeFeed(
            table,
            os.path.join(tdir, "chunk-*"),
            checkpoint_dir=ck2,
            mode="typed",
            mq_dir=mq_dir,
            mq_partitions=args.parts,
            mq_protocol="open",
            mq_old_value=True,
        )
        t0 = time.time()
        cf2.run_available()
        trickle_walls.append(round(time.time() - t0, 2))
    stats = getattr(table, "preimage_stats", [])
    tot = sum(s["files_total"] for s in stats)
    rd = sum(s["files_read"] for s in stats)
    report.update(
        {
            "compact_sec": report_compact_sec,
            "trickle_events": args.trickle * args.trickle_batches,
            "trickle_walls": trickle_walls,
            "pre_files_total": tot,
            "pre_files_read": rd,
            "prune_frac": round(1 - rd / tot, 3) if tot else None,
        }
    )
    report.update(manifest_report(tbl_dir))
    # versions list is long — summarize for the stdout line
    growth = report.pop("versions")
    report["manifest_files_first_last"] = [
        growth[0]["files"],
        growth[-1]["files"],
    ] if growth else None
    report["manifest_bytes_last"] = growth[-1]["manifest_bytes"] if growth else None
    if args.out:
        with open(args.out + ".tmp", "w") as f:
            json.dump({**report, "versions": growth}, f, indent=1, sort_keys=True)
        os.replace(args.out + ".tmp", args.out)
        report["detail_file"] = args.out
    print(json.dumps(report, separators=(",", ":")))
    spark.stop()
    if not args.keep:
        shutil.rmtree(args.work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
