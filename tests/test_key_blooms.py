"""Key-bloom sidecars + the key-pruned pre-image read path.

The enable-old-value cross-batch read (streaming/changefeed.attach_old_images)
is adaptive: bulk batches keep the r3 bucket-pruned read; sparse batches take
read_version_for_keys — per-file [min,max]+bloom pruning probed executor-side,
semi-join before the LWW collapse. These tests pin (a) the bloom primitive's
no-false-negative contract, (b) read-path equivalence with read_version_raw,
(c) that pruning actually skips files a sparse key set cannot touch, and
(d) end-to-end old-value correctness through a sparse second batch.

Reference parity: TiCDC receives old values from TiKV with the write
(cdc/entry/mounter.go row decode carries PreColumns when enable-old-value);
the lake-side reconstruction must behave identically whichever read path the
gate picks.
"""

import base64

import numpy as np
from pyspark.sql import functions as F

from ticdc_spark.lake.table import (
    LakeTable,
    bloom_may_contain,
    build_key_bloom,
)
from ticdc_spark.model import BINLOG_SCHEMA


def _events(spark, rows):
    return spark.createDataFrame(rows, schema=BINLOG_SCHEMA)


def test_bloom_no_false_negatives_and_some_negatives():
    keys = [f"doc-{i:05d}" for i in range(2000)]
    bits, m, k = build_key_bloom(keys)
    for key in keys[::37]:
        assert bloom_may_contain(bits, m, k, key)
    absent = [f"other-{i:05d}" for i in range(500)]
    fp = sum(bloom_may_contain(bits, m, k, a) for a in absent)
    assert fp < 50  # ~0.8% design point; 10% is already a broken hash


def _mk_table(spark, root, n_base=2000, n_sparse_epochs=2, keys_per_epoch=100, n_buckets=8):
    """Bulk base epoch (no blooms — a bulk file holds every key of its
    bucket) + sparse delta epochs (bloomed: the files later probes prune)."""
    t = LakeTable.create(spark, root, n_buckets=n_buckets)
    t.set_key_blooms(True)
    base = [
        (10, i, "t", "I", f"k00-{i:04d}", [0, i], 2, "web", 0, 0)
        for i in range(n_base)
    ]
    t.merge_epoch(_events(spark, base), "e0")
    for e in range(1, n_sparse_epochs + 1):
        rows = [
            (
                10 + e,
                e * 100000 + i,
                "t",
                "I",
                f"k{e:02d}-{i:04d}",
                [e, i],
                2,
                "web",
                0,
                0,
            )
            for i in range(keys_per_epoch)
        ]
        t.merge_epoch(_events(spark, rows), f"e{e}")
    return t


def test_read_version_for_keys_matches_read_version_raw(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "tbl"))
    v = t.version
    keys = [f"k01-{i:04d}" for i in range(0, 40)] + ["k00-0007", "nope-1"]
    kdf = spark.createDataFrame([(k,) for k in keys], "doc_id string")
    pruned = t.read_version_for_keys(v, kdf)
    full = (
        t.read_version_raw(v)
        .join(F.broadcast(kdf), "doc_id", "semi")
    )
    a = sorted(map(tuple, pruned.collect()))
    b = sorted(map(tuple, full.collect()))
    assert a == b
    assert len(a) == 41  # the absent key contributes nothing


def test_manifest_carries_blooms_and_pruning_skips_files(spark, tmp_path):
    t = _mk_table(spark, str(tmp_path / "tbl"))
    entries = [e for es in t._manifest["buckets"].values() for e in es]
    assert entries and all("rows" in e for e in entries)
    # bulk base files carry NO bloom (they hold every key of their bucket —
    # a bloom there can never prune); sparse delta files carry one
    with_bloom = [e for e in entries if "bloom" in e]
    without = [e for e in entries if "bloom" not in e]
    assert with_bloom, "sparse delta files should be bloomed"
    assert without, "bulk base files should skip the bloom"
    assert max(e["rows"] for e in with_bloom) < min(e["rows"] for e in without)
    # a key set drawn from sparse epoch 2 only: epoch-1 delta files in the
    # same bucket must be bloom-pruned (disjoint prefixes k01 vs k02)
    keys = [f"k02-{i:04d}" for i in range(0, 8)]
    kdf = spark.createDataFrame([(k,) for k in keys], "doc_id string")
    # replicate the probe: count files any requested key can touch
    kept = 0
    for es in t._manifest["buckets"].values():
        for e in es:
            bl = e.get("bloom")
            lo, hi = e.get("min_key"), e.get("max_key")
            hit = False
            for k in keys:
                if lo is not None and not (lo <= k <= hi):
                    continue
                if bl is None or bloom_may_contain(
                    base64.b64decode(bl["b64"]), bl["m"], bl["k"], k
                ):
                    hit = True
                    break
            kept += hit
    total = len(entries)
    assert kept < total, f"pruning never skipped a file ({kept}/{total})"
    # and the pruned read still returns exactly the requested rows
    got = sorted(r["doc_id"] for r in t.read_version_for_keys(t.version, kdf).collect())
    assert got == sorted(keys)


def test_version_rows_stat(spark, tmp_path):
    t = _mk_table(
        spark, str(tmp_path / "tbl"), n_base=400, n_sparse_epochs=1, keys_per_epoch=50
    )
    assert t.version_rows(t.version) == 450


def test_old_value_sparse_batch_end_to_end(spark, tmp_path):
    """Bulk first batch (bucket path), sparse second batch (key-pruned
    path): the emitted old images must equal the pre-batch snapshot either
    way. 1000 base keys vs 3 updated keys → 3*4 < 1000 takes the sparse
    branch."""
    import glob
    import json as j
    import os
    import shutil

    from ticdc_spark.streaming.changefeed import ChangeFeed

    def write_file(df, binlog, name):
        stage = str(tmp_path / f"_stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        os.makedirs(binlog, exist_ok=True)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.move(part, os.path.join(binlog, f"{name}.parquet"))

    base = [
        (10, i, "t", "I", f"d{i:04d}", [i], 1, "web", 0, 0) for i in range(1000)
    ]
    upd = [
        (20, 2001, "t", "U", "d0007", [7, 7], 2, "web", 0, 0),
        (20, 2002, "t", "U", "d0123", [1, 2, 3], 3, "book", 0, 0),
        (20, 2003, "t", "D", "d0500", None, None, None, 0, 0),
    ]
    binlog = str(tmp_path / "binlog")
    write_file(_events(spark, base), binlog, "f0")
    write_file(_events(spark, upd), binlog, "f1")
    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=8)
    cf = ChangeFeed(
        t,
        binlog,
        checkpoint_dir=str(tmp_path / "ckpt"),
        mode="typed",
        max_files_per_trigger=1,
        mq_dir=str(tmp_path / "mq"),
        mq_partitions=4,
        mq_protocol="open",
        mq_old_value=True,
    )
    cf.run_available()
    assert t.read().count() == 999
    msgs = spark.read.parquet(str(tmp_path / "mq") + "/batch-*/partition=*")
    second = {
        j.loads(r["key_json"])["doc_id"]: r["old_json"]
        for r in msgs.collect()
        if j.loads(r["key_json"])["commit_ts"] == 20
    }
    assert set(second) == {"d0007", "d0123", "d0500"}
    assert j.loads(second["d0007"])["tokens"] == [7]
    assert j.loads(second["d0123"])["tokens"] == [123]
    assert j.loads(second["d0500"])["tokens"] == [500]
