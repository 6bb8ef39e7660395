"""IncrementalShards — changelog-maintained training-shard export.

Invariant under every scenario: the shard directory equals a from-scratch
export of the table's live state at the synced version (pipeline/shards
docstring), with only the dirtied shards rewritten along the way.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ticdc_spark.lake.table import LakeTable
from ticdc_spark.pipeline.shards import MANIFEST, IncrementalShards

FIELDS = [
    {"id": 1, "name": "doc_id", "type": "string", "nullable": False},
    {"id": 2, "name": "v", "type": "long"},
]


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, op string, commit_ts long, seq long, v long"
    )


def _mk(spark, tmp_path, n_buckets=16, n_shards=8, n0=40):
    t = LakeTable.create(spark, str(tmp_path / "tbl"), fields=FIELDS, n_buckets=n_buckets)
    t.merge_epoch(
        _events(spark, [(f"d{i}", "I", 10, i, i * 100) for i in range(n0)]), "e0"
    )
    sh = IncrementalShards(t, str(tmp_path / "out"), n_shards=n_shards, seed=7)
    sh.refresh()
    return t, sh


def _content(sh):
    return sorted(
        (r["doc_id"], r["v"], r["shard_id"]) for r in sh.read().collect()
    )


def _fresh_export(t, tmp_path, name, n_shards=8):
    sh2 = IncrementalShards(t, str(tmp_path / name), n_shards=n_shards, seed=7)
    sh2.refresh()
    return _content(sh2)


def test_incremental_refresh_equals_fresh_export(spark, tmp_path):
    t, sh = _mk(spark, tmp_path)
    # epoch 2: update 3 docs, delete 1, insert 2
    t.merge_epoch(
        _events(
            spark,
            [
                ("d1", "U", 20, 1, 111),
                ("d2", "U", 20, 2, 222),
                ("d3", "U", 20, 3, 333),
                ("d4", "D", 20, 4, None),
                ("x1", "I", 20, 5, 1),
                ("x2", "I", 20, 6, 2),
            ],
        ),
        "e1",
    )
    r = sh.refresh()
    assert not r["full"]
    # 6 changed keys over 8 shards: strictly fewer shards rewritten than exist
    assert 0 < r["shards_written"] < 8
    assert _content(sh) == _fresh_export(t, tmp_path, "fresh")
    assert sh.verify()
    docs = {c[0] for c in _content(sh)}
    assert "d4" not in docs and {"x1", "x2"} <= docs


def test_untouched_shard_files_not_rewritten(spark, tmp_path):
    """Dynamic partition overwrite: a refresh that dirties one shard leaves
    every other shard's files untouched on disk (mtime + inode stable)."""
    t, sh = _mk(spark, tmp_path)

    def file_ids():
        out = {}
        for d in os.listdir(sh.out_dir):
            if not d.startswith("shard_id="):
                continue
            for f in os.listdir(os.path.join(sh.out_dir, d)):
                if f.endswith(".parquet"):
                    st = os.stat(os.path.join(sh.out_dir, d, f))
                    out[(d, f)] = (st.st_ino, st.st_mtime_ns)
        return out

    before = file_ids()
    t.merge_epoch(_events(spark, [("d1", "U", 30, 1, 999)]), "e1")
    r = sh.refresh()
    assert r["shards_written"] == 1
    after = file_ids()
    changed = {k for k in before if before[k] != after.get(k)}
    gone = {k for k in before if k not in after}
    new = {k for k in after if k not in before}
    dirty_dirs = {k[0] for k in (changed | gone | new)}
    assert len(dirty_dirs) == 1  # exactly one shard directory touched
    assert sh.verify()


def test_noop_and_idempotent_refresh(spark, tmp_path):
    t, sh = _mk(spark, tmp_path)
    assert sh.refresh()["shards_written"] == 0
    before = _content(sh)
    assert sh.refresh()["shards_written"] == 0
    assert _content(sh) == before


def test_crash_replay_rewrites_same_shards(spark, tmp_path):
    """A crash between the shard write and the manifest save leaves the
    manifest at v0; re-running the refresh redoes the same deterministic
    write and converges."""
    t, sh = _mk(spark, tmp_path)
    t.merge_epoch(_events(spark, [("d5", "U", 30, 1, 555)]), "e1")
    sh.refresh()
    want = _content(sh)
    # simulate the crash: rewind the manifest to the pre-refresh version
    p = os.path.join(sh.out_dir, MANIFEST)
    m = json.load(open(p))
    m["synced_version"] -= 1
    json.dump(m, open(p, "w"))
    sh2 = IncrementalShards(t, sh.out_dir, n_shards=8, seed=7)
    r = sh2.refresh()
    assert r["shards_written"] >= 1
    assert _content(sh2) == want
    assert sh2.verify()


def test_non_append_range_falls_back_to_full_export(spark, tmp_path):
    t, sh = _mk(spark, tmp_path)
    t.truncate("tr1")
    t.merge_epoch(
        _events(spark, [("n1", "I", 40, 1, 1), ("n2", "I", 40, 2, 2)]), "e1"
    )
    r = sh.refresh()
    assert r["full"]
    assert {c[0] for c in _content(sh)} == {"n1", "n2"}
    assert sh.verify()


def test_reopen_from_disk_and_param_guardrails(spark, tmp_path):
    t, sh = _mk(spark, tmp_path)
    v = sh.synced_version
    sh2 = IncrementalShards(t, sh.out_dir, n_shards=8, seed=7)
    assert sh2.synced_version == v
    with pytest.raises(ValueError, match="disagrees"):
        IncrementalShards(t, sh.out_dir, n_shards=8, seed=8)
    with pytest.raises(ValueError, match="divide"):
        IncrementalShards(t, str(tmp_path / "o2"), n_shards=5)


def test_shard_order_is_stable_pseudo_shuffle(spark, tmp_path):
    """Within a shard, rows sit in h60(seed ∥ doc_id) order, and an update
    elsewhere does not reorder an untouched shard."""
    from ticdc_spark.functions.hashing import h60

    t, sh = _mk(spark, tmp_path, n0=60)
    rows = sh.read_shard(0).collect()
    got = [r["doc_id"] for r in rows]
    keyed = spark.createDataFrame([(d,) for d in got], "doc_id string").select(
        "doc_id",
        h60(F.concat_ws("\x1f", F.lit("7"), F.col("doc_id"))).alias("sk"),
    )
    want = [r["doc_id"] for r in keyed.orderBy("sk", "doc_id").collect()]
    assert got == want


def test_shards_and_profile_stay_fresh_under_streaming_feed(spark, tmp_path):
    """The full freshness story: binlog dir → ChangeFeed micro-batches →
    lake table → IncrementalShards + IncrementalProfile re-synced after
    each batch. After every refresh the derived artifacts equal a
    from-scratch computation over the live state, and a feed restart (new
    ChangeFeed, same checkpoint) keeps the cursors consistent."""
    from ticdc_spark.pipeline.profile import IncrementalProfile
    from ticdc_spark.streaming.changefeed import ChangeFeed
    from ticdc_spark.testgen import BinlogSpec, write_binlog

    binlog = str(tmp_path / "binlog")
    write_binlog(
        BinlogSpec(n_events=12_000, n_keys=1_200, seed=44, p_update=0.25, p_delete=0.15),
        binlog,
        files_per_part=4,
    )
    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=16)
    sh = IncrementalShards(t, str(tmp_path / "shards"), n_shards=4, seed=2)
    prof = IncrementalProfile(t, "source", ("n_tok",))
    cf = ChangeFeed(t, binlog, str(tmp_path / "ckpt"), max_files_per_trigger=2)
    n_batches = 0
    for _ in cf.run_available():
        n_batches += 1
        r = sh.refresh()
        assert r["version"] == t.version
        assert sh.verify(), f"batch {n_batches} shards diverged"
        prof.sync()
        assert prof.verify() == [], f"batch {n_batches} profile diverged"
    assert n_batches == 2
    assert sh.synced_version == t.version == prof.meta["version"]
    # incremental path actually exercised: batch 2 rewrote < all shards OR
    # all (hash spread) — but it must NOT have fallen back to full export
    assert sh.manifest()["synced_version"] == t.version


def test_shard_emptied_by_deletes_is_removed(spark, tmp_path):
    """A dirty shard whose LAST rows are deleted must lose its directory —
    dynamic partition overwrite alone would leave the stale files behind."""
    t, sh = _mk(spark, tmp_path, n_buckets=4, n_shards=4, n0=12)
    # find which shard doc d0 lives in, then delete EVERY doc in that shard
    shard_of = {
        r["doc_id"]: r["s"]
        for r in t.read()
        .select("doc_id", (t._bucket_expr(t.key_col) / 1).cast("int").alias("s"))
        .collect()
    }
    target = shard_of["d0"]  # n_buckets == n_shards → shard id == bucket id
    victims = [d for d, s in shard_of.items() if s == target]
    assert victims
    t.merge_epoch(
        _events(spark, [(d, "D", 20, i, None) for i, d in enumerate(victims)]),
        "kill",
    )
    r = sh.refresh()
    assert r["shards_written"] >= 1
    assert not os.path.exists(
        os.path.join(str(tmp_path / "out"), f"shard_id={target}")
    )
    assert sh.manifest()["shards"][str(target)] == 0
    assert sh.verify(), "shard union must equal live state after emptying"


def test_schema_ddl_forces_full_reexport(spark, tmp_path):
    """add_column is metadata-only (append-only by manifest rules), but the
    exported shard parquet is read back PLAIN — a mixed-schema directory
    would result if refresh only rewrote the dirty shards. The schema
    signature in the shard manifest forces ONE full re-export instead, and
    every shard file carries the new column afterwards."""
    t, sh = _mk(spark, tmp_path, n_buckets=8, n_shards=4, n0=24)
    t.update_schema("add_column", {"id": 3, "name": "extra", "type": "long"},
                    epoch_id="ddl1")
    t.merge_epoch(
        spark.createDataFrame(
            [("d0", "U", 30, 1, 111, 7)],
            "doc_id string, op string, commit_ts long, seq long, v long, extra long",
        ),
        "e1",
    )
    r = sh.refresh()
    assert r["full"], "schema change must force a full re-export"
    got = sh.read()
    assert "extra" in got.columns
    # EVERY shard directory reads back with the new schema
    for s in range(sh.n_shards):
        if sh.manifest()["shards"][str(s)]:
            assert "extra" in sh.read_shard(s).columns, s
    assert sh.verify()


def test_empty_export_and_truncate_path(spark, tmp_path):
    """Full export of an EMPTY table (post-truncate) must read back as an
    empty frame and verify clean — not die on schema inference."""
    t, sh = _mk(spark, tmp_path, n_buckets=4, n_shards=4, n0=8)
    t.truncate(epoch_id="wipe")
    r = sh.refresh()
    assert r["full"]
    assert sh.read().count() == 0
    assert sh.verify()
    # and the export comes back to life on new data
    t.merge_epoch(_events(spark, [("z1", "I", 50, 1, 7)]), "e9")
    sh.refresh()
    assert sh.read().count() == 1
    assert sh.verify()


def test_non_key_bucketed_table_rejected(spark, tmp_path):
    """Shard membership hashes the key; bucket pruning follows bucket_col —
    a non-key-bucketed table must be refused, not silently corrupted."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), fields=FIELDS, n_buckets=4, bucket_col="v"
    )
    with pytest.raises(ValueError, match="key-bucketed"):
        IncrementalShards(t, str(tmp_path / "out"), n_shards=4)
