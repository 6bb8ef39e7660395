"""LakeTable: merge semantics, idempotence, tombstones, time travel,
schema evolution, compaction.

Mirrors the reference tests: final-state diff (check_sync_diff), idempotent
re-apply (owner checkpoint replay, cdc/owner.go:706-800), DDL application
(entry/schema_storage_test.go).
"""

import pyarrow as pa

from ticdc_spark.lake.table import LakeTable
from ticdc_spark.model import BINLOG_SCHEMA
from ticdc_spark.engine.replay import replay_epoch


def _events(spark, rows):
    return spark.createDataFrame(rows, schema=BINLOG_SCHEMA)


def _state(table):
    rows = table.read().collect()
    return {r["doc_id"]: (list(r["tokens"]) if r["tokens"] is not None else None, r["n_tok"], r["source"]) for r in rows}


E1 = [
    (10, 1, "t", "I", "a", [1, 2], 2, "web", 0, 0),
    (10, 2, "t", "I", "b", [3], 1, "book", 0, 0),
    (11, 3, "t", "U", "a", [9], 1, "web", 0, 0),
]
E2 = [
    (12, 4, "t", "D", "b", None, None, None, 0, 0),
    (12, 5, "t", "I", "c", [7, 7], 2, "code", 0, 0),
]


def test_merge_and_tombstone(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    replay_epoch(t, _events(spark, E1), "e1")
    assert _state(t) == {"a": ([9], 1, "web"), "b": ([3], 1, "book")}
    replay_epoch(t, _events(spark, E2), "e2")
    assert _state(t) == {"a": ([9], 1, "web"), "c": ([7, 7], 2, "code")}
    # tombstone for b is retained in raw view
    raw = {r["doc_id"]: r["_deleted"] for r in t.read_raw().collect()}
    assert raw["b"] is True


def test_idempotent_epoch_recommit(spark, tmp_path):
    """Re-applying a committed epoch is a no-op: at-least-once + idempotent
    = exactly-once (mysql.go:875-937 retry + owner checkpoint semantics)."""
    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    replay_epoch(t, _events(spark, E1), "e1")
    v1 = t._manifest["version"]
    r = replay_epoch(t, _events(spark, E1), "e1")
    assert r["committed"] is False
    assert t._manifest["version"] == v1


def test_out_of_order_epoch_cannot_regress(spark, tmp_path):
    """An epoch carrying only OLDER events must not overwrite newer state
    (conditional merge on (commit_ts, seq, op_rank))."""
    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    replay_epoch(t, _events(spark, E1 + E2), "e12")
    before = _state(t)
    # replay E1 alone under a NEW epoch id (late duplicate delivery)
    replay_epoch(t, _events(spark, E1), "late-dup")
    assert _state(t) == before
    # deleted key must not resurrect from an older insert
    replay_epoch(t, _events(spark, [(10, 2, "t", "I", "b", [3], 1, "book", 0, 0)]), "late-b")
    assert "b" not in _state(t)


def test_time_travel(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    replay_epoch(t, _events(spark, E1), "e1")
    v_after_e1 = t._manifest["version"]
    replay_epoch(t, _events(spark, E2), "e2")
    old = t.read_version(v_after_e1).collect()
    assert {r["doc_id"] for r in old} == {"a", "b"}
    new = t.read().collect()
    assert {r["doc_id"] for r in new} == {"a", "c"}


def test_schema_evolution_add_widen_rename(spark, tmp_path):
    """F3 DDLs: add lang, widen n_tok int->bigint, rename source->origin.
    Old files must read correctly under the new schema (field-id projection,
    schema_storage.go:539-624 analog)."""
    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    replay_epoch(t, _events(spark, E1), "e1")
    t.update_schema("add_column", {"name": "lang", "type": "string"}, "ddl1")
    t.update_schema("widen_column", {"name": "n_tok", "to": "bigint"}, "ddl2")
    t.update_schema("rename_column", {"from": "source", "to": "origin"}, "ddl3")
    df = t.read()
    assert set(df.columns) == {"doc_id", "tokens", "n_tok", "origin", "lang"}
    assert dict(df.dtypes)["n_tok"] == "bigint"
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows["a"]["origin"] == "web" and rows["a"]["lang"] is None
    assert rows["a"]["n_tok"] == 1
    # new-schema writes then merge over old files
    ev = spark.createDataFrame(
        [(20, 9, "t", "I", "d", [5], 1, "wiki", "en", 0, 0)],
        schema="commit_ts long, seq long, table string, op string, doc_id string, "
        "tokens array<int>, n_tok long, origin string, lang string, part int, schema_version int",
    )
    replay_epoch(t, ev, "e3")
    rows = {r["doc_id"]: r for r in t.read().collect()}
    assert rows["d"]["lang"] == "en" and rows["a"]["lang"] is None


def test_compaction_purges_tombstones(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    replay_epoch(t, _events(spark, E1 + E2), "e")
    assert t.read_raw().count() == 3  # a, b(tombstone), c
    t.compact()
    assert t.read_raw().count() == 2
    assert _state(t) == {"a": ([9], 1, "web"), "c": ([7, 7], 2, "code")}


def test_idempotence_under_ddl_epoch(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    assert t.update_schema("add_column", {"name": "lang", "type": "string"}, "d1") is True
    assert t.update_schema("add_column", {"name": "lang", "type": "string"}, "d1") is False


def test_empty_epoch_advances_checkpoint(spark, tmp_path):
    """Empty epochs still commit (metadata-only) — the empty-flush analog
    (heap_sorter.go:115-122): checkpoint advances, state untouched."""
    from ticdc_spark.lake.table import LakeTable

    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    ch = spark.createDataFrame(
        [("a", "U", 1, 1, [1], 1, "s")],
        "doc_id string, op string, commit_ts long, seq long, "
        "tokens array<int>, n_tok int, source string",
    )
    t.merge_epoch(ch, "e0")
    empty = ch.limit(0)
    st = t.merge_epoch(empty, "e1")
    assert st["committed"]
    assert "e1" in t.committed_epochs
    assert t.read().count() == 1
    # replaying the empty epoch is still a no-op
    assert not t.merge_epoch(empty, "e1")["committed"]


def test_expire_versions_gc(spark, tmp_path):
    import glob as g

    from ticdc_spark.lake.table import LakeTable

    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    for e in range(5):
        ch = spark.createDataFrame(
            [("a", "U", e + 1, e + 1, [e], 1, "s")],
            "doc_id string, op string, commit_ts long, seq long, "
            "tokens array<int>, n_tok int, source string",
        )
        t.merge_epoch(ch, f"e{e}")
    t.compact()  # deltas folded; old delta files now unreferenced by CURRENT
    n_before = len(g.glob(str(tmp_path / "t" / "data" / "**" / "*.parquet"), recursive=True))
    stats = t.expire_versions(keep_last=1)
    n_after = len(g.glob(str(tmp_path / "t" / "data" / "**" / "*.parquet"), recursive=True))
    assert stats["removed_files"] > 0 and n_after < n_before
    # current state survives
    assert [r["tokens"] for r in t.read().collect()] == [[4]]
    # and stays mergeable
    t.merge_epoch(
        spark.createDataFrame(
            [("b", "U", 10, 10, [9], 1, "s")],
            "doc_id string, op string, commit_ts long, seq long, "
            "tokens array<int>, n_tok int, source string",
        ),
        "e9",
    )
    assert t.read().count() == 2


def test_crash_between_write_and_commit_is_invisible(spark, tmp_path):
    """Exactly-once under partial failure: if the process dies after delta
    files are written but BEFORE the manifest CURRENT pointer swings, the
    files are orphans — reads are unaffected and re-applying the epoch
    succeeds cleanly (cdc/owner.go:706-800 lease-commit analog)."""
    from ticdc_spark.lake.table import LakeTable

    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    schema = (
        "doc_id string, op string, commit_ts long, seq long, "
        "tokens array<int>, n_tok int, source string"
    )
    t.merge_epoch(spark.createDataFrame([("a", "U", 1, 1, [1], 1, "s")], schema), "e0")

    boom = RuntimeError("crash before manifest swing")
    orig = t._commit_manifest

    def crashing(m):
        raise boom

    t._commit_manifest = crashing
    ch = spark.createDataFrame([("b", "U", 2, 2, [2], 1, "s")], schema)
    try:
        t.merge_epoch(ch, "e1")
        raise AssertionError("expected crash")
    except RuntimeError:
        pass
    t._commit_manifest = orig

    # fresh reader sees only the committed state
    t2 = LakeTable(spark, str(tmp_path / "t"))
    assert {r["doc_id"] for r in t2.read().collect()} == {"a"}
    assert "e1" not in t2.committed_epochs
    # replaying the epoch now lands it exactly once
    assert t2.merge_epoch(ch, "e1")["committed"]
    assert {r["doc_id"] for r in t2.read().collect()} == {"a", "b"}
    assert not t2.merge_epoch(ch, "e1")["committed"]


def test_syncpoints_point_in_time(spark, tmp_path):
    """Syncpoint store analog (cdc/sink/mysql.go:1364-1426): each
    watermarked commit maps primary_ts (resolved frontier) -> snapshot
    version; version_at_ts gives the point-in-time read."""
    from ticdc_spark.lake.table import LakeTable

    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    for e, ts in enumerate([100, 200, 300]):
        ch = spark.createDataFrame(
            [(f"d{e}", "U", ts, ts, [e], 1, "s")],
            "doc_id string, op string, commit_ts long, seq long, "
            "tokens array<int>, n_tok int, source string",
        )
        t.merge_epoch(ch, f"e{e}", watermarks={"0": ts})
    sps = t.syncpoints
    assert [sp["primary_ts"] for sp in sps] == [100, 200, 300]
    assert t.version_at_ts(50) is None
    v150 = t.version_at_ts(150)
    assert v150 == sps[0]["version"]
    assert {r["doc_id"] for r in t.read_version(v150).collect()} == {"d0"}
    assert t.version_at_ts(10**9) == sps[-1]["version"]
    assert {r["doc_id"] for r in t.read().collect()} == {"d0", "d1", "d2"}


def test_lookup_prunes_buckets(spark, tmp_path):
    """Point lookup reads only the keyed buckets (dispatch-hash pruning) and
    returns exactly the live rows for the requested keys."""
    from ticdc_spark.lake.table import LakeTable

    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=16)
    ch = spark.createDataFrame(
        [(f"d{i}", "U", i + 1, i + 1, [i], 1, "s") for i in range(200)]
        + [("d7", "D", 1000, 1000, None, None, None)],  # delete one key
        "doc_id string, op string, commit_ts long, seq long, "
        "tokens array<int>, n_tok int, source string",
    )
    t.merge_epoch(ch, "e0")
    got = {r["doc_id"]: r["tokens"] for r in t.lookup(["d3", "d7", "d42", "nope"]).collect()}
    assert got == {"d3": [3], "d42": [42]}  # d7 deleted, nope absent


def test_bootstrap_then_changefeed_equals_full_replay(spark, tmp_path):
    """Snapshot restore + changefeed --start-ts (SURVEY.md §3.1): bootstrap
    the table from the state at start_ts, stream only events above it; the
    result must equal replaying the WHOLE log. Pre-start events redelivered
    at-least-once must lose to the snapshot rows."""
    import os

    import pyarrow.parquet as pq

    from ticdc_spark.lake.table import LakeTable
    from ticdc_spark.oracle import apply_binlog, diff_tables
    from ticdc_spark.streaming.changefeed import ChangeFeed
    from ticdc_spark.testgen import BinlogSpec, write_binlog

    spec = BinlogSpec(n_events=10_000, n_keys=1_000, seed=61, p_delete=0.15, p_insert=0.55)
    binlog_dir = write_binlog(spec, str(tmp_path / "binlog"), files_per_part=4)
    full = pq.read_table(binlog_dir)
    import pyarrow.compute as pc

    lo = pc.min(full.column("commit_ts")).as_py()
    hi = pc.max(full.column("commit_ts")).as_py()
    start_ts = (lo + hi) // 2

    # snapshot = oracle state at start_ts (what dumpling would have exported)
    snap = apply_binlog(full, upto_ts=start_ts)
    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=8)
    st = t.bootstrap(spark.createDataFrame(snap.to_pandas()), as_of_ts=start_ts)
    assert st["committed"]
    assert not t.bootstrap(spark.createDataFrame(snap.to_pandas()), as_of_ts=start_ts)[
        "committed"
    ]  # idempotent

    cf = ChangeFeed(
        t,
        binlog_dir,
        str(tmp_path / "ckpt"),
        start_ts=start_ts,
        max_files_per_trigger=8,
    )
    summaries = cf.run_available()
    resolved = summaries[-1]["resolved_ts"]
    expected = apply_binlog(full, upto_ts=resolved)
    pdf = t.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    import pyarrow as pa

    actual = pa.table(
        {
            "doc_id": pa.array(pdf["doc_id"], pa.string()),
            "tokens": pa.array([list(v) for v in pdf["tokens"]], pa.list_(pa.int32())),
            "n_tok": pa.Array.from_pandas(pdf["n_tok"], type=pa.int32()),
            "source": pa.array(pdf["source"], pa.string()),
        }
    )
    problems = diff_tables(expected, actual)
    assert not problems, problems[:3]


def test_merge_epoch_any_cover_any_order_converges_hypothesis(spark, tmp_path):
    """Exactly-once property, fuzzed: applying ANY cover of the event set by
    epochs (overlapping allowed = at-least-once redelivery), in ANY order,
    with within-epoch collapse, converges to the sequential-oracle state —
    because the merge is conditional on (commit_ts, seq, op_rank) recency
    and deletes persist as tombstones."""
    import itertools

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ticdc_spark.lake.table import LakeTable

    counter = itertools.count()

    @settings(max_examples=6, deadline=None)
    @given(
        st.data(),
        st.lists(
            st.tuples(
                st.integers(0, 3),      # key idx
                st.integers(0, 1),      # 0=put 1=delete
                st.integers(100, 103),  # commit_ts
            ),
            min_size=1,
            max_size=14,
        ),
    )
    def run(data, raw_events):
        events = [
            (f"k{k}", "D" if d else "U", ts, seq)
            for seq, (k, d, ts) in enumerate(raw_events)
        ]
        n_epochs = data.draw(st.integers(1, 3))
        # each event lands in >=1 epoch; epochs may overlap (redelivery)
        assignment = [
            data.draw(
                st.sets(st.integers(0, n_epochs - 1), min_size=1, max_size=n_epochs)
            )
            for _ in events
        ]
        order = data.draw(st.permutations(list(range(n_epochs))))

        tid = next(counter)
        t = LakeTable.create(spark, str(tmp_path / f"t{tid}"), n_buckets=2)
        for e in order:
            rows = [
                (k, op, ts, seq, [seq] if op != "D" else None,
                 1 if op != "D" else None, "s" if op != "D" else None)
                for (k, op, ts, seq), eps in zip(events, assignment)
                if e in eps
            ]
            if not rows:
                continue
            ch = spark.createDataFrame(
                rows,
                "doc_id string, op string, commit_ts long, seq long, "
                "tokens array<int>, n_tok int, source string",
            )
            t.merge_epoch(ch, f"t{tid}-e{e}")  # assume_deduped=False: collapse in-merge

        # sequential oracle over ALL events in (commit_ts, seq, op_rank) order
        state = {}
        for k, op, ts, seq in sorted(
            events, key=lambda r: (r[2], r[3], 0 if r[1] == "D" else 1)
        ):
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = [seq]
        got = {r["doc_id"]: list(r["tokens"]) for r in t.read().collect()}
        assert got == state, (events, assignment, order)

    run()


def test_lookup_file_skipping_by_key_stats(spark, tmp_path):
    """Manifest column-stats pruning: a lookup for keys in one epoch's key
    range must skip the other epoch's files (disjoint sorted ranges in the
    same bucket), and still return correct rows."""
    from ticdc_spark.lake.table import LakeTable

    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=1)  # one bucket
    a = spark.createDataFrame(
        [(f"a{i:03d}", "U", i + 1, i + 1, [i], 1, "s") for i in range(50)],
        "doc_id string, op string, commit_ts long, seq long, "
        "tokens array<int>, n_tok int, source string",
    )
    z = spark.createDataFrame(
        [(f"z{i:03d}", "U", 100 + i, 100 + i, [i], 1, "s") for i in range(50)],
        "doc_id string, op string, commit_ts long, seq long, "
        "tokens array<int>, n_tok int, source string",
    )
    t.merge_epoch(a, "ea")
    t.merge_epoch(z, "ez")
    all_entries = t._bucket_entries([0])
    assert len(all_entries) >= 2
    assert all("min_key" in e for e in all_entries)  # stats recorded
    pruned = t._lookup_entries(["z007", "z042"], [0])
    assert len(pruned) < len(all_entries)  # the 'a*' file(s) skipped
    assert all(e["min_key"].startswith("z") for e in pruned)
    got = {r["doc_id"]: r["tokens"] for r in t.lookup(["z007", "a001", "nope"]).collect()}
    assert got == {"z007": [7], "a001": [1]}


def test_incremental_compaction_touches_only_offending_buckets(spark, tmp_path):
    """maybe_compact folds ONLY buckets over the delta threshold; cold
    buckets' file entries carry forward by reference (no rewrite)."""
    from ticdc_spark.lake.table import LakeTable

    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    # seed every bucket once
    base = spark.createDataFrame(
        [(f"d{i}", "U", i + 1, i + 1, [i], 1, "s") for i in range(40)],
        "doc_id string, op string, commit_ts long, seq long, "
        "tokens array<int>, n_tok int, source string",
    )
    t.merge_epoch(base, "e-base")
    # then hammer ONE key (one bucket) with many single-row epochs
    for e in range(6):
        ch = spark.createDataFrame(
            [("d0", "U", 100 + e, 100 + e, [e], 1, "s")],
            "doc_id string, op string, commit_ts long, seq long, "
            "tokens array<int>, n_tok int, source string",
        )
        t.merge_epoch(ch, f"e-hot{e}")
    counts = {b: len(v) for b, v in t._manifest["buckets"].items()}
    hot = [b for b, n in counts.items() if n > 3]
    cold = {b: t._manifest["buckets"][b] for b in counts if b not in hot}
    assert hot and cold
    assert t.maybe_compact(max_deltas=3) is not None
    after = t._manifest["buckets"]
    for b, entries in cold.items():
        assert after[b] == entries  # untouched: same file references
    for b in hot:
        assert len(after[b]) <= 3
    assert t.max_files_per_bucket() <= 3
    got = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    assert got["d0"] == [5] and len(got) == 40  # state intact, last write won


def test_version_at_ts_skips_expired_snapshots(spark, tmp_path):
    from ticdc_spark.lake.table import LakeTable

    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    for e, ts in enumerate([100, 200, 300, 400]):
        ch = spark.createDataFrame(
            [(f"d{e}", "U", ts, ts, [e], 1, "s")],
            "doc_id string, op string, commit_ts long, seq long, "
            "tokens array<int>, n_tok int, source string",
        )
        t.merge_epoch(ch, f"e{e}", watermarks={"0": ts})
    early = t.version_at_ts(150)
    assert early is not None
    t.expire_versions(keep_last=2)
    assert t.version_at_ts(150) is None  # snapshot expired -> no stale read
    late = t.version_at_ts(10**9)
    assert late == t._manifest["version"]  # CURRENT still resolvable
    assert t.read_version(late).count() == 4


def test_clean_buckets_skip_collapse_after_compaction(spark, tmp_path):
    """After a compaction, reads bypass the LWW collapse shuffle (no
    aggregate in the plan); a later MOR delta dirties only its bucket and
    correctness is preserved throughout."""
    from ticdc_spark.lake.table import LakeTable

    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    ch = spark.createDataFrame(
        [(f"d{i}", "U", i + 1, i + 1, [i], 1, "s") for i in range(20)]
        + [("d3", "D", 100, 100, None, None, None)],
        "doc_id string, op string, commit_ts long, seq long, "
        "tokens array<int>, n_tok int, source string",
    )
    t.merge_epoch(ch, "e0")
    assert t._manifest.get("clean_buckets", []) == []  # MOR appends are dirty
    t.compact(purge_tombstones=True)
    assert len(t._manifest["clean_buckets"]) == 4
    plan = t.read()._jdf.queryExecution().optimizedPlan().toString()
    assert "max_by" not in plan and "Aggregate" not in plan  # collapse skipped
    assert t.read().count() == 19  # d3 tombstoned+purged

    # a new delta dirties ONE bucket; other buckets stay collapse-free
    ch2 = spark.createDataFrame(
        [("d0", "U", 500, 500, [99], 1, "s")],
        "doc_id string, op string, commit_ts long, seq long, "
        "tokens array<int>, n_tok int, source string",
    )
    t.merge_epoch(ch2, "e1")
    assert len(t._manifest["clean_buckets"]) == 3
    got = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    assert got["d0"] == [99] and len(got) == 19
    plan2 = t.read()._jdf.queryExecution().optimizedPlan().toString()
    assert "Aggregate" in plan2  # the dirty bucket collapses again


def test_rebucket_partition_evolution(spark, tmp_path):
    """Grow the bucket count mid-life: state identical, new writes route by
    the new bucket expr, lookups still hit, rebucket is idempotent."""
    from ticdc_spark.lake.table import LakeTable

    t = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    ch = spark.createDataFrame(
        [(f"d{i}", "U", i + 1, i + 1, [i], 1, "s") for i in range(30)],
        "doc_id string, op string, commit_ts long, seq long, "
        "tokens array<int>, n_tok int, source string",
    )
    t.merge_epoch(ch, "e0")
    before = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    assert t.rebucket(8, "rb-1")["committed"]
    assert t.n_buckets == 8 and len(t._manifest["buckets"]) == 8
    assert not t.rebucket(8, "rb-1")["committed"]  # idempotent replay
    after = {r["doc_id"]: r["tokens"] for r in t.read().collect()}
    assert before == after
    # new writes + lookups under the new bucketing
    ch2 = spark.createDataFrame(
        [("d0", "U", 99, 99, [42], 1, "s"), ("zz", "I", 99, 100, [7], 1, "s")],
        "doc_id string, op string, commit_ts long, seq long, "
        "tokens array<int>, n_tok int, source string",
    )
    t.merge_epoch(ch2, "e1")
    got = {r["doc_id"]: r["tokens"] for r in t.lookup(["d0", "zz", "d5"]).collect()}
    assert got == {"d0": [42], "zz": [7], "d5": [5]}
    # reload from disk: manifest round-trips the new bucket count
    t2 = LakeTable(spark, str(tmp_path / "t"))
    assert t2.n_buckets == 8 and t2.read().count() == 31


def test_read_changes_incremental_scan(spark, tmp_path):
    """Iceberg-style incremental changelog: changes after a version replay
    onto a second table to reproduce state; compaction commits contribute
    NO change rows; expired history raises."""
    import os

    from pyspark.sql import functions as F

    from ticdc_spark.engine.replay import open_binlog, replay_binlog
    from ticdc_spark.testgen import BinlogSpec, write_binlog

    path = write_binlog(
        BinlogSpec(n_events=6_000, n_keys=600, seed=71, p_delete=0.15, p_insert=0.55),
        str(tmp_path / "binlog"),
    )
    events = open_binlog(spark, path)
    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    replay_binlog(t, events, n_epochs=4)
    v_mid = None
    # find the version after epoch 2 by replaying fresh with a probe
    t2 = LakeTable.create(spark, str(tmp_path / "tbl2"), n_buckets=4)
    stats = replay_binlog(t2, events, n_epochs=4)
    assert len(stats) == 4

    # bootstrap a follower from the mid-version full state, then catch up
    # with read_changes only
    versions = sorted(
        int(f[1:9]) for f in os.listdir(os.path.join(str(tmp_path / "tbl"), "_manifests"))
        if f.startswith("v") and f.endswith(".json")
    )
    v_mid = versions[len(versions) // 2]
    follower = LakeTable.create(spark, str(tmp_path / "follower"), n_buckets=4)
    base = t.read_version(v_mid)
    # seed follower with the mid snapshot (ts 0 synthetic ordering)
    seed = base.select(
        "doc_id", F.lit("I").alias("op"), F.lit(0).alias("commit_ts"),
        F.lit(0).alias("seq"), "tokens", "n_tok", "source",
    )
    follower.merge_epoch(seed, "seed")
    changes = t.read_changes(since_version=v_mid)
    assert changes.count() > 0
    follower.merge_epoch(changes, "catchup")
    a = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"]) for r in t.read().collect()}
    b = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"]) for r in follower.read().collect()}
    assert a == b and len(a) > 0

    # compaction rewrites contribute no change rows
    v_before = t._manifest["version"]
    t.compact()
    t.refresh()
    assert t.read_changes(since_version=v_before).count() == 0

    # expired history raises
    t.expire_versions(keep_last=1)
    t.refresh()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="expired"):
        t.read_changes(since_version=1)


def test_follower_feed_seed_then_incremental(spark, tmp_path):
    """FollowerFeed: bootstrap seeds a snapshot, later syncs apply ONLY the
    incremental changes, and the follower tracks upstream exactly; repeated
    sync with nothing new is a no-op."""
    from pyspark.sql import functions as F  # noqa: F401

    from ticdc_spark.engine.follower import FollowerFeed
    from ticdc_spark.engine.replay import open_binlog, replay_binlog
    from ticdc_spark.testgen import BinlogSpec, write_binlog

    path = write_binlog(
        BinlogSpec(n_events=6_000, n_keys=600, seed=72, p_delete=0.15, p_insert=0.55),
        str(tmp_path / "binlog"),
    )
    events = open_binlog(spark, path)
    lo, hi = events.agg(F.min("commit_ts"), F.max("commit_ts")).collect()[0]
    mid = (lo + hi) // 2
    src = LakeTable.create(spark, str(tmp_path / "src"), n_buckets=4)
    replay_binlog(src, events.filter(F.col("commit_ts") <= mid), n_epochs=2)

    dst = LakeTable.create(spark, str(tmp_path / "dst"), n_buckets=4)
    feed = FollowerFeed(src, dst)
    st = feed.sync()
    assert st["sync_mode"] == "seed" and st["committed"]

    # upstream advances
    replay_binlog(src, events.filter(F.col("commit_ts") > mid), n_epochs=2,
                  epoch_prefix="late")
    st = feed.sync()
    assert st["sync_mode"] == "incremental" and st["committed"]

    a = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"]) for r in src.read().collect()}
    b = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"]) for r in dst.read().collect()}
    assert a == b and len(a) > 0

    st = feed.sync()
    assert st["sync_mode"] == "noop"

    # a new FollowerFeed object recovers progress from epoch ids alone
    feed2 = FollowerFeed(LakeTable(spark, str(tmp_path / "src")),
                         LakeTable(spark, str(tmp_path / "dst")))
    assert feed2.sync()["sync_mode"] == "noop"
