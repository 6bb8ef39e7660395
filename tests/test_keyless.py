"""Force-replicate keyless-table replication: multiset state equivalence
vs a sequential python oracle, redelivery idempotence, corrupt-history
detection, and pre-flight routing.

Reference semantics: cdc/sink/mysql.go:1203-1221 (whereSlice all-columns
fallback + LIMIT 1), model/schema_storage.go:309-317 (IsEligible under
force-replicate).
"""

import collections
import random

import pytest
from pyspark.sql import functions as F

SCHEMA = (
    "op string, commit_ts long, seq long, a string, b long, "
    "old_a string, old_b long"
)
OLD = {"a": "old_a", "b": "old_b"}
FIELDS = [
    {"id": 1, "name": "a", "type": "string"},
    {"id": 2, "name": "b", "type": "bigint"},
]


def _consistent_history(n_events: int, seed: int):
    """A valid keyless history: deletes/updates only touch live instances.
    Returns (event rows, final python multiset)."""
    rng = random.Random(seed)
    bag = collections.Counter()
    rows = []
    ts = 0
    values = [("v%d" % i, i % 3) for i in range(6)]  # tiny space -> dups
    for seq in range(n_events):
        ts += rng.randint(0, 2)
        live = [v for v, c in bag.items() if c > 0]
        roll = rng.random()
        if not live or roll < 0.5:
            v = rng.choice(values)
            rows.append(("I", ts, seq, v[0], v[1], None, None))
            bag[v] += 1
        elif roll < 0.75:
            v = rng.choice(live)
            rows.append(("D", ts, seq, v[0], v[1], None, None))
            bag[v] -= 1
        else:
            old = rng.choice(live)
            new = rng.choice(values)
            rows.append(("U", ts, seq, new[0], new[1], old[0], old[1]))
            bag[old] -= 1
            bag[new] += 1
    return rows, +bag  # +bag drops zero counts


def test_keyless_table_matches_python_multiset(spark, tmp_path):
    from ticdc_spark.lake.keyless import KeylessTable

    rows, want = _consistent_history(300, seed=7)
    kt = KeylessTable.create(spark, str(tmp_path / "kl"), FIELDS, n_buckets=4)
    # epochs split by position: replay order is the history order
    for i, lo in enumerate(range(0, 300, 100)):
        chunk = spark.createDataFrame(rows[lo : lo + 100], SCHEMA)
        st = kt.apply_epoch(chunk, f"e{i}", old_cols=OLD)
        assert st["committed"]
    got = collections.Counter(
        (r["a"], r["b"]) for r in kt.read_bag().collect()
    )
    assert got == want
    # mult view agrees with the bag view
    mult = {(r["a"], r["b"]): r["mult"] for r in kt.read().collect()}
    assert mult == dict(want)


def test_keyless_epoch_boundary_netting(spark, tmp_path):
    """Within one epoch, insert+delete of the same value nets to zero and
    never appears; an update chain collapses to its endpoints."""
    from ticdc_spark.lake.keyless import KeylessTable

    kt = KeylessTable.create(spark, str(tmp_path / "kl"), FIELDS, n_buckets=4)
    e = spark.createDataFrame(
        [
            ("I", 1, 0, "p", 1, None, None),
            ("D", 1, 1, "p", 1, None, None),  # nets out
            ("I", 1, 2, "q", 2, None, None),
            ("U", 2, 3, "q", 3, "q", 2),      # q,2 -> q,3
            ("U", 2, 4, "q", 4, "q", 3),      # q,3 -> q,4 same epoch
        ],
        SCHEMA,
    )
    assert kt.apply_epoch(e, "e0", old_cols=OLD)["committed"]
    got = [(r["a"], r["b"], r["mult"]) for r in kt.read().orderBy("a", "b").collect()]
    assert got == [("q", 4, 1)]


def test_keyless_redelivery_and_crash_replay(spark, tmp_path):
    from ticdc_spark.lake.keyless import KeylessTable

    rows, want = _consistent_history(120, seed=11)
    root = str(tmp_path / "kl")
    kt = KeylessTable.create(spark, root, FIELDS, n_buckets=4)
    chunks = [rows[:60], rows[60:]]
    assert kt.apply_epoch(spark.createDataFrame(chunks[0], SCHEMA), "e0", old_cols=OLD)["committed"]
    # redeliver e0: no-op
    st = kt.apply_epoch(spark.createDataFrame(chunks[0], SCHEMA), "e0", old_cols=OLD)
    assert not st["committed"]
    # "crash": reopen from disk, apply e1
    kt2 = KeylessTable(spark, root)
    assert kt2.apply_epoch(spark.createDataFrame(chunks[1], SCHEMA), "e1", old_cols=OLD)["committed"]
    got = collections.Counter((r["a"], r["b"]) for r in kt2.read_bag().collect())
    assert got == want


def test_keyless_negative_multiplicity_raises_at_validate(spark, tmp_path):
    """validate=True detects a corrupt retraction BEFORE committing."""
    from ticdc_spark.lake.keyless import KeylessTable

    kt = KeylessTable.create(spark, str(tmp_path / "kl"), FIELDS, n_buckets=4)
    bad = spark.createDataFrame([("D", 1, 0, "ghost", 1, None, None)], SCHEMA)
    with pytest.raises(Exception, match="negative"):
        kt.apply_epoch(bad, "e0", old_cols=OLD, validate=True)
    # the failed epoch did not commit; a valid epoch then applies cleanly
    ok = spark.createDataFrame([("I", 2, 0, "real", 1, None, None)], SCHEMA)
    assert kt.apply_epoch(ok, "e0", old_cols=OLD, validate=True)["committed"]
    assert [(r["a"], r["b"]) for r in kt.read_bag().collect()] == [("real", 1)]


def test_keyless_negative_multiplicity_raises_at_read(spark, tmp_path):
    """The fast (no-validate) path defers detection: the corrupt epoch
    commits, but the first collapse raises in-plan."""
    from ticdc_spark.lake.keyless import KeylessTable

    kt = KeylessTable.create(spark, str(tmp_path / "kl"), FIELDS, n_buckets=4)
    bad = spark.createDataFrame([("D", 1, 0, "ghost", 1, None, None)], SCHEMA)
    assert kt.apply_epoch(bad, "e0", old_cols=OLD)["committed"]
    with pytest.raises(Exception, match="negative"):
        kt.validate()


def test_keyless_update_without_preimage_raises(spark):
    from ticdc_spark.operators.keyless import keyless_delta

    ev = spark.createDataFrame(
        [("U", 1, 0, "x", 1, None, None)], SCHEMA
    ).select("op", "commit_ts", "seq", "a", "b")
    with pytest.raises(Exception, match="pre-image"):
        keyless_delta(ev, ["a", "b"]).collect()
    # but a stream with no U rows is fine without old cols
    ev2 = spark.createDataFrame(
        [("I", 1, 0, "x", 1, None, None), ("D", 1, 1, "x", 1, None, None)],
        SCHEMA,
    ).select("op", "commit_ts", "seq", "a", "b")
    assert keyless_delta(ev2, ["a", "b"]).count() == 0  # nets out


def test_keyless_null_columns_distinct_from_empty(spark, tmp_path):
    """NULL and '' are different value tuples (the \\x00 sentinel)."""
    from ticdc_spark.lake.keyless import KeylessTable

    kt = KeylessTable.create(spark, str(tmp_path / "kl"), FIELDS, n_buckets=4)
    e = spark.createDataFrame(
        [
            ("I", 1, 0, None, 1, None, None),
            ("I", 1, 1, "", 1, None, None),
        ],
        SCHEMA,
    )
    assert kt.apply_epoch(e, "e0", old_cols=OLD)["committed"]
    got = sorted(
        ((r["a"], r["b"], r["mult"]) for r in kt.read().collect()), key=str
    )
    assert got == [("", 1, 1), (None, 1, 1)]


def test_replication_mode_routing():
    from ticdc_spark.operators.handle import replication_mode

    keyed = {
        "pk_is_handle": True,
        "columns": [{"name": "id", "primary": True, "nullable": False}],
        "indices": [],
    }
    keyless = {
        "pk_is_handle": False,
        "columns": [{"name": "x", "nullable": True}],
        "indices": [],
    }
    assert replication_mode(keyed, force_replicate=False) == "keyed"
    assert replication_mode(keyed, force_replicate=True) == "keyed"
    assert replication_mode(keyless, force_replicate=False) == "skip"
    assert replication_mode(keyless, force_replicate=True) == "keyless"


def _pa_multiset(tbl):
    """Final multiset implied by a keyless binlog table: sequential python
    replay of the event stream in (commit_ts, seq) order."""
    import pyarrow as pa  # noqa: F401

    rows = tbl.sort_by([("commit_ts", "ascending"), ("seq", "ascending")]).to_pylist()
    bag = collections.Counter()
    for r in rows:
        new = (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        if r["op"] == "I":
            bag[new] += 1
        elif r["op"] == "D":
            bag[new] -= 1
        else:
            old = (
                r["old_doc_id"],
                tuple(r["old_tokens"]),
                r["old_n_tok"],
                r["old_source"],
            )
            bag[old] -= 1
            bag[new] += 1
    assert min(bag.values(), default=0) >= 0, "generator produced invalid history"
    return +bag


TOKEN_FIELDS = [
    {"id": 1, "name": "doc_id", "type": "string"},
    {"id": 2, "name": "tokens", "type": "array<int>"},
    {"id": 3, "name": "n_tok", "type": "int"},
    {"id": 4, "name": "source", "type": "string"},
]


def test_keyless_chunk_replay_matches_sequential_oracle(spark, tmp_path):
    from ticdc_spark.engine.replay import replay_chunks_keyless
    from ticdc_spark.lake.keyless import KeylessTable
    from ticdc_spark.testgen import generate_keyless_binlog, write_keyless_binlog_chunks

    tbl, final_rows = generate_keyless_binlog(800, seed=5, n_chunks=3)
    want = _pa_multiset(tbl)
    dirs, fr2 = write_keyless_binlog_chunks(
        800, str(tmp_path / "binlog"), n_chunks=3, seed=5
    )
    assert fr2 == final_rows == sum(want.values())

    kt = KeylessTable.create(spark, str(tmp_path / "tbl"), TOKEN_FIELDS, n_buckets=4)
    st = replay_chunks_keyless(kt, spark, dirs)
    assert all(s["committed"] for s in st)
    got = collections.Counter(
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in kt.read_bag().collect()
    )
    assert got == want


def test_keyless_chunk_replay_crash_resume(spark, tmp_path):
    from ticdc_spark.engine.replay import replay_chunks_keyless
    from ticdc_spark.lake.keyless import KeylessTable
    from ticdc_spark.testgen import write_keyless_binlog_chunks

    dirs, final_rows = write_keyless_binlog_chunks(
        600, str(tmp_path / "binlog"), n_chunks=4, seed=9
    )
    root = str(tmp_path / "tbl")
    kt = KeylessTable.create(spark, root, TOKEN_FIELDS, n_buckets=4)
    # crash after 2 chunks, reopen, replay ALL chunks (redelivery included)
    replay_chunks_keyless(kt, spark, dirs[:2])
    kt2 = KeylessTable(spark, root)
    st = replay_chunks_keyless(kt2, spark, dirs)
    assert [s["committed"] for s in st] == [False, False, True, True]
    assert kt2.read().agg(F.sum("mult")).collect()[0][0] == final_rows


def test_keyless_strategies_equivalent(spark, tmp_path):
    """agg and fused apply strategies produce identical multiset state
    (they differ only in physical plan)."""
    from ticdc_spark.lake.keyless import KeylessTable

    rows, want = _consistent_history(200, seed=23)
    bags = {}
    for s in ("agg", "fused"):
        kt = KeylessTable.create(spark, str(tmp_path / s), FIELDS, n_buckets=4)
        for i, lo in enumerate(range(0, 200, 70)):
            chunk = spark.createDataFrame(rows[lo : lo + 70], SCHEMA)
            kt.apply_epoch(chunk, f"e{i}", old_cols=OLD, strategy=s)
        bags[s] = collections.Counter(
            (r["a"], r["b"]) for r in kt.read_bag().collect()
        )
    assert bags["agg"] == bags["fused"] == want


def test_keyless_streaming_feed_converges_and_resumes(spark, tmp_path):
    """Structured Streaming path: availableNow over the chunked keyless
    binlog converges to the batch-replay multiset; a second run with the
    same checkpoint processes nothing new; a fresh checkpoint over the same
    table no-ops via idempotent epochs only if batch ids align — so we
    verify the CHECKPOINT resume contract, the one the engine relies on."""
    import glob

    from ticdc_spark.lake.keyless import KeylessTable
    from ticdc_spark.streaming.keyless_feed import KeylessFeed
    from ticdc_spark.testgen import write_keyless_binlog_chunks

    dirs, final_rows = write_keyless_binlog_chunks(
        500, str(tmp_path / "binlog"), n_chunks=3, seed=31
    )
    stream_glob = str(tmp_path / "binlog" / "chunk-*")
    kt = KeylessTable.create(spark, str(tmp_path / "tbl"), TOKEN_FIELDS, n_buckets=4)
    feed = KeylessFeed(
        kt,
        stream_glob,
        str(tmp_path / "ck"),
        max_files_per_trigger=1,
    )
    summaries = feed.run_available()
    # one batch per FILE (maxFilesPerTrigger=1; chunks are multi-file) —
    # ANY batching converges, that's the additive-monoid point
    assert len(summaries) >= 3 and all(s["committed"] for s in summaries)
    assert kt.read().agg(F.sum("mult")).collect()[0][0] == final_rows

    # restart with the same checkpoint: nothing to process
    feed2 = KeylessFeed(kt, stream_glob, str(tmp_path / "ck"))
    assert feed2.run_available() == []
    assert kt.read().agg(F.sum("mult")).collect()[0][0] == final_rows

    # batch replay over the same chunks agrees (streaming == batch)
    from ticdc_spark.engine.replay import replay_chunks_keyless

    kt_b = KeylessTable.create(spark, str(tmp_path / "tbl_b"), TOKEN_FIELDS, n_buckets=4)
    replay_chunks_keyless(kt_b, spark, dirs)
    a = collections.Counter(
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in kt.read_bag().collect()
    )
    b = collections.Counter(
        (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])
        for r in kt_b.read_bag().collect()
    )
    assert a == b


def test_keyless_feed_compaction_preserves_state(spark, tmp_path):
    """Per-batch maybe_compact with a tiny delta budget folds the multiset
    without changing it; zero-total tuples get purged."""
    from ticdc_spark.lake.keyless import KeylessTable
    from ticdc_spark.streaming.keyless_feed import KeylessFeed
    from ticdc_spark.testgen import write_keyless_binlog_chunks

    dirs, final_rows = write_keyless_binlog_chunks(
        300, str(tmp_path / "binlog"), n_chunks=3, seed=13
    )
    kt = KeylessTable.create(spark, str(tmp_path / "tbl"), TOKEN_FIELDS, n_buckets=2)
    feed = KeylessFeed(
        kt,
        str(tmp_path / "binlog" / "chunk-*"),
        str(tmp_path / "ck"),
        max_files_per_trigger=1,
        compact_max_deltas=1,  # force a fold almost every batch
        expire_keep_last=4,
    )
    feed.run_available()
    assert kt.read().agg(F.sum("mult")).collect()[0][0] == final_rows
    assert kt.validate() == final_rows


def test_keyless_cli_available_now(spark, tmp_path, monkeypatch):
    """jobs/run_changefeed.py --keyless drives the full path from argv to
    on-disk multiset state."""
    import sys as _sys

    from ticdc_spark.lake.keyless import KeylessTable
    from ticdc_spark.testgen import write_keyless_binlog_chunks

    _, final_rows = write_keyless_binlog_chunks(
        200, str(tmp_path / "binlog"), n_chunks=2, seed=4
    )
    import jobs.run_changefeed as job

    monkeypatch.setattr(
        _sys,
        "argv",
        [
            "run_changefeed.py",
            "--keyless",
            "--binlog", str(tmp_path / "binlog" / "chunk-*"),
            "--table", str(tmp_path / "tbl"),
            "--checkpoint", str(tmp_path / "ck"),
            "--available-now",
            "--buckets", "2",
        ],
    )
    assert job.main() == 0
    kt = KeylessTable(spark, str(tmp_path / "tbl"))
    assert kt.validate() == final_rows


def test_keyless_any_partition_any_order_with_redelivery_hypothesis(spark, tmp_path):
    """Exactly-once property, fuzzed: applying ANY disjoint partition of a
    consistent history into epochs, in ANY order, with any epochs
    REDELIVERED under their original ids, converges to the python multiset
    — additive deltas commute, and committed epoch ids no-op on replay.

    (Contrast with the keyed table's property test, which tolerates
    OVERLAPPING covers: LWW is per-event idempotent, sums are not — the
    keyless exactly-once contract is disjoint batches with stable ids,
    which is precisely what a streaming checkpoint's foreachBatch gives.)"""
    import itertools

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ticdc_spark.lake.keyless import KeylessTable

    counter = itertools.count()
    rows_all, want = _consistent_history(40, seed=99)

    @settings(max_examples=6, deadline=None)
    @given(st.data())
    def run(data):
        n_epochs = data.draw(st.integers(1, 4))
        assignment = [
            data.draw(st.integers(0, n_epochs - 1)) for _ in rows_all
        ]
        order = list(
            data.draw(st.permutations(list(range(n_epochs))))
        )
        # redeliver a random subset of epochs at random later points
        redelivered = data.draw(
            st.lists(st.integers(0, n_epochs - 1), max_size=3)
        )
        schedule = order + redelivered

        tid = next(counter)
        kt = KeylessTable.create(
            spark, str(tmp_path / f"kl{tid}"), FIELDS, n_buckets=2
        )
        for e in schedule:
            chunk = [r for r, a in zip(rows_all, assignment) if a == e]
            if not chunk:
                continue
            df = spark.createDataFrame(chunk, SCHEMA)
            kt.apply_epoch(df, f"e{e}", old_cols=OLD)
        got = collections.Counter(
            (r["a"], r["b"]) for r in kt.read_bag().collect()
        )
        assert got == want

    run()


def test_keyless_feed_multi_table_routing(spark, tmp_path):
    """Events routed by the binlog's `table` column, one epoch per table
    per batch; the off-target table sees nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ticdc_spark.lake.keyless import KeylessTable
    from ticdc_spark.streaming.keyless_feed import KeylessFeed
    from ticdc_spark.testgen import generate_keyless_binlog

    tbl_a, rows_a = generate_keyless_binlog(120, seed=1, n_chunks=1, table="ta")
    tbl_b, rows_b = generate_keyless_binlog(80, seed=2, n_chunks=1, table="tb")
    binlog = str(tmp_path / "binlog")
    import os

    os.makedirs(binlog)
    pq.write_table(pa.concat_tables([tbl_a, tbl_b]), f"{binlog}/binlog-0.parquet")

    kts = {
        n: KeylessTable.create(spark, str(tmp_path / n), TOKEN_FIELDS, n_buckets=2)
        for n in ("ta", "tb")
    }
    feed = KeylessFeed(
        tables=kts, binlog_dir=binlog, checkpoint_dir=str(tmp_path / "ck")
    )
    summaries = feed.run_available()
    assert summaries and all(
        s["committed"] for b in summaries for s in b["tables"].values()
    )
    assert kts["ta"].validate() == rows_a
    assert kts["tb"].validate() == rows_b


def test_keyless_evolve_add_column_rewrites_identity(spark, tmp_path):
    from ticdc_spark.lake.keyless import KeylessTable

    kt = KeylessTable.create(spark, str(tmp_path / "kl"), FIELDS, n_buckets=4)
    e = spark.createDataFrame(
        [("I", 1, 0, "x", 1, None, None), ("I", 1, 1, "x", 1, None, None)],
        SCHEMA,
    )
    kt.apply_epoch(e, "e0", old_cols=OLD)
    assert kt.evolve("add_column", {"name": "c", "type": "string"}, "ddl1")
    # replay of the same DDL no-ops
    assert not kt.evolve("add_column", {"name": "c", "type": "string"}, "ddl1")
    got = kt.read().collect()
    assert len(got) == 1 and got[0]["mult"] == 2 and got[0]["c"] is None
    assert kt.value_cols == ["a", "b", "c"]
    # post-evolve events carry the new column; (x,1,NULL) and (x,1,'v')
    # are DIFFERENT tuples now
    sch2 = (
        "op string, commit_ts long, seq long, a string, b long, c string, "
        "old_a string, old_b long, old_c string"
    )
    e2 = spark.createDataFrame([("I", 2, 0, "x", 1, "v", None, None, None)], sch2)
    kt.apply_epoch(e2, "e1", old_cols={"a": "old_a", "b": "old_b", "c": "old_c"})
    rows = {(r["a"], r["b"], r["c"]): r["mult"] for r in kt.read().collect()}
    assert rows == {("x", 1, None): 2, ("x", 1, "v"): 1}
    # and a delete of the ORIGINAL tuple (now with NULL c) still lands
    e3 = spark.createDataFrame([("D", 3, 0, "x", 1, None, None, None, None)], sch2)
    kt.apply_epoch(e3, "e2", old_cols={"a": "old_a", "b": "old_b", "c": "old_c"})
    rows = {(r["a"], r["b"], r["c"]): r["mult"] for r in kt.read().collect()}
    assert rows == {("x", 1, None): 1, ("x", 1, "v"): 1}


def test_keyless_evolve_drop_column_merges_tuples(spark, tmp_path):
    from ticdc_spark.lake.keyless import KeylessTable

    kt = KeylessTable.create(spark, str(tmp_path / "kl"), FIELDS, n_buckets=4)
    e = spark.createDataFrame(
        [
            ("I", 1, 0, "x", 1, None, None),
            ("I", 1, 1, "x", 2, None, None),  # distinct from (x,1) only by b
            ("I", 1, 2, "y", 3, None, None),
        ],
        SCHEMA,
    )
    kt.apply_epoch(e, "e0", old_cols=OLD)
    assert kt.evolve("drop_column", {"name": "b"}, "ddl1")
    rows = {r["a"]: r["mult"] for r in kt.read().collect()}
    # (x,1) and (x,2) collapse into (x) with summed multiplicity
    assert rows == {"x": 2, "y": 1}
    assert kt.value_cols == ["a"]


def test_keyless_evolve_rename_is_metadata_only(spark, tmp_path):
    from ticdc_spark.lake.keyless import KeylessTable

    kt = KeylessTable.create(spark, str(tmp_path / "kl"), FIELDS, n_buckets=4)
    e = spark.createDataFrame([("I", 1, 0, "x", 1, None, None)], SCHEMA)
    kt.apply_epoch(e, "e0", old_cols=OLD)
    v_before = kt.t.version
    assert kt.evolve("rename_column", {"from": "a", "to": "alpha"}, "ddl1")
    assert kt.t.version == v_before + 1  # one metadata commit, no rewrite
    got = kt.read().collect()
    assert got[0]["alpha"] == "x" and kt.value_cols == ["alpha", "b"]
    # identity unchanged: a delete keyed by the SAME values still retracts
    sch = "op string, commit_ts long, seq long, alpha string, b long"
    e2 = spark.createDataFrame([("D", 2, 0, "x", 1)], sch)
    kt.apply_epoch(e2, "e1")
    assert kt.read().count() == 0


def test_keyless_mq_roundtrip_downstream_equals_primary(spark, tmp_path):
    """A -> MQ (keyless open protocol, full images + mandatory pre-images)
    -> consumer -> B: downstream multiset identical to the primary; a
    second consumer run no-ops (epoch ids)."""
    from pyspark.sql import types as T

    from ticdc_spark.lake.keyless import KeylessTable
    from ticdc_spark.streaming.keyless_feed import KeylessFeed
    from ticdc_spark.streaming.keyless_mq import KeylessMQConsumer
    from ticdc_spark.testgen import write_keyless_binlog_chunks

    _, final_rows = write_keyless_binlog_chunks(
        400, str(tmp_path / "binlog"), n_chunks=2, seed=21
    )
    a = KeylessTable.create(spark, str(tmp_path / "a"), TOKEN_FIELDS, n_buckets=4)
    feed = KeylessFeed(
        a,
        str(tmp_path / "binlog" / "chunk-*"),
        str(tmp_path / "ck"),
        mq_dir=str(tmp_path / "mq"),
        mq_partitions=4,
    )
    feed.run_available()
    assert a.validate() == final_rows

    value_fields = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
        ]
    )
    b = KeylessTable.create(spark, str(tmp_path / "b"), TOKEN_FIELDS, n_buckets=4)
    consumer = KeylessMQConsumer(
        spark,
        str(tmp_path / "mq"),
        {"keyless_tokens": b},
        value_fields,
    )
    st = consumer.run()
    assert st and all(s["committed"] for s in st)

    key = lambda r: (r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"])  # noqa: E731
    a_bag = collections.Counter(key(r) for r in a.read_bag().collect())
    b_bag = collections.Counter(key(r) for r in b.read_bag().collect())
    assert a_bag == b_bag and sum(a_bag.values()) == final_rows

    # redelivery: consuming again changes nothing
    st2 = consumer.run()
    assert all(not s["committed"] for s in st2)
    assert collections.Counter(key(r) for r in b.read_bag().collect()) == b_bag


def test_keyless_feed_mq_rejects_heterogeneous_tables(spark, tmp_path):
    from ticdc_spark.lake.keyless import KeylessTable
    from ticdc_spark.streaming.keyless_feed import KeylessFeed

    a = KeylessTable.create(spark, str(tmp_path / "a"), FIELDS, n_buckets=2)
    b = KeylessTable.create(
        spark, str(tmp_path / "b"),
        [{"id": 1, "name": "z", "type": "string"}], n_buckets=2,
    )
    feed = KeylessFeed(
        tables={"ta": a, "tb": b},
        binlog_dir=str(tmp_path / "none"),
        checkpoint_dir=str(tmp_path / "ck"),
        mq_dir=str(tmp_path / "mq"),
    )
    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError, match="homogeneous"):
        feed._process_batch(df, 0)


def test_keyless_changes_fold_to_current_state(spark, tmp_path):
    """The incremental changelog is the signed delta stream: folding all
    changes since v0 reproduces the live multiset; a compaction commit
    contributes no change rows."""
    from ticdc_spark.lake.keyless import KeylessTable

    rows, want = _consistent_history(150, seed=41)
    kt = KeylessTable.create(spark, str(tmp_path / "kl"), FIELDS, n_buckets=2)
    for i, lo in enumerate(range(0, 150, 50)):
        kt.apply_epoch(
            spark.createDataFrame(rows[lo : lo + 50], SCHEMA), f"e{i}", old_cols=OLD
        )
    v_pre_compact = kt.t.version
    kt.compact()
    ch = kt.changes(0).groupBy("a", "b").agg(F.sum("mult").alias("m"))
    got = {
        (r["a"], r["b"]): r["m"] for r in ch.collect() if r["m"] != 0
    }
    assert got == dict(want)
    # compaction added no change rows
    assert kt.changes(v_pre_compact).count() == 0
