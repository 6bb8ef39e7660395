"""Everything-at-once soak: the chaos-suite composition the reference runs
as separate availability cases (tests/availability, kill_owner_with_ddl,
changefeed_reconstruct, processor_panic), in one flow:

  randomized binlog (skew + ties + delete/put pairs)
  × DDL chain applied at barriers
  × kill after the first batches, restart from checkpoint
  × full at-least-once REdelivery of every file under new epoch ids
  × forced MOR compaction mid-way
  → final state must equal the sequential oracle, schema fully evolved.
"""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc

from ticdc_spark.lake.table import LakeTable
from ticdc_spark.oracle import apply_binlog_raw, diff_tables
from ticdc_spark.streaming.changefeed import ChangeFeed
from ticdc_spark.streaming.registry import SchemaRegistry
from ticdc_spark.testgen import BinlogSpec, binlog_to_raw, generate_binlog, write_raw_binlog

BASE = [
    {"id": 1, "name": "doc_id", "type": "string"},
    {"id": 2, "name": "tokens", "type": "array<int>"},
    {"id": 3, "name": "n_tok", "type": "int"},
    {"id": 4, "name": "source", "type": "string"},
]


def _lake_arrow(table, fields):
    pdf = table.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    pa_type = {"string": pa.string(), "int": pa.int32(), "bigint": pa.int64()}
    out = {}
    for f in fields:
        if f["type"] == "array<int>":
            out[f["name"]] = pa.array(
                [None if v is None else list(v) for v in pdf[f["name"]]],
                pa.list_(pa.int32()),
            )
        else:
            out[f["name"]] = pa.Array.from_pandas(pdf[f["name"]], type=pa_type[f["type"]])
    return pa.table(out)


def test_soak_chaos_ddl_redelivery_compaction(spark, tmp_path):
    spec = BinlogSpec(
        n_events=25_000,
        n_keys=2_000,
        seed=91,
        hot_frac=0.3,
        hot_keys=12,
        tie_frac=0.35,
        dup_seq_tie_frac=0.2,
        p_delete=0.18,
        p_insert=0.5,
        p_update=0.32,
    )
    typed = generate_binlog(spec)
    lo = pc.min(typed.column("commit_ts")).as_py()
    hi = pc.max(typed.column("commit_ts")).as_py()
    q = (hi - lo) // 5
    ddls = [
        (lo + q, "add_column", {"name": "lang", "type": "string"}),
        (lo + 2 * q, "widen_column", {"name": "n_tok", "to": "bigint"}),
        (lo + 3 * q, "rename_column", {"from": "source", "to": "origin"}),
        (lo + 4 * q, "drop_column", {"name": "lang"}),
    ]
    raw = binlog_to_raw(typed, ddls)
    binlog = str(tmp_path / "binlog")
    write_raw_binlog(raw, binlog, n_files=10)
    ddl_rows = [{"commit_ts": ts, "ddl_type": t, "spec": s} for ts, t, s in ddls]

    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=8)
    ck = str(tmp_path / "ckpt")

    # phase 1: process only part of the stream, then "crash" (new instance
    # later). max_files_per_trigger=2 → 5 batches; stop after ~2 by staging
    # only 4 files first.
    part1 = str(tmp_path / "part1")
    os.makedirs(part1)
    files = sorted(glob.glob(binlog + "/*.parquet"))
    for f in files[:4]:
        os.link(f, os.path.join(part1, os.path.basename(f)))
    cf1 = ChangeFeed(t, part1, ck, mode="raw", ddl_rows=ddl_rows, max_files_per_trigger=2)
    cf1.run_available()
    assert t._manifest["version"] > 0

    # mid-way: force a compaction (tombstone-preserving) — must not disturb
    # later replay
    t.compact(purge_tombstones=False)

    # phase 2: "restart" — the rest of the files appear, SAME checkpoint
    for f in files[4:]:
        os.link(f, os.path.join(part1, os.path.basename(f)))
    t2 = LakeTable(spark, str(tmp_path / "tbl"))
    cf2 = ChangeFeed(t2, part1, ck, mode="raw", ddl_rows=ddl_rows, max_files_per_trigger=2)
    s2 = cf2.run_available()
    resolved = s2[-1]["resolved_ts"]

    # phase 3: full at-least-once REdelivery under fresh epoch ids (fresh
    # checkpoint): conditional merge must keep state stable
    t3 = LakeTable(spark, str(tmp_path / "tbl"))
    cf3 = ChangeFeed(
        t3, binlog, str(tmp_path / "ckpt2"), mode="raw", ddl_rows=ddl_rows,
        max_files_per_trigger=4,
    )
    s3 = cf3.run_available()
    resolved = max(resolved, s3[-1]["resolved_ts"])

    reg = SchemaRegistry(BASE, ddls)
    final_fields = reg.fields(len(ddls))
    t_final = LakeTable(spark, str(tmp_path / "tbl"))
    assert t_final.schema_version == len(ddls)
    assert [f["name"] for f in t_final.current_fields] == [f["name"] for f in final_fields]

    expected = apply_binlog_raw(raw, BASE, ddls, upto_ts=resolved)
    problems = diff_tables(expected, _lake_arrow(t_final, final_fields))
    assert not problems, problems[:3]


def test_soak_multi_table_lifecycle_heartbeats_restart(spark, tmp_path):
    """Round-3 kitchen sink — every new frontier mechanism composed:

      ta: ordered stream on parts 0..3, an 8-part declared universe whose
          idle half advances ONLY via resolved heartbeats (op='R'),
          add_column at t_add, TRUNCATE at t_trunc (barrier-ordered data
          op ⇒ per-table frontier gating + late-fatal contract)
      tc: created mid-stream by a lifecycle create_table DDL, its DATA
          arriving only after a restart (below the already-released union
          frontier — legal: its own spans promised nothing), dropped at
          drop_ts
      two runs over one checkpoint (restart), second run fed new files

    Final states must equal the sequential oracles."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ticdc_spark.oracle import apply_binlog
    from ticdc_spark.streaming.multi import MultiTableChangeFeed
    from ticdc_spark.testgen import write_binlog, write_resolved_events

    stage_a = str(tmp_path / "sa")
    stage_c = str(tmp_path / "sc")
    write_binlog(BinlogSpec(n_events=5_000, n_keys=400, seed=101, table="ta",
                            out_of_order=False, n_parts=4, p_delete=0.15,
                            p_insert=0.55),
                 stage_a, files_per_part=3, align_ts=True)
    write_binlog(BinlogSpec(n_events=3_000, n_keys=250, seed=102, table="tc",
                            out_of_order=False, n_parts=4),
                 stage_c, files_per_part=1, align_ts=True)
    ev_a = pq.read_table(stage_a)
    ev_c = pq.read_table(stage_c)
    lo = pc.min(ev_a.column("commit_ts")).as_py()
    hi = pc.max(ev_a.column("commit_ts")).as_py()
    span = hi - lo
    t_add = lo + span // 5
    create_ts = lo + span // 4
    t_trunc = lo + 2 * span // 5
    hb1 = lo + 3 * span // 5
    drop_ts = lo + 4 * span // 5

    binlog = str(tmp_path / "binlog")
    os.makedirs(binlog)
    for f in glob.glob(stage_a + "/*.parquet"):
        os.link(f, os.path.join(binlog, "a-" + os.path.basename(f)))
    # phase-1 heartbeats: ta's idle parts 4..7 resolve to hb1 — WITHOUT
    # these the declared universe pins ta's frontier (and the truncate) at -1
    write_resolved_events(binlog, {p: hb1 for p in range(4, 8)},
                          table="ta", fname="a-hb1.parquet")

    fields = [
        {"id": 1, "name": "doc_id", "type": "string"},
        {"id": 2, "name": "tokens", "type": "array<int>"},
        {"id": 3, "name": "n_tok", "type": "int"},
        {"id": 4, "name": "source", "type": "string"},
    ]
    ddl_rows = [
        {"commit_ts": t_add, "ddl_type": "add_column", "table": "ta",
         "spec": '{"name":"lang","type":"string"}'},
        {"commit_ts": create_ts, "ddl_type": "create_table", "table": "tc",
         "spec": {"fields": fields, "key": "doc_id", "n_buckets": 4}},
        {"commit_ts": t_trunc, "ddl_type": "truncate_table", "table": "ta",
         "spec": "{}"},
        {"commit_ts": drop_ts, "ddl_type": "drop_table", "table": "tc",
         "spec": {}},
    ]
    ta = LakeTable.create(spark, str(tmp_path / "ta"), n_buckets=4)
    ck = str(tmp_path / "ckpt")

    def mk_feed():
        return MultiTableChangeFeed(
            {"ta": LakeTable(spark, str(tmp_path / "ta"))}, binlog, ck,
            max_files_per_trigger=2, ddl_rows=ddl_rows, n_parts=8,
            table_root=str(tmp_path / "created"),
        )

    s1 = mk_feed().run_available()
    r1 = s1[-1]["resolved_ts"]
    # phase 1: frontier capped by the idle-half heartbeat; truncate applied
    assert r1 == hb1 and t_trunc < r1 < drop_ts
    ta = LakeTable(spark, str(tmp_path / "ta"))
    assert ta.schema_version == 2  # add_column + truncate both crossed

    # ---- restart: tc's data + the closing heartbeats land ----
    for f in glob.glob(stage_c + "/*.parquet"):
        os.link(f, os.path.join(binlog, "c-" + os.path.basename(f)))
    write_resolved_events(binlog, {p: hi for p in range(4, 8)},
                          table="ta", fname="z-hb2.parquet")
    s2 = mk_feed().run_available()
    r2 = s2[-1]["resolved_ts"]
    assert r2 > drop_ts

    # ta == LWW of post-truncate events only, lang all NULL
    ta = LakeTable(spark, str(tmp_path / "ta"))
    post = ev_a.filter(pc.greater(ev_a.column("commit_ts"), t_trunc))
    exp_a = apply_binlog(post, upto_ts=r2)
    pdf = ta.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    got_a = pa.table({
        "doc_id": pa.array(pdf["doc_id"], pa.string()),
        "tokens": pa.array([list(t) for t in pdf["tokens"]], pa.list_(pa.int32())),
        "n_tok": pa.Array.from_pandas(pdf["n_tok"], type=pa.int32()),
        "source": pa.array(pdf["source"], pa.string()),
    })
    assert not diff_tables(exp_a, got_a)
    assert pdf["lang"].isna().all()

    # tc == LWW of its events in (create_ts, drop_ts] — late-arriving data
    # (below the released union frontier) applied because ITS spans never
    # promised anything; window enforced by the lifecycle DDLs
    tc = LakeTable(spark, str(tmp_path / "created" / "tc"))
    ev_c_win = ev_c.filter(
        pc.and_(pc.greater(ev_c.column("commit_ts"), create_ts),
                pc.less_equal(ev_c.column("commit_ts"), drop_ts))
    )
    exp_c = apply_binlog(ev_c_win, upto_ts=r2)
    pdf_c = tc.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    got_c = pa.table({
        "doc_id": pa.array(pdf_c["doc_id"], pa.string()),
        "tokens": pa.array([list(t) for t in pdf_c["tokens"]], pa.list_(pa.int32())),
        "n_tok": pa.Array.from_pandas(pdf_c["n_tok"], type=pa.int32()),
        "source": pa.array(pdf_c["source"], pa.string()),
    })
    assert not diff_tables(exp_c, got_c)
