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
