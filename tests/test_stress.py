"""Randomized stress analogs of the reference's integration suites.

- multi_source (tests/multi_source/main.go:74-131): a RANDOM valid DDL chain
  (add / widen / rename / drop) interleaved with DML at random barrier points,
  replayed through the streaming changefeed; final schema AND data must match
  the raw-mode oracle. Three seeds — the chain differs per seed.
- many_pk_or_uk (tests/many_pk_or_uk/main.go:56-120): boundary handle-key
  values (int64 min/max, uint64 max, empty string, unicode, quoting hazards)
  and boundary commit-ts magnitudes, with same-(commit_ts, seq) delete+put
  ties; batch replay must match the sequential oracle.
"""

import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ticdc_spark.lake.table import LakeTable
from ticdc_spark.oracle import apply_binlog, apply_binlog_raw, diff_tables
from ticdc_spark.streaming.changefeed import ChangeFeed
from ticdc_spark.streaming.registry import SchemaRegistry
from ticdc_spark.testgen import BinlogSpec, binlog_to_raw, generate_binlog, write_raw_binlog

BASE = [
    {"id": 1, "name": "doc_id", "type": "string"},
    {"id": 2, "name": "tokens", "type": "array<int>"},
    {"id": 3, "name": "n_tok", "type": "int"},
    {"id": 4, "name": "source", "type": "string"},
]


def _random_ddl_chain(rng: random.Random, ts_points: list[int]) -> list[tuple[int, str, dict]]:
    """A random VALID DDL chain: each op picked against the evolving schema
    (multi_source runs create/add/drop/modify continuously; ours draws from
    the lake's supported set). Never drops the tokens field (id 2) so the
    payload comparison stays meaningful."""
    reg = SchemaRegistry(BASE)
    ddls: list[tuple[int, str, dict]] = []
    n_added = 0
    for ts in ts_points:
        fields = reg.versions[-1]
        nonkey = [f for f in fields if f["name"] != "doc_id"]
        choices = ["add"]
        if any(f["type"] == "int" for f in nonkey):
            choices.append("widen")
        if nonkey:
            choices.append("rename")
        if len([f for f in nonkey if f["id"] != 2]) > 1:
            choices.append("drop")
        op = rng.choice(choices)
        if op == "add":
            n_added += 1
            spec: dict = {"name": f"extra{n_added}", "type": "string"}
            if rng.random() < 0.5:
                # half the adds carry ADD COLUMN ... DEFAULT: the initial-
                # default must survive later rename/widen of the column and
                # interleave correctly with drops (oracle mirrors it)
                spec["default"] = f"dflt{n_added}"
            ddl = ("add_column", spec)
        elif op == "widen":
            f = rng.choice([f for f in nonkey if f["type"] == "int"])
            ddl = ("widen_column", {"name": f["name"], "to": "bigint"})
        elif op == "rename":
            f = rng.choice(nonkey)
            ddl = ("rename_column", {"from": f["name"], "to": f["name"] + "_r"})
        else:
            f = rng.choice([f for f in nonkey if f["id"] != 2])
            ddl = ("drop_column", {"name": f["name"]})
        reg.add_ddl(ts, *ddl)
        ddls.append((ts, *ddl))
    return ddls


def _lake_arrow_dyn(table, fields) -> pa.Table:
    pdf = table.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    pa_type = {
        "string": pa.string(),
        "int": pa.int32(),
        "bigint": pa.int64(),
        "array<int>": pa.list_(pa.int32()),
    }
    out = {}
    for f in fields:
        name = f["name"]
        if f["type"] == "array<int>":
            out[name] = pa.array(
                [None if v is None else list(v) for v in pdf[name]], pa.list_(pa.int32())
            )
        else:
            out[name] = pa.Array.from_pandas(pdf[name], type=pa_type[f["type"]])
    return pa.table(out)


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_multi_source_random_ddl_dml(spark, tmp_path, seed):
    rng = random.Random(seed)
    spec = BinlogSpec(
        n_events=8_000,
        n_keys=800,
        seed=seed,
        p_delete=0.1 + 0.1 * rng.random(),
        p_insert=0.5,
        p_update=1 - 0.5 - (0.1 + 0.1 * rng.random()),
        tie_frac=rng.random() * 0.4,
    )
    # normalize probs (BinlogSpec takes them as given to rng.choice)
    tot = spec.p_insert + spec.p_update + spec.p_delete
    spec.p_insert, spec.p_update, spec.p_delete = (
        spec.p_insert / tot, spec.p_update / tot, spec.p_delete / tot,
    )
    typed = generate_binlog(spec)
    import pyarrow.compute as pc

    lo = pc.min(typed.column("commit_ts")).as_py()
    hi = pc.max(typed.column("commit_ts")).as_py()
    n_ddl = rng.randint(2, 5)
    ts_points = sorted(rng.sample(range(lo + 1, hi - 1), n_ddl))
    ddls = _random_ddl_chain(rng, ts_points)

    raw = binlog_to_raw(typed, ddls)
    write_raw_binlog(raw, str(tmp_path / "binlog"), n_files=6)
    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=8)
    cf = ChangeFeed(
        t,
        str(tmp_path / "binlog"),
        str(tmp_path / "ckpt"),
        mode="raw",
        ddl_rows=[{"commit_ts": ts, "ddl_type": typ, "spec": s} for ts, typ, s in ddls],
        max_files_per_trigger=2,
    )
    summaries = cf.run_available()
    resolved = summaries[-1]["resolved_ts"]
    assert t.schema_version == len(ddls)

    reg = SchemaRegistry(BASE, ddls)
    final_fields = reg.fields(len(ddls))
    assert [f["name"] for f in t.current_fields] == [f["name"] for f in final_fields]
    expected = apply_binlog_raw(raw, BASE, ddls, upto_ts=resolved)
    problems = diff_tables(expected, _lake_arrow_dyn(t, final_fields))
    assert not problems, (ddls, problems[:3])


BOUNDARY_KEYS = [
    "0",
    str(2**63 - 1),          # max int64
    str(-(2**63)),           # min int64
    str(2**64 - 1),          # max uint64 (many_pk_or_uk's MaxUint64 case)
    "",                      # empty string key
    "ключ-🙂",               # non-ascii
    "a'b\"c;--",             # quoting hazards (no SQL-injection surface)
    "doc_\t\n",              # control chars
]


def test_boundary_keys_and_ts_replay(spark, tmp_path):
    """Every boundary key gets insert → update (huge commit-ts) → for half
    the keys a same-(commit_ts, seq) delete+put tie, for the other half a
    bare trailing delete; replay must match the sequential oracle exactly."""
    rows = []  # (commit_ts, seq, op, doc_id, tokens)
    big = 2**62  # near the long limit but epoch arithmetic stays in-range
    for i, k in enumerate(BOUNDARY_KEYS):
        rows.append((1 + i, i, "I", k, [i]))
        rows.append((big - 1000 + i, 1000 + i, "U", k, [i, i + 1]))
        if i % 2 == 0:  # delete+put tie at identical (commit_ts, seq): put wins
            rows.append((big + i, 2000 + i, "D", k, None))
            rows.append((big + i, 2000 + i, "U", k, [42 + i]))
        else:  # bare delete wins as a delete
            rows.append((big + i, 2000 + i, "D", k, None))
    # one sentinel per partition above every boundary event, so the resolved
    # frontier (min over parts of max commit-ts) covers the whole stream
    for p in range(4):
        rows.append((big + 1000 + p, 3000 + p, "I", f"sentinel{p}", [p]))

    tbl = pa.table(
        {
            "commit_ts": pa.array([r[0] for r in rows], pa.int64()),
            "seq": pa.array([r[1] for r in rows], pa.int64()),
            "table": pa.array(["t"] * len(rows)),
            "op": pa.array([r[2] for r in rows]),
            "doc_id": pa.array([r[3] for r in rows], pa.string()),
            "tokens": pa.array([r[4] for r in rows], pa.list_(pa.int32())),
            "n_tok": pa.array(
                [None if r[4] is None else len(r[4]) for r in rows], pa.int32()
            ),
            "source": pa.array(
                [None if r[2] == "D" else "web" for r in rows], pa.string()
            ),
            "part": pa.array(
                [
                    int(r[3][8:]) if r[3].startswith("sentinel") else i % 4
                    for i, r in enumerate(rows)
                ],
                pa.int32(),
            ),
            "schema_version": pa.array([0] * len(rows), pa.int32()),
        }
    )
    path = str(tmp_path / "binlog")
    import os

    os.makedirs(path)
    pq.write_table(tbl, os.path.join(path, "binlog-00000.parquet"))

    from ticdc_spark.engine.replay import open_binlog, replay_binlog
    from ticdc_spark.operators.epochs import resolved_frontier

    events = open_binlog(spark, path)
    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    replay_binlog(t, events, n_epochs=3)
    resolved = resolved_frontier(events)
    expected = apply_binlog(tbl, upto_ts=resolved)

    pdf = t.read().toPandas().sort_values("doc_id").reset_index(drop=True)
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
    # tie semantics spot-check: even-index keys survive with the tied put's
    # payload; odd-index keys are gone
    surviving = set(pdf["doc_id"])
    for i, k in enumerate(BOUNDARY_KEYS):
        assert (k in surviving) == (i % 2 == 0), (i, k)
