"""Single-threaded reference applier — the sync_diff_inspector analog.

The reference's primary correctness oracle is a full upstream-vs-downstream
table diff after replay (tests/_utils/check_sync_diff:1-37). Ours: apply every
binlog event sequentially in (commit_ts, seq, op_rank) order — op_rank
delete=0 < put=1, cdc/puller/entry_sorter.go:62-72 — to an in-memory dict,
then compare the engine's final table state row-for-row (token-array equality
via pyarrow, never per-row Python in the engine itself).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .model import OP_RANK, PAYLOAD_COLS

# resolved-ts control events (op='R') carry no data: rank them with the
# puts so sorting never KeyErrors, and skip them in the apply loops
_OP_RANK_MAP = {k: v for k, v in OP_RANK.items()}
_OP_RANK_MAP.setdefault("R", 1)


def apply_binlog(binlog: pa.Table, upto_ts: int | None = None) -> pa.Table:
    """Replay events, return final state sorted by doc_id.

    upto_ts: only apply events with commit_ts <= upto_ts (resolved-ts slice).
    """
    cols = binlog.to_pydict()
    n = len(binlog)
    order = sorted(
        range(n),
        key=lambda i: (cols["commit_ts"][i], cols["seq"][i], _OP_RANK_MAP[cols["op"][i]]),
    )
    state: dict[str, tuple] = {}
    for i in order:
        if upto_ts is not None and cols["commit_ts"][i] > upto_ts:
            continue
        if cols["op"][i] == "R":
            continue  # frontier heartbeat, not a row change
        k = cols["doc_id"][i]
        if cols["op"][i] == "D":
            state.pop(k, None)
        else:
            state[k] = tuple(cols[c][i] for c in PAYLOAD_COLS)
    keys = sorted(state)
    out = {
        "doc_id": pa.array(keys, pa.string()),
        "tokens": pa.array([state[k][0] for k in keys], pa.list_(pa.int32())),
        "n_tok": pa.array([state[k][1] for k in keys], pa.int32()),
        "source": pa.array([state[k][2] for k in keys], pa.string()),
    }
    return pa.table(out)


def apply_binlog_raw(
    binlog: pa.Table,
    base_fields: list[dict],
    ddls: list[tuple[int, str, dict]],
    upto_ts: int | None = None,
) -> "pa.Table":
    """Raw-mode oracle: decode payload JSON per event schema version, project
    by field id into the FINAL schema, LWW-apply. Returns final state sorted
    by doc_id with the final column names/types."""
    import bisect
    import json

    from .streaming.registry import SchemaRegistry

    reg = SchemaRegistry(base_fields, ddls)
    final_fields = [f for f in reg.fields(len(reg.versions) - 1) if f["name"] != "doc_id"]
    cols = binlog.to_pydict()
    n = len(binlog)
    order = sorted(
        range(n),
        key=lambda i: (cols["commit_ts"][i], cols["seq"][i], _OP_RANK_MAP[cols["op"][i]]),
    )
    state: dict[str, dict] = {}
    for i in order:
        if upto_ts is not None and cols["commit_ts"][i] > upto_ts:
            continue
        if cols["op"][i] == "R":
            continue  # frontier heartbeat, not a row change
        k = cols["doc_id"][i]
        if cols["op"][i] == "D":
            state.pop(k, None)
            continue
        v = bisect.bisect_left(reg.ddl_ts, cols["commit_ts"][i])
        vals = json.loads(cols["payload"][i])
        by_id = {
            f["id"]: vals.get(f["name"])
            for f in reg.fields(v)
            if f["name"] != "doc_id"
        }
        state[k] = {
            # id absent at the event's version = column didn't exist yet ->
            # initial default (ADD COLUMN ... DEFAULT x); present-but-NULL
            # stays NULL (same rule as mounter.project_fields)
            f["name"]: by_id[f["id"]] if f["id"] in by_id else f.get("initial_default")
            for f in final_fields
        }
    keys = sorted(state)

    def _pa_type(t: str):
        return {
            "string": pa.string(),
            "int": pa.int32(),
            "bigint": pa.int64(),
            "array<int>": pa.list_(pa.int32()),
        }[t]

    out = {"doc_id": pa.array(keys, pa.string())}
    for f in final_fields:
        out[f["name"]] = pa.array([state[k][f["name"]] for k in keys], _pa_type(f["type"]))
    return pa.table(out)


def _list_neq(e: pa.Array, a: pa.Array) -> "np.ndarray":
    """Vectorized per-row inequality for list arrays: null masks, lengths,
    then the flattened value buffers — no per-row Python."""
    import numpy as np

    n = len(e)
    e_null = pc.is_null(e).to_numpy(zero_copy_only=False)
    a_null = pc.is_null(a).to_numpy(zero_copy_only=False)
    bad = e_null != a_null
    e_len = pc.fill_null(pc.list_value_length(e), 0).to_numpy(zero_copy_only=False)
    a_len = pc.fill_null(pc.list_value_length(a), 0).to_numpy(zero_copy_only=False)
    bad |= (e_len != a_len) & ~e_null
    # compare values only where row structure matches
    ok_struct = ~bad & ~e_null
    if ok_struct.any():
        ef = pc.list_flatten(e).to_numpy(zero_copy_only=False)
        af = pc.list_flatten(a).to_numpy(zero_copy_only=False)
        row_of_e = np.repeat(np.arange(n), e_len)
        row_of_a = np.repeat(np.arange(n), a_len)
        # build per-row value-mismatch only for structurally-ok rows
        e_keep = ok_struct[row_of_e]
        a_keep = ok_struct[row_of_a]
        ev, av = ef[e_keep], af[a_keep]
        if len(ev) == len(av):
            neq = ev != av
            if neq.any():
                bad_rows = np.unique(row_of_e[e_keep][neq])
                bad[bad_rows] = True
        else:  # shouldn't happen, lengths matched
            bad |= ok_struct
    return bad


def diff_tables(expected: pa.Table, actual: pa.Table) -> list[str]:
    """Full-state diff (check_sync_diff analog). Returns list of problems,
    empty = match. Token arrays compared with pyarrow vectorized equality."""
    problems: list[str] = []
    exp = expected.sort_by("doc_id")
    act = actual.select(expected.column_names).sort_by("doc_id")
    if exp.num_rows != act.num_rows:
        ek = set(exp.column("doc_id").to_pylist())
        ak = set(act.column("doc_id").to_pylist())
        problems.append(
            f"row count {exp.num_rows} != {act.num_rows}; "
            f"missing={sorted(ek - ak)[:5]} extra={sorted(ak - ek)[:5]}"
        )
        return problems
    for name in expected.column_names:
        e = exp.column(name).combine_chunks()
        a = act.column(name).combine_chunks()
        if pa.types.is_list(e.type):
            a = a.cast(e.type)
            bad = pa.array(_list_neq(e, a))
        else:
            a = a.cast(e.type)
            eq = pc.equal(e, a)
            both_null = pc.and_(pc.is_null(e), pc.is_null(a))
            bad = pc.invert(pc.fill_null(pc.or_kleene(eq, both_null), False))
        nbad = pc.sum(bad.cast(pa.int64())).as_py() or 0
        if nbad:
            idx = pc.index(bad, pa.scalar(True)).as_py()
            key = exp.column("doc_id")[idx].as_py()
            problems.append(
                f"column {name}: {nbad} mismatched rows; first at doc_id={key}: "
                f"expected={exp.column(name)[idx].as_py()!r} actual={act.column(name)[idx].as_py()!r}"
            )
    return problems
