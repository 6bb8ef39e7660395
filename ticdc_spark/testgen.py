"""Deterministic synthetic binlog / DDL generator (FIXTURES.md F2/F3).

Pure numpy + pyarrow (no Spark needed to generate), fully vectorized so the
bench can synthesize millions of events in seconds. Mirrors the reference's
randomized-workload test inputs (tests/dailytest/{data,rand}.go: random
insert/update/delete batches) plus the knobs our correctness tests need:
hot-key zipf skew, equal-commit-ts ties with delete+put pairs
(cdc/puller/entry_sorter_test.go ordering cases), and out-of-order delivery
within a partition (the sorter's job, cdc/puller/entry_sorter.go:119-155).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OPS = np.array(["I", "U", "D"])

# one ListArray holds at most 2^31-1 token values (int32 offsets); corpora
# whose total token count exceeds this are generated in segments and the
# table's columns come out chunked. Module-level so tests can shrink it.
_MAX_LIST_VALUES = 1_500_000_000


@dataclass
class BinlogSpec:
    n_events: int = 100_000
    n_keys: int = 10_000
    seed: int = 42
    # insert/update/delete mix (dailytest default-ish 60/30/10)
    p_insert: float = 0.6
    p_update: float = 0.3
    p_delete: float = 0.1
    # hot-key skew: zipf-ish; 0 = uniform. fraction of events drawn from the
    # hottest `hot_keys` keys (region hot-spot analog).
    hot_frac: float = 0.0
    hot_keys: int = 1
    # fraction of events that share a commit_ts with the previous event
    # (txn with multiple rows / resolved-ts tie cases)
    tie_frac: float = 0.2
    # fraction of DELETE events that are immediately followed by a PUT at the
    # SAME (commit_ts, seq) — exercises delete-before-put op_rank ordering
    # (entry_sorter.go:62-72): the put must win.
    dup_seq_tie_frac: float = 0.05
    # shuffle events within each partition to simulate out-of-order arrival
    out_of_order: bool = True
    n_parts: int = 8
    table: str = "target_tokens"
    min_tok: int = 4
    max_tok: int = 64
    vocab: int = 50_000
    start_ts: int = 1_000_000


def _keys(rng: np.random.Generator, spec: BinlogSpec) -> np.ndarray:
    """Pick a key index per event with optional hot-key skew."""
    n = spec.n_events
    uniform = rng.integers(0, spec.n_keys, size=n)
    if spec.hot_frac <= 0:
        return uniform
    hot_mask = rng.random(n) < spec.hot_frac
    hot = rng.integers(0, max(1, spec.hot_keys), size=n)
    return np.where(hot_mask, hot, uniform)


def generate_binlog(spec: BinlogSpec) -> pa.Table:
    """Return the binlog as one pyarrow Table (schema = model.BINLOG_SCHEMA)."""
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events

    key_idx = _keys(rng, spec)
    doc_id = np.char.add("doc_", key_idx.astype("U12"))

    op_idx = rng.choice(3, size=n, p=[spec.p_insert, spec.p_update, spec.p_delete])
    op = OPS[op_idx]

    # commit_ts: non-decreasing with ties (consecutive events share a ts with
    # prob tie_frac); seq = global arrival order within the ts stream
    advance = (rng.random(n) >= spec.tie_frac).astype(np.int64)
    advance[0] = 1
    commit_ts = spec.start_ts + np.cumsum(advance)
    seq = np.arange(n, dtype=np.int64)

    # delete+put same-(commit_ts, seq) pairs: for a sample of deletes, clone
    # the row as a PUT with identical commit_ts and seq — op_rank must decide.
    del_pos = np.flatnonzero(op == "D")
    n_pairs = int(len(del_pos) * spec.dup_seq_tie_frac)
    pair_pos = rng.choice(del_pos, size=n_pairs, replace=False) if n_pairs else np.array([], dtype=np.int64)

    # payload (only for non-delete rows; deletes carry NULL after-image,
    # cdc/model/sink.go:238-240)
    n_tok = rng.integers(spec.min_tok, spec.max_tok + 1, size=n).astype(np.int32)
    total = int(n_tok.sum())
    token_values = rng.integers(0, spec.vocab, size=total, dtype=np.int32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    sources = np.array(["web", "book", "code", "wiki"])[rng.integers(0, 4, size=n)]

    part = (key_idx % spec.n_parts).astype(np.int32)

    def build(sel: np.ndarray, force_put: bool) -> dict[str, pa.Array]:
        o = np.full(sel.shape, "U") if force_put else op[sel]
        is_del = o == "D"
        contiguous = len(sel) and sel[-1] - sel[0] + 1 == len(sel)
        if contiguous:
            vals = token_values[offsets[sel[0]] : offsets[sel[-1] + 1]]
        elif len(sel):
            vals = np.concatenate([token_values[offsets[i] : offsets[i + 1]] for i in sel])
        else:
            vals = np.array([], dtype=np.int32)
        toks = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(n_tok[sel])]), type=pa.int32()),
            pa.array(vals, type=pa.int32()),
        )
        mask = pa.array(is_del)
        return {
            "commit_ts": pa.array(commit_ts[sel], type=pa.int64()),
            "seq": pa.array(seq[sel], type=pa.int64()),
            "table": pa.array(np.full(len(sel), spec.table)),
            "op": pa.array(o),
            "doc_id": pa.array(doc_id[sel]),
            "tokens": _mask_list(toks, mask),
            "n_tok": pa.array(np.ma.masked_array(n_tok[sel], mask=is_del)),
            "source": pa.array(np.ma.masked_array(sources[sel], mask=is_del)),
            "part": pa.array(part[sel], type=pa.int32()),
            "schema_version": pa.array(np.zeros(len(sel), dtype=np.int32)),
        }

    # a single ListArray carries int32 value offsets, so one build() call
    # must stay under 2^31 token values — segment large corpora. Sort /
    # shuffle SEGMENT-WISE too: a global sort_by/take over the chunked list
    # column concatenates chunks internally and overflows the same int32
    # offsets (pyarrow "offset overflow while concatenating arrays", hit at
    # 10^8 events). Segments are contiguous commit-ts ranges and each
    # tie-pair clone lands in its delete's own segment, so per-segment sort
    # + concat IS the global sort; out_of_order shuffles within segments
    # (arrival interleaving is what the shuffle models — a ~44M-row window
    # is far beyond any real reorder horizon).
    max_vals = _MAX_LIST_VALUES
    sort_keys = [
        ("commit_ts", "ascending"),
        ("seq", "ascending"),
        ("op", "ascending"),
    ]
    if total > max_vals:
        n_seg = int(np.ceil(total / max_vals))
        bounds = np.linspace(0, n, n_seg + 1, dtype=np.int64)
        segs = []
        for i in range(n_seg):
            t = pa.table(
                build(np.arange(bounds[i], bounds[i + 1]), force_put=False)
            )
            pp = pair_pos[(pair_pos >= bounds[i]) & (pair_pos < bounds[i + 1])]
            if len(pp):
                t = pa.concat_tables([t, pa.table(build(pp, force_put=True))])
            if spec.out_of_order:
                t = t.take(pa.array(rng.permutation(len(t))))
            else:
                t = t.sort_by(sort_keys)
            segs.append(t)
        return pa.concat_tables(segs)
    tbl = pa.table(build(np.arange(n), force_put=False))
    if len(pair_pos):
        # regenerate fresh payload for the cloned puts so the winner is distinct
        extra = build(pair_pos, force_put=True)
        tbl = pa.concat_tables([tbl, pa.table(extra)])

    if spec.out_of_order:
        # shuffle full arrival order (puller receives regions interleaved)
        perm = rng.permutation(len(tbl))
        tbl = tbl.take(pa.array(perm))
    else:
        # ordered arrival: the concat above appended tie-pair clones at the
        # END — re-sort so position slices are true commit-ts ranges ("D" <
        # "U" lexicographically = delete-before-put at a (ts, seq) tie)
        tbl = tbl.sort_by(
            [("commit_ts", "ascending"), ("seq", "ascending"), ("op", "ascending")]
        )
    return tbl


def _mask_list(arr: pa.ListArray, mask: pa.BooleanArray) -> pa.ListArray:
    """Apply a null mask to a list array (deletes carry NULL tokens)."""
    if not pa.compute.any(mask).as_py():
        return arr
    indices = pa.compute.if_else(mask, pa.scalar(None, pa.int64()), pa.array(np.arange(len(arr)), pa.int64()))
    return arr.take(indices)


def write_binlog(
    spec: BinlogSpec, out_dir: str, files_per_part: int = 1, align_ts: bool = False
) -> str:
    """Write the binlog as parquet under out_dir (one or more files).

    Multiple files let Structured Streaming pick them up as separate
    micro-batch inputs (maxFilesPerTrigger).

    align_ts=True (requires out_of_order=False) pushes every file boundary
    forward past commit_ts ties so no ts group straddles two files — the
    arrival shape the puller's per-span no-late contract demands (a tie
    group split across micro-batches would re-deliver a ts at or below the
    released span watermark, puller.go:163-168).
    """
    os.makedirs(out_dir, exist_ok=True)
    tbl = generate_binlog(spec)
    nfiles = max(1, files_per_part)
    step = (len(tbl) + nfiles - 1) // nfiles
    if align_ts:
        if spec.out_of_order:
            raise ValueError("align_ts requires out_of_order=False")
        ts = tbl.column("commit_ts").to_numpy()
        bounds = [0]
        for i in range(1, nfiles):
            b = max(i * step, bounds[-1])
            while 0 < b < len(tbl) and ts[b] == ts[b - 1]:
                b += 1
            bounds.append(min(b, len(tbl)))
        bounds.append(len(tbl))
        for i, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
            if hi > lo:
                pq.write_table(
                    tbl.slice(lo, hi - lo),
                    os.path.join(out_dir, f"binlog-{i:05d}.parquet"),
                )
        return out_dir
    for i in range(nfiles):
        chunk = tbl.slice(i * step, step)
        if len(chunk):
            pq.write_table(chunk, os.path.join(out_dir, f"binlog-{i:05d}.parquet"))
    return out_dir


def write_resolved_events(
    out_dir: str,
    ts_by_part: dict[int, int],
    table: str = "target_tokens",
    fname: str = "resolved-00000.parquet",
    raw: bool = False,
) -> str:
    """Append resolved-ts CONTROL events (op='R', model.OP_RESOLVED) to a
    binlog dir: one heartbeat row per (part → resolved ts). The kv-client
    analog of per-region resolved-ts events (kv/client.go → puller) — an
    idle span advances its frontier through these, with no data rows.
    Payload columns are NULL; doc_id/seq are placeholders (never applied).
    raw=True emits the raw-mode shape (one NULL payload-json column)."""
    import os as _os

    n = len(ts_by_part)
    parts = sorted(ts_by_part)
    cols = {
        "commit_ts": pa.array([int(ts_by_part[p]) for p in parts], pa.int64()),
        "seq": pa.array([0] * n, pa.int64()),
        "table": pa.array([table] * n, pa.string()),
        "op": pa.array(["R"] * n, pa.string()),
        "doc_id": pa.array([""] * n, pa.string()),
        "tokens": pa.array([None] * n, pa.list_(pa.int32())),
        "n_tok": pa.array([None] * n, pa.int32()),
        "source": pa.array([None] * n, pa.string()),
        "part": pa.array(parts, pa.int32()),
        "schema_version": pa.array([0] * n, pa.int32()),
    }
    if raw:
        for c in ("tokens", "n_tok", "source"):
            del cols[c]
        cols["payload"] = pa.array([None] * n, pa.string())
    tbl = pa.table(cols)
    _os.makedirs(out_dir, exist_ok=True)
    path = _os.path.join(out_dir, fname)
    pq.write_table(tbl, path)
    return path


def write_topology_events(
    out_dir: str,
    changes: list[tuple[str, int, list[int], int]],
    table: str = "target_tokens",
    fname: str = "topology-00000.parquet",
) -> str:
    """Append span-topology CONTROL events (model.TOPOLOGY_OPS) to a binlog
    dir — the kv-client region split/merge analog. `changes` is a list of
    (op, part, spec, commit_ts):
      ("S", parent, [child ids...], ts)  — parent splits into children
      ("M", child, [parent ids...], ts)  — parents merge into child
    The spec rides doc_id as a CSV (control rows carry no data payload);
    seq enumerates the list so same-ts changes stay ordered."""
    import os as _os

    n = len(changes)
    cols = {
        "commit_ts": pa.array([int(ts) for _, _, _, ts in changes], pa.int64()),
        "seq": pa.array(list(range(n)), pa.int64()),
        "table": pa.array([table] * n, pa.string()),
        "op": pa.array([op for op, _, _, _ in changes], pa.string()),
        "doc_id": pa.array(
            [",".join(str(x) for x in spec) for _, _, spec, _ in changes],
            pa.string(),
        ),
        "tokens": pa.array([None] * n, pa.list_(pa.int32())),
        "n_tok": pa.array([None] * n, pa.int32()),
        "source": pa.array([None] * n, pa.string()),
        "part": pa.array([int(p) for _, p, _, _ in changes], pa.int32()),
        "schema_version": pa.array([0] * n, pa.int32()),
    }
    tbl = pa.table(cols)
    _os.makedirs(out_dir, exist_ok=True)
    path = _os.path.join(out_dir, fname)
    pq.write_table(tbl, path)
    return path


def write_binlog_chunks(
    spec: BinlogSpec, out_dir: str, n_chunks: int = 4, files_per_chunk: int = 8
) -> list[str]:
    """Write the binlog as `n_chunks` arrival chunks (chunk-00000/ ...).

    The pre-shuffle event order is commit-ts-nondecreasing, so position
    slices are commit-ts ranges — each chunk is one micro-batch's worth of
    new files, shuffled internally to simulate out-of-order delivery within
    the batch (what maxFilesPerTrigger feeds a real streaming epoch).
    Unlike a single flat directory, an epoch replay reads ONLY its chunk —
    per-epoch IO scales with epoch size, not stream length.
    """
    import time as _time

    rng = np.random.default_rng(spec.seed + 1)
    base_spec = BinlogSpec(**{**spec.__dict__, "out_of_order": False})
    tbl = generate_binlog(base_spec)
    os.makedirs(out_dir, exist_ok=True)
    step = (len(tbl) + n_chunks - 1) // n_chunks
    dirs = []
    t0 = _time.time()
    for c in range(n_chunks):
        chunk = tbl.slice(c * step, step)
        if not len(chunk):
            break
        perm = rng.permutation(len(chunk))
        chunk = chunk.take(pa.array(perm))
        cdir = os.path.join(out_dir, f"chunk-{c:05d}")
        os.makedirs(cdir, exist_ok=True)
        fstep = (len(chunk) + files_per_chunk - 1) // files_per_chunk
        for i in range(files_per_chunk):
            part = chunk.slice(i * fstep, fstep)
            if len(part):
                path = os.path.join(cdir, f"binlog-{i:05d}.parquet")
                pq.write_table(part, path)
                # strictly increasing mtime per CHUNK: the file stream
                # source orders files by modification time, and a tie at a
                # chunk boundary would mix two chunks into one trigger —
                # later files of the earlier chunk then arrive BELOW the
                # released frontier (late), which old-value mode rejects
                os.utime(path, (t0 + c * 2, t0 + c * 2))
        dirs.append(cdir)
    return dirs


def binlog_to_raw(
    tbl: pa.Table,
    ddls: list[tuple[int, str, dict]] | None = None,
    lang_values: tuple[str, ...] = ("en", "de", "fr", "zh", "es"),
    seed: int = 7,
) -> pa.Table:
    """Re-encode a typed binlog as the RAW wire form: payload = JSON string,
    schema_version = #{ddl : finished_ts < commit_ts} (the snapshot-at-CRTs-1
    rule, cdc/entry/mounter.go:242-247). Events at versions that include an
    added `lang` field carry a value for it; renames change the JSON key.

    Test-side generator — per-row Python is fine here (never in the engine).
    """
    import bisect

    from .streaming.registry import SchemaRegistry

    base = [
        {"id": 1, "name": "doc_id", "type": "string"},
        {"id": 2, "name": "tokens", "type": "array<int>"},
        {"id": 3, "name": "n_tok", "type": "int"},
        {"id": 4, "name": "source", "type": "string"},
    ]
    reg = SchemaRegistry(base, ddls or [])
    rng = np.random.default_rng(seed)
    d = tbl.to_pydict()
    n = len(tbl)
    langs = rng.integers(0, len(lang_values), size=n)
    payloads, versions = [], []
    for i in range(n):
        v = bisect.bisect_left(reg.ddl_ts, d["commit_ts"][i])
        versions.append(v)
        if d["op"][i] == "D":
            payloads.append(None)
            continue
        fields = [f for f in reg.fields(v) if f["name"] != "doc_id"]
        vals = {}
        for f in fields:
            if f["id"] == 2:
                vals[f["name"]] = d["tokens"][i]
            elif f["id"] == 3:
                vals[f["name"]] = d["n_tok"][i]
            elif f["id"] == 4:
                vals[f["name"]] = d["source"][i]
            else:  # added columns (e.g. lang)
                vals[f["name"]] = lang_values[langs[i]]
        payloads.append(json.dumps(vals))
    return pa.table(
        {
            "commit_ts": pa.array(d["commit_ts"], pa.int64()),
            "seq": pa.array(d["seq"], pa.int64()),
            "table": pa.array(d["table"]),
            "op": pa.array(d["op"]),
            "doc_id": pa.array(d["doc_id"]),
            "payload": pa.array(payloads, pa.string()),
            "part": pa.array(d["part"], pa.int32()),
            "schema_version": pa.array(versions, pa.int32()),
        }
    )


def write_raw_binlog(tbl: pa.Table, out_dir: str, n_files: int = 1) -> str:
    os.makedirs(out_dir, exist_ok=True)
    step = (len(tbl) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = tbl.slice(i * step, step)
        if len(chunk):
            pq.write_table(chunk, os.path.join(out_dir, f"raw-{i:05d}.parquet"))
    return out_dir


@dataclass
class DDLSpec:
    """FIXTURES.md F3 — add / widen / rename DDLs at fixed barrier points."""

    table: str = "target_tokens"
    ddls: list[tuple[int, str, dict]] = field(default_factory=list)

    def to_table(self) -> pa.Table:
        return pa.table(
            {
                "commit_ts": pa.array([ts for ts, _, _ in self.ddls], pa.int64()),
                "ddl_type": pa.array([t for _, t, _ in self.ddls]),
                "table": pa.array([self.table] * len(self.ddls)),
                "spec": pa.array([json.dumps(s) for _, _, s in self.ddls]),
            }
        )


def write_ddl(spec: DDLSpec, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(spec.to_table(), os.path.join(out_dir, "ddl-00000.parquet"))
    return out_dir


# --- keyless (force-replicate) binlog -----------------------------------------


def generate_keyless_binlog(
    n_rows: int,
    seed: int = 0,
    dup_frac: float = 0.1,
    touch_frac: float = 0.4,
    n_chunks: int = 4,
    min_tok: int = 4,
    max_tok: int = 64,
    vocab: int = 50_000,
    start_ts: int = 1_000_000,
    n_parts: int = 8,
    table: str = "keyless_tokens",
):
    """A CONSISTENT keyless-table history (schema model.KEYLESS_BINLOG_SCHEMA),
    returned as one pyarrow Table in commit order plus the expected final
    multiset size. doc_id deliberately collides (it is NOT a key — the whole
    row is the identity); a dup_frac sample of rows is inserted twice so the
    multiset has real multiplicities.

    Consistency by construction (so KeylessTable's negative-multiplicity
    guard never fires on valid data): chunk 0 is all inserts; later chunks
    delete or update DISJOINT subsets of base rows, each at most once, with
    strictly later commit_ts. Chunk boundaries are commit-ts splits, so any
    chunk-prefix replay is also a valid history.
    """
    rng = np.random.default_rng(seed)
    n_tok = rng.integers(min_tok, max_tok + 1, size=n_rows).astype(np.int32)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    token_values = rng.integers(0, vocab, size=int(offsets[-1]), dtype=np.int32)
    # colliding doc_ids: ~4 rows share each id
    doc_id = np.char.add("doc_", (np.arange(n_rows) % max(1, n_rows // 4)).astype("U12"))
    sources = np.array(["web", "book", "code", "wiki"])[rng.integers(0, 4, size=n_rows)]

    def toks_of(sel: np.ndarray) -> pa.ListArray:
        if len(sel):
            vals = np.concatenate([token_values[offsets[i] : offsets[i + 1]] for i in sel])
        else:
            vals = np.array([], dtype=np.int32)
        return pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(n_tok[sel])]), type=pa.int32()),
            pa.array(vals, type=pa.int32()),
        )

    nulls_str = lambda k: pa.array([None] * k, type=pa.string())  # noqa: E731
    nulls_int = lambda k: pa.array([None] * k, type=pa.int32())  # noqa: E731
    nulls_toks = lambda k: pa.array([None] * k, type=pa.list_(pa.int32()))  # noqa: E731

    def block(sel, op, ts, seq0, old_sel=None, bump=None):
        k = len(sel)
        new_toks = toks_of(sel)
        if bump is not None:
            # updated image: first token incremented (stays a valid row)
            flat = new_toks.values.to_numpy(zero_copy_only=False).copy()
            offs = new_toks.offsets.to_numpy(zero_copy_only=False)
            flat[offs[:-1][n_tok[sel] > 0]] += 1
            new_toks = pa.ListArray.from_arrays(pa.array(offs, type=pa.int32()), pa.array(flat, type=pa.int32()))
        return {
            "commit_ts": pa.array(ts, type=pa.int64()),
            "seq": pa.array(np.arange(seq0, seq0 + k), type=pa.int64()),
            "table": pa.array(np.full(k, table)),
            "op": pa.array(np.full(k, op)),
            "doc_id": pa.array(doc_id[sel]),
            "tokens": new_toks,
            "n_tok": pa.array(n_tok[sel], type=pa.int32()),
            "source": pa.array(sources[sel]),
            "old_doc_id": pa.array(doc_id[old_sel]) if old_sel is not None else nulls_str(k),
            "old_tokens": toks_of(old_sel) if old_sel is not None else nulls_toks(k),
            "old_n_tok": pa.array(n_tok[old_sel], type=pa.int32()) if old_sel is not None else nulls_int(k),
            "old_source": pa.array(sources[old_sel]) if old_sel is not None else nulls_str(k),
            "part": pa.array((sel % n_parts).astype(np.int32)),
        }

    blocks = []
    all_idx = np.arange(n_rows)
    dup_idx = rng.choice(all_idx, size=int(n_rows * dup_frac), replace=False)
    ins_sel = np.sort(np.concatenate([all_idx, dup_idx]))
    ts = start_ts + np.arange(len(ins_sel), dtype=np.int64)
    blocks.append(block(ins_sel, "I", ts, 0))
    seq0 = len(ins_sel)
    ts0 = int(ts[-1]) + 1 if len(ts) else start_ts

    touched = rng.choice(all_idx, size=int(n_rows * touch_frac), replace=False)
    half = len(touched) // 2
    del_sel, upd_sel = np.sort(touched[:half]), np.sort(touched[half:])
    per = max(1, (len(del_sel) + n_chunks - 2) // max(1, n_chunks - 1)) if n_chunks > 1 else len(del_sel)
    for c in range(max(1, n_chunks - 1)):
        ds = del_sel[c * per : (c + 1) * per]
        us = upd_sel[c * per : (c + 1) * per]
        k = len(ds) + len(us)
        if k == 0:
            break
        if len(ds):
            blocks.append(block(ds, "D", ts0 + np.arange(len(ds)), seq0))
            seq0 += len(ds)
            ts0 += len(ds)
        if len(us):
            blocks.append(block(us, "U", ts0 + np.arange(len(us)), seq0, old_sel=us, bump=True))
            seq0 += len(us)
            ts0 += len(us)
    cols = list(blocks[0])
    tbl = pa.Table.from_pydict(
        {c: pa.concat_arrays([pa.concat_tables([pa.table({c: b[c]}) for b in blocks]).column(c).combine_chunks()]) for c in cols}
    )
    final_rows = len(ins_sel) - len(del_sel)
    return tbl, final_rows


def write_keyless_binlog_chunks(
    n_rows: int,
    out_dir: str,
    n_chunks: int = 4,
    seed: int = 0,
    files_per_chunk: int = 8,
    **kw,
) -> tuple[list[str], int]:
    """Chunked on-disk layout of generate_keyless_binlog (commit-order
    position slices = commit-ts ranges, like write_binlog_chunks).

    files_per_chunk > 1 matters for SCALING measurements: a single ~100 MB
    parquet file is one input split, so the scan + entry explode + partial
    aggregation of a whole epoch would run in ONE task no matter how many
    cores the session has (measured as a 0.65 scaling-efficiency ceiling
    before this was split)."""
    tbl, final_rows = generate_keyless_binlog(
        n_rows, seed=seed, n_chunks=n_chunks, **kw
    )
    os.makedirs(out_dir, exist_ok=True)
    step = (len(tbl) + n_chunks - 1) // n_chunks
    dirs = []
    for c in range(n_chunks):
        chunk = tbl.slice(c * step, step)
        if not len(chunk):
            break
        cdir = os.path.join(out_dir, f"chunk-{c:05d}")
        os.makedirs(cdir, exist_ok=True)
        fstep = (len(chunk) + files_per_chunk - 1) // files_per_chunk
        for i in range(files_per_chunk):
            part = chunk.slice(i * fstep, fstep)
            if len(part):
                pq.write_table(part, os.path.join(cdir, f"binlog-{i:05d}.parquet"))
        dirs.append(cdir)
    return dirs, final_rows
