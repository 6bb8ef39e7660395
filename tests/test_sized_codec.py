"""Sized MQ message framing — the reference's JSONEventBatchEncoder splits
a partition's events into messages of ≤ max-batch-size events (default 16)
and ≤ max-message-bytes bytes (default 64 MiB), cdc/sink/codec/json.go:38-41
(defaults) + 394-418 (greedy split, oversized-single-event warning)."""

import json
import struct

import pytest
from pyspark.sql import functions as F

from ticdc_spark.functions.codec import (
    DEFAULT_MAX_BATCH_SIZE,
    decode_open_protocol_batched,
    encode_open_protocol_sized,
    split_open_protocol_sized,
    unpack_open_protocol_batch,
)


def _golang_reference_split(keys, values, max_batch, max_bytes):
    """Line-by-line transcription of the json.go:394-418 accumulation for
    the test oracle: messageBuf of (length, count), new message when empty,
    count-full, or the byte check fires."""
    msgs = []
    for k, v in zip(keys, values):
        klen = len(k.encode("utf-8"))
        vlen = 0 if v is None else len(v.encode("utf-8"))
        if (
            not msgs
            or msgs[-1][1] >= max_batch
            or msgs[-1][0] + klen + vlen + 16 > max_bytes
        ):
            msgs.append([8, 0])
        msgs[-1][0] += klen + vlen + 16
        msgs[-1][1] += 1
    return [n for _, n in msgs]


def _mk_events(n, vlen=20):
    keys = [json.dumps({"ts": i, "doc": f"d{i:04d}"}) for i in range(n)]
    vals = [
        None if i % 7 == 3 else json.dumps({"p": "x" * (vlen + i % 11)})
        for i in range(n)
    ]
    return keys, vals


@pytest.mark.parametrize("max_batch,max_bytes", [
    (16, 1 << 26),   # count rule only (reference defaults)
    (1000, 300),     # byte rule only
    (4, 250),        # both fire, interleaved
    (1, 50),         # degenerate: every event alone, some oversized
])
def test_split_matches_reference_semantics(max_batch, max_bytes):
    keys, vals = _mk_events(200)
    ranges = split_open_protocol_sized(keys, vals, max_batch, max_bytes)
    # contiguous, complete, ordered
    assert ranges[0][0] == 0 and ranges[-1][1] == len(keys)
    assert all(a[1] == b[0] for a, b in zip(ranges, ranges[1:]))
    # exact per-message event counts vs the transcribed go accumulation
    assert [e - s for s, e in ranges] == _golang_reference_split(
        keys, vals, max_batch, max_bytes
    )
    # invariants: count cap always; byte cap unless a single event overflows
    for s, e in ranges:
        assert e - s <= max_batch
        size = 8 + sum(
            len(keys[i].encode()) + (0 if vals[i] is None else len(vals[i].encode())) + 16
            for i in range(s, e)
        )
        if e - s > 1:
            assert size <= max_bytes


def test_oversized_single_event_ships_alone():
    # json.go:414-418: an event bigger than max-message-bytes still ships
    # (warn, don't drop) — and never shares its message
    keys = ["k1", "x" * 500, "k3", "k4"]
    vals = ["v1", "v2", "v3", "v4"]
    ranges = split_open_protocol_sized(keys, vals, 16, 100)
    sizes = [e - s for s, e in ranges]
    assert sum(sizes) == 4
    assert 1 in sizes  # the 500-byte key event is alone
    big_idx = next(i for i, (s, e) in enumerate(ranges) if 1 in range(s, e))
    assert ranges[big_idx][1] - ranges[big_idx][0] == 1


def test_encode_sized_spark_roundtrip(spark):
    rows = [
        (100 + i // 3, i, "t1", "D" if i % 9 == 4 else "U", f"doc{i % 40}",
         f"ev{i % 5}", float(i) / 4, i % 4)
        for i in range(600)
    ]
    df = spark.createDataFrame(
        rows,
        "commit_ts long, seq long, table string, op string, doc_id string, "
        "event_type string, value double, part int",
    )
    enc = encode_open_protocol_sized(
        df, ["event_type", "value"], group_col="part",
        max_batch_size=5, max_message_bytes=900,
    ).cache()
    got = enc.collect()
    # every message obeys the caps (no single event here exceeds 900B)
    assert all(r["n_events"] <= 5 for r in got)
    assert all(
        len(r["key_bytes"]) + len(r["value_bytes"]) <= 900 for r in got
    )
    # msg_idx dense per partition from 0
    by_part = {}
    for r in got:
        by_part.setdefault(r["part"], []).append(r["msg_idx"])
    for idxs in by_part.values():
        assert sorted(idxs) == list(range(len(idxs)))
    # per-partition event order across message boundaries = (commit_ts, seq)
    for p, idxs in by_part.items():
        msgs = {r["msg_idx"]: r for r in got if r["part"] == p}
        seen = []
        for i in range(len(idxs)):
            for k, _ in unpack_open_protocol_batch(
                msgs[i]["key_bytes"], msgs[i]["value_bytes"]
            ):
                d = json.loads(k)
                seen.append((d["commit_ts"], d["seq"]))
        assert seen == sorted(seen)
    # full decode == source rows
    dec = decode_open_protocol_batched(
        enc, df.select("event_type", "value").schema
    )
    src = {(r["commit_ts"], r["seq"]) for r in df.collect()}
    out = {(r["commit_ts"], r["seq"]) for r in dec.collect()}
    assert out == src
    deletes = dec.filter(F.col("op") == "D").collect()
    assert deletes and all(r["event_type"] is None for r in deletes)
    enc.unpersist()


def test_default_caps_match_reference():
    # json.go:38-41
    from ticdc_spark.functions.codec import DEFAULT_MAX_MESSAGE_BYTES

    assert DEFAULT_MAX_BATCH_SIZE == 16
    assert DEFAULT_MAX_MESSAGE_BYTES == 64 * 1024 * 1024


def test_frame_layout_byte_exact():
    keys, vals = _mk_events(10)
    ranges = split_open_protocol_sized(keys, vals, 4, 1 << 20)
    from ticdc_spark.functions.codec import pack_open_protocol_batch

    for s, e in ranges:
        kb, vb = pack_open_protocol_batch(keys[s:e], vals[s:e])
        assert struct.unpack(">Q", kb[:8])[0] == 1  # BatchVersion1
        assert unpack_open_protocol_batch(kb, vb) == [
            (keys[i], vals[i]) for i in range(s, e)
        ]
