"""ReplicaConfig loader: pkg/config/config.go surface → feed kwargs.
Pure-python (no Spark session needed)."""

import textwrap

import pytest

from ticdc_spark.config import (
    ReplicaConfig,
    load_replica_config,
    parse_sink_uri,
)

TOML = textwrap.dedent("""\
    case-sensitive = false
    enable-old-value = true
    force-replicate = true
    check-gc-safe-point = false

    [filter]
    rules = ["cdc.target_*", "!cdc.target_secret"]
    ignore-txn-start-ts = [1, 2]
    ddl-allow-list = ["create view"]

    [mounter]
    worker-num = 8

    [sink]
    protocol = "canal-json"
    [[sink.dispatchers]]
    matcher = ["cdc.ta", "cdc.tb"]
    dispatcher = "table"
    [[sink.dispatchers]]
    matcher = ["*.*"]
    dispatcher = "ts"

    [cyclic-replication]
    enable = true
    replica-id = 2
    filter-replica-ids = [3, 4]
    sync-ddl = true
""")


def test_load_toml_full_surface(tmp_path):
    p = tmp_path / "changefeed.toml"
    p.write_text(TOML)
    cfg = load_replica_config(str(p))
    assert cfg.enable_old_value and cfg.force_replicate
    assert not cfg.check_gc_safe_point and not cfg.case_sensitive
    assert cfg.filter_rules == ["cdc.target_*", "!cdc.target_secret"]
    assert cfg.ignore_txn_start_ts == [1, 2]
    assert cfg.mounter_worker_num == 8
    assert cfg.sink_protocol == "canal-json"
    # matcher lists flatten to one (matcher, rule) pair each
    assert cfg.sink_dispatchers == [
        ("cdc.ta", "table"), ("cdc.tb", "table"), ("*.*", "ts")
    ]
    assert cfg.cyclic["replica-id"] == 2


def test_table_filter_last_match_wins():
    cfg = ReplicaConfig(filter_rules=["cdc.target_*", "!cdc.target_secret"])
    assert cfg.table_matches("target_tokens")
    assert not cfg.table_matches("target_secret")  # negation wins (later)
    assert not cfg.table_matches("other")  # no match -> excluded
    # re-allow after negation: LAST matching rule wins
    cfg2 = ReplicaConfig(
        filter_rules=["cdc.*", "!cdc.tmp_*", "cdc.tmp_keep"]
    )
    assert cfg2.table_matches("tmp_keep")
    assert not cfg2.table_matches("tmp_scratch")
    assert cfg2.table_matches("events")


def test_table_filter_defaults_and_case():
    assert ReplicaConfig().table_matches("anything")  # empty -> *.*
    ci = ReplicaConfig(filter_rules=["cdc.TARGET"])
    assert ci.table_matches("target")  # case-insensitive by default
    cs = ReplicaConfig(filter_rules=["cdc.TARGET"], case_sensitive=True)
    assert not cs.table_matches("target")
    assert cs.table_matches("TARGET")
    # bare (unqualified) patterns match the bare table name
    assert ReplicaConfig(filter_rules=["tok*"]).table_matches("tokens")


def test_feed_kwargs_mapping():
    cfg = ReplicaConfig(
        enable_old_value=True,
        sink_protocol="canal-json",
        sink_dispatchers=[("ta", "table"), ("*", "ts")],
        cyclic={"enable": True, "replica-id": 2, "filter-replica-ids": [3]},
        force_replicate=True,
        ignore_txn_start_ts=[9],
    )
    kw, notes = cfg.feed_kwargs(multi=True)
    assert kw["mq_protocol"] == "canal-json"
    assert kw["mq_old_value"] is True
    assert kw["mq_dispatch_rules"] == [("ta", "table"), ("*", "ts")]
    assert kw["cyclic"] == {"replica_id": 2, "filter_replica_ids": [3]}
    # n/a options are NOTED, not silently dropped
    assert any("force-replicate" in n for n in notes)
    assert any("ignore-txn-start-ts" in n for n in notes)
    # single-table: first dispatcher rule wins
    kw1, _ = cfg.feed_kwargs(multi=False)
    assert kw1["mq_dispatch_rule"] == "table"


def test_protocol_names_match_reference():
    # codec/interface.go:148-165 name set; unknown -> default with a note
    for ref, ours in [
        ("default", "open"), ("canal", "canal-pb"), ("canal-json", "canal-json"),
        ("avro", "avro"), ("maxwell", "maxwell"),
    ]:
        kw, _ = ReplicaConfig(sink_protocol=ref).feed_kwargs()
        assert kw["mq_protocol"] == ours
    kw, notes = ReplicaConfig(sink_protocol="craft").feed_kwargs()
    assert kw["mq_protocol"] == "open" and any("craft" in n for n in notes)


def test_parse_sink_uri():
    kw, notes = parse_sink_uri("mysql://root@10.0.0.1:3306/")
    assert kw == {} and any("MERGE" in n for n in notes)
    kw, notes = parse_sink_uri("blackhole://")
    assert kw == {} and notes
    kw, _ = parse_sink_uri(
        "kafka://broker:9092/feed-topic?protocol=maxwell&partition-num=6"
        "&enable-old-value=true",
        mq_base="/tmp/mq",
    )
    assert kw == {
        "mq_dir": "/tmp/mq/feed-topic", "mq_protocol": "maxwell",
        "mq_partitions": 6, "mq_old_value": True,
    }
    kw, _ = parse_sink_uri("file:///data/mq?protocol=canal-json")
    assert kw == {"mq_dir": "/data/mq", "mq_protocol": "canal-json"}
    with pytest.raises(ValueError):
        parse_sink_uri("kafka://b:9092/topic")  # no mq_base
    with pytest.raises(ValueError):
        parse_sink_uri("pulsar://x/y")


def test_parse_sink_uri_message_sizing():
    kw, _ = parse_sink_uri(
        "kafka://broker/topic?protocol=default&max-message-bytes=1048576"
        "&max-batch-size=8",
        mq_base="/tmp/mq",
    )
    assert kw["mq_framing"] == "sized"
    assert kw["mq_max_message_bytes"] == 1048576
    assert kw["mq_max_batch_size"] == 8
