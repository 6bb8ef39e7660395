"""Prometheus textfile exporter: exposition format + per-batch emission."""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ticdc_spark.lake.table import LakeTable
from ticdc_spark.streaming.changefeed import ChangeFeed
from ticdc_spark.streaming.metrics import MetricsExporter, render_exposition
from ticdc_spark.testgen import BinlogSpec, write_binlog

ROOT = "/tmp/ticdc_spark_test_metrics"


def _parse(text):
    out = {}
    for line in text.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        name_labels, val = line.rsplit(" ", 1)
        out[name_labels] = float(val)
    return out


def test_render_exposition_escaping_and_families():
    stats = {"batches": 3, "total_rows": 120, "last_resolved_ts": 987,
             "busy_seconds": 1.5}
    parts = [
        {"part": 0, "part_max_ts": 980, "part_resolved": 987, "lag_us": 7,
         "events_seen": 60},
        {"part": 1, "part_max_ts": 987, "part_resolved": 987, "lag_us": 0,
         "events_seen": 60},
    ]
    text = render_exposition('feed"x', stats, parts)
    m = _parse(text)
    assert m['ticdc_spark_changefeed_resolved_ts{changefeed="feed\\"x"}'] == 987
    assert m['ticdc_spark_changefeed_batches_total{changefeed="feed\\"x"}'] == 3
    # checkpoint = min over partitions of their own position
    assert m['ticdc_spark_changefeed_checkpoint_ts{changefeed="feed\\"x"}'] == 980
    assert m['ticdc_spark_partition_lag{changefeed="feed\\"x",part="0"}'] == 7
    # every family has exactly one TYPE line
    types = [l for l in text.splitlines() if l.startswith("# TYPE")]
    assert len(types) == len({t.split()[2] for t in types}) == 7


def test_exporter_follows_feed(spark, tmp_path):
    shutil.rmtree(ROOT, ignore_errors=True)
    path = write_binlog(BinlogSpec(n_events=4_000, n_keys=400, seed=17), str(tmp_path / "binlog"))
    t = LakeTable.create(spark, str(tmp_path / "tbl"), n_buckets=4)
    exp = MetricsExporter(os.path.join(ROOT, "prom"))
    cf = ChangeFeed(
        t, path, checkpoint_dir=str(tmp_path / "ckpt"),
        lineage_dir=str(tmp_path / "lineage"),
    )
    cf.post_batch = exp.hook(cf, "feed1")
    cf.run_available()
    prom = os.path.join(ROOT, "prom", "feed1.prom")
    assert os.path.exists(prom)
    m = _parse(open(prom).read())
    s = cf.stats()
    assert m['ticdc_spark_changefeed_events_total{changefeed="feed1"}'] == s["total_rows"]
    assert m['ticdc_spark_changefeed_batches_total{changefeed="feed1"}'] == s["batches"]
    assert m['ticdc_spark_changefeed_resolved_ts{changefeed="feed1"}'] == s["last_resolved_ts"]
    # per-partition gauges present for every source partition in lineage
    nparts = sum(1 for k in m if k.startswith("ticdc_spark_partition_lag"))
    assert nparts == cf.lag_report().count() > 0
    # after a full availableNow drain the applied frontier (min over
    # partitions of their own position) IS the broadcast resolved-ts
    ckpt = m['ticdc_spark_changefeed_checkpoint_ts{changefeed="feed1"}']
    assert ckpt == m['ticdc_spark_changefeed_resolved_ts{changefeed="feed1"}'] > 0
