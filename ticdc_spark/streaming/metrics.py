"""Prometheus exposition of changefeed metrics (textfile-collector style).

The reference instruments every stage with Prometheus gauges/counters
(cdc/metrics.go registers processor/puller/sink collectors; e.g.
cdc/processor.go:360-383 resolved-ts / checkpoint-ts gauges,
cdc/sink/statistics.go:29-132 sink row totals). A Spark driver has no
long-lived HTTP scrape endpoint to offer here, so the exporter writes the
node-exporter *textfile collector* format: one atomically-replaced .prom
file per feed, rewritten after every micro-batch — any Prometheus
deployment tails it with zero extra infrastructure, and the format is the
exposition text format verbatim.

Metric set (names mirror the reference's ticdc_* families):

  ticdc_spark_changefeed_resolved_ts       gauge, last broadcast resolved-ts
  ticdc_spark_changefeed_checkpoint_ts     gauge, applied frontier
  ticdc_spark_changefeed_batches_total     counter
  ticdc_spark_changefeed_events_total      counter (rows sunk)
  ticdc_spark_changefeed_busy_seconds_total counter (sum of stage timings)
  ticdc_spark_partition_resolved_ts        gauge per source partition
  ticdc_spark_partition_lag                gauge per source partition
                                           (events the partition trails the
                                           most-advanced one by, ts units)

All values come from driver-side state the feed already tracks (batch
summaries + the lineage table) — emitting metrics never runs a Spark job
unless per-partition gauges are requested AND a lineage dir exists.
"""

from __future__ import annotations

import os


def _esc(v: str) -> str:
    return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def render_exposition(
    feed: str,
    stats: dict,
    partition_rows: list[dict] | None = None,
) -> str:
    """stats: ChangeFeed.stats() dict. partition_rows: collected
    lag_report() rows ([{part, part_max_ts, part_resolved, lag_us,
    events_seen}]) or None to omit the per-partition families."""
    lbl = f'{{changefeed="{_esc(feed)}"}}'
    lines = [
        "# TYPE ticdc_spark_changefeed_resolved_ts gauge",
        f"ticdc_spark_changefeed_resolved_ts{lbl} "
        f"{stats.get('last_resolved_ts') or 0}",
        "# TYPE ticdc_spark_changefeed_batches_total counter",
        f"ticdc_spark_changefeed_batches_total{lbl} {stats.get('batches', 0)}",
        "# TYPE ticdc_spark_changefeed_events_total counter",
        f"ticdc_spark_changefeed_events_total{lbl} {stats.get('total_rows', 0)}",
        "# TYPE ticdc_spark_changefeed_busy_seconds_total counter",
        f"ticdc_spark_changefeed_busy_seconds_total{lbl} "
        f"{stats.get('busy_seconds', 0.0)}",
    ]
    if partition_rows is not None:
        lines.append("# TYPE ticdc_spark_partition_resolved_ts gauge")
        for r in partition_rows:
            plbl = f'{{changefeed="{_esc(feed)}",part="{int(r["part"])}"}}'
            lines.append(
                f"ticdc_spark_partition_resolved_ts{plbl} {int(r['part_resolved'])}"
            )
        lines.append("# TYPE ticdc_spark_partition_lag gauge")
        for r in partition_rows:
            plbl = f'{{changefeed="{_esc(feed)}",part="{int(r["part"])}"}}'
            lines.append(f"ticdc_spark_partition_lag{plbl} {int(r['lag_us'])}")
        # the applied frontier is min over partitions of their own position
        if partition_rows:
            ckpt = min(int(r["part_max_ts"]) for r in partition_rows)
            lines.insert(
                2,
                f"ticdc_spark_changefeed_checkpoint_ts{lbl} {ckpt}",
            )
            lines.insert(2, "# TYPE ticdc_spark_changefeed_checkpoint_ts gauge")
    return "\n".join(lines) + "\n"


class MetricsExporter:
    """Writes <dir>/<feed>.prom atomically after every batch (attach via
    ChangeFeed(post_batch=exporter.hook(cf)) or call emit() manually)."""

    def __init__(self, out_dir: str, with_partitions: bool = True):
        self.out_dir = out_dir
        self.with_partitions = with_partitions
        os.makedirs(out_dir, exist_ok=True)

    def emit(self, feed_name: str, cf) -> str:
        parts = None
        if self.with_partitions and getattr(cf, "lineage_dir", None):
            parts = [r.asDict() for r in cf.lag_report().collect()]
        text = render_exposition(feed_name, cf.stats(), parts)
        path = os.path.join(self.out_dir, f"{feed_name}.prom")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, path)
        return path

    def hook(self, cf, feed_name: str = "changefeed"):
        """A post_batch callable bound to a feed."""
        return lambda summary: self.emit(feed_name, cf)
