"""Round-4 ADVICE fixes, pinned.

- syncdiff row signatures are NULL/separator-unambiguous (ADVICE r3 #1:
  concat_ws silently drops NULLs, so {a:'x',b:NULL} vs {a:NULL,b:'x'} used
  to serialize identically — a divergent downstream could exit 0)
- syncdiff drill-down is manifest-pruned on shared key-bucketed layouts
- changefeed_ctl create rejects reserved keys in --set and validates
  target-ts > start-ts (cmd/client_changefeed.go verifyTargetTs)
- changefeed_ctl tso errors (exit 1) when no file carries commit_ts stats
- nb_eval_auc emits NULL (not a division error / engine-dependent value)
  on single-class samples, in both the Spark and oracle forms
"""

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

from ticdc_spark.lake.table import LakeTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mk_pair(spark, tmp_path, right_rows):
    """Two 4-bucket tables with one string-nullable payload pair."""
    fields = [
        {"id": 1, "name": "doc_id", "type": "string", "nullable": False},
        {"id": 2, "name": "a", "type": "string"},
        {"id": 3, "name": "b", "type": "string"},
    ]
    left_rows = [("k1", "x", None), ("k2", "p|q", "r")]
    out = []
    for name, rows in (("a", left_rows), ("b", right_rows)):
        t = LakeTable.create(spark, str(tmp_path / name), fields=fields, n_buckets=4)
        ch = spark.createDataFrame(
            [(d, a, b, 1, i, "I") for i, (d, a, b) in enumerate(rows)],
            "doc_id string, a string, b string, commit_ts long, seq long, op string",
        )
        t.merge_epoch(ch, "e0")
        out.append(t)
    return out


def _syncdiff(tmp_path, *extra):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_syncdiff.py"),
         "--left", str(tmp_path / "a"), "--right", str(tmp_path / "b"),
         "--master", "local[2]", *extra],
        capture_output=True, text=True,
    )


def test_syncdiff_null_swap_detected(spark, tmp_path):
    # NULL moved between columns: the old concat_ws signature collapsed
    # ('x', NULL) and (NULL, 'x') to the same string
    _mk_pair(spark, tmp_path, [("k1", None, "x"), ("k2", "p|q", "r")])
    proc = _syncdiff(tmp_path)
    assert proc.returncode == 1, (proc.stdout, proc.stderr)
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["match"] is False


def test_syncdiff_separator_forgery_detected(spark, tmp_path):
    # ('p|q', 'r') vs ('p', 'q|r'): unescaped '|' made both 'p|q|r'
    _mk_pair(spark, tmp_path, [("k1", "x", None), ("k2", "p", "q|r")])
    proc = _syncdiff(tmp_path)
    assert proc.returncode == 1, (proc.stdout, proc.stderr)


def test_syncdiff_identical_pruned(spark, tmp_path):
    _mk_pair(spark, tmp_path, [("k1", "x", None), ("k2", "p|q", "r")])
    proc = _syncdiff(tmp_path)
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["match"] is True
    # shared key-bucketed layout → physical-bucket signatures → drill-down
    # would be manifest-pruned
    assert out["drilldown_pruned"] is True and out["n_buckets"] == 4


def _ctl(*argv):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "changefeed_ctl.py"), *argv],
        capture_output=True, text=True,
    )


def test_create_rejects_reserved_set_keys(tmp_path):
    proc = _ctl("--admin-dir", str(tmp_path / "admin"), "create", "feed-x",
                "--set", "start_ts=5")
    assert proc.returncode == 1
    assert "start-ts" in proc.stderr
    # the registry must not have been touched
    assert not os.path.exists(str(tmp_path / "admin" / "feed-x.json"))


def test_create_validates_target_ts(tmp_path):
    proc = _ctl("--admin-dir", str(tmp_path / "admin"), "create", "feed-y",
                "--start-ts", "100", "--target-ts", "100",
                "--disable-gc-check")
    assert proc.returncode == 1
    assert "target-ts" in proc.stderr
    ok = _ctl("--admin-dir", str(tmp_path / "admin"), "create", "feed-y",
              "--start-ts", "100", "--target-ts", "101",
              "--disable-gc-check")
    assert ok.returncode == 0, (ok.stdout, ok.stderr)


def test_tso_without_stats_errors(spark, tmp_path):
    # parquet files exist, none carries a commit_ts column
    df = spark.range(5).select(F.col("id").alias("something_else"))
    df.coalesce(1).write.parquet(str(tmp_path / "binlog"))
    proc = _ctl("tso", "--binlog", str(tmp_path / "binlog"))
    assert proc.returncode == 1
    assert "commit_ts" in proc.stderr


def test_nb_auc_single_class_null(spark):
    from ticdc_spark.pipeline.classifier import nb_eval_auc

    docs = spark.createDataFrame(
        [(f"d{i}", f"alpha beta doc {i}", "src0") for i in range(30)],
        "doc_id string, text string, source string",
    )
    # every doc is positive → n_neg = 0 → AUC undefined → NULL, no error
    row = nb_eval_auc(docs, pos_sources=("src0",)).collect()[0]
    assert row["n_neg"] == 0 and row["auc"] is None
