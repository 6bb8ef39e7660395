"""spark-submit --py-files launch path (the BASELINE north-rule run mode).

Packages the engine with tools/package.py, copies the job script OUTSIDE the
repo, strips the repo from PYTHONPATH, and runs a real `spark-submit
--master local[4] --py-files ticdc_spark.zip` changefeed — so every
`import ticdc_spark` in the driver AND in forked python UDF workers must
resolve from the zip, exactly as on a cluster. Verifies:

  1. the job exits 0 and reports committed batches,
  2. the submitted --master is honored (build_session must not override it),
  3. the final lake state equals the pyarrow oracle row-for-row.
"""

import json
import os
import shutil
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ticdc_spark.engine.replay import open_binlog
from ticdc_spark.lake.table import LakeTable
from ticdc_spark.operators.epochs import resolved_frontier
from ticdc_spark.oracle import apply_binlog, diff_tables
from ticdc_spark.testgen import BinlogSpec, write_binlog

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from package import build_pyfiles_zip  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _lake_arrow(table) -> pa.Table:
    pdf = table.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    return pa.table(
        {
            "doc_id": pa.array(pdf["doc_id"], pa.string()),
            "tokens": pa.array([list(t) for t in pdf["tokens"]], pa.list_(pa.int32())),
            "n_tok": pa.array(pdf["n_tok"], pa.int32()),
            "source": pa.array(pdf["source"], pa.string()),
        }
    )


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_changefeed(spark, tmp_path):
    spec = BinlogSpec(n_events=8_000, n_keys=800, seed=41, p_delete=0.15, p_insert=0.55)
    binlog = write_binlog(spec, str(tmp_path / "binlog"), files_per_part=2)
    zip_path = build_pyfiles_zip(str(tmp_path / "dist" / "ticdc_spark.zip"))

    # Job script lives outside the repo: its own sys.path hack points at
    # tmp_path, so ticdc_spark is importable ONLY via --py-files.
    job = str(tmp_path / "jobs" / "run_changefeed.py")
    os.makedirs(os.path.dirname(job))
    shutil.copy(os.path.join(REPO, "jobs", "run_changefeed.py"), job)

    table_root = str(tmp_path / "tbl")
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # nothing from the repo leaks in
    env.pop("SPARK_GRAFT_CPUS", None)
    env["SPARK_GRAFT_SHUFFLE"] = "8"
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=2g",
        "--py-files", zip_path,
        job,
        "--binlog", binlog,
        "--table", table_root,
        "--checkpoint", str(tmp_path / "ckpt"),
        "--lineage", str(tmp_path / "lineage"),
        "--available-now",
        "--buckets", "4",
    ]
    proc = subprocess.run(
        cmd, cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["batches"] >= 1
    assert all(s.get("committed", True) for s in summary["summaries"])

    t = LakeTable(spark, table_root)
    events = open_binlog(spark, binlog)
    expected = apply_binlog(pq.read_table(binlog), upto_ts=resolved_frontier(events))
    problems = diff_tables(expected, _lake_arrow(t))
    assert not problems, problems[:3]


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_submitted_master_is_honored(tmp_path):
    """build_session under spark-submit keeps --master (PYSPARK_GATEWAY_PORT
    detection) instead of silently overriding a cluster master with local[*]."""
    zip_path = build_pyfiles_zip(str(tmp_path / "dist" / "ticdc_spark.zip"))
    probe = str(tmp_path / "probe.py")
    with open(probe, "w") as f:
        f.write(
            "from ticdc_spark.session import build_session\n"
            "s = build_session('probe')\n"
            "print('MASTER=' + s.sparkContext.master)\n"
            "s.stop()\n"
        )
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    proc = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[3]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path, probe,
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "MASTER=local[3]" in proc.stdout, proc.stdout


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_curation(tmp_path):
    """The curation CLI under spark-submit --py-files: curate -> DSIR ->
    shard export, resolving ticdc_spark ONLY from the zip."""
    zip_path = build_pyfiles_zip(str(tmp_path / "dist" / "ticdc_spark.zip"))
    job = str(tmp_path / "jobs" / "run_curation.py")
    os.makedirs(os.path.dirname(job))
    shutil.copy(os.path.join(REPO, "jobs", "run_curation.py"), job)
    out = str(tmp_path / "shards")
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env.pop("SPARK_GRAFT_CPUS", None)
    env["SPARK_GRAFT_SHUFFLE"] = "8"
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=2g",
        "--py-files", zip_path,
        job,
        "--docs", "/root/testdata/sf0.001/documents.parquet",
        "--out", out,
        "--target-source", "src0",
        "--dsir-keep", "20",
        "--shards", "4",
    ]
    proc = subprocess.run(
        cmd, cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["counts"]["after_dsir"] == 20
    assert summary["counts"]["exported"] == 20
    manifest = json.load(open(os.path.join(out, "_shard_manifest.json")))
    assert sum(manifest["shards"].values()) == 20
    assert max(manifest["shards"].values()) - min(manifest["shards"].values()) <= 1


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_curation_entropy_gate(tmp_path):
    """--min-entropy/--max-top-frac drop degenerate docs between curate
    and shard export; the gate count lands in the summary."""
    zip_path = build_pyfiles_zip(str(tmp_path / "dist" / "ticdc_spark.zip"))
    job = str(tmp_path / "jobs" / "run_curation.py")
    os.makedirs(os.path.dirname(job))
    shutil.copy(os.path.join(REPO, "jobs", "run_curation.py"), job)
    out = str(tmp_path / "shards")
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env.pop("SPARK_GRAFT_CPUS", None)
    env["SPARK_GRAFT_SHUFFLE"] = "8"
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=2g",
        "--py-files", zip_path,
        job,
        "--docs", "/root/testdata/sf0.001/documents.parquet",
        "--out", out,
        "--min-entropy", "0.5",
        "--max-top-frac", "0.5",
        "--shards", "4",
    ]
    proc = subprocess.run(
        cmd, cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    c = summary["counts"]
    assert "after_entropy_gate" in c
    assert 0 < c["after_entropy_gate"] <= c["after_curate"]
    assert c["exported"] == c["after_entropy_gate"]


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_supervised_changefeed(spark, tmp_path):
    """--supervised: happy path replicates under the owner retry loop and
    converges to oracle state; a pre-failed feed is skipped with exit 1
    (failInitFeeds semantics through the CLI)."""
    from ticdc_spark.streaming.admin import FeedRegistry

    spec = BinlogSpec(n_events=6_000, n_keys=600, seed=47, p_delete=0.1)
    binlog = write_binlog(spec, str(tmp_path / "binlog"), files_per_part=2)
    zip_path = build_pyfiles_zip(str(tmp_path / "dist" / "ticdc_spark.zip"))
    job = str(tmp_path / "jobs" / "run_changefeed.py")
    os.makedirs(os.path.dirname(job))
    shutil.copy(os.path.join(REPO, "jobs", "run_changefeed.py"), job)
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env.pop("SPARK_GRAFT_CPUS", None)
    env["SPARK_GRAFT_SHUFFLE"] = "8"
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=2g",
        "--py-files", zip_path,
        job,
        "--binlog", binlog,
        "--table", str(tmp_path / "tbl"),
        "--checkpoint", str(tmp_path / "ckpt"),
        "--available-now",
        "--buckets", "4",
        "--admin-dir", str(tmp_path / "adm"),
        "--feed-name", "sup-feed",
        "--supervised", "3",
    ]
    proc = subprocess.run(
        cmd, cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out == {"outcome": "ran", "attempts": 1, "state": "normal",
                   "batches": out["batches"]} and out["batches"] >= 1

    t = LakeTable(spark, str(tmp_path / "tbl"))
    events = open_binlog(spark, binlog)
    expected = apply_binlog(pq.read_table(binlog), upto_ts=resolved_frontier(events))
    assert not diff_tables(expected, _lake_arrow(t))

    # fail the feed; the supervised run now refuses to process
    FeedRegistry(str(tmp_path / "adm")).record_error(
        "sup-feed", "boom", fast_fail=True
    )
    proc = subprocess.run(
        cmd, cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 1, proc.stdout[-1000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["outcome"] == "skipped:failed" and out["batches"] == 0


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_derived_shards_and_profile(spark, tmp_path):
    """One spark-submit command tails the binlog AND keeps the trainer
    shard export + corpus profile fresh (--derived-shards/--derived-profile
    post-batch hooks). Shard union must equal the replicated live state."""
    from ticdc_spark.pipeline.profile import IncrementalProfile
    from ticdc_spark.pipeline.shards import IncrementalShards

    spec = BinlogSpec(n_events=6_000, n_keys=600, seed=47, p_delete=0.1)
    binlog = write_binlog(spec, str(tmp_path / "binlog"), files_per_part=2)
    zip_path = build_pyfiles_zip(str(tmp_path / "dist" / "ticdc_spark.zip"))
    job = str(tmp_path / "jobs" / "run_changefeed.py")
    os.makedirs(os.path.dirname(job))
    shutil.copy(os.path.join(REPO, "jobs", "run_changefeed.py"), job)
    table_root = str(tmp_path / "tbl")
    shards_dir = str(tmp_path / "shards")
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env.pop("SPARK_GRAFT_CPUS", None)
    env["SPARK_GRAFT_SHUFFLE"] = "8"
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=2g",
        "--py-files", zip_path,
        job,
        "--binlog", binlog,
        "--table", table_root,
        "--checkpoint", str(tmp_path / "ckpt"),
        "--available-now",
        "--buckets", "8",
        "--derived-shards", shards_dir + ":4",
        "--derived-profile", "source:n_tok",
    ]
    proc = subprocess.run(
        cmd, cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["shards_synced_version"] >= 1
    assert out["profile_groups"] >= 1

    t = LakeTable(spark, table_root)
    sh = IncrementalShards(t, shards_dir, n_shards=4)
    assert sh.synced_version == t.version
    assert sh.verify(), "shard union != live state after submitted feed"
    prof = IncrementalProfile(t, "source", ("n_tok",))
    assert prof.meta["version"] == t.version
    assert prof.verify() == []


def test_ctl_tso_query_footer_stats(spark, tmp_path):
    """`changefeed_ctl.py tso` reports the binlog's committed frontier from
    parquet footer statistics alone (cmd/client_tso.go analog)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ticdc_spark.testgen import BinlogSpec, write_binlog

    binlog = str(tmp_path / "binlog")
    write_binlog(
        BinlogSpec(n_events=2_000, n_keys=200, seed=5), binlog, files_per_part=2
    )
    expected = pc.max(pq.read_table(binlog, columns=["commit_ts"])["commit_ts"]).as_py()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "changefeed_ctl.py"),
         "tso", "--binlog", binlog],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["tso"] == expected
    # file rows = data events + resolved heartbeat control rows
    assert out["n_events"] >= 2_000 and out["n_files"] > 1

def test_run_syncdiff_cli(spark, tmp_path):
    """sync-diff job: identical tables exit 0; a diverged downstream exits 1,
    flags the right bucket, and drill-down names the changed key."""
    from pyspark.sql import functions as F

    from ticdc_spark.engine.replay import replay_binlog

    binlog = write_binlog(
        BinlogSpec(n_events=4_000, n_keys=400, seed=17), str(tmp_path / "binlog")
    )
    ev = open_binlog(spark, binlog)
    a = LakeTable.create(spark, str(tmp_path / "a"), n_buckets=4)
    b = LakeTable.create(spark, str(tmp_path / "b"), n_buckets=4)
    replay_binlog(a, ev, n_epochs=2, epoch_prefix="a")
    replay_binlog(b, ev, n_epochs=2, epoch_prefix="b")

    def run(right, *extra):
        return subprocess.run(
            [sys.executable, os.path.join(REPO, "jobs", "run_syncdiff.py"),
             "--left", str(tmp_path / "a"), "--right", right,
             "--buckets", "8", "--master", "local[2]", *extra],
            capture_output=True, text=True,
        )

    proc = run(str(tmp_path / "b"))
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["match"] is True and out["divergent_buckets"] == []

    # diverge one key downstream: an update the upstream never saw
    victim = b.read().select("doc_id").orderBy("doc_id").limit(1).collect()[0][0]
    mut = b.read().filter(F.col("doc_id") == victim).select(
        "doc_id", F.lit("U").alias("op"),
        F.lit(10_000_000).alias("commit_ts"), F.lit(0).cast("long").alias("seq"),
        "tokens", F.lit(-1).cast("int").alias("n_tok"), "source",
    )
    b.merge_epoch(mut, "mutate", assume_deduped=True)

    proc = run(str(tmp_path / "b"), "--drilldown")
    assert proc.returncode == 1, (proc.stdout[-2000:], proc.stderr[-2000:])
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["match"] is False and len(out["divergent_buckets"]) == 1
    assert out["divergent_keys"] == [{"doc_id": victim, "kind": "value_diff"}]
