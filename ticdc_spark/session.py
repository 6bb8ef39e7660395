"""SparkSession construction with the engine's scale-oriented defaults.

Defaults chosen for the 100 TB design point, scaled down for local[...] test
runs: AQE on (runtime re-plan + skew-join splitting), shuffle partitions sized
to cores locally (on a real cluster: 2-3x total cores or AQE-coalesced),
Arrow enabled for every pandas-UDF boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "ticdc-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession.

    master defaults to local[$SPARK_GRAFT_CPUS or *]. On a real cluster this
    is whatever spark-submit provides — we never override an existing master.
    """
    # Under spark-submit the gateway JVM is already up (PYSPARK_GATEWAY_PORT
    # is set) and carries the submitted --master; overriding it here would
    # silently turn a cluster job into local[*]. Only pick a local default
    # when we own the JVM launch.
    submitted = "PYSPARK_GATEWAY_PORT" in os.environ
    if master is None and not submitted:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    # Python UDF workers must be able to import this package no matter the
    # caller's cwd (the spark-submit --py-files analog: jobs run from
    # anywhere, pandas-UDF closures reference ticdc_spark.*). Prepending the
    # package's parent to PYTHONPATH before the JVM launches propagates to
    # every python worker the executors fork.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = pkg_root + (os.pathsep + pp if pp else "")
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", str(min(64, n))))

    b = SparkSession.builder.appName(app_name)
    if master is not None:
        b = b.master(master)
    b = (
        b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # CDC joins are hash-friendly: the build side is always a narrow
        # winner/dim set. SMJ would sort the wide token side — measured 3-5x
        # slower and bimodal when AQE flip-flops at the 10MB default
        # broadcast threshold. SHJ + a 64MB broadcast ceiling keeps the
        # payload un-sorted; at cluster scale the same holds per-partition.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # files.maxPartitionBytes tuned so a 100 TB scan yields ~1M tasks of
        # ~128MB — the Spark default is already right; pinned for clarity.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
