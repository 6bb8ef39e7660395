"""cdclog file/S3 sink — the reference's log-archive sink, byte-layout
faithful (SURVEY.md §2.2).

Reference: cdc/sink/cdclog/file.go + utils.go:220-251 —
  <root>/log.meta                      json {names: {tableID: "`db`.`tbl`"}}
  <root>/t_<tableID>/cdclog.<maxCommitTs>   mixed-build open-protocol bytes
  <root>/ddls/ddl.<2^64-1-commitTs>    one DDL message per file (reverse-ts
                                       names so the NEWEST ddl sorts first)

Message bytes are the MixedBuild layout (json.go:370-398): [8B BE version]
then per message [8B BE keyLen][key][8B BE valLen][value] — deletes frame a
zero-length value.

Spark shape: EXECUTOR-SIDE size-rotated writes — the reference rotates
files at a max size and flushes >=5MB multipart chunks precisely because a
batch does not fit one buffer (cdc/sink/cdclog/s3.go:35-42), so the sink
must never fold a table's batch into a single driver row. The plan:

  1. encode key/value JSON per row (JVM-side to_json, no Python),
  2. deterministic per-table byte prefix-sum over (commit_ts, seq) order
     (fixed-width commit_ts ranges — the same no-sampling machinery as
     pipeline/pack) → byte offset → file slot = offset div rotate_bytes,
  3. identity_repartition on the global file id (each file = one task),
     sortWithinPartitions(commit_ts, seq),
  4. mapInPandas streams mixed-framing bytes straight to the file from the
     executor, flushing every flush_bytes — per-Arrow-batch memory only,
  5. the driver collects O(files) metadata rows and only RENAMES tmp files
     to their final cdclog.<maxCommitTs> names (commit step).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.codec import (
    BATCH_VERSION_1,
    KEY_FIELDS,
    decode_open_protocol,
    pack_open_protocol_mixed,
    unpack_open_protocol_mixed,
)

MAX_UINT64 = (1 << 64) - 1


class CdclogSink:
    def __init__(self, spark: SparkSession, root: str, table_ids: dict[str, int]):
        """table_ids: table name → numeric table id (the lake has no TiDB
        table ids; callers assign stable ones)."""
        self.spark = spark
        self.root = root
        self.table_ids = dict(table_ids)
        os.makedirs(os.path.join(root, "ddls"), exist_ok=True)
        self._write_meta()

    def _write_meta(self) -> None:
        meta = {
            "names": {
                str(tid): f"`cdc`.`{name}`" for name, tid in self.table_ids.items()
            }
        }
        tmp = os.path.join(self.root, ".log.meta.tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self.root, "log.meta"))

    def emit(
        self,
        events: DataFrame,
        payload_cols: dict[str, list[str]],
        rotate_bytes: int = 100 * (1 << 20),
        flush_bytes: int = 5 * (1 << 20),
        time_ranges: int = 32,
    ) -> dict:
        """Write the batch as size-rotated cdclog files per table, events in
        (commit_ts, seq) order across the table's file sequence. File name =
        cdclog.<max commit ts in file> (file.go:111 makeTableFileName);
        rotation at rotate_bytes with flush_bytes streaming flushes mirrors
        cdc/sink/cdclog/s3.go:35-42. Event bytes NEVER pass through the
        driver — executors write the files; the driver renames O(files)
        tmp paths. Returns {table: [paths in file order]}."""
        from ..functions.partitioning import identity_repartition

        names = list(self.table_ids)
        key = F.to_json(F.struct(*[F.col(c) for c in KEY_FIELDS]))
        vpay = F.lit(None).cast("string")
        for name in names:
            vpay = F.when(
                F.col("table") == name,
                F.to_json(F.struct(*[F.col(c) for c in payload_cols[name]])),
            ).otherwise(vpay)
        val = F.when(F.col("op") != "D", vpay)
        # frame size: [8B keyLen][key][8B valLen][val]
        nb = (
            F.lit(16)
            + F.octet_length(key)
            + F.coalesce(F.octet_length(val), F.lit(0))
        )
        enc = events.filter(F.col("table").isin(names)).select(
            "table",
            "commit_ts",
            "seq",
            key.alias("_k"),
            val.alias("_v"),
            nb.alias("_nb"),
        )

        # deterministic byte prefix-sum per table over (commit_ts, seq):
        # fixed-width commit_ts ranges from one min/max metadata agg — the
        # range id is a pure function of the row (pipeline/pack discipline)
        row = enc.agg(
            F.min("commit_ts").alias("lo"), F.max("commit_ts").alias("hi")
        ).collect()[0]
        if row["lo"] is None:
            return {}
        lo, hi = int(row["lo"]), int(row["hi"])
        width = max(1, (hi - lo) // time_ranges + 1)
        pid = ((F.col("commit_ts") - F.lit(lo)) / F.lit(width)).cast("int")
        tagged = enc.withColumn("_pid", pid).persist()

        # per-(table, range) byte totals: O(tables x ranges) metadata fold
        totals = {
            (r["table"], int(r["_pid"])): int(r["t"])
            for r in tagged.groupBy("table", "_pid")
            .agg(F.sum("_nb").alias("t"))
            .collect()
        }
        prefix: dict[tuple, int] = {}
        table_total: dict[str, int] = {}
        for tbl, p in sorted(totals):
            prefix[(tbl, p)] = table_total.get(tbl, 0)
            table_total[tbl] = table_total.get(tbl, 0) + totals[(tbl, p)]
        # global file ids: contiguous slot blocks per table
        base: dict[str, int] = {}
        n_files = 0
        for tbl in sorted(table_total):
            base[tbl] = n_files
            n_files += (table_total[tbl] + rotate_bytes - 1) // rotate_bytes
        spark = events.sparkSession
        off_df = spark.createDataFrame(
            [(t, p, off, base[t]) for (t, p), off in prefix.items()],
            "table string, _pid int, _off long, _base long",
        )
        w_local = Window.partitionBy("table", "_pid").orderBy(
            "commit_ts", "seq"
        )
        start_off = F.col("_off") + F.sum("_nb").over(w_local) - F.col("_nb")
        placed = (
            tagged.join(F.broadcast(off_df), ["table", "_pid"])
            .withColumn(
                "_file_idx",
                (F.col("_base") + (start_off / rotate_bytes).cast("long")).cast(
                    "int"
                ),
            )
            .select("table", "commit_ts", "seq", "_k", "_v", "_file_idx")
        )
        routed = identity_repartition(
            placed, n_files, "_file_idx", domain=list(range(n_files))
        ).sortWithinPartitions("_file_idx", "commit_ts", "seq")

        root, tid_map = self.root, dict(self.table_ids)
        version, fl_bytes = BATCH_VERSION_1, flush_bytes

        def _write(batches):
            import struct
            import uuid

            import pandas as pd

            state: dict[int, dict] = {}
            for pdf in batches:
                for tbl, fidx, cts, k, v in zip(
                    pdf["table"], pdf["_file_idx"], pdf["commit_ts"],
                    pdf["_k"], pdf["_v"],
                ):
                    fidx = int(fidx)
                    st = state.get(fidx)
                    if st is None:
                        tdir = os.path.join(root, f"t_{tid_map[tbl]}")
                        os.makedirs(tdir, exist_ok=True)
                        tmp = os.path.join(
                            tdir, f".cdclog.tmp.{uuid.uuid4().hex}"
                        )
                        fh = open(tmp, "wb")
                        fh.write(struct.pack(">Q", version))
                        st = state[fidx] = {
                            "fh": fh, "tmp": tmp, "table": tbl,
                            "max_ts": int(cts), "n": 0, "unflushed": 0,
                        }
                    ke = k.encode("utf-8")
                    ve = b"" if v is None else v.encode("utf-8")
                    frame = (
                        struct.pack(">Q", len(ke)) + ke
                        + struct.pack(">Q", len(ve)) + ve
                    )
                    st["fh"].write(frame)
                    st["unflushed"] += len(frame)
                    if st["unflushed"] >= fl_bytes:
                        st["fh"].flush()
                        st["unflushed"] = 0
                    st["max_ts"] = max(st["max_ts"], int(cts))
                    st["n"] += 1
            rows = []
            for fidx, st in state.items():
                st["fh"].close()
                rows.append(
                    (st["table"], fidx, st["max_ts"], st["tmp"], st["n"])
                )
            yield pd.DataFrame(
                rows, columns=["table", "file_idx", "max_ts", "tmp", "n_msgs"]
            )

        written = routed.mapInPandas(
            _write,
            "table string, file_idx int, max_ts long, tmp string, n_msgs long",
        ).collect()  # O(files) metadata rows, never event data
        tagged.unpersist()

        # commit step: rename tmp -> cdclog.<max_ts> in file order; a
        # max_ts shared across rotated files gets a .<k> disambiguator
        out: dict[str, list[str]] = {}
        for r in sorted(written, key=lambda r: r["file_idx"]):
            tdir = os.path.join(root, f"t_{self.table_ids[r['table']]}")
            path = os.path.join(tdir, f"cdclog.{int(r['max_ts'])}")
            k = 1
            while os.path.exists(path):
                path = os.path.join(tdir, f"cdclog.{int(r['max_ts'])}.{k}")
                k += 1
            os.replace(r["tmp"], path)
            out.setdefault(r["table"], []).append(path)
        return out

    def emit_ddl(self, commit_ts: int, ddl_type: str, table: str, spec: dict) -> str:
        """One DDL message per file under ddls/, reverse-ts filename so the
        newest sorts FIRST (utils.go:249-251)."""
        msg = pack_open_protocol_mixed(
            [json.dumps({"ts": commit_ts, "type": "ddl", "table": table})],
            [json.dumps({"ddl_type": ddl_type, "spec": spec})],
        )
        path = os.path.join(self.root, "ddls", f"ddl.{MAX_UINT64 - commit_ts}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(msg)
        os.replace(tmp, path)
        return path


def read_cdclog_meta(root: str) -> dict[str, int]:
    """log.meta → {table name: table id} (inverts the `{"names": {id:
    "`db`.`tbl`"}}` layout the sink writes, utils.go:220-251)."""
    with open(os.path.join(root, "log.meta")) as f:
        meta = json.load(f)
    out = {}
    for tid, qualified in meta.get("names", {}).items():
        name = qualified.rsplit(".", 1)[-1].strip("`")
        out[name] = int(tid)
    return out


def read_cdclog_ddls(
    root: str, table: str | None = None, upto_ts: int | None = None
) -> list[tuple[int, str, str, dict]]:
    """Parse ddls/ddl.* (one DDL message per file, reverse-ts filenames so
    the NEWEST sorts first — utils.go:249-251) → [(ts, table, ddl_type,
    spec)] in ASCENDING ts order. Driver-side: DDLs are rare, O(#ddls)
    tiny files — the same metadata-fold budget as the manifest reads."""
    ddl_dir = os.path.join(root, "ddls")
    out = []
    if not os.path.isdir(ddl_dir):
        return out
    for fn in os.listdir(ddl_dir):
        if not fn.startswith("ddl."):
            continue
        with open(os.path.join(ddl_dir, fn), "rb") as f:
            msgs = unpack_open_protocol_mixed(f.read())
        for k, v in msgs:
            key = json.loads(k)
            val = json.loads(v) if v else {}
            ts = int(key["ts"])
            if upto_ts is not None and ts > upto_ts:
                continue
            if table is not None and key.get("table") != table:
                continue
            out.append((ts, key.get("table"), val["ddl_type"], val.get("spec", {})))
    out.sort(key=lambda r: r[0])
    return out


_WIPE_DDL = ("truncate_table", "drop_partition", "truncate_partition")


def restore_cdclog(
    spark: SparkSession,
    root: str,
    dest_root: str,
    table: str,
    base_fields: list[dict],
    n_buckets: int = 8,
    upto_ts: int | None = None,
    key_col: str = "doc_id",
    collapse: str = "bucket_window",
):
    """BR-style disaster recovery: rebuild a lake table FROM the archived
    cdclog — the whole reason the reference ships this sink (cdclog is
    consumed by BR's restore, cdc/sink/cdclog/s3.go doc; file layout
    utils.go:220-251). Returns the restored LakeTable.

    base_fields: the table's schema at the START of the log (a restore
    always begins from a backup whose meta carries the base schema); the
    archived ddls/ stream replays forward from it through a SchemaRegistry,
    and every event decodes at the schema current at CRTs-1 (the mounter's
    snapshot rule), regardless of which schema version wrote its file.

    upto_ts: point-in-time restore — apply only events/DDLs at or below it.

    Plan shape: ONE binaryFile scan of the table's cdclog files →
    Arrow-batched unframe → per-version vectorized from_json (mount_raw) →
    LWW-collapsed idempotent epoch merges, split ONLY at data-wiping DDL
    barriers (truncate/partition-drop — field DDLs need no barrier because
    every event is projected to the final schema by stable field id).
    Nothing driver-side but the O(#ddls + #files) metadata."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ..engine.replay import replay_epoch
    from ..lake.table import LakeTable
    from ..operators.mounter import mount_raw
    from .registry import SchemaRegistry

    tid = read_cdclog_meta(root)[table]
    ddls = read_cdclog_ddls(root, table=table, upto_ts=upto_ts)
    registry = SchemaRegistry(base_fields)
    for ts, _tbl, ddl_type, spec in ddls:
        registry.add_ddl(ts, ddl_type, spec, on_unsupported="skip")

    def _unpack(content):
        out = []
        for data in content:
            out.append([list(p) for p in unpack_open_protocol_mixed(data)])
        return pd.Series(out)

    unpacker = pandas_udf(_unpack, "array<array<string>>")
    files = spark.read.format("binaryFile").load(
        os.path.join(root, f"t_{tid}", "cdclog.*")
    )
    pairs = files.select(
        F.explode(unpacker(F.col("content"))).alias("_p")
    ).select(F.col("_p")[0].alias("key_json"), F.col("_p")[1].alias("value_json"))
    key_schema = T.StructType(
        [
            T.StructField("commit_ts", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("table", T.StringType()),
            T.StructField("op", T.StringType()),
            T.StructField(key_col, T.StringType()),
        ]
    )
    ev = pairs.withColumn("_k", F.from_json("key_json", key_schema)).select(
        "_k.*", F.col("value_json").alias("payload")
    )
    if upto_ts is not None:
        ev = ev.filter(F.col("commit_ts") <= upto_ts)
    # schema_version = #DDLs strictly below commit_ts (snapshot at CRTs-1)
    sv = F.lit(0)
    for ts in registry.ddl_ts:
        sv = sv + F.when(F.lit(ts) < F.col("commit_ts"), 1).otherwise(0)
    raw = ev.select(
        "commit_ts", "seq", "table", "op", key_col,
        F.lit(0).alias("part"),
        sv.cast("int").alias("schema_version"),
        "payload",
    )
    final_version = len(registry.versions) - 1
    mounted = mount_raw(
        raw, registry, final_version,
        versions_present=list(range(final_version + 1)),
    )

    dest = LakeTable.create(
        spark, dest_root,
        fields=[dict(f) for f in registry.fields(final_version)],
        n_buckets=n_buckets, key_col=key_col,
    )
    wipes = [
        (ts, kind, spec)
        for ts, kind, spec in zip(
            registry.ddl_ts, registry.ddl_kinds, registry.ddl_specs
        )
        if kind in _WIPE_DDL
    ]
    lo = None
    for k, (ts, kind, spec) in enumerate(wipes):
        seg = mounted.filter(F.col("commit_ts") <= ts)
        if lo is not None:
            seg = seg.filter(F.col("commit_ts") > lo)
        # same-ts-pre-DDL rule: DML at commit_ts == barrier applies FIRST,
        # then the wipe takes it out (delete_where stamps seq=2^62)
        replay_epoch(dest, seg, f"restore:{k}", collapse=collapse)
        if kind == "truncate_table":
            dest.truncate(f"restore:ddl:{k}")
        else:
            dest.delete_where(spec["where"], ts, f"restore:ddl:{k}")
        lo = ts
    tail = mounted if lo is None else mounted.filter(F.col("commit_ts") > lo)
    replay_epoch(dest, tail, "restore:final", collapse=collapse)
    return dest


def read_cdclog(
    spark: SparkSession, root: str, payload_schema: T.StructType
) -> DataFrame:
    """Read every table's cdclog files back into typed change rows:
    binaryFile scan → Arrow-batched unframe → JVM-side JSON decode."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _unpack(content):
        out = []
        for data in content:
            out.append([list(p) for p in unpack_open_protocol_mixed(data)])
        return pd.Series(out)

    unpacker = pandas_udf(_unpack, "array<array<string>>")
    files = spark.read.format("binaryFile").load(os.path.join(root, "t_*", "cdclog.*"))
    pairs = files.select(
        F.explode(unpacker(F.col("content"))).alias("_p")
    ).select(F.col("_p")[0].alias("key_json"), F.col("_p")[1].alias("value_json"))
    return decode_open_protocol(pairs, payload_schema)
