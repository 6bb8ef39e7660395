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

Spark shape: the per-table frame is assembled with one groupBy + Arrow-
batched packer (same plan as the MQ batch framer); the file write is
driver-side like the reference's (a log file is a single object — the
reference rotates at maxRowFileSize=64MB, emit() callers control frame
size via their trigger)."""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.codec import (
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

    def emit(self, events: DataFrame, payload_cols: dict[str, list[str]]) -> dict:
        """Write one cdclog file per table containing the batch's events in
        (commit_ts, seq) order. File name = cdclog.<max commit ts in file>
        (file.go:111 makeTableFileName). Returns {table: path}."""
        key = F.to_json(F.struct(*[F.col(c) for c in KEY_FIELDS]))
        out: dict[str, str] = {}
        for name, tid in self.table_ids.items():
            cols = payload_cols[name]
            val = F.when(
                F.col("op") != "D",
                F.to_json(F.struct(*[F.col(c) for c in cols])),
            )
            sub = events.filter(F.col("table") == F.lit(name)).select(
                F.struct(
                    F.col("commit_ts"), F.col("seq"), key.alias("k"), val.alias("v")
                ).alias("_msg")
            )
            frame = sub.agg(
                F.array_sort(F.collect_list("_msg")).alias("_msgs"),
                F.max("_msg.commit_ts").alias("_max_ts"),
            ).collect()[0]
            if not frame["_msgs"]:
                continue
            data = pack_open_protocol_mixed(
                [m["k"] for m in frame["_msgs"]],
                [m["v"] for m in frame["_msgs"]],
            )
            tdir = os.path.join(self.root, f"t_{tid}")
            os.makedirs(tdir, exist_ok=True)
            path = os.path.join(tdir, f"cdclog.{int(frame['_max_ts'])}")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
            out[name] = path
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
