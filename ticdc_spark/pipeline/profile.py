"""CDC-maintained corpus profile — IncrementalProfile.

The dashboard every training-data pipeline keeps: per-stratum (source,
language, shard …) document counts and token totals/moments over the LIVE
corpus. A full recount after every ingest epoch is O(corpus); these stats
are EXACTLY additive under the changelog algebra, so the profile updates
from the changed keys' old images (stats out) and new images (stats in) —
read volume ∝ change volume, the same epoch-derived-state primitive as
IncrementalChecksum / IncrementalNB / IncrementalShards
(lake.verify.change_images does the version-pinned old-image reads).

Maintained per group g:

    n_docs(g)   = count of live docs
    <c>_sum(g)  = Σ c           (for each declared numeric stat column)
    <c>_sq(g)   = Σ c²          (second moment → variance/σ without a pass)

All three are group-wise sums over live rows, so removing a key's old image
and adding its new image is subtraction/addition — intermediate versions
cancel algebraically. Deletes subtract; a group whose last doc leaves nets
to an all-zero row and is dropped. min/max are deliberately NOT maintained
(not additive under deletes — a max leaving would force a group rescan);
the batch profile query covers those.

Fallback rule (shared with every changelog consumer): a non-append-only
range (truncate / modify-column / compaction) triggers ONE full recount at
the target version (lake.verify.range_is_append_only).

State: ``<table>/_profile/meta.json`` (atomic tmp+replace, version-stamped)
+ one parquet snapshot per synced version — the profile is bounded by the
number of groups (thousands), so the snapshot rewrite is O(groups), never
O(corpus).

Reference analog: TiCDC keeps per-changefeed/per-table statistics current
from the stream rather than recounting the sink (cdc/sink/statistics.go);
this applies that contract to corpus-level training statistics.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class IncrementalProfile:
    """Changelog-maintained per-group stats over a LakeTable.

    Invariant (the check every test drives):

        profile() ≡ live-state groupBy at the synced version
    """

    def __init__(self, table, group_col: str, stat_cols: tuple[str, ...]):
        self.table = table
        self.spark = table.spark
        self.group_col = group_col
        self.stat_cols = tuple(stat_cols)
        types = {f["name"]: str(f.get("type", "")) for f in table.current_fields}
        missing = ({group_col, *stat_cols}) - set(types)
        if missing:
            raise ValueError(f"columns not in table schema: {sorted(missing)}")
        # per-column sum type: fractional stats sum as double (a long cast
        # would silently truncate 0.7 → 0), integral stats stay exact longs
        self._sum_type: dict[str, str] = {}
        for c in self.stat_cols:
            t = types[c].lower()
            if any(x in t for x in ("double", "float", "decimal")):
                self._sum_type[c] = "double"
            elif any(x in t for x in ("long", "bigint", "int", "short", "byte")):
                self._sum_type[c] = "long"
            else:
                raise ValueError(
                    f"stat column {c!r} has non-numeric type {types[c]!r}"
                )
        self.root = os.path.join(table.root, "_profile")
        os.makedirs(os.path.join(self.root, "snap"), exist_ok=True)
        self._meta_path = os.path.join(self.root, "meta.json")
        self.meta = {"version": 0, "snap": None}
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                self.meta = json.load(f)

    # -- internals -----------------------------------------------------------
    def _stat_names(self) -> list[str]:
        out = ["n_docs"]
        for c in self.stat_cols:
            out += [f"{c}_sum", f"{c}_sq"]
        return out

    def _stats_frame(self, df: DataFrame, sign: int = 1) -> DataFrame:
        """Per-group additive stats of df's rows (sign=-1 negates — the
        'counts out' side of the update)."""
        aggs = [(F.count("*") * sign).alias("n_docs")]
        for c in self.stat_cols:
            col = F.col(c).cast(self._sum_type[c])
            aggs.append((F.sum(col) * sign).alias(f"{c}_sum"))
            aggs.append((F.sum(col * col) * sign).alias(f"{c}_sq"))
        return df.groupBy(F.col(self.group_col).alias("grp")).agg(*aggs)

    def _snap_df(self) -> DataFrame:
        if self.meta["snap"] is None:
            cols = ["grp string", "n_docs long"]
            for c in self.stat_cols:
                t = self._sum_type[c]
                cols += [f"{c}_sum {t}", f"{c}_sq {t}"]
            return self.spark.createDataFrame([], ", ".join(cols))
        return self.spark.read.parquet(
            os.path.join(self.root, "snap", self.meta["snap"])
        )

    def _write_snap(self, snap: DataFrame, version: int) -> None:
        name = f"v{version:08d}"
        # bounded by the number of groups — one file is right
        snap.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.root, "snap", name)
        )
        prev = self.meta["snap"]
        self.meta["snap"] = name
        self._save_meta(version)
        if prev is not None and prev != name:
            # one live snapshot: drop the superseded one AFTER the meta
            # replace (a crash in between leaves an orphan dir, never a
            # dangling pointer)
            import shutil

            shutil.rmtree(
                os.path.join(self.root, "snap", prev), ignore_errors=True
            )

    def _save_meta(self, version: int) -> None:
        self.meta["version"] = version
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.meta, f, indent=1, sort_keys=True)
        os.replace(tmp, self._meta_path)

    @staticmethod
    def _live(df: DataFrame) -> DataFrame:
        return df.filter(F.col("op") != "D")

    # -- maintenance -----------------------------------------------------------
    def sync(self, max_lookup_keys: int = 100_000) -> dict:
        from ..lake.verify import change_images, range_is_append_only

        t = self.table
        v1 = int(t._manifest["version"])
        v0 = int(self.meta["version"])
        if v1 <= v0:
            return {"synced": False, "version": v0}
        if self.meta["snap"] is None or not range_is_append_only(t, v0, v1):
            live = t.read_version(v1)
            self._write_snap(self._stats_frame(live), v1)
            return {"synced": True, "version": v1, "mode": "full"}
        old, merged, n_changed = change_images(t, v0, v1, max_lookup_keys)
        if n_changed == 0:
            # metadata-only range: bump the version pointer, keep the snap
            self._save_meta(v1)
            return {"synced": True, "version": v1, "mode": "empty"}
        minus = self._stats_frame(self._live(old), sign=-1)
        plus = self._stats_frame(self._live(merged), sign=1)
        names = self._stat_names()
        nonzero = None
        for n in names:
            c = F.col(n) != 0
            nonzero = c if nonzero is None else (nonzero | c)
        snap = (
            self._snap_df()
            .unionByName(plus)
            .unionByName(minus)
            .groupBy("grp")
            .agg(*[F.sum(n).alias(n) for n in names])
            .filter(nonzero)
        )
        self._write_snap(snap, v1)
        return {
            "synced": True,
            "version": v1,
            "mode": "incremental",
            "changed_keys": n_changed,
        }

    # -- reads -----------------------------------------------------------------
    def profile(self) -> DataFrame:
        """(grp, n_docs, <c>_sum, <c>_sq, …) at the synced version."""
        return self._snap_df()

    def verify(self) -> list[str]:
        """Maintained stats vs a full recount at the synced version —
        [] ⟺ consistent (the audit path)."""
        live = self.table.read_version(int(self.meta["version"]))
        want = self._stats_frame(live)
        got = self._snap_df()
        names = self._stat_names()
        cond = None
        for n in names:
            c = F.coalesce(f"w_{n}", F.lit(0)) != F.coalesce(n, F.lit(0))
            cond = c if cond is None else (cond | c)
        bad = (
            want.select("grp", *[F.col(n).alias(f"w_{n}") for n in names])
            .join(got, "grp", "full_outer")
            .filter(cond)
            .count()
        )
        return [f"{bad} group-stat mismatches"] if bad else []
