"""Point-in-time (as-of) join — enrich a fact stream with the most recent
dimension version at or before each fact's timestamp.

This is how a downstream consumer joins facts against a CDC-maintained
dimension's VERSION HISTORY: the lake layer already exposes versioned state
(LakeTable.read_version / syncpoints — the reference ships syncpoint
precisely so downstreams can do consistent point-in-time reads: the
primary_ts→secondary_ts map table, cdc/sink/mysql.go:1267-1428 +
syncpointStore.go:24-40), and the as-of join is the query that consumes
it. Spark has no ASOF JOIN; the naive rewrite (range join + per-fact argmax)
explodes to O(facts x versions-per-key). The scalable form is the
union-window plan:

  1. tag dimension-version rows side=0, fact rows side=1;
  2. unionByName on the shared (key, ts) spine (missing columns null-fill);
  3. ONE window per key ordered by (ts, side): last(payload, ignorenulls)
     over rowsBetween(unboundedPreceding, currentRow) carries the latest
     dimension payload forward onto every fact row — dim-before-fact at
     equal ts gives the `>=` (allow-exact) semantics, the flipped order
     gives strict `>`;
  4. keep side=1.

Scale shape: exactly ONE shuffle (hash-partition by key) + one in-partition
sort — the cost of a plain equi-join, no range explosion, no per-row
Python. Skewed keys stream through the running window without
materializing per-key state beyond the carried payload. The DuckDB oracle
is a native ASOF LEFT JOIN (the engines implement the same semantics by
entirely different plans — a strong cross-check).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    facts: DataFrame,
    dims: DataFrame,
    key: str | Sequence[str],
    fact_ts: str = "ts",
    dim_ts: str = "ts",
    payload: Sequence[str] = ("value",),
    prefix: str = "asof_",
    allow_exact: bool = True,
) -> DataFrame:
    """For every fact row, attach ``prefix+c`` for each payload column of
    the dimension row with the greatest ``dim_ts`` <= ``fact_ts`` (strictly
    ``<`` when ``allow_exact=False``) sharing ``key``, plus ``prefix+ts``
    (the matched version's timestamp). Facts with no prior version keep
    NULLs — a LEFT as-of join.

    ``dims`` must be unique per (key, dim_ts); pre-aggregate ties upstream
    (both engines would otherwise pick an arbitrary row).
    """
    keys = [key] if isinstance(key, str) else list(key)
    d = dims.select(
        *[F.col(k) for k in keys],
        F.col(dim_ts).alias("_ats"),
        *[F.col(c).alias(prefix + c) for c in payload],
    ).withColumn("_side", F.lit(0))
    f = facts.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(fact_ts))
    u = f.unionByName(d, allowMissingColumns=True)

    side_order = F.col("_side").asc() if allow_exact else F.col("_side").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ats").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(F.col(prefix + c), ignorenulls=True).over(w).alias(prefix + c)
        for c in payload
    ]
    matched_ts = F.last(
        F.when(F.col("_side") == 0, F.col("_ats")), ignorenulls=True
    ).over(w).alias(prefix + "ts")
    return (
        u.select(*facts.columns, "_side", *carried, matched_ts)
        .filter(F.col("_side") == 1)
        .drop("_side")
    )
