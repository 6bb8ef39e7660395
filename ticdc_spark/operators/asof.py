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


def _check_collisions(
    facts: DataFrame, payload: Sequence[str], prefix: str, extra: Sequence[str] = ()
) -> None:
    """The union-window plan adds internal working columns to the fact
    frame; a caller column with one of those names would be silently
    clobbered and produce wrong output — fail loudly instead."""
    reserved = {"_side", "_ats", "_pay", *extra}
    reserved.update(prefix + c for c in payload)
    reserved.add(prefix + "ts")
    clash = reserved.intersection(facts.columns)
    if clash:
        raise ValueError(
            f"asof_join: fact columns collide with internals: {sorted(clash)}; "
            f"rename them or pick a different prefix"
        )


def _carry_exprs(payload: Sequence[str], prefix: str, w):
    """Carry ONE non-null struct per dimension row (not per-column
    ignorenulls: a version whose payload value is legitimately NULL must
    propagate that NULL with its own matched timestamp, never mix fields
    from different versions — matches DuckDB ASOF semantics)."""
    pay = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col("_ats").alias("_mts"),
            *[F.col(prefix + c).alias(prefix + c) for c in payload],
        ),
    )
    carried_struct = F.last(pay, ignorenulls=True).over(w)
    cols = [
        carried_struct.getField(prefix + c).alias(prefix + c) for c in payload
    ]
    cols.append(carried_struct.getField("_mts").alias(prefix + "ts"))
    return cols


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
    _check_collisions(facts, payload, prefix)
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
    return (
        u.select(*facts.columns, "_side", *_carry_exprs(payload, prefix, w))
        .filter(F.col("_side") == 1)
        .drop("_side")
    )


def asof_join_salted(
    facts: DataFrame,
    dims: DataFrame,
    key: str | Sequence[str],
    fact_ts: str = "ts",
    dim_ts: str = "ts",
    payload: Sequence[str] = ("value",),
    prefix: str = "asof_",
    allow_exact: bool = True,
    n_ranges: int = 16,
) -> DataFrame:
    """Skew-hardened :func:`asof_join`: identical output, but each key's
    timeline is SPLIT into ``n_ranges`` fixed-width time ranges and the
    running window partitions on (key, range) — a hot key that would sort
    as one giant task in the plain form becomes n_ranges parallel tasks
    (the salting-for-skew rule applied to a time-ordered operator).

    The trick is the carry-in: a fact in range r may need a dimension
    version from an EARLIER range. Pass 1 reduces dims to one LATEST row
    per (key, range) and as-of joins that tiny table onto the fact ranges
    over the RANGE axis (strictly earlier ranges) — O(keys x ranges) rows.
    Pass 2 seeds each (key, range) partition with its carry-in row (its
    real ts precedes every in-range ts by construction, so the ordinary
    (ts, side) ordering places it first) and runs the standard union
    window within the partition.

    Cost: the plain form's one shuffle becomes three small ones (dims
    range-reduce, carry-in join, the seeded window) — pay it when a key's
    per-epoch row count is large enough that a single sorted run dominates
    a stage; the equality property test pins output parity.
    """
    keys = [key] if isinstance(key, str) else list(key)
    _check_collisions(facts, payload, prefix, extra=("_r", "_lo", "_hi", "_t"))

    # range binning runs on a NUMERIC rendering of ts (timestamps cast to
    # epoch seconds); only monotonicity matters — the in-partition ordering
    # and the output still use the real ts column
    fact_is_ts = "timestamp" in str(facts.schema[fact_ts].dataType).lower()
    dim_is_ts = "timestamp" in str(dims.schema[dim_ts].dataType).lower()

    def _numf(c, is_ts):
        return (c.cast("timestamp").cast("double") if is_ts else c).cast("double")

    ts_all = facts.select(_numf(F.col(fact_ts), fact_is_ts).alias("_t")).unionByName(
        dims.select(_numf(F.col(dim_ts), dim_is_ts).alias("_t"))
    )
    bounds = ts_all.agg(
        F.min("_t").alias("_lo"), F.max("_t").alias("_hi")
    )

    def _rng(num_col):
        width = (F.col("_hi") - F.col("_lo") + F.lit(1.0)) / F.lit(float(n_ranges))
        return F.least(
            F.lit(n_ranges - 1),
            F.floor((num_col - F.col("_lo")) / width),
        ).cast("long")

    d = (
        dims.crossJoin(F.broadcast(bounds))
        .select(
            *[F.col(k) for k in keys],
            _rng(_numf(F.col(dim_ts), dim_is_ts)).alias("_r"),
            F.col(dim_ts).alias("_ats"),
            *[F.col(c).alias(prefix + c) for c in payload],
        )
        .withColumn("_side", F.lit(0))
    )
    f = (
        facts.crossJoin(F.broadcast(bounds))
        .withColumn("_side", F.lit(1))
        .withColumn("_ats", F.col(fact_ts))
        .withColumn("_r", _rng(_numf(F.col(fact_ts), fact_is_ts)))
        .drop("_lo", "_hi")
    )
    d = d.localCheckpoint(eager=False)  # reused: range-reduce + seeded window

    # pass 1: latest dim per (key, range), as-of joined onto the fact
    # ranges over the RANGE axis (strictly earlier ranges only)
    latest = d.groupBy(*keys, "_r").agg(
        F.max_by(
            F.struct("_ats", *[prefix + c for c in payload]), F.col("_ats")
        ).alias("_w")
    )
    fact_ranges = f.select(*keys, "_r").distinct()
    carry = asof_join(
        fact_ranges,
        latest.select(*keys, "_r", "_w"),
        key=keys,
        fact_ts="_r",
        dim_ts="_r",
        payload=("_w",),
        prefix="_c_",
        allow_exact=False,
    ).filter(F.col("_c__w").isNotNull())
    seeds = carry.select(
        *keys,
        "_r",
        F.col("_c__w._ats").alias("_ats"),
        *[F.col(f"_c__w.{prefix + c}").alias(prefix + c) for c in payload],
    ).withColumn("_side", F.lit(0))

    # pass 2: the ordinary union window, partitioned by (key, range)
    u = f.unionByName(d.drop("_lo", "_hi").unionByName(seeds), allowMissingColumns=True)
    side_order = F.col("_side").asc() if allow_exact else F.col("_side").desc()
    w = (
        Window.partitionBy(*keys, "_r")
        .orderBy(F.col("_ats").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.select(*facts.columns, "_side", *_carry_exprs(payload, prefix, w))
        .filter(F.col("_side") == 1)
        .drop("_side")
    )
