"""Embedding clustering + semantic dedup (SemDeDup) for training-data
curation.

Two operators:

  * kmeans_assign — deterministic spherical k-means (Lloyd's) over an
    embedding column. Fixed-seed init (the k vectors with the smallest
    h60(vec_id) — reproducible in any engine, no rand()), a fixed number
    of iterations, cosine similarity on unit-normalized vectors. Every
    float that crosses an engine boundary is rounded to 6 digits so the
    DuckDB oracle reproduces assignments bit-for-bit.
  * semdedup — SemDeDup (Abbas et al., 2023): cluster the corpus, then
    drop any vector that has a same-cluster neighbor with cosine >= tau
    and a smaller id (one deterministic survivor per near-dup set,
    without ever comparing across clusters).

100-TB shape (this is the whole point of k-means-based curation):
  * Assignment is a MAP-ONLY pass — centroids are k x dim doubles
    (kilobytes), collected to the driver and inlined as literals, exactly
    like the changefeed's frontier folds: metadata-scale driver state,
    never data-scale.
  * The centroid update is ONE groupBy(cluster) with dim avg() aggregates
    — partial aggregation collapses each partition to <= k x dim doubles
    before the shuffle, so shuffle bytes are O(partitions x k x dim),
    independent of corpus size.
  * SemDeDup's pairwise stage is confined to single clusters. k is chosen
    so clusters are bounded (the paper uses ~100k clusters for billions of
    points); the self-join shuffles on the cluster id, and the quadratic
    term is (corpus/k)^2 per cluster — the knob that keeps it from ever
    being all-pairs.

Reference analog: the reference has no clustering (it is a CDC engine);
this extends the same curated-table surface the dedup family serves
(SURVEY.md LLM-pipeline addendum). Cross-engine hashing per
functions/hashing.py.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60
from .similarity import _dot, _norm


def _unit(vec: Column) -> Column:
    """Unit-normalize an array<float> to array<double>. Per-element double
    division — bit-identical in Spark and DuckDB (no summation-order
    ambiguity: the norm's fold runs in array order in both engines)."""
    n = _norm(vec)
    return F.transform(vec, lambda x: x.cast("double") / n)


def seed_centroids(
    emb: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[tuple[int, list[float]]]:
    """The k deterministic seeds: rows with the smallest
    (h60(id), id), cluster c = rank order. Components rounded to 6 digits
    (the same rule every later centroid follows)."""
    unit_df = emb.select(F.col(id_col), _unit(F.col(vec_col)).alias("u"))
    return _seed_from_unit(unit_df, k, id_col)


def _seed_from_unit(
    unit_df: DataFrame, k: int, id_col: str
) -> list[tuple[int, list[float]]]:
    """Seed selection over an already unit-normalized (id, u) frame — lets
    kmeans_assign/semdedup reuse one checkpointed normalization across
    seed + every Lloyd pass instead of re-deriving it per pass.

    orderBy+limit compiles to TakeOrderedAndProject — a distributed
    per-partition top-k merged on the driver, never a global sort (the
    SQL oracle's row_number window is the semantic spec, not the plan)."""
    rows = (
        unit_df.select(
            h60(F.col(id_col).cast("string")).alias("_h"),
            F.col(id_col).alias("_id"),
            F.transform(F.col("u"), lambda x: F.round(x, 6)).alias("u"),
        )
        .orderBy("_h", "_id")
        .limit(k)
        .collect()
    )
    ordered = sorted(rows, key=lambda r: (r["_h"], r["_id"]))
    return [(c, list(r["u"])) for c, r in enumerate(ordered)]


def _assign(
    unit_df: DataFrame, cents: list[tuple[int, list[float]]]
) -> DataFrame:
    """Map-only argmax assignment: sim_c = round(dot(u, cent_c), 6); ties
    go to the smallest cluster id. Centroids are inlined literals — no
    join, no shuffle."""
    scored = F.array(
        *[
            F.struct(
                F.round(_dot(F.col("u"), F.array(*[F.lit(float(v)) for v in cent])), 6).alias(
                    "sim"
                ),
                F.lit(-c).alias("negc"),
            )
            for c, cent in cents
        ]
    )
    # array_max by struct order = (max sim, then max negc = smallest c):
    # identical to sort-desc[0] without materializing the sorted array.
    best = F.array_max(scored)
    return unit_df.withColumn("cluster", (-best["negc"]).cast("int")).withColumn(
        "cos_sim", best["sim"]
    )


def _update(unit_df: DataFrame, dim: int) -> list[tuple[int, list[float]]]:
    """One Lloyd centroid update: per-dim avg, renormalize, round 6.
    Single groupBy(cluster) with dim avg aggregates (map-side combine);
    clusters that lost every point simply drop out (both engines agree:
    a GROUP BY has no row for an empty group). Norm is a left-to-right
    fold over dimensions, matching DuckDB's list_dot_product order."""
    avgs = unit_df.groupBy("cluster").agg(
        *[F.avg(F.col("u")[i]).alias(f"a_{i}") for i in range(dim)]
    )
    norm = F.sqrt(
        reduce(lambda acc, i: acc + F.col(f"a_{i}") * F.col(f"a_{i}"), range(1, dim), F.col("a_0") * F.col("a_0"))
    )
    rows = avgs.select(
        "cluster",
        F.array(*[F.round(F.col(f"a_{i}") / norm, 6) for i in range(dim)]).alias("cent"),
    ).collect()
    return sorted((int(r["cluster"]), list(r["cent"])) for r in rows)


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic spherical k-means: returns (id, cluster, cos_sim)
    where cluster is the argmax-cosine centroid after `iters` Lloyd
    updates from the hash-seeded init. `iters` is FIXED (not
    convergence-tested) so the computation is a finite, engine-agnostic
    plan a SQL oracle can replay CTE-for-CTE.

    The normalized frame is localCheckpoint-ed once: seed + every Lloyd
    pass + the final assignment all scan it, and without the checkpoint
    each pass re-reads parquet and re-runs the dim divisions."""
    unit_df = emb.select(
        F.col(id_col), _unit(F.col(vec_col)).alias("u")
    ).localCheckpoint(eager=False)
    cents = _seed_from_unit(unit_df, k, id_col)
    for _ in range(iters):
        cents = _update(_assign(unit_df, cents), dim)
    return _assign(unit_df, cents).select(
        F.col(id_col), F.col("cluster"), F.col("cos_sim")
    )


def semdedup(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pair_slices: int = 8,
) -> DataFrame:
    """SemDeDup: within each k-means cluster, drop any vector with a
    same-cluster neighbor at cosine >= threshold and a smaller id.
    Returns (id, cluster, kept) for every input vector — the dedup
    DECISION, composable with the corpus the same way dedup_clusters is.

    The pairwise join is per-cluster (shuffle on cluster id), never
    corpus-wide; survivors are chosen by min-id so the output is
    order-independent and idempotent.

    Plan notes: the assigned point set feeds three consumers (both sides
    of the pairwise join and the final keep-join), so it is
    localCheckpoint-ed once — otherwise the whole k-means argmax subtree
    re-executes per consumer. And the pairwise join is salted by
    hash(vid) % pair_slices on the build side (probe side replicated to
    every slice), lifting parallelism from k tasks to k x pair_slices —
    with small k the per-cluster quadratic otherwise serializes onto k
    cores regardless of cluster size."""
    unit_df = emb.select(
        F.col(id_col), _unit(F.col(vec_col)).alias("u")
    ).localCheckpoint(eager=False)
    cents = _seed_from_unit(unit_df, k, id_col)
    for _ in range(iters):
        cents = _update(_assign(unit_df, cents), dim)
    pts = (
        _assign(unit_df, cents)
        .select(F.col(id_col).alias("vid"), F.col("cluster"), F.col("u"))
        .localCheckpoint(eager=False)
    )
    s = pair_slices
    b = pts.withColumn(
        "_slice", F.pmod(F.xxhash64(F.col("vid")), F.lit(s)).cast("int")
    ).repartition(k * s, "cluster", "_slice")
    a = pts.withColumn(
        "_slice", F.explode(F.array(*[F.lit(i) for i in range(s)]))
    ).repartition(k * s, "cluster", "_slice")
    dropped = (
        a.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a._slice") == F.col("b._slice"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .filter(F.round(_dot(F.col("a.u"), F.col("b.u")), 6) >= threshold)
        .select(F.col("b.vid").alias("vid"))
        .distinct()
        .withColumn("is_dropped", F.lit(1))
    )
    return (
        pts.join(dropped, "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            "cluster",
            F.when(F.col("is_dropped").isNull(), 1).otherwise(0).alias("kept"),
        )
    )
