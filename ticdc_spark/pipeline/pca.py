"""PCA over the embeddings table — power iteration with deflation.

The dimensionality-reduction stage a 100-TB embedding pipeline runs before
ANN indexing / clustering (project 64-d vectors to the top-k principal
directions; k-means and SemDeDup then operate in the reduced space).

Spark-first split of the work by data scale:

  * O(n·d)  — the mean fold: one posexplode + groupBy(pos) avg.  Distributed.
  * O(n·d²) — the covariance fold: per-row upper-triangle outer products
              exploded (d(d+1)/2 = 2,080 structs/row at d=64) into a
              groupBy((i,j), sum).  Partial aggregation collapses every task
              to ≤2,080 rows BEFORE the shuffle, so shuffle volume is
              O(partitions·d²), never O(n·d²).  Distributed.
  * O(d³)   — the eigensolve: power iteration on the collected d×d matrix.
              4,096 doubles — a metadata-scale driver fold, same class as
              kmeans' centroid collect (pipeline/cluster.py:116) and the PQ
              codebook collect (pipeline/pq.py).  Driver.
  * O(n·d)  — the projection: dot(x − mean, component) with the components
              baked in as LITERAL arrays — map-only, whole-stage codegen,
              no shuffle, no UDF.  Distributed.

Determinism contract (the same discipline as the kmeans/PQ oracles): every
cross-stage handoff is rounded to 6 decimals — the mean, the covariance
entries, each normalized iterate, the eigenvalue, the deflated matrix, and
the final scores — so DuckDB's arbitrary-order float sums and Spark/python's
ordered sums land on identical values, and the driver's pure-python
iteration is replayed verbatim by the oracle's unrolled CTE chain.

Sign convention: the component sign is pinned by the fixed start vector
v0 = (1/√d, …, 1/√d) and the iteration count — no sign fixup needed, both
engines walk the same path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _matvec(C: list[list[float]], v: list[float]) -> list[float]:
    d = len(v)
    return [sum(C[i][j] * v[j] for j in range(d)) for i in range(d)]


def _power_iter(C: list[list[float]], v0: list[float], iters: int) -> list[float]:
    """Fixed-round power iteration; each iterate normalized then round-6
    (the oracle's v_r CTEs replay exactly this)."""
    v = v0
    for _ in range(iters):
        w = _matvec(C, v)
        nrm = math.sqrt(sum(x * x for x in w))
        v = [round(x / nrm, 6) for x in w]
    return v


def pca_components(
    embeds: DataFrame,
    k: int = 2,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[float], list[list[float]], int]:
    """Distributed mean + covariance folds, driver-side eigensolve.
    Returns (mean, components, d): mean round-6, each component a round-6
    unit vector; deflation C ← round(C − λ v vᵀ, 6) between components."""
    x = embeds.select(id_col, F.col(vec_col).cast("array<double>").alias("e"))
    d = len(x.select("e").first()["e"])
    n = x.count()

    ex = x.select(id_col, F.posexplode("e").alias("pos", "v"))
    mean_rows = (
        ex.groupBy("pos").agg(F.round(F.avg("v"), 6).alias("mv")).collect()
    )
    mean = [0.0] * d
    for r in mean_rows:
        mean[r["pos"]] = r["mv"]

    m_lit = F.array(*[F.lit(v) for v in mean])
    xc = x.select(
        id_col,
        F.zip_with("e", m_lit, lambda a, b: a - b).alias("c"),
    )
    # upper-triangle outer products; the groupBy's partial agg collapses each
    # task to <= d(d+1)/2 rows before the shuffle
    idx = F.sequence(F.lit(0), F.lit(d - 1))
    tri = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                F.sequence(i, F.lit(d - 1)),
                lambda j: F.struct(
                    i.alias("i"), j.alias("j"), (F.col("c")[i] * F.col("c")[j]).alias("p")
                ),
            ),
        )
    )
    cov_rows = (
        xc.select(F.explode(tri).alias("t"))
        .groupBy("t.i", "t.j")
        .agg(F.round(F.sum("t.p") / F.lit(float(n)), 6).alias("cv"))
        .collect()
    )
    C = [[0.0] * d for _ in range(d)]
    for r in cov_rows:
        C[r["i"]][r["j"]] = r["cv"]
        C[r["j"]][r["i"]] = r["cv"]

    v0 = [round(1.0 / math.sqrt(d), 6)] * d
    comps: list[list[float]] = []
    for _ in range(k):
        v = _power_iter(C, v0, iters)
        comps.append(v)
        w = _matvec(C, v)
        lam = round(sum(v[i] * w[i] for i in range(d)), 6)
        C = [
            [round(C[i][j] - lam * v[i] * v[j], 6) for j in range(d)]
            for i in range(d)
        ]
    return mean, comps, d


def pca_project(
    embeds: DataFrame,
    k: int = 2,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, pc_1 … pc_k): each row's centered projection onto the top-k
    principal directions.  The projection pass is map-only — components are
    literal arrays, the dot product runs in whole-stage codegen."""
    mean, comps, _d = pca_components(embeds, k=k, iters=iters, vec_col=vec_col, id_col=id_col)
    m_lit = F.array(*[F.lit(v) for v in mean])
    xc = F.zip_with(F.col(vec_col).cast("array<double>"), m_lit, lambda a, b: a - b)
    cols = [F.col(id_col)]
    for ci, comp in enumerate(comps, start=1):
        c_lit = F.array(*[F.lit(v) for v in comp])
        dot = F.aggregate(
            F.zip_with(xc, c_lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, p: acc + p,
        )
        cols.append(F.round(dot, 6).alias(f"pc_{ci}"))
    return embeds.select(*cols)


def _matvec_ctes(mat: str, vin: str, vout: str) -> str:
    """One power-iteration step as CTEs: w = mat·vin, vout = round(w/‖w‖, 6).
    MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and a chain of
    matvec steps each referencing the previous twice would inline the base
    covariance join exponentially (the same fix as the BPE merge oracle)."""
    return f"""{vout}_w AS MATERIALIZED (
  SELECT {mat}.i AS i, sum({mat}.c * {vin}.v) AS w
  FROM {mat} JOIN {vin} ON {mat}.j = {vin}.i GROUP BY {mat}.i),
{vout}_n AS (SELECT sqrt(sum(w * w)) AS nrm FROM {vout}_w),
{vout} AS MATERIALIZED (SELECT i, round(w / (SELECT nrm FROM {vout}_n), 6) AS v FROM {vout}_w)"""


def pca_oracle_sql(k: int = 2, iters: int = 3, d: int = 64) -> str:
    """DuckDB oracle replaying pca_project value-for-value: same round-6
    mean, covariance, iterates, eigenvalue, deflation, and scores — the
    eigensolve unrolled as a CTE chain (the kmeans-oracle pattern)."""
    v0 = f"round(1.0 / sqrt({d}.0), 6)"
    ctes = [
        "x AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
        "nn AS (SELECT count(*) AS n FROM x)",
        "ex AS (SELECT vec_id, unnest(e) AS v, unnest(range(0, len(e))) AS pos FROM x)",
        "m AS (SELECT pos, round(avg(v), 6) AS mv FROM ex GROUP BY pos)",
        "cx AS (SELECT ex.vec_id, ex.pos, ex.v - m.mv AS cv FROM ex JOIN m USING (pos))",
        """cov_1 AS (
  SELECT a.pos AS i, b.pos AS j,
         round(sum(a.cv * b.cv) / (SELECT n FROM nn), 6) AS c
  FROM cx a JOIN cx b ON a.vec_id = b.vec_id
  GROUP BY a.pos, b.pos)""",
        f"v0 AS (SELECT unnest(range(0, {d})) AS i, {v0} AS v)",
    ]
    score_sel = []
    score_join = []
    for comp in range(1, k + 1):
        mat = f"cov_{comp}"
        prev = "v0"
        for it in range(1, iters + 1):
            cur = f"c{comp}_v{it}"
            ctes.append(_matvec_ctes(mat, prev, cur))
            prev = cur
        # eigenvalue + deflated matrix for the next component
        if comp < k:
            ctes.append(
                f"""lam_{comp} AS (
  SELECT round(sum(vv.v * mv.w), 6) AS l FROM (
    SELECT {mat}.i AS i, sum({mat}.c * {prev}.v) AS w
    FROM {mat} JOIN {prev} ON {mat}.j = {prev}.i GROUP BY {mat}.i
  ) mv JOIN {prev} vv ON vv.i = mv.i)"""
            )
            ctes.append(
                f"""cov_{comp + 1} AS (
  SELECT {mat}.i, {mat}.j,
         round({mat}.c - (SELECT l FROM lam_{comp}) * a.v * b.v, 6) AS c
  FROM {mat}
  JOIN {prev} a ON a.i = {mat}.i
  JOIN {prev} b ON b.i = {mat}.j)"""
            )
        ctes.append(
            f"""p{comp} AS (
  SELECT cx.vec_id, round(sum(cx.cv * {prev}.v), 6) AS pc_{comp}
  FROM cx JOIN {prev} ON {prev}.i = cx.pos GROUP BY cx.vec_id)"""
        )
        score_sel.append(f"pc_{comp}")
        score_join.append(f"p{comp}")
    joins = score_join[0]
    for t in score_join[1:]:
        joins += f" JOIN {t} USING (vec_id)"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT vec_id, {', '.join(score_sel)} FROM {joins}"
    )
