"""Product quantization for ANN (Jégou, Douze, Schmid 2011, IEEE TPAMI —
"Product Quantization for Nearest Neighbor Search", public paper).

Compress each embedding into `m` small codes (one per subspace) against
per-subspace k-means codebooks; queries rank candidates by an ADDITIVE
distance-table lookup over the codes (ADC) instead of touching the float
vectors. At 100 TB this is the difference between scanning the 64-float
corpus per query batch and scanning an m-byte-per-vector code table
(~32x smaller) with the codebooks + query distance tables broadcast.

Scale shape:
  * train  — `iters` Lloyd rounds over the (vec, subspace) exploded frame:
    one hash-partitioned shuffle per round keyed by (subspace, code) for
    the centroid update; codebooks are m*k*d_sub floats (tiny) folded to
    the driver and re-broadcast as literals — the exact centroid-literal
    pattern of pipeline/cluster.kmeans_assign.
  * encode — map-only: argmin over literal centroid expressions, whole
    codegen, NO shuffle, NO UDF. Linear scan of the corpus.
  * search — queries' distance tables are driver-computed literals
    (nq * m * k doubles), broadcast-joined against the code table; one
    top-k window per query. The corpus-side read is the CODE table only.

Determinism contract (replay-identical, like every rank/pack op here):
hash-seeded init (k smallest (h60(id), id) vectors per subspace), fixed
iteration count, all distances/centroids rounded to 6 decimals before any
argmin/rank so Spark-vs-DuckDB float fold order can never flip a tie; ties
break toward the smaller code / neighbor id.

Reference parity note: the reference engine (ti-chi-bot/ticdc) has no ANN
surface — this is part of the training-data-pipeline tier built on top of
the same corpus tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import h60, h60_sql


def _subvec(vec, s: int, d_sub: int):
    # F.slice start is 1-based
    return F.slice(vec, s * d_sub + 1, d_sub)


def _unit(vec):
    """Unit-normalize (same math as pipeline/cluster's spherical k-means):
    on unit vectors L2² = 2 − 2·cos, so PQ's L2 codebooks rank identically
    to the cosine the brute/LSH/IVF tiers use."""
    n = F.sqrt(
        F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return F.transform(vec, lambda x: x / n)


def _dist2(a, b):
    """Rounded squared L2 between two equal-length arrays (codegen only)."""
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def _seed_rows(
    emb: DataFrame, k: int, id_col: str, vec_col: str
) -> list[tuple]:
    """The k seed vectors: smallest (h60(id), id) — a deterministic pure
    function of ids, independent of partition layout. O(k) driver fold."""
    seeds = (
        emb.select(
            F.col(id_col).alias("_id"),
            _unit(F.col(vec_col).cast("array<double>")).alias("_v"),
            h60(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h", "_id")
        .limit(k)
        .collect()
    )
    return [list(r["_v"]) for r in seeds]


def pq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[int, list[tuple[int, list[float]]]]:
    """Train per-subspace codebooks. Returns {s: [(code, centroid), ...]}
    with surviving codes ascending; a code whose cluster empties out drops
    from the book (mirrored exactly by the SQL oracle)."""
    assert dim % m == 0
    d_sub = dim // m
    spark = emb.sparkSession
    seeds = _seed_rows(emb, k, id_col, vec_col)
    books: dict[int, list[tuple[int, list[float]]]] = {
        s: [
            (c, [round(x, 6) for x in v[s * d_sub : (s + 1) * d_sub]])
            for c, v in enumerate(seeds)
        ]
        for s in range(m)
    }
    if iters == 0:
        return books

    vec_d = _unit(F.col(vec_col).cast("array<double>"))
    sub = emb.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        _subvec(vec_d, s, d_sub).alias("sv"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("x"),
    ).select("_id", "x.s", "x.sv")

    for _ in range(iters):
        cent_rows = [
            (s, c, cent) for s, cs in books.items() for c, cent in cs
        ]
        cents = F.broadcast(
            spark.createDataFrame(
                cent_rows, "s int, code int, cent array<double>"
            )
        )
        scored = sub.join(cents, "s").select(
            "_id", "s", "sv", "code", _dist2(F.col("sv"), F.col("cent")).alias("d")
        )
        w = Window.partitionBy("_id", "s").orderBy(
            F.col("d").asc(), F.col("code").asc()
        )
        asg = scored.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") == 1
        )
        upd = (
            asg.select(
                "s", "code", F.posexplode(F.col("sv")).alias("pos", "v")
            )
            .groupBy("s", "code", "pos")
            .agg(F.avg("v").alias("a"))
            .groupBy("s", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "a"))),
                    lambda x: F.round(x["a"], 6),
                ).alias("cent")
            )
            .collect()
        )
        books = {s: [] for s in range(m)}
        for r in upd:
            books[int(r["s"])].append((int(r["code"]), list(r["cent"])))
        for s in books:
            books[s].sort()
    return books


def pq_encode(
    emb: DataFrame,
    books: dict[int, list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — map-only argmin against literal centroids;
    ties to the smallest surviving code (array_position = first minimum in
    ascending-code order). Whole-stage codegen, zero shuffles."""
    return pq_encode_staged(
        emb.select(F.col(id_col).alias("vec_id"), vec_col), books, vec_col
    ).drop(vec_col)


def _lit_d(x: float) -> str:
    """Double SQL literal with exact round-trip (repr is shortest exact)."""
    return f"{float(x)!r}D"


def pq_encode_staged(
    df: DataFrame,
    books: dict[int, list[tuple[int, list[float]]]],
    vec_col: str = "embedding",
    code_col: str = "codes",
) -> DataFrame:
    """df + a `codes array<int>` column: argmin against literal centroids,
    ties to the smallest surviving code (array_position = first minimum in
    ascending-code order). Same math/fold order as the DuckDB oracle CTEs.

    Built from SQL strings (F.expr), not Column ops — an m*k codebook is
    m*k*d_sub literal terms and the py4j Column path costs ~40 ms per node
    in driver round-trips (~20 s at m=16,k=32). Staged through four
    projections (unit-norm -> subvectors -> distance arrays -> codes) so
    each shared subtree appears ONCE in the plan instead of m*k times:
    CollapseProject keeps multi-referenced non-trivial aliases staged, and
    janino gets m small codegen units instead of one giant method. Map-only,
    zero shuffles, whole-stage codegen throughout."""
    m = len(books)
    d_sub = len(books[0][0][1])
    for c in df.columns:
        if c.startswith("_pq_"):
            raise ValueError(f"pq_encode_staged: reserved column name {c!r}")
    cols = [F.col(c) for c in df.columns]
    vec_d = f"CAST({vec_col} AS ARRAY<DOUBLE>)"
    u_sql = (
        f"transform({vec_d}, x -> x / sqrt("
        f"aggregate({vec_d}, 0.0D, (acc, y) -> acc + y * y)))"
    )
    sved = df.withColumn("_pq_u", F.expr(u_sql)).select(
        *cols,
        *[
            F.expr(f"slice(_pq_u, {s * d_sub + 1}, {d_sub})").alias(f"_pq_sv{s}")
            for s in range(m)
        ],
    )

    def dist_sql(s: int, cent: list[float]) -> str:
        lits = ", ".join(_lit_d(x) for x in cent)
        return (
            f"round(aggregate(zip_with(_pq_sv{s}, array({lits}), "
            f"(x, y) -> (x - y) * (x - y)), 0.0D, (acc, x) -> acc + x), 6)"
        )

    dists = sved.select(
        *cols,
        *[
            F.expr(
                "array("
                + ", ".join(dist_sql(s, cent) for _, cent in books[s])
                + ")"
            ).alias(f"_pq_d{s}")
            for s in range(m)
        ],
    )

    def code_sql(s: int) -> str:
        codes_lit = ", ".join(str(c) for c, _ in books[s])
        return (
            f"element_at(array({codes_lit}), "
            f"CAST(array_position(_pq_d{s}, array_min(_pq_d{s})) AS INT))"
        )

    return dists.select(
        *cols,
        F.expr(
            "array(" + ", ".join(code_sql(s) for s in range(m)) + ")"
        ).alias(code_col),
    )


def _query_tabs(
    queries: DataFrame, books, dim: int, id_col: str, vec_col: str
):
    """Broadcast frame of per-query ADC distance tables: (query_id,
    dtab[s][j], codelists[s][j]) — nq * m * k doubles, driver-computed."""
    spark = queries.sparkSession
    m = len(books)
    d_sub = dim // m
    qrows = queries.select(
        F.col(id_col).alias("query_id"),
        _unit(F.col(vec_col).cast("array<double>")).alias("qv"),
    ).collect()
    tab_rows = []
    for r in qrows:
        qv = list(r["qv"])
        # dtab[s] aligned with books[s] (ascending surviving codes);
        # round like every other distance so oracle fold order can't flip ranks
        dtab = [
            [
                round(
                    sum(
                        (qv[s * d_sub + i] - cent[i]) ** 2
                        for i in range(d_sub)
                    ),
                    6,
                )
                for _, cent in books[s]
            ]
            for s in range(m)
        ]
        tab_rows.append(
            (r["query_id"], dtab, [[c for c, _ in books[s]] for s in range(m)])
        )
    return F.broadcast(
        spark.createDataFrame(
            tab_rows,
            "query_id long, dtab array<array<double>>, codelists array<array<int>>",
        )
    )


# adc = sum_s dtab[s][index of codes[s] in codelists[s]]
def _adc_expr():
    return F.round(
        F.aggregate(
            F.expr(
                # Spark [] is 0-based; array_position is 1-based -> -1
                "transform(codes, (c, s) -> "
                "dtab[s][cast(array_position(codelists[s], c) - 1 as int)])"
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def pq_search(
    emb: DataFrame,
    queries: DataFrame,
    k_top: int = 5,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: train books, encode the corpus, rank by the additive
    per-subspace distance-table lookup. The corpus side touches only the
    code table; query distance tables ride a broadcast join.

    Output: (query_id, neighbor_id, adc_dist, rank).
    """
    books = pq_train(emb, m=m, k=k, iters=iters, dim=dim, id_col=id_col, vec_col=vec_col)
    codes = pq_encode(emb, books, id_col=id_col, vec_col=vec_col)
    tabs = _query_tabs(queries, books, dim, id_col, vec_col)
    # explicit broadcast: tabs is O(queries × m·k) floats — tiny — and an
    # implicit-only broadcast could tip into a real cartesian once the
    # query table grows past autoBroadcastJoinThreshold at scale
    joined = codes.crossJoin(F.broadcast(tabs)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _adc_expr().alias("adc_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_top)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def ivfpq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k_top: int = 5,
    cell_bits: int = 4,
    n_probe_hamming: int = 1,
    m: int = 16,
    k: int = 32,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: dict[int, list[tuple[int, list[float]]]] | None = None,
) -> DataFrame:
    """IVFADC (Jégou et al. 2011 §IV): both pruning layers composed —
    coarse hyperplane cells cut WHICH code rows a query touches
    (~P/2^cell_bits of the corpus, same multi-probe as similarity.ivf_topk),
    PQ codes cut WHAT is read per row (m bytes, ADC lookup, no floats).
    At 100 TB the index is the cell-partitioned code table: a probe is a
    partition-pruned scan of an already-32x-compressed layout.

    Departure from the paper, stated: codes quantize the raw (unit) vector,
    not the residual vs a cell centroid — our coarse cells are hyperplane
    signs with no centroid, and raw-vector codes keep the whole pipeline
    deterministic + SQL-oracle-checkable. Costs some ADC accuracy; the
    recall gap vs plain PQ is measured in the pytest, not hidden.

    Output: (query_id, neighbor_id, adc_dist, rank).
    """
    from .similarity import cell_signature, probe_cells

    if books is None:
        books = pq_train(
            emb, m=m, k=k, iters=iters, dim=dim, id_col=id_col, vec_col=vec_col
        )
    # ONE map-only pass builds the index rows: (id, cell, codes)
    corpus = pq_encode_staged(
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col),
            cell_signature(vec_col, cell_bits, dim).alias("cell"),
        ),
        books,
        vec_col,
    ).drop(vec_col)
    probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(
            probe_cells(
                cell_signature(vec_col, cell_bits, dim),
                cell_bits,
                n_probe_hamming,
            )
        ).alias("cell"),
    )
    tabs = _query_tabs(queries, books, dim, id_col, vec_col)
    cand = (
        corpus.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(tabs, "query_id")
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        _adc_expr().alias("adc_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_top)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def _pq_ctes(m: int, k: int, iters: int, dim: int) -> tuple[str, str]:
    """DuckDB CTE chain replaying pq_train + pq_encode step-for-step:
    hash-seeded per-subspace init, per-iteration rounded argmin assignment
    (ties -> smaller code) and rounded per-dim avg update (empty codes
    drop), final encode. Returns (ctes, final_codes_cte) where the final
    CTE has (vec_id, s, code)."""
    d_sub = dim // m
    h = h60_sql("cast(vec_id AS varchar)")
    norm = "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
    sub_parts = " UNION ALL ".join(
        f"SELECT vec_id, {s} AS s, "
        f"u[{s * d_sub + 1}:{(s + 1) * d_sub}] AS sv FROM e"
        for s in range(m)
    )
    ctes = [
        f"e AS (SELECT vec_id, "
        f"list_transform(embedding::DOUBLE[], x -> x / {norm}) AS u "
        f"FROM embeddings)",
        f"sub AS ({sub_parts})",
        f"""seeds AS (
  SELECT vec_id, row_number() OVER (ORDER BY {h}, vec_id) - 1 AS c
  FROM e QUALIFY c < {k})""",
        f"""cents_0 AS (
  SELECT sub.s, seeds.c AS code,
         list_transform(sub.sv, x -> round(x, 6)) AS cent
  FROM seeds JOIN sub ON sub.vec_id = seeds.vec_id)""",
    ]
    dist = (
        "round(list_sum(list_transform(list_zip(p.sv, c.cent), "
        "z -> (z[1] - z[2]) * (z[1] - z[2]))), 6)"
    )

    def asg(i: int) -> str:
        return f"""asg_{i} AS (
  SELECT vec_id, s, sv, code FROM (
    SELECT p.vec_id, p.s, p.sv, c.code, {dist} AS d,
           row_number() OVER (PARTITION BY p.vec_id, p.s
                              ORDER BY {dist} ASC, c.code ASC) AS rn
    FROM sub p JOIN cents_{i - 1} c ON c.s = p.s
  ) WHERE rn = 1)"""

    for i in range(1, iters + 1):
        ctes.append(asg(i))
        ctes.append(
            f"""cents_{i} AS (
  SELECT s, code, list(round(a, 6) ORDER BY pos) AS cent FROM (
    SELECT s, code, pos, avg(v) AS a FROM (
      SELECT s, code, unnest(sv) AS v,
             unnest(range(1, len(sv) + 1)) AS pos
      FROM asg_{i}
    ) GROUP BY s, code, pos
  ) GROUP BY s, code)"""
        )
    final = f"asg_{iters + 1}"
    ctes.append(asg(iters + 1))
    return ",\n".join(ctes), final


def pq_search_sql(
    k_top: int = 5,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    dim: int = 64,
    query_pred: str = "vec_id < 10",
) -> str:
    """DuckDB oracle for pq_search over the `embeddings` view."""
    ctes, enc = _pq_ctes(m, k, iters, dim)
    dist = (
        "round(list_sum(list_transform(list_zip(q.sv, c.cent), "
        "z -> (z[1] - z[2]) * (z[1] - z[2]))), 6)"
    )
    return f"""
WITH {ctes},
qsub AS (
  SELECT vec_id AS query_id, s, sv FROM sub WHERE {query_pred}
),
parts AS (
  SELECT q.query_id, p.vec_id AS neighbor_id, {dist} AS dp
  FROM {enc} p
  JOIN qsub q ON q.s = p.s
  JOIN cents_{iters} c ON c.s = p.s AND c.code = p.code
  WHERE p.vec_id != q.query_id
),
adc AS (
  SELECT query_id, neighbor_id, round(sum(dp), 6) AS adc_dist
  FROM parts GROUP BY query_id, neighbor_id
)
SELECT query_id, neighbor_id, adc_dist, rank FROM (
  SELECT query_id, neighbor_id, adc_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_dist ASC, neighbor_id ASC)::BIGINT
           AS rank
  FROM adc
) WHERE rank <= {k_top}
"""
