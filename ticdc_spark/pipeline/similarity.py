"""Similarity search over an embedding column (array<float>).

Three tiers:
  * cosine_pairs / cosine_topk — brute force, exact. All arithmetic is
    native Column expressions (F.zip_with dot product + F.aggregate fold),
    computed in double and rounded so the DuckDB oracle reproduces values.
    O(n²) — the correctness baseline and fine for ≤10^5 vectors per block.
  * rp_lsh_buckets / ann_lsh_topk — random-hyperplane LSH: sign-bit
    signature from D deterministic pseudo-hyperplanes (md5-derived ±1
    components, so both engines can rebuild them); candidates share a
    signature bucket; exact cosine re-rank within bucket. Sub-quadratic:
    shuffle O(n · tables).
  * ivf_topk — IVF-style coarse quantization: k-means-free variant using
    LSH signature prefixes as cells; probe the query's cell (+optionally
    neighboring cells), exact re-rank inside. The 100 TB path: cells are
    the partition key, so a query touches 1/2^bits of the data.

Embedding near-dup (the 5th dedup family) = cosine_pairs(threshold).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column, digits: int = 6) -> Column:
    """Cosine similarity, rounded for cross-engine float determinism."""
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), digits)


def cosine_pairs(emb: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact all-pairs cosine ≥ threshold — O(n²) cross join. This is the
    CORRECTNESS ORACLE for small blocks/tests only; the registered
    embedding-dedup path is :func:`cosine_pairs_blocked` (sub-quadratic)."""
    a = emb.alias("a")
    b = emb.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def cosine_pairs_blocked(
    emb: DataFrame,
    threshold: float,
    n_bits: int = 4,
    n_tables: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup at scale: multi-table RP-LSH candidate blocking +
    exact-cosine verification. No false positives (every candidate is
    re-scored exactly); recall = 1-(1-p^b)^T for per-bit collision
    p = 1-θ/π. Shuffle O(n·T) — never the all-pairs cross join."""
    sigs = []
    for t in range(n_tables):
        sig = None
        for p in range(n_bits):
            bit = hyperplane_sign(F.col(vec_col), t * n_bits + p, dim)
            term = F.shiftleft(bit, p)
            sig = term if sig is None else sig + term
        sigs.append(sig)
    # single-scan banding (posexplode) — a union of per-table selects would
    # paste T copies of the scan subtree into the plan; explicit repartition
    # keeps the pair-expansion join from AQE-coalescing to one task
    b = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        F.posexplode(F.array(*sigs)).alias("table_id", "bucket"),
    ).repartition(64, "table_id", "bucket")
    a_, b_ = b.alias("a"), b.alias("b")
    cand = (
        a_.join(
            b_,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.embedding").alias("ea"),
            F.col("b.embedding").alias("eb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a", "id_b", cosine(F.col("ea"), F.col("eb")).alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (brute force).

    queries: same schema; broadcast (query sets are small relative to the
    corpus). Rank ties broken by neighbor id for determinism.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    joined = emb.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col(vec_col), F.col("qvec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# ---------------- LSH / IVF scale paths ----------------

def hyperplane_sign(vec: Column, plane_id: int, dim: int) -> Column:
    """Sign bit of <vec, h_plane> where h_plane[d] = ±1 derived from
    md5(plane_id:d) — deterministic, rebuildable in any engine."""
    import hashlib

    signs = []
    for d in range(dim):
        bit = int(hashlib.md5(f"{plane_id}:{d}".encode()).hexdigest()[0], 16) & 1
        signs.append(1.0 if bit else -1.0)
    proj = F.aggregate(
        F.zip_with(
            vec,
            F.array(*[F.lit(s) for s in signs]),
            lambda x, s: x.cast("double") * s,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (proj > 0).cast("long")


def rp_lsh_buckets(
    emb: DataFrame, n_bits: int = 8, dim: int = 64, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, bucket) — bucket = packed sign bits of n_bits hyperplanes.
    Cosine-similar vectors collide with prob 1 - θ/π per bit."""
    sig = None
    for p in range(n_bits):
        bit = hyperplane_sign(F.col(vec_col), p, dim)
        term = F.shiftleft(bit, p)
        sig = term if sig is None else sig + term
    return emb.select(F.col(id_col), F.col(vec_col), sig.alias("bucket"))


def ann_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    dim: int = 64,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine re-rank over LSH bucket collisions.

    The bucket equi-join replaces the cross join — at 10^9 vectors with
    n_bits=16 each query touches ~n/65536 of the corpus. Recall is tuned
    with `n_tables` independent hash tables (plane sets are disjoint:
    table t uses planes [t*n_bits, (t+1)*n_bits)); a candidate matches if
    it collides in ANY table — P[found] = 1-(1-p^b)^T for per-bit
    agreement p = 1 - θ/π. Shuffle cost is O((n+q) · T).
    """
    from pyspark.sql import Window

    def buckets(df: DataFrame, out_id: str, keep_vec: str) -> DataFrame:
        # one posexplode over the per-table signature array — a union of
        # per-table selects would paste T copies of the scan+projection
        # subtree into the plan (same fix as dedup.minhash_lsh_pairs)
        sigs = []
        for t in range(n_tables):
            sig = None
            for p in range(n_bits):
                bit = hyperplane_sign(F.col(vec_col), t * n_bits + p, dim)
                term = F.shiftleft(bit, p)
                sig = term if sig is None else sig + term
            sigs.append(sig)
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(keep_vec),
            F.posexplode(F.array(*sigs)).alias("table_id", "bucket"),
        )

    corpus = buckets(emb, "neighbor_id", "cvec")
    q = buckets(queries, "query_id", "qvec")
    cand = (
        corpus.join(F.broadcast(q), ["table_id", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qvec", "neighbor_id", "cvec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("cvec"), F.col("qvec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def cell_signature(vec_col: str, cell_bits: int, dim: int):
    """Coarse-quantizer cell id: packed sign bits of cell_bits deterministic
    hyperplanes (the k-means-free IVF coarse codebook)."""
    sig = None
    for p in range(cell_bits):
        bit = hyperplane_sign(F.col(vec_col), p, dim)
        term = F.shiftleft(bit, p)
        sig = term if sig is None else sig + term
    return sig


def probe_cells(qcell, cell_bits: int, n_probe_hamming: int = 1):
    """Multi-probe expansion: the query's own cell plus every cell within
    Hamming distance n_probe_hamming (bit flips). Returns an array Column.
    Standard multi-probe LSH — recovers most of the recall a single-cell
    probe loses at the boundary of a hyperplane."""
    cells = [qcell]
    if n_probe_hamming >= 1:
        cells += [qcell.bitwiseXOR(F.lit(1 << i)) for i in range(cell_bits)]
    if n_probe_hamming >= 2:
        cells += [
            qcell.bitwiseXOR(F.lit((1 << i) | (1 << j)))
            for i in range(cell_bits)
            for j in range(i + 1, cell_bits)
        ]
    return F.array(*cells)


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    cell_bits: int = 4,
    dim: int = 64,
    n_probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF: coarse cells = packed hyperplane sign bits; each query probes
    its own cell plus Hamming-adjacent cells (multi-probe), exact cosine
    re-rank inside the probed cells only.

    Plan shape: queries posexplode their probe-cell list → EQUI-join with
    the corpus on cell (broadcast: queries are small) → re-rank. Each
    corpus vector has exactly one cell and probe cells are distinct, so no
    candidate dedup is needed. With P probes of 2^cell_bits cells a query
    touches ~P/2^cell_bits of the corpus — the pruning IVF exists for. For
    the storage-side variant where pruning happens at the SCAN (partition-
    pruned read, no full-corpus pass at all) see ivf_build/ivf_topk_indexed.
    """
    from pyspark.sql import Window

    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        cell_signature(vec_col, cell_bits, dim).alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(
            probe_cells(cell_signature(vec_col, cell_bits, dim), cell_bits, n_probe_hamming)
        ).alias("cell"),
    )
    cand = corpus.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("cvec"), F.col("qvec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ivf_build(
    emb: DataFrame,
    index_path: str,
    cell_bits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Write the corpus PARTITIONED BY cell (hive layout, one directory per
    coarse cell) — the IVF inverted-list storage. A probe then reads only
    the probed cells' files: partition pruning at the scan, the same
    manifest-driven skip the lake layer does for buckets."""
    emb.select(
        F.col(id_col), F.col(vec_col), cell_signature(vec_col, cell_bits, dim).alias("cell")
    ).write.mode("overwrite").partitionBy("cell").parquet(index_path)


def ivf_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 5,
    cell_bits: int = 4,
    dim: int = 64,
    n_probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a built IVF index: collect the queries' probe-cell set (driver
    fold is O(queries × probes) — queries are small by contract), scan ONLY
    those hive partitions (`cell IN (...)` prunes at the file listing), and
    re-rank exactly. At 10^9 vectors and cell_bits=10 with 1-bit multi-probe
    a query batch reads ~11/1024 of the corpus bytes."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(
            probe_cells(cell_signature(vec_col, cell_bits, dim), cell_bits, n_probe_hamming)
        ).alias("cell"),
    )
    probed = sorted({int(r["cell"]) for r in q.select("cell").distinct().collect()})
    corpus = (
        spark.read.parquet(index_path)
        .filter(F.col("cell").isin(probed))
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cvec"),
            F.col("cell").cast("long").alias("cell"),
        )
    )
    cand = corpus.join(F.broadcast(q), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id", "neighbor_id", cosine(F.col("cvec"), F.col("qvec")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
