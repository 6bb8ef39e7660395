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
    """Exact all-pairs cosine ≥ threshold (embedding near-dup dedup)."""
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


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    cell_bits: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style: coarse cells = low cell_bits of the LSH signature; probe
    the query's cell only. At scale the corpus is WRITTEN partitioned by
    cell, so probing is a partition-pruned scan, not a shuffle."""
    return ann_lsh_topk(
        emb, queries, k, n_bits=cell_bits, dim=dim, n_tables=1,
        id_col=id_col, vec_col=vec_col,
    )
