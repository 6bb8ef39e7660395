"""Semantics tests for pipeline/cluster (k-means + SemDeDup) and the fuzzy
decontamination operator (pipeline/decontam.decontaminate_fuzzy). The
cross-engine value parity is covered by the driver's DuckDB oracle
(embed_kmeans / semdedup / decontam_fuzzy); these tests pin the SEMANTICS:
argmax assignment, deterministic survivor choice, planted-near-dup recall.
"""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ticdc_spark.pipeline.cluster import kmeans_assign, seed_centroids, semdedup
from ticdc_spark.pipeline.decontam import decontaminate, decontaminate_fuzzy

EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)], EMB_SCHEMA
    )


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def test_kmeans_assigns_argmax_centroid(spark):
    # Two tight orthogonal bundles in 4-d: k-means with k=2 must separate
    # them, and every point's cluster must be its max-cosine centroid.
    a = [[1.0, 0.05 * i, 0.0, 0.0] for i in range(5)]
    b = [[0.0, 0.0, 1.0, 0.05 * i] for i in range(5)]
    emb = _emb(spark, a + b)
    out = kmeans_assign(emb, k=2, iters=2, dim=4).collect()
    by_id = {r["vec_id"]: r["cluster"] for r in out}
    assert len({by_id[i] for i in range(5)}) == 1
    assert len({by_id[i] for i in range(5, 10)}) == 1
    assert by_id[0] != by_id[5]
    # cos_sim is the similarity to the OWN centroid: high within a bundle
    assert all(r["cos_sim"] > 0.9 for r in out)


def test_kmeans_deterministic_and_seeded(spark):
    vecs = [[float((i * 7 + j * 3) % 5 - 2) for j in range(4)] for i in range(12)]
    vecs = [v if any(v) else [1.0, 0, 0, 0] for v in vecs]
    emb = _emb(spark, vecs)
    r1 = sorted(kmeans_assign(emb, k=3, iters=2, dim=4).collect())
    r2 = sorted(kmeans_assign(emb, k=3, iters=2, dim=4).collect())
    assert r1 == r2
    seeds = seed_centroids(emb, 3)
    assert [c for c, _ in seeds] == [0, 1, 2]
    # seeds are unit-normalized and rounded
    for _, cent in seeds:
        assert abs(sum(x * x for x in cent) - 1.0) < 1e-4


def test_kmeans_empty_cluster_drops_out(spark):
    # k=3 over two identical points: at most 2 seeds distinct, one cluster
    # starves after the first update — assignment must still cover all rows.
    emb = _emb(spark, [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    out = kmeans_assign(emb, k=3, iters=2, dim=2).collect()
    assert len(out) == 3
    assert {r["vec_id"] for r in out} == {0, 1, 2}


def test_semdedup_keeps_min_id_per_near_dup_set(spark):
    # 0,1,2 are near-identical; 3 is orthogonal. tau=0.99 -> drop 1 and 2.
    vecs = [
        [1.0, 0.0, 0.0, 0.0],
        [1.0, 0.001, 0.0, 0.0],
        [1.0, 0.0, 0.001, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ]
    out = {r["vec_id"]: r["kept"] for r in semdedup(_emb(spark, vecs), k=2, iters=1, threshold=0.99, dim=4).collect()}
    assert out == {0: 1, 1: 0, 2: 0, 3: 1}


def test_semdedup_threshold_boundary(spark):
    # orthogonal vectors (cos=0) with tau>0: nothing dropped
    vecs = [[1.0, 0.0], [0.0, 1.0]]
    out = semdedup(_emb(spark, vecs), k=1, iters=1, threshold=0.5, dim=2).collect()
    assert all(r["kept"] == 1 for r in out)


DOCS_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


def test_decontaminate_fuzzy_flags_paraphrase(spark):
    ev_text = "the quick brown fox jumps over the lazy dog near the river bank today"
    # paraphrase: one word changed -> high 3-gram Jaccard, but NOT an exact
    # 8-gram superset-free case the exact rule would need
    near = "the quick brown fox jumps over the lazy cat near the river bank today"
    far = "completely unrelated text about spark shuffle partitions and codegen stages"
    train = spark.createDataFrame([(10, near), (11, far), (12, ev_text)], DOCS_SCHEMA)
    ev = spark.createDataFrame([(1, ev_text)], DOCS_SCHEMA)
    # bands=8 (r=2): detection prob at s=0.6 is 1-(1-s^2)^8 ~ 0.98 — the
    # default b=4/r=4 banding is tuned for s>=0.7 and deterministically
    # misses this planted pair (recall is the LSH knob, not a bug)
    out = {
        r["doc_id"]: (r["contaminated"], r["max_jaccard"])
        for r in decontaminate_fuzzy(train, ev, n=3, bands=8, threshold=0.5).collect()
    }
    assert out[10][0] == 1 and 0.5 <= out[10][1] < 1.0
    assert out[11] == (0, 0.0)
    assert out[12] == (1, 1.0)  # exact dup: jaccard 1
    # every train doc gets a row (left join semantics)
    assert set(out) == {10, 11, 12}


def test_decontaminate_fuzzy_catches_what_exact_misses(spark):
    # Change the MIDDLE word of a 15-word doc: every 8-gram window spans
    # position 8, so the exact 8-gram rule finds zero shared grams — but
    # only 3 of 13 3-gram shingles break (Jaccard 0.625), so the fuzzy
    # rule flags it.
    ev_text = (
        "alpha beta gamma delta epsilon zeta eta theta "
        "iota kappa lambda mu nu xi omicron"
    )
    edited = (
        "alpha beta gamma delta epsilon zeta eta CHANGED "
        "iota kappa lambda mu nu xi omicron"
    )
    train = spark.createDataFrame([(20, edited)], DOCS_SCHEMA)
    ev = spark.createDataFrame([(1, ev_text)], DOCS_SCHEMA)
    exact = decontaminate(train, ev, n=8).collect()[0]
    fuzzy = decontaminate_fuzzy(train, ev, n=3, bands=8, threshold=0.5).collect()[0]
    assert exact["contaminated"] == 0
    assert fuzzy["contaminated"] == 1


def _py_pca(vecs, k=2, iters=3):
    """Pure-python replay of pipeline/pca: round-6 mean, covariance,
    iterates, eigenvalue, deflation, scores."""
    d = len(vecs[0])
    n = len(vecs)
    mean = [round(sum(v[i] for v in vecs) / n, 6) for i in range(d)]
    xc = [[v[i] - mean[i] for i in range(d)] for v in vecs]
    C = [
        [round(sum(r[i] * r[j] for r in xc) / float(n), 6) for j in range(d)]
        for i in range(d)
    ]
    v0 = [round(1.0 / math.sqrt(d), 6)] * d
    comps = []
    for _ in range(k):
        v = v0
        for _ in range(iters):
            w = [sum(C[i][j] * v[j] for j in range(d)) for i in range(d)]
            nrm = math.sqrt(sum(x * x for x in w))
            v = [round(x / nrm, 6) for x in w]
        comps.append(v)
        w = [sum(C[i][j] * v[j] for j in range(d)) for i in range(d)]
        lam = round(sum(v[i] * w[i] for i in range(d)), 6)
        C = [[round(C[i][j] - lam * v[i] * v[j], 6) for j in range(d)] for i in range(d)]
    return mean, comps, xc


def test_pca_project_matches_pure_python(spark):
    """pca_project replays the documented round-6 algorithm exactly, and the
    top component captures more variance than the second."""
    import random

    from ticdc_spark.pipeline.pca import pca_project

    rng = random.Random(7)
    d = 8
    # anisotropic cloud: dim 0 dominates, dim 1 second
    vecs = [
        [rng.gauss(0, 5), rng.gauss(0, 2)] + [rng.gauss(0, 0.3) for _ in range(d - 2)]
        for _ in range(120)
    ]
    mean, comps, xc = _py_pca(vecs, k=2, iters=3)
    want = {
        i: (
            round(sum(x * c for x, c in zip(row, comps[0])), 6),
            round(sum(x * c for x, c in zip(row, comps[1])), 6),
        )
        for i, row in enumerate(xc)
    }
    out = {r["vec_id"]: (r["pc_1"], r["pc_2"]) for r in pca_project(_emb(spark, vecs), k=2, iters=3).collect()}
    # float32 storage of the input is the only divergence source; compare
    # against the same float32-truncated vectors
    vecs32 = [[float(__import__("struct").unpack("f", __import__("struct").pack("f", x))[0]) for x in v] for v in vecs]
    mean, comps, xc = _py_pca(vecs32, k=2, iters=3)
    want = {
        i: (
            round(sum(x * c for x, c in zip(row, comps[0])), 6),
            round(sum(x * c for x, c in zip(row, comps[1])), 6),
        )
        for i, row in enumerate(xc)
    }
    assert out == want
    # components are round-6 unit vectors; pc1 variance dominates
    for c in comps:
        assert abs(sum(x * x for x in c) - 1.0) < 1e-4
    var1 = sum(p[0] ** 2 for p in out.values())
    var2 = sum(p[1] ** 2 for p in out.values())
    assert var1 > var2 > 0
    # the dominant direction is (close to) axis 0
    assert abs(comps[0][0]) > 0.9
