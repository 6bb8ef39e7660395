"""Deduplication operators over the documents table.

Five families, each Spark-first (no per-row Python, every hash cross-engine
reproducible via functions.hashing so the DuckDB oracle can verify values):

  * exact            — content-hash groupBy; survivor = min(doc_id).
                       One shuffle on a 32-hex key; map-side combine.
  * ngram_jaccard    — exact word-n-gram Jaccard via shingle explode +
                       self-equi-join on shingle + group count. Quadratic only
                       within shingle buckets; at 100 TB use minhash_lsh below
                       to pre-filter candidates.
  * minhash_lsh      — MinHash signatures (K universal-hash perms over 60-bit
                       shingle hashes) banded into B bands; candidate pairs
                       share ≥1 band; verified with exact Jaccard. The scale
                       path: shuffle is O(docs × B), never all-pairs.
  * simhash          — 32-bit SimHash over distinct tokens; near-dup pairs =
                       hamming(simhash_a, simhash_b) ≤ r via bit_count(xor).
  * embedding_cosine — near-dup by cosine over an embedding column
                       (array<float>); see pipeline.similarity for the ANN
                       scale path.

Scale notes: the explode(shingles) width is bounded by doc length; the
band-join is an equi-join on (band_id, band_hash) — AQE skew-split handles
hot bands (boilerplate docs). All joins here are shuffle equi-joins with
partial aggregation pushed below the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import MERSENNE_P, h60, perm_params
from ..functions.text import tokens_col, word_ngrams

# LSH defaults: K = BANDS * ROWS_PER_BAND signatures
N_PERMS = 16
BANDS = 4
ROWS_PER_BAND = 4


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Group identical (lowercased, trimmed) content; emit one row per
    distinct content with its duplicate count and canonical (min) doc_id."""
    return (
        docs.select(
            F.col("doc_id"), F.md5(F.lower(F.trim(F.col(text_col)))).alias("content_md5")
        )
        .groupBy("content_md5")
        .agg(
            F.count("*").alias("dup_count"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def shingles(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Distinct word-n-gram shingles per doc: (doc_id, shingle)."""
    toks = tokens_col(text_col)
    return (
        docs.select("doc_id", F.explode(word_ngrams(toks, n)).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard near-dup pairs: |A∩B| / |A∪B| ≥ threshold.

    Plan: explode shingles → self-equi-join on shingle (doc_a < doc_b) →
    count per pair = intersection; set sizes joined back (no broadcast
    hint — at corpus scale `sizes` is one row per DOC, far too big to
    broadcast; AQE picks broadcast at runtime when it actually fits).

    max_shingle_df: drop shingles whose document frequency exceeds the cap
    BEFORE the self-join (standard MinHash/Jaccard practice). Boilerplate
    shingles shared by millions of docs make the self-join quadratic in the
    hot bucket; capping df bounds pair expansion at df²·n_shingles. The
    Jaccard is then computed over the CAPPED shingle sets (sizes too), so
    the measure stays a true Jaccard of the filtered universe.
    """
    sh = shingles(docs, n, text_col)
    if max_shingle_df is not None:
        # df per shingle is a map-side-combined count; the anti-filter is a
        # shuffle-free semi-join on the already-partitioned shingle key
        df_ok = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(df_ok, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "jaccard")
    )
    return out


def minhash_signatures(
    docs: DataFrame, n: int = 3, n_perms: int = N_PERMS, text_col: str = "text"
) -> DataFrame:
    """(doc_id, mh_0..mh_{K-1}) — min over shingles of perm_i(h60(shingle)).

    One explode + one groupBy with K min() aggregates: partial aggregation
    collapses each partition's shingles before the shuffle, so the shuffle
    carries ≤ K longs per (doc, partition).
    """
    sh = shingles(docs, n, text_col)
    h = (h60(F.col("shingle")) % F.lit(MERSENNE_P)).alias("h")
    base = sh.select("doc_id", h)
    aggs = []
    for i in range(n_perms):
        a, b = perm_params(i)
        aggs.append(
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MERSENNE_P)).alias(f"mh_{i}")
        )
    return base.groupBy("doc_id").agg(*aggs)


def band_hash_exprs(n_perms: int = N_PERMS, bands: int = BANDS) -> list:
    """One md5 column per LSH band over mh_{i} signature columns. Shared by
    the batch path (minhash_lsh_pairs) and the incremental band index
    (pipeline.incremental) so the two can never disagree on banding."""
    r = n_perms // bands
    return [
        F.md5(
            F.concat_ws(
                "_",
                *[F.col(f"mh_{b * r + j}").cast("string") for j in range(r)],
            )
        )
        for b in range(bands)
    ]


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    n_perms: int = N_PERMS,
    bands: int = BANDS,
    threshold: float = 0.7,
    text_col: str = "text",
) -> DataFrame:
    """LSH candidate generation + exact-Jaccard verification.

    Bands of r = n_perms/bands rows; band key = md5 of the concatenated
    signature slice. Candidates = pairs sharing any (band_id, band_hash);
    each candidate is verified with exact n-gram Jaccard, so output has no
    false positives (recall is the LSH knob: P[detect] = 1-(1-s^r)^b).
    """
    sig = minhash_signatures(docs, n, n_perms, text_col)
    # ONE posexplode, not a union of per-band selects: a union would paste
    # the signature subtree (explode + K-way min agg) once per band into the
    # plan, recomputing it B times per join side (measured ~2x whole-query)
    band_hashes = band_hash_exprs(n_perms, bands)
    banded = sig.select(
        "doc_id", F.posexplode(F.array(*band_hashes)).alias("band_id", "band_hash")
    ).repartition(64, "band_id", "band_hash")
    a = banded.alias("a")
    b_ = banded.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # verify ONLY candidates (the point of LSH). NO broadcast hints here:
    # on an adversarial corpus (huge near-dup clusters) the candidate set
    # is quadratic in the cluster size and a forced broadcast OOMs the
    # driver; AQE picks broadcast at runtime when the set actually fits,
    # and falls back to a shuffle join when it doesn't.
    # The shingle subtree is referenced three times below (sizes, sh_a,
    # sh_b) and once more by the signature pass above — deliberately
    # RECOMPUTED, not materialized: it is a scan-fused narrow explode
    # (projection + generator, no shuffle), and a localCheckpoint of the
    # exploded set costs more than the recomputes (measured at sf0.1:
    # 4.5 s recompute vs 4.5-5.9 s checkpointed; at 100 TB the exploded
    # shingle set is ~10x the corpus and would dominate local disk).
    sh = shingles(docs, n, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b2"), F.col("shingle").alias("shingle_b"))
    inter = (
        cand
        .join(sh_a, "doc_a")
        .join(sh_b, (F.col("doc_b") == F.col("doc_b2")) & (F.col("shingle") == F.col("shingle_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# 60 bits (not 64): the packed value stays positive in engines that check
# int64 overflow on shifts/sums; 4 pigeonhole chunks of 15 bits.
SIMHASH_BITS = 60


def simhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """60-bit SimHash over the doc's DISTINCT token set.

    bit_j(doc) = [ Σ_tokens (2·bit_j(h60(token)) − 1) > 0 ]; packed into one
    long. All bit sums are a single groupBy with 32 sum() aggregates.
    """
    tok = (
        docs.select("doc_id", F.explode(tokens_col(text_col)).alias("tok"))
        .distinct()
        .withColumn("h", h60(F.col("tok")))
    )
    sums = [
        F.sum(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"s_{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc_id").agg(*sums)
    packed = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s_{j}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        term = F.shiftleft(bit, j)
        packed = term if packed is None else packed + term
    return agg.select("doc_id", packed.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 6, text_col: str = "text") -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Local form is an all-pairs join (fine ≤10^5 docs); the scale path blocks
    on simhash chunks (pigeonhole: ≤r differing bits ⇒ some 32/(r+1)-bit
    chunk is identical) — see simhash_pairs_blocked.
    """
    sig = simhash_signatures(docs, text_col)
    a = sig.alias("a")
    b = sig.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs_blocked(
    docs: DataFrame, max_hamming: int = 6, n_blocks: int | None = None, text_col: str = "text"
) -> DataFrame:
    """Scale path: pigeonhole blocking. Split the 32-bit signature into
    n_blocks = max_hamming+1 chunks; any pair within distance ≤ max_hamming
    agrees on at least one chunk → equi-join per chunk, union, distinct,
    verify. Shuffle is O(docs × n_blocks), not all-pairs."""
    n_blocks = n_blocks or (max_hamming + 1)
    width = SIMHASH_BITS // n_blocks
    sig = simhash_signatures(docs, text_col)
    # ONE posexplode over the chunk array (see minhash_lsh_pairs: a union of
    # per-chunk selects recomputes the 60-agg signature per branch), then an
    # explicit repartition on the block key — the tiny post-AQE shuffle would
    # otherwise coalesce the pair-expansion join to one task
    masks = [((1 << width) - 1) << (c * width) for c in range(n_blocks)]
    blocked = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(*[F.col("simhash").bitwiseAND(F.lit(m)) for m in masks])
        ).alias("chunk_id", "chunk_val"),
    ).repartition(64, "chunk_id", "chunk_val")
    a = blocked.alias("a")
    b = blocked.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# connected components — pairs → clusters → one survivor per cluster


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """(doc_id, cluster_id) with cluster_id = min doc_id of the component.

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): provably converges in
    O(log^2 n) rounds on ANY graph shape — a 1M-link near-dup *chain* is as
    safe as the near-clique clusters LSH usually emits (those converge in
    2-3 rounds). Each round is two shuffle group-bys keyed on node id plus
    an equi-join back; nothing is ever collected to the driver except an
    O(1) convergence signature per round. This is the stage every pair
    emitter (minhash_lsh_pairs / simhash_pairs_blocked / RP-LSH cosine)
    feeds at 100 TB: dedup needs clusters with one survivor, not pairs —
    and a driver-side union-find over a pair list that can be billions of
    rows is not an option.

    Round r:
      large-star: for each node u, hang every neighbor v > u off
                  m(u) = min(N(u) ∪ {u})   → edges point "downhill"
      small-star: edges now oriented (big → small); for each u, hang u and
                  all its smaller neighbors off its min neighbor
    Fixpoint = forest of stars rooted at each component's minimum node.
    Convergence detected by an O(1) (count, xxhash64-xor) signature of the
    edge set — a collision would need two distinct edge sets with equal
    count AND equal 64-bit hash xor-fold across consecutive rounds.
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )
    # localCheckpoint, not persist: each round references the previous
    # frame ~5 times (union + two joins + distinct), so without lineage
    # truncation the logical plan grows ~5^rounds and the driver OOMs just
    # *printing* it by round 8. Checkpointing materializes the round and
    # cuts the plan to a leaf. (On a shared cluster with dynamic allocation
    # use reliable checkpoint(); local[N] executors are never reclaimed.)
    cur = edges.localCheckpoint(eager=True)
    prev_sig = None
    converged = False
    for _ in range(max_iter):
        # large-star over the undirected view
        und = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        lmin = (
            und.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least(F.col("u"), F.col("mv")).alias("m"))
        )
        large = (
            und.join(lmin, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: `large` is (big → small)-oriented, so min("v") is
        # m(u) over all of u's (smaller) neighbors
        smin = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(smin, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smin.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        nxt = small.localCheckpoint(eager=True)
        # xor fold, not sum: order-independent, ANSI-overflow-proof, and
        # the edge set is distinct so nothing can cancel spuriously
        row = nxt.agg(
            F.count("*").alias("c"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("s"),
        ).collect()[0]
        sig = (row["c"], row["s"])
        cur = nxt
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # never return a silently-unconverged clustering: max_iter rounds
        # bound ANY graph at O(log^2 n) — hitting the cap means something
        # is wrong (or max_iter was set absurdly low), so fail loudly
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    members = cur.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    roots = (
        cur.select(F.col("v").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
    )
    return members.union(roots)


def dedup_clusters(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.7,
    text_col: str = "text",
    **lsh_kwargs,
) -> DataFrame:
    """The complete near-dup dedup decision: LSH pairs → connected
    components → per-cluster survivor. One row per CLUSTERED doc:
    (doc_id, cluster_id, cluster_size, keep) — keep=1 only for the
    canonical (minimum) doc of its cluster; docs in no cluster are
    implicitly kept and not emitted. Downstream drop-set = rows with
    keep=0, an anti-join key list that is O(duplicates), not O(corpus)."""
    pairs = minhash_lsh_pairs(
        docs, n=n, threshold=threshold, text_col=text_col, **lsh_kwargs
    )
    cc = connected_components(pairs)
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).cast("int").alias("keep"),
    )


def dedup_keep_best(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.7,
    text_col: str = "text",
    **lsh_kwargs,
) -> DataFrame:
    """Cluster dedup with a QUALITY survivor rule: instead of keeping the
    first-seen (minimum doc_id) member of each near-dup cluster, keep the
    member with the most words — the RefinedWeb/FineWeb "keep the longest
    representative" convention — ties broken by min doc_id so the choice is
    deterministic. One row per clustered doc:
    (doc_id, cluster_id, cluster_size, n_words, keep_best).

    Scale shape: reuses dedup_clusters (LSH → connected components — nothing
    all-pairs), joins the O(duplicates) cluster assignment back to a 2-column
    projection of the corpus for word counts, and ranks inside clusters with
    a window partitioned by cluster_id (cluster sizes are bounded by the
    near-dup neighborhood, so no straggler partitions)."""
    from pyspark.sql.window import Window

    clusters = dedup_clusters(
        docs, n=n, threshold=threshold, text_col=text_col, **lsh_kwargs
    ).drop("keep")
    nw = docs.select("doc_id", F.size(tokens_col(text_col)).alias("n_words"))
    j = clusters.join(nw, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_words").desc(), F.col("doc_id").asc()
    )
    return j.select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        "n_words",
        (F.row_number().over(w) == 1).cast("int").alias("keep_best"),
    )


# ---------------------------------------------------------------------------
# chunk-level (paragraph-hash) dedup — CCNet / RefinedWeb style


def chunk_dedup(
    docs: DataFrame,
    chunk_words: int = 10,
    df_threshold: int = 2,
    keep_frac: float = 0.3,
    text_col: str = "text",
) -> DataFrame:
    """Sub-document dedup at chunk granularity (the CCNet paragraph-hash /
    RefinedWeb line-dedup rule, adapted to newline-free corpora): split each
    doc into consecutive non-overlapping `chunk_words`-word chunks, md5 each,
    count each chunk hash's document frequency GLOBALLY, and report per doc
    how much of its mass is chunks that also occur in >= df_threshold docs.

      n_chunks        — chunks in this doc
      n_dup_chunks    — chunks whose global doc-frequency >= df_threshold
      dup_chunk_frac  — n_dup_chunks / n_chunks
      keep            — dup_chunk_frac <= keep_frac (RefinedWeb drops docs
                        that are mostly boilerplate shared across the crawl)

    Scale shape: one explode O(tokens/chunk_words), a groupBy on the 32-hex
    chunk hash with partial aggregation below the shuffle (hot boilerplate
    chunks collapse map-side), an equi-join back on the hash, and a final
    per-doc fold. No self-join, nothing quadratic — unlike pair-based dedup
    this is linear in corpus size, which is why CCNet runs it on full
    CommonCrawl snapshots.
    """
    toks = tokens_col(text_col)
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_words)).cast("int")
    chunks = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i * chunk_words + 1, chunk_words))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = docs.select("doc_id", F.explode(chunks).alias("chunk_md5"))
    dfreq = (
        ex.distinct()
        .groupBy("chunk_md5")
        .agg(F.count("*").alias("chunk_df"))
    )
    per_doc = (
        ex.join(dfreq, "chunk_md5")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum((F.col("chunk_df") >= df_threshold).cast("long")).alias("n_dup_chunks"),
        )
    )
    frac = F.col("n_dup_chunks") / F.col("n_chunks")
    return per_doc.select(
        "doc_id",
        "n_chunks",
        "n_dup_chunks",
        frac.alias("dup_chunk_frac"),
        (frac <= keep_frac).cast("int").alias("keep"),
    )


def chunk_dedup_sql(
    chunk_words: int = 10, df_threshold: int = 2, keep_frac: float = 0.3
) -> str:
    """DuckDB oracle for chunk_dedup (same chunking, same md5)."""
    from ..functions.text import TOKENS_SQL

    toks = TOKENS_SQL.format(t="text")
    w = chunk_words
    return f"""
WITH t AS (
  SELECT doc_id, {toks} AS toks FROM documents
), c AS (
  SELECT doc_id,
         md5(array_to_string(toks[(i - 1) * {w} + 1:i * {w}], ' ')) AS chunk_md5
  FROM (
    SELECT doc_id, toks,
           unnest(generate_series(1, cast(ceil(len(toks) / {w}.0) AS bigint))) AS i
    FROM t WHERE len(toks) > 0
  )
), dfreq AS (
  SELECT chunk_md5, count(*) AS chunk_df
  FROM (SELECT DISTINCT doc_id, chunk_md5 FROM c)
  GROUP BY chunk_md5
)
SELECT c.doc_id,
       count(*) AS n_chunks,
       sum(CASE WHEN dfreq.chunk_df >= {df_threshold} THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks,
       sum(CASE WHEN dfreq.chunk_df >= {df_threshold} THEN 1 ELSE 0 END) * 1.0 / count(*) AS dup_chunk_frac,
       (CASE WHEN sum(CASE WHEN dfreq.chunk_df >= {df_threshold} THEN 1 ELSE 0 END) * 1.0 / count(*)
                  <= {keep_frac} THEN 1 ELSE 0 END)::BIGINT AS keep
FROM c JOIN dfreq USING (chunk_md5)
GROUP BY c.doc_id
"""


def boilerplate_strip(
    docs: DataFrame,
    chunk_words: int = 10,
    df_threshold: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """The TRANSFORM companion to chunk_dedup: chunk_dedup only *scores*
    documents by their boilerplate mass; this rewrites each document with the
    corpus-frequent chunks REMOVED (the C4 "discard any line seen more than
    once in the corpus" rule, at chunk granularity for newline-free text).
    A chunk survives iff its global document frequency < df_threshold; the
    survivors are reassembled in original order. Output per doc (docs with at
    least one chunk): (doc_id, n_chunks, n_kept, kept_frac, clean_text) —
    clean_text == '' when every chunk was boilerplate.

    Scale shape: identical to chunk_dedup — one explode O(tokens/chunk_words),
    one groupBy on the 32-hex chunk hash (map-side combine collapses hot
    boilerplate), one equi-join back, then ONE per-doc fold that both counts
    and reassembles (array_sort(collect_list(struct(i, chunk))) keyed by the
    in-doc chunk index; collect_list drops the NULLed boilerplate entries, so
    the carried state is only the kept chunks). Nothing quadratic; the
    reassembly group is bounded by document length."""
    toks = tokens_col(text_col)
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_words)).cast("int")
    chunk_structs = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.alias("i"),
                F.concat_ws(" ", F.slice(toks, i * chunk_words + 1, chunk_words)).alias(
                    "chunk"
                ),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<i:int,chunk:string>>"))
    ex = docs.select(
        "doc_id", F.explode(chunk_structs).alias("c")
    ).select("doc_id", "c.i", "c.chunk", F.md5("c.chunk").alias("chunk_md5"))
    dfreq = (
        ex.select("doc_id", "chunk_md5")
        .distinct()
        .groupBy("chunk_md5")
        .agg(F.count("*").alias("chunk_df"))
    )
    kept = F.col("chunk_df") < df_threshold
    per_doc = (
        ex.join(dfreq, "chunk_md5")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(kept, F.struct("i", "chunk")))
                    ),
                    lambda x: x["chunk"],
                ),
            ).alias("clean_text"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_chunks",
        "n_kept",
        F.round(F.col("n_kept") / F.col("n_chunks"), 6).alias("kept_frac"),
        "clean_text",
    )


def boilerplate_strip_sql(chunk_words: int = 10, df_threshold: int = 2) -> str:
    """DuckDB oracle for boilerplate_strip (same chunking, same df rule,
    order-preserving reassembly via string_agg ORDER BY chunk index)."""
    from ..functions.text import TOKENS_SQL

    toks = TOKENS_SQL.format(t="text")
    w = chunk_words
    return f"""
WITH t AS (
  SELECT doc_id, {toks} AS toks FROM documents
), c AS (
  SELECT doc_id, i,
         array_to_string(toks[(i - 1) * {w} + 1:i * {w}], ' ') AS chunk
  FROM (
    SELECT doc_id, toks,
           unnest(generate_series(1, cast(ceil(len(toks) / {w}.0) AS bigint))) AS i
    FROM t WHERE len(toks) > 0
  )
), dfreq AS (
  SELECT chunk_md5, count(*) AS chunk_df
  FROM (SELECT DISTINCT doc_id, md5(chunk) AS chunk_md5 FROM c)
  GROUP BY chunk_md5
), j AS (
  SELECT c.doc_id, c.i, c.chunk,
         (dfreq.chunk_df < {df_threshold}) AS kept
  FROM c JOIN dfreq ON dfreq.chunk_md5 = md5(c.chunk)
)
SELECT doc_id,
       count(*) AS n_chunks,
       sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       round(sum(CASE WHEN kept THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS kept_frac,
       coalesce(string_agg(CASE WHEN kept THEN chunk END, ' ' ORDER BY i), '') AS clean_text
FROM j
GROUP BY doc_id
"""


def dup_spans(
    docs: DataFrame,
    w: int = 10,
    min_count: int = 2,
    frac_threshold: float = 0.2,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-internal duplicated-span detection: the fixed-window exact
    form of suffix-array training-data dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): a w-token window is
    DUPLICATED when its exact token sequence occurs >= min_count times
    anywhere in the corpus (across docs or repeated within one doc —
    occurrence count, NOT doc frequency, which is what distinguishes this
    from chunk_dedup's boilerplate-mass rule above; windows OVERLAP, chunks
    don't). Per doc: the fraction of its windows that are duplicated; docs
    above frac_threshold are flagged for dropping/trimming.

    Output: (doc_id, n_windows, n_dup_windows, dup_frac, flagged) — one row
    per input doc (docs shorter than w tokens have 0 windows, dup_frac 0).

    Scale shape (100 TB): three linear shuffles, nothing quadratic —
      1. gram count: explode O(total tokens) windows -> groupBy(gram) with
         map-side partial aggregation (the repeated spans this op exists to
         find are exactly the ones partial agg collapses before the wire);
      2. dup marking: semi-join the window stream against the duplicated
         grams on the SAME gram key — co-partitioned with the count's
         output, so AQE reuses the exchange;
      3. per-doc rollup: groupBy(doc_id) count.
    The suffix-array construction the paper uses is a global sort the
    cluster can't shard cheaply; fixed-w windows give the same flagging
    decision for spans >= w at 1/w-th the index size and pure-DataFrame
    shape. h60 pre-hashing keeps gram shuffle rows ~16 B instead of the
    w-word string.
    """
    return _dup_spans_over(
        docs.select("doc_id", tokens_col(text_col).alias("toks")),
        w,
        min_count,
        frac_threshold,
    )


def tokens_dup_spans(
    seqs: DataFrame,
    w: int = 10,
    min_count: int = 2,
    frac_threshold: float = 0.2,
    id_col: str = "doc_id",
    tokens_col_name: str = "tokens",
) -> DataFrame:
    """dup_spans over PRE-TOKENIZED sequences (the input_hint table shape:
    doc_id + tokens array<int>) — the literal Lee et al. 2022 setting:
    dedup duplicated w-token spans in tokenized training data before it
    reaches the trainer. Same plan as dup_spans minus the tokenizer: the
    int arrays are cast to strings so the window join keys stay the
    engine-portable h60."""
    toks = F.col(tokens_col_name).cast("array<string>")
    return _dup_spans_over(
        seqs.select(F.col(id_col).alias("doc_id"), toks.alias("toks")),
        w,
        min_count,
        frac_threshold,
    )


def _dup_spans_over(
    base: DataFrame, w: int, min_count: int, frac_threshold: float
) -> DataFrame:
    """Shared core: base = (doc_id, toks array<string>).

    Plan shape: the gram subtree (explode + hash) is referenced exactly
    TWICE (occurrence count; dup marking) — n_windows comes straight from
    size(toks), never from a third explode. Gram identity is xxhash64:
    it is engine-INTERNAL (the DuckDB oracle counts the raw gram strings),
    so the cheap native hash beats the cross-engine md5 h60 — measured 4x
    end-to-end on 1M pre-tokenized sequences — and 64 bits dominates the
    60-bit alternative on collisions too."""
    grams = base.select(
        "doc_id",
        F.explode(word_ngrams(F.col("toks"), w)).alias("gram"),
    ).select("doc_id", F.xxhash64("gram").alias("g"))
    counts = grams.groupBy("g").agg(F.count("*").alias("cnt"))
    dup = counts.filter(F.col("cnt") >= min_count).select("g")
    per_doc = base.select(
        "doc_id",
        F.greatest(F.size("toks") - F.lit(w - 1), F.lit(0))
        .cast("long")
        .alias("n_windows"),
    )
    dup_per_doc = (
        grams.join(dup, "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_dup_windows"))
    )
    return (
        per_doc
        .join(dup_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_windows"), F.lit(0)).alias("n_windows"),
            F.coalesce(F.col("n_dup_windows"), F.lit(0)).alias("n_dup_windows"),
            F.when(
                F.coalesce(F.col("n_windows"), F.lit(0)) > 0,
                F.round(
                    F.coalesce(F.col("n_dup_windows"), F.lit(0))
                    / F.col("n_windows"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
        .withColumn(
            "flagged",
            (F.col("dup_frac") > F.lit(frac_threshold)).cast("int"),
        )
    )


def dup_spans_oracle_sql(
    w: int = 10,
    min_count: int = 2,
    frac_threshold: float = 0.2,
    t_cte: str | None = None,
) -> str:
    """DuckDB oracle for dup_spans (same windows, same occurrence rule;
    gram identity by the w-word string itself — h60 on the Spark side is a
    pure shuffle-size optimization, injective on these grams far below
    birthday bounds). t_cte overrides the token-source CTE body (must
    select doc_id + toks) — tokens_dup_spans uses it to point the same
    windowing SQL at pre-tokenized sequences."""
    from ..functions.text import TOKENS_SQL

    if t_cte is None:
        toks = TOKENS_SQL.format(t="text")
        t_cte = f"SELECT doc_id, {toks} AS toks FROM documents"
    return f"""
WITH t AS (
  {t_cte}
), g AS (
  SELECT doc_id, array_to_string(toks[i:i + {w - 1}], ' ') AS gram
  FROM (
    SELECT doc_id, toks,
           unnest(generate_series(1, greatest(len(toks) - {w - 1}, 0))) AS i
    FROM t
  )
), dup AS (
  SELECT gram FROM g GROUP BY gram HAVING count(*) >= {min_count}
), nw AS (
  SELECT doc_id, count(*) AS n_windows FROM g GROUP BY doc_id
), nd AS (
  SELECT doc_id, count(*) AS n_dup_windows
  FROM g WHERE gram IN (SELECT gram FROM dup) GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(nw.n_windows, 0) AS n_windows,
       coalesce(nd.n_dup_windows, 0) AS n_dup_windows,
       CASE WHEN coalesce(nw.n_windows, 0) > 0
            THEN round(coalesce(nd.n_dup_windows, 0) * 1.0 / nw.n_windows, 6)
            ELSE 0.0 END AS dup_frac,
       CASE WHEN (CASE WHEN coalesce(nw.n_windows, 0) > 0
                       THEN round(coalesce(nd.n_dup_windows, 0) * 1.0 / nw.n_windows, 6)
                       ELSE 0.0 END) > {frac_threshold}
            THEN 1 ELSE 0 END::BIGINT AS flagged
FROM t
LEFT JOIN nw USING (doc_id)
LEFT JOIN nd USING (doc_id)
"""


def dup_span_trim(
    docs: DataFrame,
    w: int = 10,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """The ACTION form of dup_spans: remove every token covered by a
    duplicated w-token window (Lee et al. 2022 delete the repeated
    substring itself, not the whole document — ExactSubstr dedup). A token
    at index t is removed when ANY duplicated window [p, p+w-1] covers it;
    surviving tokens are re-joined with single spaces (whitespace is
    normalized by tokenization, which the flagging op already fixed as the
    corpus contract).

    Output: (doc_id, n_tok, n_removed, trimmed_text).

    Scale shape: same three linear shuffles as dup_spans, plus a per-doc
    collect_set of duplicated window offsets — bounded by doc length, the
    unit all per-doc ops here already work in. The coverage test
    (token-index vs window-interval) runs inside array higher-order
    functions on the already-assembled row: zero extra shuffle, stays in
    codegen, never explodes the token stream a second time.
    """
    toks = tokens_col(text_col)
    base = docs.select("doc_id", toks.alias("toks"))
    grams = base.select(
        "doc_id",
        F.posexplode(word_ngrams(F.col("toks"), w)).alias("pos", "gram"),
    ).select("doc_id", "pos", F.xxhash64("gram").alias("g"))
    dup = (
        grams.groupBy("g")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("g")
    )
    dpos = (
        grams.join(dup, "g")
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("dup_pos"))
    )
    dp = F.coalesce(F.col("dup_pos"), F.array().cast("array<int>"))
    idx = F.sequence(F.lit(0), F.size("toks") - F.lit(1))
    kept_idx = F.filter(
        idx,
        lambda t: ~F.exists(dp, lambda p: (p <= t) & (t <= p + F.lit(w - 1))),
    )
    kept = F.transform(kept_idx, lambda t: F.element_at(F.col("toks"), t + 1))
    return base.join(dpos, "doc_id", "left").select(
        "doc_id",
        F.size("toks").alias("n_tok"),
        (F.size("toks") - F.size(kept)).alias("n_removed"),
        F.concat_ws(" ", kept).alias("trimmed_text"),
    )


def dup_span_trim_oracle_sql(w: int = 10, min_count: int = 2) -> str:
    """DuckDB oracle for dup_span_trim: relational form of the same rule —
    a token survives unless a duplicated window's [pos, pos+w-1] interval
    covers its index (1-based here; both engines agree on tokenization)."""
    from ..functions.text import TOKENS_SQL

    toks = TOKENS_SQL.format(t="text")
    return f"""
WITH t AS (
  SELECT doc_id, {toks} AS toks FROM documents
), tok AS (
  SELECT doc_id, unnest(toks) AS tk,
         unnest(generate_series(1, len(toks))) AS i
  FROM t
), g AS (
  SELECT doc_id, i AS pos, array_to_string(toks[i:i + {w - 1}], ' ') AS gram
  FROM (
    SELECT doc_id, toks,
           unnest(generate_series(1, greatest(len(toks) - {w - 1}, 0))) AS i
    FROM t
  )
), dup AS (
  SELECT gram FROM g GROUP BY gram HAVING count(*) >= {min_count}
), dwin AS (
  SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM dup)
), kept AS (
  SELECT tok.doc_id, tok.i, tok.tk FROM tok
  WHERE NOT EXISTS (
    SELECT 1 FROM dwin d
    WHERE d.doc_id = tok.doc_id AND d.pos <= tok.i AND tok.i <= d.pos + {w - 1}
  )
), k AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(tk, ' ' ORDER BY i) AS txt
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       len(t.toks) AS n_tok,
       len(t.toks) - coalesce(k.n_kept, 0) AS n_removed,
       coalesce(k.txt, '') AS trimmed_text
FROM t LEFT JOIN k USING (doc_id)
"""
