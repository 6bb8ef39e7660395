"""Training-sequence packing — turn a corpus of variable-length token
documents into fixed-length training sequences (the "packed dataset" layout:
documents concatenated in a deterministic order, sequences cut every L
tokens; a document may span a boundary, recorded by its start/end offsets —
cu_seqlens-style metadata).

Pure window arithmetic (cumulative token counts), so it is one sort-shuffle
at any scale and oracle-checkable:

    offset(doc) = Σ n_tok of docs before it (order: doc_id)
    seq_id(doc) = offset // L

At 100 TB: the global cumulative sum is a range-partitioned sort (Spark's
window over a single ordering); for throughput, pack per shard (partition by
hash(doc) into S shards, offsets within shard) — same plan with shard in the
partition key, fully parallel, at the cost of ≤ S partially-filled tails.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_offsets(
    docs: DataFrame,
    seq_len: int,
    n_tok_col: str = "n_tok",
    order_col: str = "doc_id",
    shard_col: str | None = None,
) -> DataFrame:
    """Per-document packing metadata: (order cols..., start_off, end_off,
    seq_id, spans_boundary)."""
    part = [shard_col] if shard_col else []
    w = Window.partitionBy(*part).orderBy(order_col)
    cum = F.sum(n_tok_col).over(w)
    start = (cum - F.col(n_tok_col)).alias("start_off")
    out = docs.select(
        *( [shard_col] if shard_col else [] ),
        order_col,
        F.col(n_tok_col),
        start,
        cum.alias("end_off"),
    )
    return out.select(
        "*",
        (F.col("start_off") / seq_len).cast("long").alias("seq_id"),
        (
            (F.col("start_off") / seq_len).cast("long")
            != ((F.col("end_off") - 1) / seq_len).cast("long")
        ).alias("spans_boundary"),
    )


def pack_stats(docs: DataFrame, seq_len: int, **kw) -> DataFrame:
    """Per-sequence fill stats: docs starting in each sequence, tokens
    contributed, boundary-spanning count."""
    off = pack_offsets(docs, seq_len, **kw)
    return off.groupBy("seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.sum(F.col("spans_boundary").cast("long")).alias("n_spanning"),
        F.min("start_off").alias("first_off"),
    )
