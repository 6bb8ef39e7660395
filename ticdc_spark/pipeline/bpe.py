"""Distributed BPE merge learning — the tokenizer-training job a
pre-training pipeline runs over the corpus it just curated.

Classic byte-pair encoding (Sennrich et al. 2016) learned at corpus scale:

  1. ONE pass over the corpus builds the word-frequency table (explode +
     groupBy; the only corpus-sized job — everything after runs on the
     vocab-sized table, which is what makes BPE tractable at 100 TB: the
     iterate-over-merges loop never touches the corpus again).
  2. Each word is a symbol array (characters to start). Per merge step:
       a. count adjacent symbol pairs weighted by word frequency
          (posexplode over zip_with of the array and its shift — native
          columns, partial aggregation below the shuffle),
       b. argmax with a DETERMINISTIC tie-break (count desc, then pair
          lexicographic) collected to the driver — one row per step,
       c. rewrite every word's symbol array, merging non-overlapping
          occurrences LEFT TO RIGHT (the BPE contract) — inherently a
          sequential scan within each word, so this is the one Arrow-
          batched pandas UDF in the loop (vectorized over words; never
          row-at-a-time Python in the Spark sense).
  3. Output: the ordered merge table (rank, left, right) — the artifact a
     tokenizer ships.

Lineage: the symbol table is localCheckpoint-ed per step (an iterative
loop's plan otherwise compounds per round — same discipline as
connected_components). Words that can no longer merge (single symbol) are
dropped from the working set, so the working table shrinks as merges
consume it.

No DuckDB oracle: the per-step argmax + rewrite recurrence is not
expressible as a fixed SQL query; correctness is pinned by an exact
pure-python reference implementation over the same word-freq table
(tests/test_bpe.py) — merge-list equality, not just counts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over lowercased whitespace tokens — the ONLY
    corpus-sized job in BPE learning."""
    from ..functions.text import tokens_col

    return (
        docs.select(F.explode(tokens_col(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word freq. zip_with of the symbol
    array against its own tail gives the bigram list natively."""
    pairs = F.zip_with(
        F.slice(F.col("symbols"), 1, F.size("symbols") - 1),
        F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        syms.filter(F.size("symbols") >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _merge_step_udf(left: str, right: str):
    """Pandas UDF rewriting symbol arrays for one learned merge: greedy
    left-to-right, non-overlapping — the BPE contract."""
    from pyspark.sql.functions import pandas_udf

    merged = left + right

    def fn(col: pd.Series) -> pd.Series:
        out = []
        for symbols in col:
            s = list(symbols)
            i, res = 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    # registered positionally (type-hint registration breaks under
    # `from __future__ import annotations`)
    return pandas_udf(fn, "array<string>")


def bpe_learn(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[int, str, str, int]]:
    """Learn an ordered BPE merge list from the corpus. Returns
    [(rank, left, right, count), ...]; stops early when no pair reaches
    min_pair_count. Deterministic: ties break on (count desc, left asc,
    right asc)."""
    wf = word_freqs(docs, text_col)
    syms = wf.select(
        F.col("freq"),
        F.split(F.col("word"), "").alias("symbols"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            _pair_counts(syms)
            .orderBy(F.col("cnt").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(1)
            .collect()
        )
        if not top or int(top[0]["cnt"]) < min_pair_count:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["cnt"])
        merges.append((rank, left, right, cnt))
        apply_merge = _merge_step_udf(left, right)
        nxt = (
            syms.select("freq", apply_merge(F.col("symbols")).alias("symbols"))
            # fully-merged words can never produce another pair — drop them
            .filter(F.size("symbols") >= 2)
            .localCheckpoint(eager=True)
        )
        syms = nxt
    return merges


def bpe_merges_df(docs: DataFrame, n_merges: int = 50, text_col: str = "text") -> DataFrame:
    """The merge list as a DataFrame (rank, left, right, cnt) — the
    driver-query form."""
    spark = docs.sparkSession
    rows = bpe_learn(docs, n_merges=n_merges, text_col=text_col)
    return spark.createDataFrame(
        rows, "rank long, left string, right string, cnt long"
    )


def _encode_word_udf(merges: list):
    """Pandas UDF encoding one WORD into its BPE pieces by applying the
    learned merges in rank order, each greedily left-to-right. Rank order
    is equivalent to the repeat-lowest-rank-pair algorithm: a merge can
    only create pairs involving its new (later-ranked) symbol, never an
    earlier-ranked pair."""
    from pyspark.sql.functions import pandas_udf

    ordered = [(m[1], m[2]) for m in sorted(merges, key=lambda m: m[0])]

    def fn(col: pd.Series) -> pd.Series:
        out = []
        for word in col:
            s = list(word)
            for left, right in ordered:
                if len(s) < 2:
                    break
                i, res = 0, []
                while i < len(s):
                    if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                        res.append(left + right)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                s = res
            out.append(s)
        return pd.Series(out)

    return pandas_udf(fn, "array<string>")


def bpe_encode(
    docs: DataFrame, merges: list, text_col: str = "text"
) -> DataFrame:
    """Tokenize the corpus with a learned merge list. The corpus-scale
    trick: ENCODE THE VOCABULARY, NOT THE CORPUS — distinct words (vocab-
    sized) run the merge loop once each; the corpus pass is then a
    posexplode + equi-join + ordered reassembly, all native.

    Returns (doc_id, bpe_tokens array<string>, n_bpe)."""
    from ..functions.text import tokens_col

    ex = docs.select(
        "doc_id", F.posexplode(tokens_col(text_col)).alias("pos", "word")
    ).filter(F.col("word") != "")
    vocab = ex.select("word").distinct()
    enc = _encode_word_udf(merges)
    encoded = vocab.select("word", enc(F.col("word")).alias("pieces"))
    return (
        ex.join(encoded, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "pieces"))),
                    lambda s: s["pieces"],
                )
            ).alias("bpe_tokens")
        )
        .select("doc_id", "bpe_tokens", F.size("bpe_tokens").alias("n_bpe"))
    )
