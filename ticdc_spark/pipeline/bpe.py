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

DuckDB oracle (bpe_merges_oracle_sql): the fixed number of merge rounds
unrolls into a chain of CTEs — per round, a pair-count aggregate + argmax
with the same deterministic tie-break, then the greedy left-to-right
rewrite expressed as a single string replace() over a double-separator
encoding of the symbol array ('␟a␟␟b␟␟c␟'; pattern '␟l␟␟r␟' → '␟lr␟').
SQL replace scans the input once left-to-right without rescanning its own
output — exactly the BPE merge contract — and the doubled boundary
separators mean adjacent matches never share a character, so one replace
per round IS the greedy pass. A pure-python reference implementation
additionally pins merge-list equality in tests/test_bpe.py.
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


def _merge_chain_parts(
    n_merges: int, min_pair_count: int, text_col: str
) -> list[str]:
    """The shared CTE chain: word freqs → symbol encoding → n_merges rounds
    of (pair count, argmax m{k}, greedy rewrite s{k+1}). Used by both the
    merge-list oracle and the corpus-encode oracle."""
    from ..functions.text import TOKENS_SQL

    s = chr(30)
    d = s + s
    toks = TOKENS_SQL.format(t=text_col)
    parts = [
        f"""wf AS MATERIALIZED (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest({toks}) AS word FROM documents)
  WHERE word <> '' GROUP BY word
)""",
        f"""s0 AS MATERIALIZED (
  SELECT freq, '{s}' || substr(r, 1, length(r) - 1) AS s
  FROM (SELECT freq, regexp_replace(word, '(.)', '\\1{d}', 'g') AS r FROM wf)
)""",
    ]
    for k in range(n_merges):
        parts.append(f"""a{k} AS MATERIALIZED (
  SELECT freq, list_transform(string_split(s, '{d}'), x -> trim(x, '{s}')) AS a
  FROM s{k}
)""")
        parts.append(f"""p{k} AS (
  SELECT a[i] AS l, a[i + 1] AS r, sum(freq) AS cnt
  FROM (SELECT freq, a, unnest(range(1, len(a))) AS i FROM a{k} WHERE len(a) >= 2)
  GROUP BY 1, 2
)""")
        parts.append(f"""m{k} AS (
  SELECT {k} AS rank, l, r, cnt FROM p{k}
  WHERE cnt >= {int(min_pair_count)}
  ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
)""")
        parts.append(f"""s{k + 1} AS MATERIALIZED (
  SELECT freq, replace(s, '{s}' || l || '{d}' || r || '{s}',
                          '{s}' || l || r || '{s}') AS s
  FROM s{k}, m{k}
)""")
    return parts


def bpe_merges_oracle_sql(
    n_merges: int = 50, min_pair_count: int = 2, text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`bpe_merges_df` — the n_merges rounds unrolled
    as chained CTEs (see module docstring for the replace()-as-greedy-merge
    encoding). Separator chr(30) must not occur in corpus words (it is a
    control character; whitespace tokenization never produces it)."""
    parts = _merge_chain_parts(n_merges, min_pair_count, text_col)
    union = " UNION ALL ".join(f"SELECT * FROM m{k}" for k in range(n_merges))
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT cast(rank AS BIGINT) AS rank, l AS "left", r AS "right",
       cast(cnt AS BIGINT) AS cnt FROM ({union}) ORDER BY rank
"""
    )


def bpe_encode_oracle_sql(
    n_merges: int = 50,
    min_pair_count: int = 2,
    text_col: str = "text",
    join_sep: str = chr(31),
) -> str:
    """DuckDB twin of learn-then-:func:`bpe_encode`: the merge chain from
    :func:`_merge_chain_parts`, then a vocab-sized encode chain (the same
    greedy replace() per learned merge, applied to every DISTINCT word —
    mirroring bpe_encode's encode-the-vocabulary-not-the-corpus shape),
    then per-document reassembly in token order.

    Output: (doc_id, n_bpe, pieces) where pieces = the document's BPE
    tokens joined on `join_sep` (chr(31), the unit separator — absent from
    whitespace tokens for the same reason chr(30) is).

    The encode chain LEFT JOINs each m{{k}} so an early-stopped merge list
    (m{{k}} empty below min_pair_count) passes words through unchanged
    instead of emptying the chain."""
    s = chr(30)
    d = s + s
    parts = _merge_chain_parts(n_merges, min_pair_count, text_col)
    # v0: every distinct corpus word in the same double-separator symbol
    # encoding as s0
    parts.append(f"""v0 AS MATERIALIZED (
  SELECT word, '{s}' || substr(r, 1, length(r) - 1) AS s
  FROM (SELECT word, regexp_replace(word, '(.)', '\\1{d}', 'g') AS r FROM wf)
)""")
    for k in range(n_merges):
        parts.append(f"""v{k + 1} AS MATERIALIZED (
  SELECT v.word,
         CASE WHEN m.l IS NULL THEN v.s
              ELSE replace(v.s, '{s}' || m.l || '{d}' || m.r || '{s}',
                                '{s}' || m.l || m.r || '{s}') END AS s
  FROM v{k} v LEFT JOIN m{k} m ON TRUE
)""")
    from ..functions.text import TOKENS_SQL

    toks = TOKENS_SQL.format(t=text_col)
    parts.append(f"""enc AS (
  SELECT word,
         len(string_split(s, '{d}'))::BIGINT AS n_pieces,
         replace(trim(s, '{s}'), '{d}', '{join_sep}') AS pieces_str
  FROM v{n_merges}
)""")
    parts.append(f"""ex AS (
  SELECT doc_id, generate_subscripts(t, 1) AS pos, unnest(t) AS word
  FROM (SELECT doc_id, {toks} AS t FROM documents)
)""")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT e.doc_id,
       sum(c.n_pieces)::BIGINT AS n_bpe,
       string_agg(c.pieces_str, '{join_sep}' ORDER BY e.pos) AS pieces
FROM ex e JOIN enc c USING (word)
WHERE e.word <> ''
GROUP BY e.doc_id
"""
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
