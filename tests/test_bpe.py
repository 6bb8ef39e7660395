"""Distributed BPE merge learning vs an exact pure-python reference: the
ordered merge list must match EXACTLY (same greedy left-to-right rewrite,
same deterministic tie-break)."""

import os
import sys
from collections import Counter

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _py_bpe(word_freqs, n_merges, min_pair_count=2):
    """Reference BPE (Sennrich et al.): dict of word->freq, char symbols."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(n_merges):
        counts = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (left, right), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((rank, left, right, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            s, i, res = list(syms), 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            if len(res) >= 2:  # mirror the engine's shrink rule
                new_vocab[tuple(res)] = new_vocab.get(tuple(res), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_matches_reference_on_fixture_corpus(spark):
    from ticdc_spark.pipeline.bpe import bpe_learn, word_freqs

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text").limit(120)
    wf = {r["word"]: r["freq"] for r in word_freqs(docs).collect()}
    want = _py_bpe(wf, n_merges=25)
    got = bpe_learn(docs, n_merges=25)
    assert got == want
    assert len(got) == 25  # the fixture corpus supports a full run


def test_bpe_greedy_overlap_and_early_stop(spark):
    """'aaaa' with freq 3: merge (a,a) counts 9 pairwise but greedy
    non-overlap rewrites to (aa,aa); next merge is (aa,aa). Early stop when
    nothing reaches min_pair_count."""
    from ticdc_spark.pipeline.bpe import bpe_learn

    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa"), (2, "bc")], "doc_id long, text string"
    )
    got = bpe_learn(docs, n_merges=10)
    assert got[0][1:3] == ("a", "a")
    assert got[1][1:3] == ("aa", "aa")
    # 'bc' freq 1 stays below min_pair_count=2 -> stop after the a-merges
    assert all(m[1] != "b" for m in got)


def _py_encode(text, merges):
    ordered = [(m[1], m[2]) for m in sorted(merges, key=lambda m: m[0])]
    out = []
    for word in text.lower().strip().split():
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
        out.extend(s)
    return out


def test_bpe_encode_matches_reference(spark):
    from ticdc_spark.pipeline.bpe import bpe_encode, bpe_learn

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text").limit(80)
    merges = bpe_learn(docs, n_merges=20)
    got = {r["doc_id"]: list(r["bpe_tokens"]) for r in bpe_encode(docs, merges).collect()}
    for row in docs.collect():
        assert got[row["doc_id"]] == _py_encode(row["text"], merges), row["doc_id"]
    # round-trip: concatenating pieces re-yields each word stream
    for row in docs.collect():
        assert "".join(got[row["doc_id"]]) == "".join(row["text"].lower().strip().split())
