"""BPE tokenizer training (operators/bpe.py): differential vs a pure-
Python reference implementation of the classical algorithm."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from tb_lakehouse_enhanced_spark.operators.bpe import (
    bpe_train, merge_pair, pair_counts, segment_words, to_symbols, word_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def _ref_bpe(texts, n_merges):
    wc = Counter(w for t in texts for w in re.findall("[a-z]+", t.lower()))
    vocab = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, c in wc.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        for w, s in vocab.items():
            acc = []
            for x in s:
                if acc and acc[-1] == a and x == b:
                    acc[-1] = a + b
                else:
                    acc.append(x)
            vocab[w] = acc
    return merges, vocab


def test_merge_pair_greedy_left_to_right(spark):
    v = spark.createDataFrame([("aaa", 1)], "word string, cnt long")
    out = merge_pair(to_symbols(v), "a", "a").collect()[0]["syms"]
    assert out == ["aa", "a"]


def test_pair_counts_tiny(spark):
    # "abab" x2 + "ab" x1 -> (a,b): 2*2+1=5, (b,a): 2
    docs = spark.createDataFrame(
        [("abab abab",), ("ab",)], "text string")
    pc = {(r.a, r.b): r.cnt
          for r in pair_counts(to_symbols(word_counts(docs))).collect()}
    assert pc == {("a", "b"): 5, ("b", "a"): 2}


def test_bpe_train_matches_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(120)
    texts = [r.text for r in docs.select("text").collect()]
    ref_merges, ref_vocab = _ref_bpe(texts, 10)
    merges, vocab = bpe_train(docs, 10)
    assert merges == ref_merges
    got = {r.word: r.syms for r in vocab.collect()}
    assert got == {w: list(s) for w, s in ref_vocab.items()}


def test_segment_words_applies_learned_merges(spark):
    docs = spark.createDataFrame(
        [("low lower lowest low low",)], "text string")
    merges, _ = bpe_train(docs, 3)
    words = spark.createDataFrame([("lowly",)], "word string")
    pieces = segment_words(words, merges).collect()[0]["pieces"]
    # replaying the merges on an unseen word reproduces the reference
    ref = list("lowly")
    for a, b, _ in merges:
        acc = []
        for x in ref:
            if acc and acc[-1] == a and x == b:
                acc[-1] = a + b
            else:
                acc.append(x)
        ref = acc
    assert pieces == ref
