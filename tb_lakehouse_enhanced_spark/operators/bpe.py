"""Byte-pair-encoding tokenizer training as Spark aggregations.

BPE training (Sennrich et al., ACL 2016, "Neural Machine Translation of
Rare Words with Subword Units") is, per merge step, ONE weighted count
of adjacent symbol pairs over the word vocabulary plus an argmax — a
shape Spark executes as a grouped aggregation. The reference repo has no
tokenizer surface (SURVEY.md §2.7: its string work is renaming only);
this belongs to the LLM-data-pipeline extension mandated by
BASELINE.json.

Scale split:
- the CORPUS-sized work happens exactly once: ``word_counts`` reduces
  100 TB of text to a vocabulary-sized (word, count) relation — one
  explode + one groupBy shuffle;
- every merge iteration then runs on that vocabulary-sized relation
  (bounded by distinct words, not corpus tokens): adjacent-pair
  counting via in-row higher-order lambdas (codegen, no explode of the
  corpus), a 1-row argmax to the driver (the merge decision is a
  scalar), and a fold-based in-row pair substitution. localCheckpoint
  per round keeps the loop's lineage flat (same discipline as
  cluster.pagerank).

Everything is built-in expressions — no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_RE = "[a-z]+"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, cnt): lowercase alphabetic words. The single
    corpus-sized pass of BPE training."""
    w = F.explode(F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0))).alias("word")
    return (docs.select(w)
            .groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("cnt")))


def to_symbols(vocab: DataFrame) -> DataFrame:
    """(word, cnt) -> (word, syms array<string>, cnt): initial
    character-level symbol sequences."""
    return vocab.withColumn(
        "syms",
        F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))"))


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbolized vocabulary.

    (a, b, cnt): sum of word counts over every adjacent occurrence of
    the pair (overlaps count, matching the classical formulation).
    In-row 2-grams via transform over an index sequence — guarded so a
    1-symbol word yields an empty array (sequence(0,-1) would DESCEND,
    not produce nothing).
    """
    pairs = F.expr(
        "CASE WHEN size(syms) >= 2 THEN "
        "  transform(sequence(0, size(syms) - 2),"
        "            i -> struct(syms[i] AS a, syms[i+1] AS b)) "
        "ELSE array() END")
    return (vocab.select(F.explode(pairs).alias("p"), "cnt")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").cast("bigint").alias("cnt")))


def merge_pair(vocab: DataFrame, a: str, b: str) -> DataFrame:
    """Replace adjacent (a, b) with the merged symbol a||b, greedy
    left-to-right (so 'aaa' under merge (a,a) becomes ['aa','a']) — a
    fold over the symbol array, entirely in codegen."""
    merged = a + b
    fold = F.expr(
        "aggregate(syms, cast(array() as array<string>), (acc, x) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {_lit(a)} "
        f"          AND x = {_lit(b)} "
        f"     THEN concat(slice(acc, 1, size(acc) - 1), array({_lit(merged)})) "
        "     ELSE concat(acc, array(x)) END)")
    return vocab.withColumn("syms", fold)


def _lit(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def bpe_train(docs: DataFrame, n_merges: int,
              text_col: str = "text") -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns (merges, final_vocab): merges as [(a, b, weighted_count)]
    in learned order with the deterministic tie-break (max count, then
    lexicographic smallest pair), and the vocabulary with its final
    symbol sequences. Each iteration's argmax moves ONE row to the
    driver — the merge decision is a scalar, so this is not a
    collect-the-data antipattern; the vocabulary itself never leaves
    the cluster.
    """
    vocab = to_symbols(word_counts(docs, text_col)).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(int(n_merges)):
        top = (pair_counts(vocab)
               .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
               .limit(1).collect())
        if not top or top[0]["cnt"] <= 0:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((a, b, cnt))
        # flat lineage per round: without the checkpoint each iteration
        # re-codegens the whole growing fold chain (~2 s/round)
        vocab = merge_pair(vocab, a, b).localCheckpoint()
    return merges, vocab


def segment_words(words: DataFrame, merges: list[tuple[str, str, int]],
                  word_col: str = "word") -> DataFrame:
    """Apply learned merges to segment words (inference path): the same
    fold substitution replayed in learned order over any word relation.
    Adds ``pieces array<string>``."""
    out = words.withColumn(
        "pieces",
        F.expr(f"transform(sequence(1, length({word_col})),"
               f" i -> substr({word_col}, i, 1))"))
    for i, (a, b, _) in enumerate(merges):
        tmp = out.withColumnRenamed("pieces", "syms")
        tmp = merge_pair(tmp, a, b)
        out = tmp.withColumnRenamed("syms", "pieces")
        # real vocabularies carry thousands of merges: flatten the plan
        # every few folds or analysis/codegen chokes on the nested
        # aggregate chain (same lineage discipline as bpe_train's loop)
        if (i + 1) % 16 == 0:
            out = out.localCheckpoint(eager=False)
    return out
