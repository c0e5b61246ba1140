"""Text-analysis column functions (LLM-pipeline extension surface).

The reference has no string processing beyond column renames
(SURVEY.md §2.7) — these are the training-data-pipeline operators the
engine adds (language-ID, quality scoring, token counting, document
fingerprinting). All are pure ``pyspark.sql.functions`` compositions:
JVM-side, whole-stage-codegen-able, no Python UDFs in the hot path, so
they stream through a 100 TB corpus at scan speed.

Every function has an exact ANSI-SQL equivalent (used by the DuckDB
correctness oracle), so regex patterns stick to syntax shared by Java
regex and RE2.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenization: words | single digits | single punctuation.
TOKEN_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

# Tiny per-language stopword anchors for the n-gram/lexicon heuristic.
LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "und", "die", "ist"],
    "fr": ["le", "et", "les", "est"],
    "es": ["el", "y", "los", "es"],
}


def ws_token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), r"\s+")).cast("int")


def token_count(text: Column) -> Column:
    """BPE-ish token count via regex pre-tokenization."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), F.lit(0))).cast("int")


def quality_score(text: Column) -> Column:
    """Heuristic quality score in [0,1]: length, word-shape, stopwords.

    Scalar double arithmetic (no aggregation, so IEEE ops are
    deterministic and oracle-exact):
      0.4 * min(n_chars,400)/400 + 0.4 * alpha_ratio + 0.2 * stopword_hit
    """
    n_chars = F.length(text).cast("double")
    len_part = F.least(n_chars, F.lit(400.0)) / F.lit(400.0)
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    alpha_ratio = alpha / F.greatest(n_chars, F.lit(1.0))
    stop_hit = F.when(text.rlike(r"\b(the|and|of|is)\b"), F.lit(1.0)).otherwise(F.lit(0.0))
    return (F.lit(0.4) * len_part + F.lit(0.4) * alpha_ratio
            + F.lit(0.2) * stop_hit).alias("quality_score")


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-word hit counts per language."""
    out = {}
    for lang, words in LANG_MARKERS.items():
        pat = r"\b(" + "|".join(words) + r")\b"
        out[lang] = F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), F.lit(0))).cast("int")
    return out


def lang_id(text: Column) -> Column:
    """Argmax language over marker scores ('und' when all zero).

    Ties break by fixed priority en > de > fr > es via a CASE cascade —
    the SQL oracle mirrors the identical cascade.
    """
    s = lang_scores(text)
    return (
        F.when((s["en"] == 0) & (s["de"] == 0) & (s["fr"] == 0) & (s["es"] == 0),
               F.lit("und"))
        .when((s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["es"]),
              F.lit("en"))
        .when((s["de"] >= s["fr"]) & (s["de"] >= s["es"]), F.lit("de"))
        .when(s["fr"] >= s["es"], F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def doc_fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint: md5 of normalized text.

    (md5 rather than xxhash64 so the DuckDB oracle computes the identical
    value; normalization = lowercase + whitespace collapse.)
    """
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def char_set(text: Column) -> Column:
    """Distinct-character array (basis of character-Jaccard similarity)."""
    return F.array_distinct(F.split(text, ""))


# -- corpus-preparation operators ------------------------------------------

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"


def redact_pii(text: Column) -> Column:
    """Mask emails and phone-like numbers (training-corpus hygiene).

    Regex classes shared by Java regex and RE2 so the SQL oracle
    computes the identical redaction.
    """
    out = F.regexp_replace(text, EMAIL_RE, "[EMAIL]")
    return F.regexp_replace(out, PHONE_RE, "[PHONE]")


def normalize_text(text: Column) -> Column:
    """Canonical form for dedup/fingerprints: lowercase, collapse
    whitespace, strip non-alphanumerics (keeping spaces)."""
    out = F.lower(F.trim(text))
    out = F.regexp_replace(out, r"[^a-z0-9 ]", " ")
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def split_assign(key: Column, train_pct: int = 80, val_pct: int = 10) -> Column:
    """Deterministic train/val/test assignment from a numeric id.

    Knuth multiplicative hash in plain integer arithmetic (identical in
    any SQL engine — no engine-specific hash function), bucketed 0-99.
    Stable across runs, partitions, and engines; adding data never
    reassigns existing ids.
    """
    # fold into 31 bits first so the multiply stays inside int64 (ANSI-safe)
    bucket = F.pmod(F.pmod(key.cast("bigint"), F.lit(2147483648))
                    * F.lit(2654435761), F.lit(100))
    return (F.when(bucket < train_pct, "train")
            .when(bucket < train_pct + val_pct, "val")
            .otherwise("test"))


def bigram_lm_scores(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", rare_max: int = 2) -> DataFrame:
    """Corpus-bigram language-model quality signals per document.

    The CCNet/Gopher-style perplexity gate of a pretraining pipeline:
    fit a bigram LM on the corpus itself (two count aggregations), score
    each document by its average negative log2 conditional probability
    ``-log2 c(w1,w2)/c(w1)``, plus the fraction of its bigrams that are
    corpus-rare (count <= ``rare_max``). High scores = improbable word
    sequences = boilerplate/garbled/degenerate text.

    Scale shape: the exploded bigram stream shuffles once per count
    aggregation (vocabulary-sized outputs, map-side partial combine) and
    once per count join; the per-doc finish groups by id. No UDFs, no
    driver-side state — the LM "fit" IS the aggregation.

    Determinism: counts and the rare fraction are exact integer math;
    the log scores are IEEE doubles rounded to 6 dp so the DuckDB oracle
    hash-matches (ln is the only non-exact op; 1-ulp engine differences
    vanish at 6 dp).
    """
    toks = F.split(F.trim(F.col(text_col)), " ")
    n = F.size(toks)
    base = docs.select(F.col(id_col), toks.alias("_toks"), n.alias("_n"))
    pairs = F.transform(
        F.sequence(F.lit(1), F.col("_n") - 1),
        lambda i: F.struct(
            F.element_at(F.col("_toks"), i).alias("w1"),
            F.concat_ws(" ", F.element_at(F.col("_toks"), i),
                        F.element_at(F.col("_toks"), i + 1)).alias("bigram")))
    bg = (base.filter(F.col("_n") >= 2)
          .select(id_col, F.explode(pairs).alias("_p"))
          .select(id_col, "_p.w1", "_p.bigram"))
    c2 = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("_c2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("_c1"))
    scored = (bg.join(c2, "bigram").join(c1, "w1")
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_bigrams"),
                   (F.sum(F.when(F.col("_c2") <= rare_max, 1).otherwise(0))
                    .cast("double") / F.count(F.lit(1))).alias("rare_bigram_frac"),
                   F.round(F.avg((F.log(F.col("_c1")) - F.log(F.col("_c2")))
                                 / F.log(F.lit(2.0))), 6).alias("avg_neg_log2p")))
    return (base.select(id_col).join(scored, id_col, "left_outer")
            .select(id_col,
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    F.coalesce("rare_bigram_frac", F.lit(0.0)).alias("rare_bigram_frac"),
                    "avg_neg_log2p"))
