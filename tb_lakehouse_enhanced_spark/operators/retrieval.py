"""Ranked keyword retrieval (BM25) over the document corpus.

The missing piece between dedup/quality filtering and curation: given a
small set of probe terms, score every document with Okapi BM25 and
return the top-k — the standard lexical-retrieval primitive for corpus
exploration, targeted curation ("find me the docs about X to
upsample"), and benchmark-contamination triage.

Shape (100 TB discipline):

- Per-term tf is a higher-order ``filter`` over the token array —
  whole-stage-codegen JVM expressions on the scan, no explode, no
  shuffle, no UDF. The probe set is small by contract (a user query),
  so tf columns are one expression per term.
- Corpus stats (N, Σdl, per-term df) are ONE scalar aggregate (map-side
  combined) broadcast back via crossJoin — two scans total, nothing
  wide. At a fixed corpus the stats sub-plan is a natural candidate for
  a materialized one-row table; the operator keeps it lazy so the whole
  thing stays a single Catalyst plan.
- Docs matching no term are filtered out BEFORE ranking, so the top-k
  (TakeOrdered: per-partition heap + driver merge of p*k rows) sees
  only the posting-list union, not the corpus.
- For large probe sets this flips into the inverted-index formulation
  (explode tokens -> (term, doc) postings join); the small-probe API
  here is the interactive shape.

Float policy (see ARCHITECTURE.md correctness gate): scores are double
and never emitted — only (doc_id, rank). Two same-length docs whose tf
mass is swapped between equal-df terms have MATHEMATICALLY equal scores
that the left-assoc sum computes in different addition order (1-2 ulp
apart), and ``ln`` itself is not correctly rounded (libm vs JVM may
differ by 1 ulp on the idf constants) — so raw-double ordering is not
engine-stable. Ranking therefore uses the micro-quantized score
``floor(score * 1e6)`` with doc_id tie-break: quantization collapses
ulp-noise ties into the same bucket in both engines (multiply and
floor are exactly-rounded IEEE ops), while genuinely different (tf, dl)
inputs land in different buckets. A boundary flip would need a true
score within ~1 ulp of a 1e-6 grid line (~1e-9 per doc) — far below
the flake budget the cosine/top-k family already carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def bm25_topk(docs: DataFrame, terms: list[str], k: int = 50,
              k1: float = K1, b: float = B,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Okapi BM25 top-k: idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)),
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl)).

    Returns (doc_id, rank), rank 1..k by score desc, doc_id asc.
    """
    if not terms:
        raise ValueError("need at least one probe term")
    toks = F.split(F.lower(F.trim(F.col(text_col))), " ")
    base = docs.select(F.col(id_col), toks.alias("_toks"))
    base = base.withColumn("_dl", F.size("_toks").cast("double"))
    def _eq(term):
        # unary closure: F.filter treats a 2-arg callable as (value, index)
        return lambda x: x == F.lit(term)

    for i, t in enumerate(terms):
        base = base.withColumn(
            f"_tf{i}",
            F.size(F.filter(F.col("_toks"), _eq(t))).cast("double"))
    base = base.drop("_toks")

    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_dl").alias("_sumdl"),
        *[F.sum((F.col(f"_tf{i}") > 0).cast("long")).cast("double")
          .alias(f"_df{i}") for i in range(len(terms))])

    hit = None
    for i in range(len(terms)):
        c = F.col(f"_tf{i}") > 0
        hit = c if hit is None else (hit | c)
    scored = base.filter(hit).crossJoin(F.broadcast(stats))

    avgdl = F.col("_sumdl") / F.col("_n")
    score = None
    for i in range(len(terms)):
        tf, df = F.col(f"_tf{i}"), F.col(f"_df{i}")
        idf = F.log(F.lit(1.0) + (F.col("_n") - df + F.lit(0.5))
                    / (df + F.lit(0.5)))
        term = (idf * tf * F.lit(k1 + 1.0)
                / (tf + F.lit(k1) * (F.lit(1.0) - F.lit(b)
                                     + F.lit(b) * F.col("_dl") / avgdl)))
        score = term if score is None else (score + term)

    bucket = F.floor(score * F.lit(1e6)).cast("bigint")
    topk = (scored.select(F.col(id_col), bucket.alias("_score"))
            .orderBy(F.desc("_score"), F.asc(id_col)).limit(k))
    # rank the <=k survivors (tiny relation; single-task window is fine)
    w = Window.orderBy(F.desc("_score"), F.asc(id_col))
    return (topk.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .select(id_col, "rank"))


def bm25_oracle_sql(terms: list[str], k: int = 50,
                    k1: float = K1, b: float = B) -> str:
    """DuckDB mirror of ``bm25_topk`` over the ``documents`` view —
    expression-for-expression the same double math (shared float
    literals via repr so both engines parse identical constants)."""
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(t, x -> x = '{t}')) AS DOUBLE) AS tf{i}"
        for i, t in enumerate(terms))
    df_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(len(terms)))
    hit = " OR ".join(f"tf{i} > 0" for i in range(len(terms)))
    score = "\n       + ".join(
        f"ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5)) * tf{i} * {k1 + 1.0!r}"
        f" / (tf{i} + {k1!r} * (1.0 - {b!r} + {b!r} * dl / (sumdl / n)))"
        for i in range(len(terms)))
    return f"""
WITH base AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents
), tf AS (
  SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl,
         {tf_cols}
  FROM base
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(dl) AS sumdl,
         {df_cols}
  FROM tf
), scored AS (
  SELECT doc_id,
         CAST(floor(({score}) * 1000000.0) AS BIGINT)
         AS score
  FROM tf, stats
  WHERE {hit}
)
SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
FROM scored ORDER BY score DESC, doc_id LIMIT {k}
"""


def hybrid_rrf_topk(docs: DataFrame, embeddings: DataFrame,
                    terms: list[str], query_vec_id: int, k: int = 20,
                    depth: int = 50, c: float = 60.0,
                    id_col: str = "doc_id", text_col: str = "text",
                    vec_id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Hybrid lexical+semantic retrieval via Reciprocal Rank Fusion
    (Cormack/Clarke/Buettcher, SIGIR 2009): BM25 top-``depth`` and
    cosine top-``depth`` lists fuse as score(d) = sum over lists of
    1/(c + rank_d), then the fused top-``k`` re-ranks — the standard
    way to combine keyword and embedding recall without calibrating
    incomparable score scales (RRF uses only RANKS, which also makes
    it cross-engine exact: 1/(c+rank) is one correctly-rounded
    division per list and one addition, identical doubles everywhere).

    Plan shape: both branches end in bounded top-``depth`` relations
    (TakeOrdered / windowed rank over partial top-k merges), so the
    fusion join + final rank run over <= 2*depth rows regardless of
    corpus size — the corpus is scanned once per branch and nothing
    wide ever shuffles.
    """
    from .similarity import cosine_topk
    lex = bm25_topk(docs, terms, k=depth, id_col=id_col, text_col=text_col)
    q = embeddings.filter(F.col(vec_id_col) == query_vec_id)
    sem = (cosine_topk(embeddings, q, k=depth,
                       id_col=vec_id_col, vec_col=vec_col)
           .select(F.col("neighbor_id").alias(id_col),
                   F.col("rank").alias("_sem_rank")))
    lexr = lex.select(id_col, F.col("rank").alias("_lex_rank"))
    fused = (lexr.join(sem, id_col, "full_outer")
             .select(id_col,
                     (F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("_lex_rank")),
                                 F.lit(0.0))
                      + F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("_sem_rank")),
                                   F.lit(0.0))).alias("_score")))
    w = Window.orderBy(F.desc("_score"), F.asc(id_col))
    # bounded window: <= 2*depth rows by construction
    return (fused.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(id_col, "rank"))


def hybrid_rrf_oracle_sql(terms: list[str], query_vec_id: int = 0,
                          k: int = 20, depth: int = 50,
                          c: float = 60.0) -> str:
    """DuckDB mirror of ``hybrid_rrf_topk``: the bm25 oracle as a CTE,
    the cosine rank list as in the simsearch_topk oracle, RRF-fused
    with identical double arithmetic."""
    bm25 = bm25_oracle_sql(terms, k=depth).strip().rstrip()
    return f"""
WITH lex AS (
  {bm25}
), sem AS (
  SELECT doc_id, rank FROM (
    SELECT cde.vec_id AS doc_id,
           CAST(ROW_NUMBER() OVER (
             ORDER BY list_cosine_similarity(qv.embedding, cde.embedding) DESC,
                      cde.vec_id) AS BIGINT) AS rank
    FROM embeddings cde,
         (SELECT embedding FROM embeddings WHERE vec_id = {query_vec_id}) qv
    WHERE cde.vec_id <> {query_vec_id}
  ) WHERE rank <= {depth}
), fused AS (
  SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
         COALESCE(1.0 / ({c!r} + lex.rank), 0.0)
         + COALESCE(1.0 / ({c!r} + sem.rank), 0.0) AS score
  FROM lex FULL JOIN sem ON lex.doc_id = sem.doc_id
)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
FROM fused ORDER BY score DESC, doc_id LIMIT {k}
"""


# ---------------------------------------------------------------- index -----
#
# bm25_topk recomputes tf/df/dl from the corpus per query — right for
# exploration, wrong for SERVING many queries against a fixed corpus.
# The persisted formulation mirrors what the IVF-PQ index does for
# dense vectors (operators/similarity.py): pay one indexing pass, then
# answer each probe from a partition-pruned fraction of the index.
#
# Layout: one parquet posting list partitioned by term_bucket =
# pmod(xxhash64(term), n_buckets) with rows (term, doc_id, tf, dl),
# plus a tiny JSON for the corpus constants (N, Σdl). df is NOT stored:
# a probe's pruned scan contains EVERY posting of its terms (bucket
# partitioning guarantees it), so per-term df is one tiny aggregate
# over the rows already scanned — which is what makes the index
# APPEND-ONLY maintainable (appending documents changes existing
# terms' df; stored df would go stale on every append). A probe hashes
# its terms through the SAME Spark expression the build used, scans
# only the matching bucket directories (PartitionFilters — the plan
# gate asserts it), and aggregates per doc.
#
# Determinism: the serving score quantizes each posting's contribution
# to floor(contrib * 1e6) BEFORE the per-doc sum, so the aggregate is
# an integer sum — order-independent, engine-exact — where bm25_topk
# quantizes after its fixed-order expression sum. The two rankings can
# therefore differ in ulp-tie corners; each is deterministic and each
# has its own oracle mirror.

def _bucket_expr(term_col, n_buckets: int):
    return F.pmod(F.xxhash64(term_col), F.lit(n_buckets))


# (term, n_buckets) -> bucket id. The probe must hash its terms with
# the ENGINE's xxhash64 (never a driver-side reimplementation), which
# costs one tiny local-relation job — measured ~0.2s, MORE than the
# pruned probe scan itself at sf0.1. The mapping is a pure function of
# (term, n_buckets) for a given engine build, so it memoizes safely for
# the process lifetime; repeat probes (the serving pattern) skip the
# job entirely, and only UNSEEN terms are ever hashed.
_BUCKET_MEMO: dict = {}


def _term_buckets(spark, terms, n_buckets: int) -> list[int]:
    missing = [t for t in dict.fromkeys(terms)
               if (t, n_buckets) not in _BUCKET_MEMO]
    if missing:
        # inline VALUES LocalRelation: ConvertToLocalRelation folds the
        # projection, so the collect evaluates the engine's hash
        # expression with NO Spark job (createDataFrame planned a
        # default-parallelism 32-task job for a handful of terms)
        vals = ",".join(
            "('" + t.replace("\\", "\\\\").replace("'", "\\'") + "')"
            for t in missing)
        rows = (spark.sql(f"SELECT * FROM (VALUES {vals}) AS t(term)")
                .select("term",
                        _bucket_expr(F.col("term"), n_buckets).alias("b"))
                .collect())
        for r in rows:
            _BUCKET_MEMO[(r["term"], n_buckets)] = int(r["b"])
    return sorted({_BUCKET_MEMO[(t, n_buckets)] for t in terms})


def _postings(docs: DataFrame, n_buckets: int,
              id_col: str, text_col: str, observe_into=None):
    toks = F.split(F.lower(F.trim(F.col(text_col))), " ")
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
    base = base.withColumn("dl", F.size("_toks").cast("double"))
    if observe_into is not None:
        # corpus constants (n, sumdl) ride the postings WRITE job as a
        # CollectMetrics node at the per-document grain — the batch is
        # tokenized and scanned ONCE total where the old shape ran a
        # second full aggregate pass over the corpus just for two
        # numbers (guide §1.2: don't compute things twice). Exact same
        # aggregate as the old pass: count(*) + sum(dl) over the
        # pre-explode rows.
        base = base.observe(observe_into,
                            F.count(F.lit(1)).cast("double").alias("n"),
                            F.sum("dl").alias("sumdl"))
    posts = (base.select("doc_id", "dl", F.explode("_toks").alias("term"))
             .groupBy("term", "doc_id", "dl")
             .agg(F.count(F.lit(1)).cast("double").alias("tf"))
             .withColumn("term_bucket",
                         _bucket_expr(F.col("term"), n_buckets))
             # cluster each bucket's file by term: parquet row-group
             # min/max stats then prune `term IN (...)` INSIDE the kept
             # bucket files too — one extra build-time shuffle, paid
             # once on a write-once/probe-many index. The partition
             # count is EXPLICIT (n_buckets — the write's natural
             # parallelism: one output file per bucket dir either way):
             # with the bare column form, AQE's byte-based coalescing
             # sees a few MB of shuffle output and serializes the
             # 64-directory write into ONE task (measured 0.76 s of the
             # 1.5 s entry); at cluster scale ≤n_buckets hash partitions
             # of the shuffle are non-empty anyway, so the explicit
             # count changes nothing there.
             .repartition(n_buckets, "term_bucket")
             .sortWithinPartitions("term", "doc_id"))
    return base, posts


def _observed_stats(obs, base: DataFrame):
    """The write-job observation's (n, sumdl) row. A provably-empty
    batch plans as a LocalRelation whose write runs ZERO tasks, so no
    ObservedMetrics event ever fires and ``obs.get`` fails — fall back
    to the direct (trivial: empty input) aggregate there."""
    try:
        return obs.get
    except Exception:
        return base.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("dl").alias("sumdl")).collect()[0]


def _write_stats(path: str, stats: dict) -> None:
    import json as _json
    import os as _os
    tmp = _os.path.join(path, "_bm25_stats.json.tmp")
    with open(tmp, "w") as f:
        _json.dump(stats, f)
    _os.replace(tmp, _os.path.join(path, "_bm25_stats.json"))


def build_bm25_index(docs: DataFrame, path: str, n_buckets: int = 64,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> dict:
    """One indexing pass: explode tokens -> (term, doc) tf counts (one
    shuffle on the posting grain), written partitioned by
    (ingest_batch, term_bucket) — the batch level exists so appends
    land in their OWN directory and the stats JSON's ``last_batch``
    high-water mark can make them atomic/replay-safe. Returns the
    stats dict."""
    import os as _os

    from pyspark.sql import Observation
    obs = Observation()
    base, posts = _postings(docs, n_buckets, id_col, text_col,
                            observe_into=obs)
    (posts.write.mode("overwrite").partitionBy("term_bucket")
     .parquet(_os.path.join(path, "postings", "ingest_batch=0")))
    stats_row = _observed_stats(obs, base)
    stats = {"n": float(stats_row["n"] or 0.0),
             "sumdl": float(stats_row["sumdl"] or 0.0),
             "n_buckets": n_buckets, "last_batch": 0,
             # the id column's Spark type, so probes against an EMPTY
             # bootstrap index return the same doc_id schema a
             # non-empty probe would (string-keyed corpora included)
             "id_type": base.schema["doc_id"].dataType.simpleString()}
    _write_stats(path, stats)
    return stats


def append_bm25_index(docs: DataFrame, path: str,
                      batch_id: int | None = None,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> dict:
    """Incremental maintenance: index a NEW batch of documents into an
    existing index — postings land in their own
    ``ingest_batch=<id>/term_bucket=*`` directories (zero existing
    files rewritten, O(|batch|) cost at any index size) and the corpus
    constants update in the stats JSON. Works because df is computed
    at probe time from the pruned scan, never stored; batch doc ids
    must be new (same contract as any doc store).

    Exactly-once on replay (the streaming-sink contract): a batch id
    at or below the recorded ``last_batch`` is skipped, and because the
    batch dir is OVERWRITTEN before the high-water mark advances, a
    crash between the two leaves a dir the probe's
    ``ingest_batch <= last_batch`` filter cannot see — the retry
    rewrites it cleanly and only then commits the mark.

    After any number of appends, a probe is IDENTICAL to one against
    an index rebuilt from scratch over the full corpus (asserted in
    test_operators.py)."""
    import json as _json
    import os as _os
    with open(_os.path.join(path, "_bm25_stats.json")) as f:
        stats = _json.load(f)
    last = int(stats.get("last_batch", 0))
    bid = last + 1 if batch_id is None else int(batch_id)
    if bid <= last:
        return stats                     # replayed batch: already applied
    from pyspark.sql import Observation
    obs = Observation()
    base, posts = _postings(docs, stats["n_buckets"], id_col, text_col,
                            observe_into=obs)
    (posts.write.mode("overwrite").partitionBy("term_bucket")
     .parquet(_os.path.join(path, _postings_dir(stats),
                            f"ingest_batch={bid}")))
    stats_row = _observed_stats(obs, base)
    stats["n"] = float(stats["n"] + (stats_row["n"] or 0.0))
    stats["sumdl"] = float(stats["sumdl"] + (stats_row["sumdl"] or 0.0))
    stats["last_batch"] = bid
    _write_stats(path, stats)
    return stats


def bm25_probe(spark, path: str, terms: list[str], k: int = 50,
               k1: float = K1, b: float = B) -> DataFrame:
    """Serve one query from the persisted index: scan ONLY the probe
    terms' bucket partitions, score each posting, integer-sum per doc.

    Returns (doc_id, rank) like ``bm25_topk`` (see the determinism
    note above on why the two rankings may differ at ulp ties)."""
    import json as _json
    import os as _os
    if not terms:
        raise ValueError("need at least one probe term")
    with open(_os.path.join(path, "_bm25_stats.json")) as f:
        stats = _json.load(f)
    n, sumdl = stats["n"], stats["sumdl"]
    if n == 0:
        # empty bootstrap index (streaming sink before its first
        # append): nothing to scan, schema-stable empty result — the
        # doc_id type comes from the build-time stats, not a hardcoded
        # long, so string-keyed corpora stay schema-consistent
        return spark.createDataFrame(
            [], f"doc_id {stats.get('id_type', 'bigint')}, rank bigint")
    # hash probe terms through the build's own Spark expression (never
    # reimplement the engine hash driver-side — same rule as the bloom
    # index probe); memoized per process, see _term_buckets
    buckets = _term_buckets(spark, terms, stats["n_buckets"])
    # ingest_batch <= last_batch excludes any batch dir written by a
    # crashed append whose high-water commit never happened (see
    # append_bm25_index); both predicates are PartitionFilters. The
    # postings dir name comes from the stats JSON so compaction can
    # flip to a fresh layout atomically.
    posts = (spark.read.parquet(_os.path.join(path, _postings_dir(stats)))
             .filter(F.col("term_bucket").isin(buckets)
                     & (F.col("ingest_batch") <= stats.get("last_batch", 0))
                     & F.col("term").isin(terms)))
    # df from the pruned scan itself: bucket partitioning guarantees
    # every posting of a probe term was scanned, so this tiny per-term
    # aggregate equals the full-corpus df — and nothing stored goes
    # stale when append_bm25_index adds documents
    dfreq = posts.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df"))
    posts = posts.join(F.broadcast(dfreq), "term")
    avgdl = sumdl / n
    idf = F.log(F.lit(1.0) + (F.lit(n) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    contrib = (idf * F.col("tf") * F.lit(k1 + 1.0)
               / (F.col("tf") + F.lit(k1) * (F.lit(1.0) - F.lit(b)
                                             + F.lit(b) * F.col("dl")
                                             / F.lit(avgdl))))
    qcontrib = F.floor(contrib * F.lit(1e6)).cast("bigint")
    scored = (posts.select("doc_id", qcontrib.alias("_qc"))
              .groupBy("doc_id").agg(F.sum("_qc").alias("_score")))
    topk = (scored.orderBy(F.desc("_score"), F.asc("doc_id")).limit(k))
    w = Window.orderBy(F.desc("_score"), F.asc("doc_id"))
    return (topk.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .select("doc_id", "rank"))


def bm25_indexed_oracle_sql(terms: list[str], k: int = 50,
                            k1: float = K1, b: float = B,
                            source: str = "documents") -> str:
    """DuckDB mirror of ``bm25_probe`` semantics computed from the raw
    corpus (the oracle needs no index — same postings, same per-posting
    quantization, same integer sum). ``source`` is any relation
    exposing (doc_id, text) — a table name or a parenthesized
    subquery — so composed corpora (e.g. chunked documents) mirror
    with the same algebra."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH base AS (
  SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM {source}
), toks AS (
  SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl, unnest(t) AS term FROM base
), posts AS (
  SELECT term, doc_id, dl, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM toks WHERE term IN ({term_list})
  GROUP BY term, doc_id, dl
), dfreq AS (
  -- df over the FULL corpus posting list, like the index build
  SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
  FROM toks GROUP BY term
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(CAST(len(t) AS DOUBLE)) AS sumdl
  FROM base
), contrib AS (
  SELECT p.doc_id,
         CAST(floor(
           ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
           * p.tf * {k1 + 1.0!r}
           / (p.tf + {k1!r} * (1.0 - {b!r} + {b!r} * p.dl / (s.sumdl / s.n)))
           * 1000000.0) AS BIGINT) AS qc
  FROM posts p JOIN dfreq d ON d.term = p.term, stats s
), scored AS (
  SELECT doc_id, SUM(qc) AS score FROM contrib GROUP BY doc_id
)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
FROM scored ORDER BY score DESC, doc_id LIMIT {k}
"""


def _postings_dir(stats: dict) -> str:
    return stats.get("dir", "postings")


def compact_bm25_index(spark, path: str) -> dict:
    """Fold the accumulated ingest-batch directories into one — the
    OPTIMIZE of the posting list. Streaming appends leave one directory
    (with one file set) per micro-batch; probe scan task counts should
    track index size, not ingest history.

    Atomic for concurrent probes: the compacted postings land in a NEW
    versioned directory (``postings_v<k>``) holding everything under a
    single ``ingest_batch=<last_batch>`` partition, and the stats JSON
    flips to it in one rename — a probe reads either the old layout or
    the new one, never a mix. ``last_batch`` is deliberately UNCHANGED
    so the streaming sink's replay guard keeps rejecting already-
    applied batch ids after compaction.

    The superseded directory is NOT removed here: a probe that loaded
    the stats JSON just before the flip lists the old directory's
    parquet files LAZILY (Spark defers file listing to job launch), so
    an immediate delete could fail that probe mid-flight — open file
    handles are not enough, the listing itself must still succeed.
    Superseded ``postings*`` dirs are swept by the NEXT maintenance
    pass (``maintain_bm25_index`` / the next ``compact``), by which
    point any probe that could have referenced them has long resolved
    — the same deferred-removal grace the managed table's vacuum uses.
    """
    import json as _json
    import os as _os
    with open(_os.path.join(path, "_bm25_stats.json")) as f:
        stats = _json.load(f)
    _sweep_superseded_postings(path, stats)
    old_dir = _postings_dir(stats)
    last = int(stats.get("last_batch", 0))
    committed = (spark.read.parquet(_os.path.join(path, old_dir))
                 .filter(F.col("ingest_batch") <= last)
                 .drop("ingest_batch"))
    ver = int(old_dir.rsplit("_v", 1)[1]) if "_v" in old_dir else 0
    new_dir = f"postings_v{ver + 1}"
    (committed.coalesce(max(1, stats["n_buckets"] // 8))
     .write.mode("overwrite").partitionBy("term_bucket")
     .parquet(_os.path.join(path, new_dir, f"ingest_batch={last}")))
    stats["dir"] = new_dir
    _write_stats(path, stats)
    # old_dir is now superseded; removal is deferred (see docstring)
    return stats


def rebucket_bm25_index(spark, path: str, n_buckets: int) -> dict:
    """Re-spread the posting list over a NEW bucket count — the rebucket
    ride on the compaction machinery for an index that has outgrown its
    build-time ``n_buckets`` (bucket file sizes grow with the corpus;
    probe pruning stays proportional to |probe terms| / n_buckets).

    Same atomicity contract as ``compact_bm25_index``: the rebucketed
    postings land in a fresh versioned directory under a single
    committed ingest batch, ``n_buckets`` and ``dir`` flip together in
    the one stats-JSON rename (a probe hashes its terms with whichever
    bucket count it read — old stats prune the old layout, new stats
    the new one, never a mix), ``last_batch`` is preserved so the
    streaming sink's replay guard survives, and the superseded
    directory is swept by the next maintenance pass."""
    import json as _json
    import os as _os
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    with open(_os.path.join(path, "_bm25_stats.json")) as f:
        stats = _json.load(f)
    old_dir = _postings_dir(stats)
    last = int(stats.get("last_batch", 0))
    committed = (spark.read.parquet(_os.path.join(path, old_dir))
                 .filter(F.col("ingest_batch") <= last)
                 .drop("ingest_batch")
                 .withColumn("term_bucket",
                             _bucket_expr(F.col("term"), n_buckets))
                 .repartition("term_bucket")
                 .sortWithinPartitions("term", "doc_id"))
    ver = int(old_dir.rsplit("_v", 1)[1]) if "_v" in old_dir else 0
    new_dir = f"postings_v{ver + 1}"
    (committed.write.mode("overwrite").partitionBy("term_bucket")
     .parquet(_os.path.join(path, new_dir, f"ingest_batch={last}")))
    stats["dir"] = new_dir
    stats["n_buckets"] = n_buckets
    _write_stats(path, stats)
    return stats


def _sweep_superseded_postings(path: str, stats: dict) -> list[str]:
    """Remove ``postings*`` directories superseded by an EARLIER
    compaction (anything other than the stats JSON's current dir).
    Called from maintenance entry points only, never inline with a
    flip, so concurrent probes get a full maintenance-interval grace
    before their layout disappears."""
    import os as _os
    import shutil as _sh
    cur = _postings_dir(stats)
    gone = []
    for d in _os.listdir(path):
        if d.startswith("postings") and d != cur \
                and _os.path.isdir(_os.path.join(path, d)):
            _sh.rmtree(_os.path.join(path, d), ignore_errors=True)
            gone.append(d)
    return gone


def maintain_bm25_index(spark, path: str, max_batches: int = 16) -> str:
    """Autonomous posting-list maintenance (the ManagedTable.maintain
    twin): compact when the committed ingest-batch count exceeds
    ``max_batches``, else do nothing. Metadata-only check (directory
    listing); returns 'compact' | 'noop' for scheduler logs."""
    import json as _json
    import os as _os
    with open(_os.path.join(path, "_bm25_stats.json")) as f:
        stats = _json.load(f)
    swept = _sweep_superseded_postings(path, stats)
    root = _os.path.join(path, _postings_dir(stats))
    n_batches = sum(1 for d in _os.listdir(root)
                    if d.startswith("ingest_batch="))
    if n_batches <= max_batches:
        return "sweep" if swept else "noop"
    compact_bm25_index(spark, path)
    return "compact"


def bm25_probe_many(spark, path: str, queries: DataFrame, k: int = 50,
                    k1: float = K1, b: float = B,
                    max_terms: int = 100_000) -> DataFrame:
    """Batch serving: score MANY queries against the persisted index in
    ONE job — the offline-eval / reranking-pipeline shape, where
    thousands of probes one-at-a-time would pay per-query scheduling.

    ``queries`` carries (query_id, terms array<string>). The distinct
    term set (bounded by ``max_terms`` — it is the probe vocabulary,
    not the corpus) resolves to bucket literals exactly like the
    single probe, the pruned posting scan joins the exploded
    (query_id, term) relation once, per-posting contributions quantize
    BEFORE the per-(query, doc) integer sum, and the per-query top-k
    is a rank window PARTITIONED BY query_id — never a global funnel.
    Returns (query_id, doc_id, rank).
    """
    import json as _json
    import os as _os
    with open(_os.path.join(path, "_bm25_stats.json")) as f:
        stats = _json.load(f)
    n, sumdl = stats["n"], stats["sumdl"]
    if n == 0:
        return spark.createDataFrame(
            [], f"query_id long, doc_id {stats.get('id_type', 'bigint')}, "
                f"rank bigint")
    qt = (queries.select(F.col(queries.columns[0]).alias("query_id"),
                         F.explode(F.col(queries.columns[1]))
                         .alias("term"))
          .dropDuplicates(["query_id", "term"]))
    terms = qt.select("term").distinct().limit(max_terms + 1).collect()
    if len(terms) > max_terms:
        raise ValueError(
            f"probe vocabulary exceeds max_terms={max_terms}; raise the "
            f"cap or shard the query set")
    term_list = [r["term"] for r in terms]
    buckets = _term_buckets(spark, term_list, stats["n_buckets"])
    posts = (spark.read.parquet(_os.path.join(path, _postings_dir(stats)))
             .filter(F.col("term_bucket").isin(buckets)
                     & (F.col("ingest_batch") <= stats.get("last_batch", 0))
                     & F.col("term").isin(term_list)))
    dfreq = posts.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df"))
    posts = posts.join(F.broadcast(dfreq), "term")
    avgdl = sumdl / n
    idf = F.log(F.lit(1.0) + (F.lit(n) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    contrib = (idf * F.col("tf") * F.lit(k1 + 1.0)
               / (F.col("tf") + F.lit(k1) * (F.lit(1.0) - F.lit(b)
                                             + F.lit(b) * F.col("dl")
                                             / F.lit(avgdl))))
    qc = F.floor(contrib * F.lit(1e6)).cast("bigint")
    scored = (posts.join(qt, "term")
              .select("query_id", "doc_id", qc.alias("_qc"))
              .groupBy("query_id", "doc_id")
              .agg(F.sum("_qc").alias("_score")))
    w = Window.partitionBy("query_id").orderBy(F.desc("_score"),
                                               F.asc("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "rank"))
