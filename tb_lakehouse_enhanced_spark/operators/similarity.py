"""Similarity search over embedding columns (LLM-pipeline extension).

- ``cosine_topk``  brute-force exact top-k. The query set is small by
  contract (it's the probe side), so it ships to every task inside an
  Arrow-batched ``mapInPandas`` closure; each corpus batch computes one
  numpy matmul (batch x dim) @ (dim x nq) and emits only its local
  top-(k+1) rows per query. A final windowed rank merges the per-batch
  partials. The corpus is scanned once, never shuffled, never collected;
  the shuffle carries <= batches*nq*(k+1) tiny rows.
- ``lsh_topk``     random-hyperplane (sign) LSH: vectors land in
  sign-pattern buckets and only bucket-mates are scored — same batch
  kernel, but each batch scores only candidates whose bucket matches a
  query bucket. At 100 TB the corpus is written bucketed/partitioned on
  the bucket id so a probe prunes to one partition per table.

Why Pandas-UDF here and JVM expressions elsewhere: a 64-dim dot product
per pair is exactly the shape Arrow+numpy wins at (one BLAS matmul per
batch vs 64 interpreted lambda evals per pair; measured ~20x on the
sf0.1 corpus). Scores are float64 matmuls — deterministic per platform;
outputs expose (query_id, neighbor_id, rank) only, and observed
adjacent-rank cosine gaps (>=3e-4) dwarf float error (~1e-15), so ranks
are stable against the SQL oracle's sequential-sum cosine.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_OUT_SCHEMA = "query_id long, neighbor_id long, cos double"


def _matrix(col: pd.Series) -> np.ndarray:
    m = np.stack([np.asarray(v, dtype=np.float64) for v in col])
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0  # zero vectors score 0 against everything
    return m / norms


def _mat_from_arrow(col) -> np.ndarray:
    """``_matrix`` from an Arrow list<float> column (r14, guide §4.2):
    the list column is one contiguous values buffer plus offsets, so
    the (n, dim) matrix is a flatten+reshape — no pandas object-Series
    of per-row arrays. float32 -> float64 widening is exact, and the
    normalization is the same float64 arithmetic, so downstream sims
    are bit-identical to the pandas path's."""
    import pyarrow as pa
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    lens = arr.value_lengths().to_numpy(zero_copy_only=False)
    if len(lens) == 0:
        return np.zeros((0, 0), dtype=np.float64)
    if (lens != lens[0]).any():
        raise ValueError("ragged embedding vectors")
    flat = arr.flatten().to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    m = flat.reshape(len(lens), int(lens[0]))
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return m / norms


def _train_sample_rows(df: DataFrame, vec_col: str, n: int) -> list:
    """Deterministic, partitioning-invariant uniform draw of ``n``
    vectors for quantizer training: bottom-``n`` by
    ``xxhash64(vector)`` (a TakeOrdered — per-partition heap + driver
    merge, never a full sort), tie-broken on the vector itself so the
    result is a pure function of the corpus CONTENTS. An unordered
    ``limit(n)`` takes whatever partitions answer first — at 100 TB
    that is a PREFIX of the first file(s), a biased sample that
    degrades IVF/PQ recall; the hash-bottom-n costs the same bounded
    collect and is unbiased at any scale (pytest pins invariance
    under ``repartition``)."""
    rows = (df.select(vec_col)
            .orderBy(F.xxhash64(F.col(vec_col)).asc(),
                     F.col(vec_col).asc())
            .limit(n).collect())
    return [r[0] for r in rows]


_MAX_QUERIES = 100_000  # probe sets are driver-collected by contract


def _collect_queries(queries: DataFrame, id_col: str, vec_col: str):
    """The query (probe) side ships to every task by CONTRACT — top-k
    search is queries-small / corpus-huge. The limit+raise makes that
    assumption explicit instead of letting an accidentally-huge probe
    relation OOM the driver; corpus-vs-corpus workloads belong on
    ``embedding_near_dup_lsh`` (no collect on either side)."""
    rows = queries.select(id_col, vec_col).limit(_MAX_QUERIES + 1).collect()
    if len(rows) > _MAX_QUERIES:
        raise ValueError(
            f"query set exceeds {_MAX_QUERIES} vectors; top-k probes are "
            "driver-collected by contract — for corpus-scale pair "
            "generation use embedding_near_dup_lsh instead")
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    qm = _matrix(pd.Series([r[1] for r in rows]))
    return qids, qm


def _topk_merge(partials: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (partials.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query vector (self-matches excluded).

    Returns (query_id, neighbor_id, rank); rank by cosine desc with
    neighbor-id tie-break so the result is fully deterministic.
    """
    qids, qm = _collect_queries(queries, id_col, vec_col)
    nq = len(qids)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            sims = _matrix(pdf[vec_col]) @ qm.T            # (n, nq)
            kk = min(k + 1, len(ids))                      # +1 absorbs self-match
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
            out_q = np.repeat(qids, kk)
            out_n = ids[top.T.ravel()]
            out_c = sims[top.T.ravel(), np.repeat(np.arange(nq), kk)]
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                                "cos": out_c})

    partials = (corpus.mapInPandas(score, _OUT_SCHEMA)
                .filter(F.col("query_id") != F.col("neighbor_id")))
    return _topk_merge(partials, k)


def _kmeans_centroids(sample: np.ndarray, k: int, iters: int = 8) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (the coarse
    quantizer training step of IVF). Seeded init, fixed iterations."""
    rng = np.random.default_rng(42)
    centroids = sample[rng.choice(len(sample), size=k, replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            members = sample[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    return centroids


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_lists: int = 16, n_probe: int = 4,
             sample_size: int = 2048,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF (inverted-file) approximate top-k.

    Train a coarse quantizer (k-means over a bounded driver-side
    sample), assign every corpus vector to its nearest centroid list,
    and score each query only against its ``n_probe`` closest lists.
    Recall/cost knob = n_probe/n_lists. At 100 TB the corpus is written
    partitioned by list id, so a probe touches n_probe partitions; the
    per-batch kernel below mirrors that pruning locally.
    """
    centroids = _kmeans_centroids(
        _matrix(pd.Series(_train_sample_rows(corpus, vec_col, sample_size))),
        n_lists)
    qids, qm = _collect_queries(queries, id_col, vec_col)
    # each query probes its n_probe nearest lists
    qd = ((qm[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probe_lists = np.argsort(qd, axis=1)[:, :n_probe]          # (nq, n_probe)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            cm = _matrix(pdf[vec_col])
            cd = ((cm[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
            clist = cd.argmin(axis=1)                          # list per vector
            outs = []
            for j, qid in enumerate(qids):
                mask = np.isin(clist, probe_lists[j])
                if not mask.any():
                    continue
                sims = cm[mask] @ qm[j]
                cand = ids[mask]
                kk = min(k + 1, len(cand))
                top = np.argpartition(-sims, kk - 1)[:kk]
                outs.append(pd.DataFrame({
                    "query_id": np.full(kk, qid, dtype=np.int64),
                    "neighbor_id": cand[top], "cos": sims[top]}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    partials = (corpus.mapInPandas(score, _OUT_SCHEMA)
                .filter(F.col("query_id") != F.col("neighbor_id")))
    return _topk_merge(partials, k)


def embedding_near_dup(corpus: DataFrame, threshold: float = 0.4,
                       id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= thr).

    ORACLE-PARITY all-pairs variant — NOT the default: use
    ``embedding_near_dup_lsh`` (the registered ``dedup_embedding``
    path) at scale. Here the corpus matrix ships to every task (it
    must fit in a broadcast — hard cap ~1M vectors) and each Arrow
    batch contributes one blocked matmul. Emits ids only: float scores
    differ in final bits across engines, ids don't.
    """
    cap = 1_000_000
    rows = corpus.select(id_col, vec_col).limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"corpus exceeds {cap} vectors — the all-pairs parity op is "
            "capped by design; use embedding_near_dup_lsh (the default "
            "dedup_embedding path) at scale")
    all_ids = np.array([r[0] for r in rows], dtype=np.int64)
    all_m = _matrix(pd.Series([r[1] for r in rows]))

    if len(rows) <= 4096:
        # the corpus is ALREADY on the driver (the cap contract
        # collected it); a second distributed pass would only pay a
        # Python-worker launch + Arrow shipping of the same matrix to
        # score a matmul that takes milliseconds — ~0.4s of fixed
        # overhead per call at sf0.1. One local blocked matmul and a
        # parallelized pair list instead; the distributed row-block
        # path below engages beyond the threshold (up to the 1M cap).
        sims = all_m @ all_m.T
        ii, jj = np.nonzero((sims >= threshold)
                            & (all_ids[:, None] < all_ids[None, :]))
        spark = corpus.sparkSession
        pairs = [(int(all_ids[i]), int(all_ids[j]))
                 for i, j in zip(ii, jj)]
        # explicit slice count (see cluster.py): defaultParallelism
        # slices would run a 32-task job to ship the local pair list
        return spark.createDataFrame(
            spark.sparkContext.parallelize(
                pairs, max(1, len(pairs) // 50_000 + 1)),
            "id_a long, id_b long")

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            sims = _matrix(pdf[vec_col]) @ all_m.T
            ii, jj = np.nonzero((sims >= threshold)
                                & (ids[:, None] < all_ids[None, :]))
            yield pd.DataFrame({"id_a": ids[ii], "id_b": all_ids[jj]})

    return corpus.mapInPandas(score, "id_a long, id_b long")


def _planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Fixed pseudo-random hyperplanes (LCG-seeded, library-stable)."""
    planes, state = [], seed
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 33) / float(1 << 31)) - 1.0)
        planes.append(row)
    return np.array(planes, dtype=np.float64)


def _buckets(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) >= 0.0                       # (n, n_planes)
    return bits @ (1 << np.arange(planes.shape[0], dtype=np.int64))


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_planes: int = 6, dim: int = 64,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: score only same-sign-bucket candidates.

    2^n_planes buckets; recall traded for a ~2^n_planes reduction in
    scored pairs. Same partial-top-k merge as ``cosine_topk``.
    """
    planes = _planes(dim, n_planes)
    qids, qm = _collect_queries(queries, id_col, vec_col)
    qb = _buckets(qm, planes)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            cm = _matrix(pdf[vec_col])
            cb = _buckets(cm, planes)
            outs = []
            for j, (qid, qbj) in enumerate(zip(qids, qb)):
                mask = cb == qbj
                if not mask.any():
                    continue
                sims = cm[mask] @ qm[j]
                cand_ids = ids[mask]
                kk = min(k + 1, len(cand_ids))
                top = np.argpartition(-sims, kk - 1)[:kk]
                outs.append(pd.DataFrame({
                    "query_id": np.full(kk, qid, dtype=np.int64),
                    "neighbor_id": cand_ids[top], "cos": sims[top]}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    partials = (corpus.mapInPandas(score, _OUT_SCHEMA)
                .filter(F.col("query_id") != F.col("neighbor_id")))
    return _topk_merge(partials, k)


def embedding_near_dup_lsh(corpus: DataFrame, threshold: float = 0.4,
                           n_planes: int = 6, n_rotations: int = 8,
                           dim: int = 64,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed (the DEFAULT
    scale path; the all-pairs sibling ``embedding_near_dup`` is the
    oracle-parity variant, capped at ~1M vectors).

    Candidate generation is a self-equi-join on (rotation, sign-bucket):
    each vector hashes to one 2^n_planes bucket per rotation of fixed
    hyperplanes, so candidate volume is sum over buckets of |bucket|^2
    instead of |corpus|^2 — a shuffle on the bucket key, never a cross
    join, never a driver collect. Multiple independent rotations recover
    the recall a single bucketing loses (a pair colliding in ANY
    rotation is a candidate). Survivors are verified with EXACT cosine
    (Arrow-batched numpy einsum) and de-duplicated across rotations.

    At 100 TB: the bucket step is one streamed pass (no state), the join
    shuffles on (rot, bucket) — 2^n_planes * n_rotations keys, sized via
    n_planes so per-bucket candidate blocks fit an executor; AQE's skew
    split handles hot buckets. Emits ids only, like the parity op.

    Recall curve (sign-LSH banding, defaults 6 planes x 8 rotations;
    per-bit collision p = 1 - arccos(cos)/pi, recall = 1-(1-p^6)^8):
    ~98% at cos 0.9, ~80% at 0.7, ~45% at 0.45 — the standard banded
    sigmoid: true near-dups are nearly always caught, borderline pairs
    are probabilistic (measured 98.5% on planted cos>=0.8 dups,
    tests/test_operators.py). Candidate volume vs all-pairs at uniform
    buckets = n_rotations / 2^n_planes = 12.5%; raise n_planes as the
    corpus grows to keep per-bucket blocks bounded.
    """
    all_planes = [_planes(dim, n_planes, seed=42 + r)
                  for r in range(n_rotations)]

    # Arrow-native kernels (r14, guide §4.2): the pandas exchange on
    # this path converted the vector column to an object Series of
    # per-row numpy arrays on every batch — pure serialization tax.
    # mapInArrow/applyInArrow hand the list<float> column over as one
    # contiguous values buffer + offsets; _mat_from_arrow reshapes it
    # straight into the SAME float64-normalized matrix _matrix()
    # builds (float32 -> float64 widening is exact), so sims/pairs are
    # bit-identical to the pandas path (_mat_from_arrow ≡ _matrix is
    # pinned by tests/test_opt_r14.py; the end result stays pinned by
    # the dedup_embedding value-hash oracle).
    import pyarrow as pa

    def bucketize(batches: Iterator[pa.RecordBatch]
                  ) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            ids = batch.column(0).cast(pa.int64())
            vec = batch.column(1)
            m = _mat_from_arrow(vec)
            for r, pl in enumerate(all_planes):
                # ids/vec re-emitted per rotation are zero-copy slices
                # of the input batch — only rot/bucket are new buffers
                yield pa.RecordBatch.from_arrays(
                    [ids, vec,
                     pa.array(np.full(batch.num_rows, r,
                                      dtype=np.int32)),
                     pa.array(_buckets(m, pl))],
                    names=["vid", "vec", "rot", "bucket"])

    # pass ONLY the two columns the kernel needs (§4.1: opaque
    # functions defeat column pruning — an explicit select is the
    # insurance)
    b = corpus.select(id_col, vec_col).mapInArrow(
        bucketize, "vid long, vec array<float>, rot int, bucket long")

    # Candidate generation + exact verify fused into ONE grouped kernel:
    # shuffle the (rot, bucket) rows once, then each bucket's pairs come
    # from a single in-task matmul over that bucket's block. (A self-
    # equi-join formulation is semantically identical but re-executes
    # the Python bucketize stage on both join branches and ships every
    # candidate pair's two vectors through the shuffle — measured 10x
    # slower at sf0.1. The grouped form moves each vector across the
    # wire once per rotation and crosses Python once more, total.)
    # NOTE: deliberately un-annotated — pyspark 4.1's applyInArrow has
    # an UnboundLocalError when type-hint inference raises on a
    # partially annotated function; the no-hints default is the
    # (key, pa.Table) -> pa.Table eval type this function implements
    def bucket_pairs(key, table):
        empty = pa.table({"id_a": pa.array([], type=pa.int64()),
                          "id_b": pa.array([], type=pa.int64())})
        if table.num_rows < 2:
            return empty
        k0 = key[0]
        rot = int(k0.as_py() if hasattr(k0, "as_py") else k0)
        ids = table.column("vid").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = _mat_from_arrow(table.column("vec"))  # float64 normalize,
        sims = m @ m.T                   # same arithmetic as the oracle
        ii, jj = np.nonzero((sims >= threshold)
                            & (ids[:, None] < ids[None, :]))
        # cross-rotation dedupe WITHOUT a distinct shuffle: emit a pair
        # only from its FIRST colliding rotation — both vectors are in
        # hand, so earlier rotations' buckets are a few in-task matmuls;
        # the union over rotations is unchanged but globally unique, so
        # no downstream exchange has to re-shuffle the (possibly huge,
        # when dup-dense) pair set just to dedupe it.
        if rot > 0 and len(ii):
            keep = np.ones(len(ii), dtype=bool)
            for r2 in range(rot):
                bk = _buckets(m, all_planes[r2])
                keep &= bk[ii] != bk[jj]
            ii, jj = ii[keep], jj[keep]
        if not len(ii):
            return empty
        return pa.table({"id_a": pa.array(ids[ii]),
                         "id_b": pa.array(ids[jj])})

    # explicit partition count for the grouping shuffle: the verify
    # kernel is Python CPU (per-bucket matmuls), which AQE's BYTE-based
    # coalescing cannot see — at sf0.1 it folded the 512 groups into 3
    # tasks (0.77 s serialized on a 32-core host). Scale-adaptive: keys
    # cap the useful parallelism (2^n_planes * n_rotations distinct
    # groups), ONE task wave (defaultParallelism) bounds it below —
    # measured best at sf0.1 (0.96 s vs 1.29 s at 2 waves vs 1.40 s
    # coalesced: per-task Python worker overhead dominates the tiny
    # per-bucket matmuls, so exactly one full wave wins). A same-keys
    # repartition satisfies the groupBy's clustering requirement, so
    # no second exchange appears (plan-checked).
    n_part = min(2 ** n_planes * n_rotations,
                 b.sparkSession.sparkContext.defaultParallelism)
    return (b.repartition(n_part, "rot", "bucket")
            .groupBy("rot", "bucket")
            .applyInArrow(bucket_pairs, "id_a long, id_b long"))


def ivf_assign(corpus: DataFrame, centroids: np.ndarray,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Corpus with an ``ivf_list`` column (nearest-centroid id per row)."""
    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            cm = _matrix(pdf[vec_col])
            d = ((cm[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
            out = pdf[[id_col, vec_col]].copy()
            out["ivf_list"] = d.argmin(axis=1).astype(np.int32)
            yield out
    schema = f"{id_col} long, {vec_col} array<double>, ivf_list int"
    return corpus.mapInPandas(assign, schema)


def ivf_write_partitioned(corpus: DataFrame, path: str, n_lists: int = 16,
                          sample_size: int = 2048,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> np.ndarray:
    """Materialize the IVF layout: corpus partitioned by list id.

    This is the physical form of the docstring claim in ``ivf_topk`` —
    at 100 TB a probe must touch ``n_probe`` partitions of the table,
    not scan it. Returns the trained centroids, and also PERSISTS them
    (plus the training-time quantization baseline) next to the table in
    ``_ivf_index.json`` — the index metadata that makes the layout
    self-describing for ``ivf_append_partitioned`` (incremental ingest)
    and ``ivf_check_drift`` (retrain trigger).
    """
    centroids = _kmeans_centroids(
        _matrix(pd.Series(_train_sample_rows(corpus, vec_col, sample_size))),
        n_lists)
    (ivf_assign(corpus, centroids, id_col, vec_col)
     .write.mode("overwrite").partitionBy("ivf_list").parquet(path))
    written = corpus.sparkSession.read.parquet(path)
    base = _mean_sq_dist(written, centroids, vec_col)
    n = written.count()
    _ivf_save_meta(path, centroids, base, n)
    return centroids


def ivf_probe_partitioned(spark, path: str, centroids: np.ndarray,
                          queries: DataFrame, k: int = 5, n_probe: int = 4,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Top-k over the partitioned IVF layout: the ``ivf_list IN (...)``
    filter is a PARTITION filter, so the scan reads only the probed
    lists' files (gated in test_plans.py)."""
    qids, qm = _collect_queries(queries, id_col, vec_col)
    qd = ((qm[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    lists = sorted({int(x) for row in qd.argsort(axis=1)[:, :n_probe]
                    for x in row})
    corpus = (spark.read.parquet(path)
              .filter(F.col("ivf_list").isin(lists)))
    return cosine_topk(corpus, queries, k=k, id_col=id_col, vec_col=vec_col)


def _ivf_meta_path(path: str) -> str:
    import os
    return os.path.join(path, "_ivf_index.json")


def _ivf_save_meta(path: str, centroids: np.ndarray,
                   mean_sq_dist: float, n: int) -> None:
    """Persist the index metadata next to the table: the trained
    centroids (they ARE the index) plus the training-time quantization
    baseline the drift trigger compares against."""
    import json
    import os
    os.makedirs(path, exist_ok=True)
    tmp = _ivf_meta_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"centroids": [[float(x) for x in c] for c in centroids],
                   "baseline_mean_sq_dist": mean_sq_dist,
                   "baseline_n": n}, f)
    os.replace(tmp, _ivf_meta_path(path))


def ivf_load_meta(path: str) -> tuple[np.ndarray, dict]:
    import json
    with open(_ivf_meta_path(path)) as f:
        meta = json.load(f)
    return np.asarray(meta["centroids"], dtype=np.float64), meta


def _mean_sq_dist(df_assigned: DataFrame, centroids: np.ndarray,
                  vec_col: str) -> float:
    """Mean squared distance of (normalized) vectors to their assigned
    centroid — the quantization-error statistic behind the drift
    trigger. One Arrow-batched pass + a 2-value aggregate."""
    def qerr(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            cm = _matrix(pdf[vec_col])
            cl = pdf["ivf_list"].to_numpy(dtype=np.int64)
            d = ((cm - centroids[cl]) ** 2).sum(axis=1)
            yield pd.DataFrame({"sq": d})
    agg = (df_assigned.mapInPandas(qerr, "sq double")
           .agg(F.sum("sq").alias("s"), F.count(F.lit(1)).alias("n"))
           .collect()[0])
    return float(agg["s"] / agg["n"]) if agg["n"] else 0.0


def ivf_append_partitioned(batch: DataFrame, path: str,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> None:
    """INCREMENTAL index maintenance: assign a new batch to the
    EXISTING centroids and append to the partitioned layout — one
    Arrow-batched pass over the batch, zero touches of the existing
    data (new files land inside the matching ``ivf_list=`` dirs, so
    the probe's partition pruning keeps working unchanged). This is
    the steady-state ingest path at 100 TB: only a drift-triggered
    retrain (``ivf_check_drift`` / ``ivf_write_partitioned``) ever
    rewrites the layout."""
    centroids, _meta = ivf_load_meta(path)
    (ivf_assign(batch, centroids, id_col, vec_col)
     .write.mode("append").partitionBy("ivf_list").parquet(path))


def ivf_check_drift(spark, path: str, threshold: float = 1.5,
                    vec_col: str = "embedding") -> dict:
    """Re-train trigger: current mean quantization error over the
    whole layout vs the training-time baseline. A ratio above
    ``threshold`` means the data distribution has moved away from the
    centroids (appended batches land far from every list center) and
    recall at fixed n_probe is degrading — time to retrain. Returns
    {ratio, drifted, current, baseline}."""
    centroids, meta = ivf_load_meta(path)
    cur = _mean_sq_dist(spark.read.parquet(path), centroids, vec_col)
    base = meta["baseline_mean_sq_dist"] or 1e-12
    ratio = cur / base
    return {"ratio": ratio, "drifted": ratio > threshold,
            "current": cur, "baseline": base}


def _pq_codebooks(sample: np.ndarray, m: int, nbits: int) -> np.ndarray:
    """Per-subspace k-means codebooks: shape (m, 2**nbits, dim//m).

    Product quantization (Jégou/Douze/Schmid, "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011): the vector splits into m
    subvectors, each quantized independently against 2**nbits centroids,
    so a d-dim float vector compresses to m*nbits bits while distances
    remain computable from per-subspace lookup tables (ADC)."""
    d = sample.shape[1]
    sub = d // m
    return np.stack([
        _kmeans_centroids(sample[:, s * sub:(s + 1) * sub].copy(), 2 ** nbits)
        for s in range(m)])


def pq_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
            m: int = 8, nbits: int = 8, rerank: int = 8,
            sample_size: int = 2048,
            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Product-quantization approximate top-k with exact re-ranking.

    Corpus vectors are PQ-encoded per Arrow batch (argmin against each
    subspace codebook — the 100 TB point: the INDEX is m*nbits bits per
    vector, ~64x smaller than the float vector, so it fits in memory
    where the vectors cannot). Queries score candidates by ADC: one
    (m x 2**nbits) inner-product lookup table per query, approximate
    score = sum of m table lookups. The top ``rerank*k`` ADC candidates
    per batch are re-scored EXACTLY against the float vectors (still in
    hand inside the batch), recovering most of the recall PQ loses —
    the standard IVF-PQ serving layout's re-rank stage.

    Deterministic (seeded codebooks, fixed iteration), but k-means
    training is iterative — not SQL-expressible, so the query entry is
    rows-only checked with a recall pytest against exact cosine_topk.
    """
    smp = _matrix(pd.Series(_train_sample_rows(corpus, vec_col, sample_size)))
    books = _pq_codebooks(smp, m, nbits)                 # (m, C, sub)
    qids, qm = _collect_queries(queries, id_col, vec_col)
    d = qm.shape[1]
    sub = d // m
    # per-query ADC tables: table[j][s][c] = <q_j[s], books[s][c]>
    tables = np.stack([
        np.stack([books[s] @ qm[j, s * sub:(s + 1) * sub]
                  for s in range(m)]) for j in range(len(qids))])

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            cm = _matrix(pdf[vec_col])
            # encode: codes[i, s] = nearest codebook entry of subvector s
            codes = np.empty((len(cm), m), dtype=np.int64)
            for s in range(m):
                block = cm[:, s * sub:(s + 1) * sub]
                dist = ((block[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = dist.argmin(axis=1)
            outs = []
            for j, qid in enumerate(qids):
                approx = tables[j][np.arange(m), codes].sum(axis=1)
                r = min(rerank * (k + 1), len(ids))
                cand = np.argpartition(-approx, r - 1)[:r]
                exact = cm[cand] @ qm[j]                  # re-rank exactly
                kk = min(k + 1, len(cand))
                top = np.argpartition(-exact, kk - 1)[:kk]
                outs.append(pd.DataFrame({
                    "query_id": np.full(kk, qid, dtype=np.int64),
                    "neighbor_id": ids[cand[top]], "cos": exact[top]}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    partials = (corpus.mapInPandas(score, _OUT_SCHEMA)
                .filter(F.col("query_id") != F.col("neighbor_id")))
    return _topk_merge(partials, k)


def pq_write_index(corpus: DataFrame, path: str, m: int = 8, nbits: int = 8,
                   sample_size: int = 2048, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> None:
    """Materialize the PQ index as TABLES: ``{path}/codes`` holds one
    row per vector (id + m small ints, ~64x smaller than the floats)
    and ``{path}/books`` holds the trained codebooks — the physical
    form of ``pq_topk``'s claim that the index fits where the vectors
    cannot. Training samples once on the driver; encoding is one
    Arrow-batched pass over the corpus, never collected or shuffled.
    """
    spark = corpus.sparkSession
    smp = _matrix(pd.Series(_train_sample_rows(corpus, vec_col, sample_size)))
    books = _pq_codebooks(smp, m, nbits)                 # (m, C, sub)
    d = smp.shape[1]
    sub = d // m

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            cm = _matrix(pdf[vec_col])
            codes = np.empty((len(cm), m), dtype=np.int32)
            for s in range(m):
                block = cm[:, s * sub:(s + 1) * sub]
                dist = ((block[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = dist.argmin(axis=1)
            yield pd.DataFrame({"vec_id": pdf[id_col].to_numpy(np.int64),
                                "codes": list(codes)})

    (corpus.select(id_col, vec_col)
     .mapInPandas(encode, "vec_id long, codes array<int>")
     .write.mode("overwrite").parquet(f"{path}/codes"))
    book_rows = [(int(s), int(c), [float(x) for x in books[s, c]])
                 for s in range(m) for c in range(books.shape[1])]
    (spark.createDataFrame(book_rows, "s int, c int, vec array<float>")
     .coalesce(1).write.mode("overwrite").parquet(f"{path}/books"))


def pq_probe_index(spark, path: str, queries: DataFrame, corpus: DataFrame,
                   k: int = 5, rerank: int = 8,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Serve top-k from the persisted PQ index: ADC-score the COMPRESSED
    codes table (the full vectors are never scanned), keep the top
    ``rerank*k`` candidates per query, then fetch ONLY those vectors by
    key (broadcast semi-join against the corpus) for the exact re-rank.
    The 100 TB shape: the scan touches m bytes per vector, and the float
    fetch is bounded by queries x rerank x k rows.
    """
    books_rows = spark.read.parquet(f"{path}/books").collect()
    m = 1 + max(r["s"] for r in books_rows)
    n_codes = 1 + max(r["c"] for r in books_rows)
    sub = len(books_rows[0]["vec"])
    books = np.zeros((m, n_codes, sub))
    for r in books_rows:
        books[r["s"], r["c"]] = np.asarray(r["vec"], dtype=np.float64)
    qids, qm = _collect_queries(queries, id_col, vec_col)
    tables = np.stack([
        np.stack([books[s] @ qm[j, s * sub:(s + 1) * sub]
                  for s in range(m)]) for j in range(len(qids))])
    n_cand = rerank * k

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(np.int64)
            codes = np.stack(pdf["codes"].to_numpy())    # (n, m)
            outs = []
            for j, qid in enumerate(qids):
                approx = tables[j][np.arange(m), codes].sum(axis=1)
                kk = min(n_cand, len(ids))
                top = np.argpartition(-approx, kk - 1)[:kk]
                outs.append(pd.DataFrame({"query_id": qid,
                                          "neighbor_id": ids[top]}))
            yield pd.concat(outs)

    cands = (spark.read.parquet(f"{path}/codes")
             .mapInPandas(adc, "query_id long, neighbor_id long"))
    # fetch only candidate vectors, exact-score, merge per query
    fetch = (corpus.select(F.col(id_col).alias("neighbor_id"),
                           F.col(vec_col).alias("_v"))
             .join(F.broadcast(cands.select("neighbor_id").distinct()),
                   "neighbor_id"))
    pairs = cands.join(fetch, "neighbor_id")

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qix = {int(q): i for i, q in enumerate(qids)}
        for pdf in batches:
            if pdf.empty:
                continue
            vm = _matrix(pdf["_v"])
            qs = pdf["query_id"].to_numpy(np.int64)
            cos = np.einsum("ij,ij->i", vm, qm[[qix[int(q)] for q in qs]])
            yield pd.DataFrame({"query_id": qs,
                                "neighbor_id": pdf["neighbor_id"].to_numpy(np.int64),
                                "cos": cos})

    scored = pairs.mapInPandas(exact, "query_id long, neighbor_id long, cos double")
    out = _topk_merge(scored, k + 1)
    # drop self-matches, re-rank the rest 1..k
    w = Window.partitionBy("query_id").orderBy("rank")
    return (out.filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


# ---------------------------------------------------------------- IVF-PQ ----

def ivfpq_write_index(corpus: DataFrame, path: str, n_lists: int = 16,
                      m: int = 8, nbits: int = 8, sample_size: int = 2048,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> None:
    """The production ANN serving layout — IVF + PQ combined (Jégou et
    al., TPAMI 2011): the coarse quantizer prunes WHICH partitions a
    probe reads (``ivf_list=`` partition dirs, like
    ``ivf_write_partitioned``), and inside each list vectors are stored
    as m-byte PQ codes of their RESIDUAL against the list centroid
    (residual encoding: the quantization error concentrates around the
    centroid, so the same codebook bits buy more accuracy than coding
    raw vectors). A probe therefore reads n_probe partitions of a table
    that is ~dim*4/m times smaller than the float vectors — at 100 TB
    of embeddings the scan is partition-pruned AND byte-compressed.

    Training (one bounded driver sample): k-means centroids, then
    per-subspace codebooks over the sample's residuals. Encoding is one
    Arrow pass over the corpus. Index metadata (centroids + codebooks)
    persists beside the table.
    """
    import json
    import os
    smp = _matrix(pd.Series(_train_sample_rows(corpus, vec_col, sample_size)))
    centroids = _kmeans_centroids(smp, n_lists)
    d = ((smp[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    resid = smp - centroids[d.argmin(axis=1)]
    books = _pq_codebooks(resid, m, nbits)               # (m, C, sub)
    dim = smp.shape[1]
    sub = dim // m

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            cm = _matrix(pdf[vec_col])
            dd = ((cm[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
            lists = dd.argmin(axis=1)
            rr = cm - centroids[lists]
            codes = np.empty((len(cm), m), dtype=np.int32)
            for s in range(m):
                block = rr[:, s * sub:(s + 1) * sub]
                dist = ((block[:, None, :] - books[s][None, :, :]) ** 2
                        ).sum(axis=2)
                codes[:, s] = dist.argmin(axis=1)
            yield pd.DataFrame({
                "vec_id": pdf[id_col].to_numpy(np.int64),
                "ivf_list": lists.astype(np.int32),
                "codes": list(codes)})

    (corpus.select(id_col, vec_col)
     .mapInPandas(encode, "vec_id long, ivf_list int, codes array<int>")
     .write.mode("overwrite").partitionBy("ivf_list")
     .parquet(f"{path}/codes"))
    os.makedirs(path, exist_ok=True)
    meta = {"centroids": [[float(x) for x in c] for c in centroids],
            "books": [[[float(x) for x in bc] for bc in books[s]]
                      for s in range(m)],
            "m": m, "nbits": nbits, "dim": dim}
    tmp = os.path.join(path, "_ivfpq_index.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, "_ivfpq_index.json"))


def ivfpq_probe(spark, path: str, queries: DataFrame, corpus: DataFrame,
                k: int = 5, n_probe: int = 4, rerank: int = 8,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Serve top-k from the IVF-PQ layout: the ``ivf_list IN (...)``
    predicate is a PARTITION filter (only probed lists' files are
    read), ADC scores the m-byte codes — approx(q, v in list l) =
    <q, centroid_l> + sum_s table_q[s][code_s] with the table built
    over the RESIDUAL codebooks — and the top ``rerank*k`` candidates
    per query re-rank EXACTLY via a bounded keyed fetch of their float
    vectors. Scan bytes ~ m per vector over n_probe partitions; exact
    work ~ queries * rerank * k rows.
    """
    import json
    import os
    with open(os.path.join(path, "_ivfpq_index.json")) as f:
        meta = json.load(f)
    centroids = np.asarray(meta["centroids"])
    books = np.asarray(meta["books"])                    # (m, C, sub)
    m = meta["m"]
    sub = meta["dim"] // m
    qids, qm = _collect_queries(queries, id_col, vec_col)
    qd = ((qm[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    probe_lists = qd.argsort(axis=1)[:, :n_probe]        # (nq, n_probe)
    lists = sorted({int(x) for row in probe_lists for x in row})
    qc = qm @ centroids.T                                # (nq, n_lists)
    tables = np.stack([
        np.stack([books[s] @ qm[j, s * sub:(s + 1) * sub]
                  for s in range(m)]) for j in range(len(qids))])
    n_cand = rerank * k

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(np.int64)
            ls = pdf["ivf_list"].to_numpy(np.int64)
            codes = np.stack(pdf["codes"].to_numpy())    # (n, m)
            outs = []
            for j, qid in enumerate(qids):
                mask = np.isin(ls, probe_lists[j])
                if not mask.any():
                    continue
                approx = (qc[j, ls[mask]]
                          + tables[j][np.arange(m), codes[mask]].sum(axis=1))
                kk = min(n_cand, int(mask.sum()))
                top = np.argpartition(-approx, kk - 1)[:kk]
                outs.append(pd.DataFrame({
                    "query_id": np.full(kk, qid, dtype=np.int64),
                    "neighbor_id": ids[mask][top]}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    cands = (spark.read.parquet(f"{path}/codes")
             .filter(F.col("ivf_list").isin(lists))      # PartitionFilter
             .mapInPandas(adc, "query_id long, neighbor_id long"))
    fetch = (corpus.select(F.col(id_col).alias("neighbor_id"),
                           F.col(vec_col).alias("_v"))
             .join(F.broadcast(cands.select("neighbor_id").distinct()),
                   "neighbor_id"))
    pairs = cands.join(fetch, "neighbor_id")

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qix = {int(q): i for i, q in enumerate(qids)}
        for pdf in batches:
            if pdf.empty:
                continue
            vm = _matrix(pdf["_v"])
            qs = pdf["query_id"].to_numpy(np.int64)
            cos = np.einsum("ij,ij->i", vm, qm[[qix[int(q)] for q in qs]])
            yield pd.DataFrame({
                "query_id": qs,
                "neighbor_id": pdf["neighbor_id"].to_numpy(np.int64),
                "cos": cos})

    scored = pairs.mapInPandas(exact, _OUT_SCHEMA)
    out = _topk_merge(scored, k + 1)
    w = Window.partitionBy("query_id").orderBy("rank")
    return (out.filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
