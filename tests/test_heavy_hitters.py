"""Streaming Misra-Gries heavy hitters (streaming/heavyhitters.py)."""

from __future__ import annotations

import random
from collections import Counter


def test_mg_fold_guarantee_random():
    """Classic MG guarantees on adversarial-ish random folds: every
    counter underestimates by at most N/(k+1), and every item with
    true count > N/(k+1) is present."""
    from tb_lakehouse_enhanced_spark.streaming.heavyhitters import mg_fold
    rng = random.Random(7)
    k = 8
    for trial in range(20):
        # zipf-ish stream over 50 items, folded in random chunkings
        stream = [f"w{int(rng.paretovariate(1.0)) % 50}"
                  for _ in range(2000)]
        exact = Counter(stream)
        n = len(stream)
        summary: dict[str, int] = {}
        i = 0
        while i < n:
            step = rng.randint(1, 200)
            chunk = Counter(stream[i:i + step])
            summary = mg_fold(summary,
                              sorted(chunk.items(),
                                     key=lambda kv: (-kv[1], kv[0])), k)
            i += step
        assert len(summary) <= k
        bound = n // (k + 1)
        for w, est in summary.items():
            assert est <= exact[w]
            assert exact[w] - est <= bound
        for w, c in exact.items():
            if c > bound:
                assert w in summary, (trial, w, c, bound)


def test_mg_merge_guarantee():
    from tb_lakehouse_enhanced_spark.streaming.heavyhitters import (
        mg_fold, mg_merge,
    )
    rng = random.Random(3)
    k = 6
    s1 = [f"w{rng.randint(0, 30)}" for _ in range(1500)]
    s2 = [f"w{rng.randint(0, 12)}" for _ in range(1500)]
    a = mg_fold({}, sorted(Counter(s1).items()), k)
    b = mg_fold({}, sorted(Counter(s2).items()), k)
    m = mg_merge(a, b, k)
    exact = Counter(s1) + Counter(s2)
    n = len(s1) + len(s2)
    assert len(m) <= k
    bound = n // (k + 1)  # additive error of the parts stays within N/(k+1)
    for w, est in m.items():
        assert est <= exact[w]
        assert exact[w] - est <= bound


def test_stream_heavy_hitters_restart_accumulates(spark, tmp_path):
    """The summary lives in the state store: top items accumulate
    across a checkpoint restart, and the final estimates respect the
    MG bound against exact counts over ALL batches."""
    from tb_lakehouse_enhanced_spark.streaming.heavyhitters import (
        stream_heavy_hitters,
    )

    def write(rows):
        spark.createDataFrame(rows, "source string, item string") \
            .coalesce(1).write.mode("append").parquet(str(tmp_path / "in"))

    def start():
        stream = (spark.readStream.schema("source string, item string")
                  .option("maxFilesPerTrigger", 1)
                  .parquet(str(tmp_path / "in")))
        return (stream_heavy_hitters(stream, key_col="source",
                                     item_col="item", k=4)
                .writeStream.format("parquet")
                .option("path", str(tmp_path / "out"))
                .option("checkpointLocation", str(tmp_path / "ck"))
                .outputMode("append").start())

    b1 = [("s", w) for w in ["a"] * 60 + ["b"] * 25 + ["c"] * 10 + ["d"] * 5]
    b2 = [("s", w) for w in ["a"] * 40 + ["e"] * 30 + ["b"] * 20 + ["f"] * 10]

    write(b1)
    q = start()
    q.processAllAvailable()
    q.stop()

    write(b2)              # delivered only after the restart
    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    out = spark.read.parquet(str(tmp_path / "out")).collect()
    latest_total = max(r.n_total for r in out)
    assert latest_total == len(b1) + len(b2)  # state survived the restart
    final = {r.item: r.est_count for r in out if r.n_total == latest_total}
    exact = Counter(w for _s, w in b1 + b2)
    bound = latest_total // 5  # k=4
    for w, est in final.items():
        assert est <= exact[w] and exact[w] - est <= bound
    # the dominant item over both batches must be present and on top
    assert max(final, key=final.get) == "a"
