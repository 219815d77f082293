"""A/B bench: HOF-fold vs Arrow/numpy cosine scorer at >=1M vectors.

Measures similarity.brute_force_topk end-to-end (scoring dominates: corpus
x |queries| pairwise cosines + per-query top-k) with scorer="hof" vs
scorer="numpy" on a deterministic synthetic corpus. Run alone on the box;
results recorded in BENCH/BASELINE.md.

Usage: python BENCH/scorer_bench.py [n_vectors] [n_queries]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 8
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from sparkcheck import similarity

    mem = "16g"
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", mem)
        .config("spark.driver.extraJavaOptions", f"-Xms{mem} -XX:+AlwaysPreTouch")
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/tmp/sparkcheck_scorer_bench_{N}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        vecs = spark.range(N).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda d: ((F.hash(F.col("id") * 64 + d) % 2001) / 1000.0 - 1.0)
                .cast("float"),
            ).alias("embedding"),
        )
        vecs.repartition(CPUS * 2).write.mode("overwrite").parquet(path)
    corpus = spark.read.parquet(path)
    queries = corpus.where(F.col("vec_id") < NQ)

    results = {}
    for scorer in ("numpy", "hof"):
        df = similarity.brute_force_topk(corpus, queries, k=5, scorer=scorer)
        # warm at FULL parallelism: the numpy path pays a one-time Python
        # worker spawn (+numpy import) per core that a 1-task warmup misses
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        results[scorer] = best
        print(
            f"scorer={scorer}: {best:.2f}s steady-state  "
            f"({N * NQ / best / 1e6:.1f}M cosines/s)", flush=True,
        )
    print(f"speedup numpy vs hof: {results['hof'] / results['numpy']:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
