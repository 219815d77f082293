"""Embedding-pipeline scaling job: Lloyd k-means refinement + SemDeDup
semantic dedup over a stored embedding corpus at a fixed parallelism.

    python BENCH/embedding_job.py --cores 8 --input /tmp/vecs.parquet

Same protocol as BENCH/curation_job.py: fresh JVM per level, identical
stored input, noop-sink writes. Prints one JSON line
{cores, vectors, kmeans_secs, semantic_secs, vecs_per_sec}.

Generate the deterministic input once with --prepare N (id-derived
xxhash64 floats — no RNG, identical bytes at any parallelism).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_BENCH = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_BENCH))
sys.path.insert(0, _BENCH)

from run_job import build_spark  # noqa: E402  (BENCH sibling)


def prepare(path: str, n: int) -> None:
    spark = build_spark(32, "8g", tag="-embprep")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    # deterministic pseudo-embeddings: dim value = xxhash64(id, dim)
    # scaled to [-1, 1); no RNG, so every parallelism level reads
    # identical bytes (the Iceberg-scan analog)
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                (F.xxhash64(F.col("id"), i) % 100_000) / 50_000.0
            ).cast("float"),
        ).alias("embedding"),
    )
    vecs.repartition(128).write.mode("overwrite").parquet(path)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int)
    ap.add_argument("--input", required=True)
    ap.add_argument("--prepare", type=int, default=0)
    ap.add_argument("--kmeans-k", type=int, default=16)
    ap.add_argument("--semantic-k", type=int, default=64)
    args = ap.parse_args()

    if args.prepare:
        prepare(args.input, args.prepare)
        print(json.dumps({"prepared": args.input, "vectors": args.prepare}))
        return

    spark = build_spark(args.cores, os.environ.get("BENCH_DRIVER_MEM", "8g"),
                        tag=f"-emb-{args.cores}")
    spark.sparkContext.setLogLevel("ERROR")

    from sparkcheck import similarity

    vecs = spark.read.parquet(args.input)
    n_vecs = vecs.count()

    # warm both pipelines on a slice (plan compile + codegen + the Arrow
    # worker pool, untimed)
    warm = vecs.limit(10_000)
    similarity.kmeans(
        warm, k=args.kmeans_k, iters=2, assign_impl="arrow"
    )[1].write.format("noop").mode("overwrite").save()
    similarity.semantic_dedup(
        warm, threshold=0.9, n_centroids=args.semantic_k,
        assign_impl="arrow",
    ).write.format("noop").mode("overwrite").save()

    # the scale path: gemm assignment (assign_impl="arrow") — the fold
    # argmax is the oracle-replayable variant, interpreted and
    # allocation-bound (see similarity._arrow_assign)
    t0 = time.monotonic()
    similarity.kmeans(
        vecs, k=args.kmeans_k, iters=2, assign_impl="arrow"
    )[1].write.format("noop").mode("overwrite").save()
    kmeans_secs = time.monotonic() - t0

    t0 = time.monotonic()
    similarity.semantic_dedup(
        vecs, threshold=0.9, n_centroids=args.semantic_k,
        assign_impl="arrow",
    ).write.format("noop").mode("overwrite").save()
    semantic_secs = time.monotonic() - t0

    total = kmeans_secs + semantic_secs
    print(json.dumps({
        "cores": args.cores,
        "vectors": n_vecs,
        "kmeans_secs": round(kmeans_secs, 2),
        "semantic_secs": round(semantic_secs, 2),
        "vecs_per_sec": round(n_vecs / total, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
