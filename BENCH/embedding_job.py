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
    ap.add_argument("--queries", type=int, default=32)
    ap.add_argument(
        "--ann",
        action="store_true",
        help="run the ANN ladder instead: float gemm vs int8 vs PQ ADC "
        "top-10 for 32 queries over the stored corpus",
    )
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

    if args.ann:
        from pyspark.sql import functions as F

        queries = vecs.where(F.col("vec_id") < args.queries)
        books = similarity.pq_codebooks(vecs, m=8, k=256)

        # ingest-time writes (timed once each): at scale quantization is
        # a one-off column write, NOT a per-query transform — the scan
        # legs below read the STORED codes, the honest at-scale shape
        t0 = time.monotonic()
        similarity.quantize_embeddings(vecs, impl="arrow").select(
            "vec_id", "qvec"
        ).write.mode("overwrite").parquet(args.input + ".int8")
        int8_encode_secs = time.monotonic() - t0
        t0 = time.monotonic()
        similarity.pq_encode(vecs, books).write.mode("overwrite").parquet(
            args.input + ".codes"
        )
        pq_encode_secs = time.monotonic() - t0
        int8_codes = spark.read.parquet(args.input + ".int8")
        pq_codes = spark.read.parquet(args.input + ".codes")

        # warm each scan path on a slice (plan compile + Arrow pool)
        warm = vecs.limit(10_000)
        similarity.brute_force_topk(warm, queries, k=10).write.format(
            "noop"
        ).mode("overwrite").save()
        similarity.quantized_topk(
            warm, queries, k=10, codes=int8_codes.limit(10_000)
        ).write.format("noop").mode("overwrite").save()
        similarity.pq_topk(
            warm, queries, books, k=10, codes=pq_codes.limit(10_000)
        ).write.format("noop").mode("overwrite").save()

        t0 = time.monotonic()
        similarity.brute_force_topk(vecs, queries, k=10).write.format(
            "noop"
        ).mode("overwrite").save()
        float_secs = time.monotonic() - t0

        t0 = time.monotonic()
        similarity.quantized_topk(
            vecs, queries, k=10, codes=int8_codes
        ).write.format("noop").mode("overwrite").save()
        int8_secs = time.monotonic() - t0

        t0 = time.monotonic()
        similarity.pq_topk(
            vecs, queries, books, k=10, codes=pq_codes
        ).write.format("noop").mode("overwrite").save()
        pq_adc_secs = time.monotonic() - t0

        print(json.dumps({
            "cores": args.cores,
            "vectors": n_vecs,
            "queries": args.queries,
            "int8_encode_secs": round(int8_encode_secs, 2),
            "pq_encode_secs": round(pq_encode_secs, 2),
            "float_secs": round(float_secs, 2),
            "int8_secs": round(int8_secs, 2),
            "pq_adc_secs": round(pq_adc_secs, 2),
            "float_vps": round(n_vecs / float_secs, 1),
            "int8_vps": round(n_vecs / int8_secs, 1),
            "pq_adc_vps": round(n_vecs / pq_adc_secs, 1),
        }))
        spark.stop()
        return

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
