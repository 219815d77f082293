"""The north-rule validation job, packaged for spark-submit.

    spark-submit --master local[32] --py-files sparkcheck.zip \
        BENCH/run_job.py --input /path/corpus.parquet

or plain python (builds its own local[N] session):

    python BENCH/run_job.py --cores 8 --docs 1000000

Workload (all distributed, no driver loops):
  1. corpus: --input parquet dir (the Iceberg-scan analog; preferred for
     scaling runs so both levels read identical bytes), else the
     deterministic synthetic generator inline
  2. full expectation suite: doc-level (null/unique/regex/row-count) via
     the fused agg pass + skew-safe groupBy uniqueness
  3. span-level violations (single-pass explode plan) to a noop sink

Prints one JSON line per iteration plus a final summary line.

JVM notes (measured on local[32], see BENCH/BASELINE.md): the driver heap
MUST be pre-sized (-Xms == -Xmx, +AlwaysPreTouch) — growing a 30 GB heap
mid-job page-faults under the kernel mmap lock with 32 threads at ~95%
system time, turning a 6 s job into a 110 s one. Parquet columnar batches
are capped at 1024 rows to bound per-thread nested-reader memory.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_spark(cores: int | None, mem: str, offheap: str = "8g", tag: str = ""):
    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName(f"sparkcheck-scaling-job{tag}")
    if cores:
        builder = (
            builder.master(f"local[{cores}]")
            .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
            .config("spark.default.parallelism", str(cores))
        )
    return (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", mem)
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{mem} -XX:+AlwaysPreTouch",
        )
        .config("spark.sql.parquet.columnarReaderBatchSize", "1024")
        # off-heap column vectors: keeps the nested parquet batches out of
        # the GC heap (measured 28s -> 21s on the span pass at local[32])
        .config("spark.sql.columnVector.offheap.enabled", "true")
        .config("spark.memory.offHeap.enabled", "true")
        .config("spark.memory.offHeap.size", offheap)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # shuffle spill to tmpfs: on a single box the local disk is a
        # serial bottleneck that fakes poor CPU scaling; a real cluster
        # shuffles over NICs that scale with executor count
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def wait_barrier(barrier: str, tag: str, timeout_s: float = 600.0) -> None:
    """File barrier for multi-JVM concurrent timing: announce readiness as
    <barrier>.ready.<tag>, then block until the orchestrator creates
    <barrier>.go — so every JVM starts its timed iterations at the same
    instant and the aggregate wall-clock is a true concurrent measurement."""
    open(f"{barrier}.ready.{tag}", "w").close()
    deadline = time.monotonic() + timeout_s
    while not os.path.exists(f"{barrier}.go"):
        if time.monotonic() > deadline:
            raise TimeoutError(f"barrier {barrier}.go never appeared")
        time.sleep(0.05)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None,
                    help="local[N] parallelism; omit under spark-submit")
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--input", default=None,
                    help="parquet corpus dir; overrides --docs generation")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--mem", default=os.environ.get("BENCH_DRIVER_MEM", "16g"))
    ap.add_argument("--offheap", default=os.environ.get("BENCH_OFFHEAP", "8g"))
    ap.add_argument("--layout", choices=("nested", "flat"), default="nested",
                    help="nested = array<struct> spans; flat = pre-exploded "
                         "span columns (synth.write_flat_corpus layout)")
    ap.add_argument("--fused", action="store_true",
                    help="single-scan shape: suite aggregates ride a "
                         "CollectMetrics node on the span-violation write "
                         "(fused.validate_and_extract) — nested layout only")
    ap.add_argument("--barrier", default=None,
                    help="path prefix for multi-JVM synchronized timing")
    ap.add_argument("--tag", default="0", help="barrier identity tag")
    args = ap.parse_args()

    spark = build_spark(args.cores, args.mem, args.offheap, f"-{args.tag}")
    spark.sparkContext.setLogLevel("ERROR")
    cores = args.cores or spark.sparkContext.defaultParallelism

    from sparkcheck import validate_df
    from sparkcheck.spans import span_violations, span_violations_flat
    from sparkcheck.synth import generate_docs
    from bench import _synth_suite

    suite = _synth_suite()
    if args.layout == "flat":
        # pre-exploded layout: doc-level suite over the small docs table,
        # span checks as flat predicates over the span table
        docs = spark.read.parquet(*[f"{p}/docs.parquet" for p in args.input.split(",")])
        flat = spark.read.parquet(*[f"{p}/spans.parquet" for p in args.input.split(",")])
        n_docs = docs.count()

        def pipeline():
            report = validate_df(docs, suite, result_format="BOOLEAN_ONLY")
            span_violations_flat(flat).write.format("noop").mode("overwrite").save()
            return report

        wdocs, wflat = docs.limit(10_000), flat.limit(50_000)
        validate_df(wdocs, suite, result_format="BOOLEAN_ONLY")
        span_violations_flat(wflat).write.format("noop").mode("overwrite").save()
    else:
        if args.input:
            # comma-separated paths: disjoint shard dirs read as one corpus
            docs = spark.read.parquet(*args.input.split(","))
            n_docs = docs.count()
        else:
            docs = generate_docs(spark, args.docs, n_partitions=cores * 4)
            n_docs = args.docs

        if args.fused:
            from sparkcheck.fused import validate_and_extract

            def pipeline():
                report, _, _ = validate_and_extract(
                    docs, suite, span_violations,
                    result_format="BOOLEAN_ONLY",
                )
                return report
        else:
            def pipeline():
                # BOOLEAN_ONLY: counts only — the scale configuration
                # (violation rows flow through span_violations instead of
                # driver collects)
                report = validate_df(docs, suite, result_format="BOOLEAN_ONLY")
                span_violations(docs).write.format("noop").mode("overwrite").save()
                return report

        # warmup: one pipeline on a small slice compiles every plan + JIT
        wdocs = docs.limit(max(n_docs // 50, 10_000))
        if args.fused:
            pipeline_warm = wdocs
            from sparkcheck.fused import validate_and_extract as _vae

            _vae(pipeline_warm, suite, span_violations,
                 result_format="BOOLEAN_ONLY")
        else:
            validate_df(wdocs, suite, result_format="BOOLEAN_ONLY")
            span_violations(wdocs).write.format("noop").mode("overwrite").save()

    if args.barrier:
        wait_barrier(args.barrier, args.tag)

    iters = []
    report = None
    for i in range(args.repeats):
        t0 = time.monotonic()
        report = pipeline()
        wall = time.monotonic() - t0
        iters.append(wall)
        print(json.dumps({"iter": i, "cores": cores, "wall_secs": round(wall, 3),
                          "docs_per_sec": round(n_docs / wall, 1)}), flush=True)

    best = min(iters)
    n_exp = report["statistics"]["evaluated_expectations"]
    print(json.dumps({
        "cores": cores,
        "docs": n_docs,
        "wall_secs": round(best, 3),
        "wall_secs_all": [round(x, 3) for x in iters],
        "docs_per_sec": round(n_docs / best, 1),
        "expectations": n_exp,
        "suite_success": report["success"],
        "expectation_evals_per_sec": round(n_exp * n_docs / best, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
