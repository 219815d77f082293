"""Curation-pipeline scaling job: passage dedup + funnel over a stored
text corpus at a fixed parallelism level.

    python BENCH/curation_job.py --cores 8 --input /tmp/corpus.parquet

Measures the round-4 curation operators the same way BENCH/run_job.py
measures the validation spine: fresh JVM per level, identical stored
input, noop-sink writes so nothing materializes on the driver. Prints one
JSON line {cores, docs, passage_dedup_secs, funnel_secs, docs_per_sec}.
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--block-tokens", type=int, default=8)
    args = ap.parse_args()

    spark = build_spark(args.cores, os.environ.get("BENCH_DRIVER_MEM", "8g"),
                        tag=f"-curation-{args.cores}")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from sparkcheck import dedup, text

    docs = spark.read.parquet(args.input)
    n_docs = docs.count()

    # warm both pipelines on a slice (plan compile + codegen, untimed)
    warm = docs.limit(20_000)
    dedup.drop_duplicate_passages(warm, args.block_tokens).write.format(
        "noop"
    ).mode("overwrite").save()
    stages = [
        ("min_chars", F.length("text") >= 60),
        ("token_range", text.token_count("text").between(5, 4000)),
        ("low_repetition", text.dup_ngram_frac("text", 2) < 0.9),
    ]
    text.curation_funnel(warm, stages).write.format("noop").mode(
        "overwrite"
    ).save()

    t0 = time.monotonic()
    dedup.drop_duplicate_passages(docs, args.block_tokens).write.format(
        "noop"
    ).mode("overwrite").save()
    dd_secs = time.monotonic() - t0

    t0 = time.monotonic()
    text.curation_funnel(docs, stages).write.format("noop").mode(
        "overwrite"
    ).save()
    fn_secs = time.monotonic() - t0

    print(json.dumps({
        "cores": args.cores,
        "docs": n_docs,
        "passage_dedup_secs": round(dd_secs, 3),
        "funnel_secs": round(fn_secs, 3),
        "docs_per_sec": round(n_docs / (dd_secs + fn_secs), 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
