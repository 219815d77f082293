"""Two-parallelism scaling evidence for exact-substring span dedup.

The gram explode is the engine's heaviest shuffle shape (~one narrow
row per corpus CHARACTER), so it gets its own N vs 4N campaign: run
dedup.duplicate_span_stats over a deterministic flat-text corpus
(materialized to parquet once — both levels read identical bytes) at
local[N] and local[4N] in fresh JVMs, and report chars/sec at both plus
scaling efficiency = (throughput_4N / throughput_N) / 4. Appends a
result table to BENCH/BASELINE.md with --record.

    python BENCH/span_bench.py [--n 2] [--docs 250000] [--min-len 40]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from datetime import datetime, timezone

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import json, sys, time
sys.path.insert(0, {root!r})
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[{cores}]")
         .config("spark.driver.memory", "24g")
         .config("spark.sql.shuffle.partitions", "{parts}")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from sparkcheck.dedup import duplicate_span_stats
docs = spark.read.parquet({path!r})
docs.count()  # warm the file index; scan bytes are timed below
t0 = time.time()
row = duplicate_span_stats(docs, min_len={min_len}).collect()[0]
dt = time.time() - t0
print(json.dumps({{"cores": {cores}, "sec": round(dt, 2),
                   "docs": row["total_docs"], "chars": row["total_chars"],
                   "dup_chars": row["dup_chars"],
                   "chars_per_sec": round(row["total_chars"] / dt),
                   "docs_per_sec": round(row["total_docs"] / dt)}}))
"""


def prepare_corpus(docs: int) -> str:
    """Flat (doc_id, text) corpus from the deterministic span generator,
    written once so both parallelism levels read identical parquet."""
    path = f"/tmp/sparkcheck_flat_corpus_{docs}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        code = (
            "import sys; sys.path.insert(0, %r); " % ROOT
            + "from pyspark.sql import SparkSession, functions as F; "
            + "from sparkcheck.synth import generate_docs; "
            + "spark = (SparkSession.builder.master('local[32]')"
            + ".config('spark.driver.memory','16g')"
            + ".config('spark.ui.enabled','false').getOrCreate()); "
            + f"d = generate_docs(spark, {docs}, n_partitions=128); "
            + "d.select('doc_id', F.concat_ws(' ', F.transform('spans', "
            + "lambda s: F.coalesce(s['text'], F.lit('')))).alias('text'))"
            + ".where('doc_id is not null')"
            + f".write.mode('overwrite').parquet({path!r})"
        )
        subprocess.run([sys.executable, "-c", code], check=True, cwd=ROOT)
    return path


def run_level(cores: int, path: str, min_len: int, repeats: int) -> dict:
    best = None
    for _ in range(repeats):
        code = _WORKER.format(
            root=ROOT, cores=cores, parts=max(cores * 4, 8),
            path=path, min_len=min_len,
        )
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, check=True, cwd=ROOT,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        if best is None or r["sec"] < best["sec"]:
            best = r
    return best


def run_control(n: int, k: int, path: str, min_len: int) -> dict:
    """Bandwidth control: span dedup is a corpus-global shuffle (not
    shard-decomposable like the per-doc validation job), so the
    multi-JVM disjoint-shard control does not apply. Instead run K
    CONCURRENT copies of the full local[n] job: if each copy finishes
    near the solo local[n] time, the box can sustain K× the memory
    bandwidth and poor in-job thread scaling would be engine
    structure; if the copies stretch, the box, not the engine, is the
    N→4N limiter."""
    code = _WORKER.format(
        root=ROOT, cores=n, parts=max(n * 4, 8), path=path, min_len=min_len
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True, cwd=ROOT,
        )
        for _ in range(k)
    ]
    secs = []
    for pr in procs:
        out, _ = pr.communicate()
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        secs.append(json.loads(line)["sec"])
    return {"k": k, "cores_each": n, "secs": secs,
            "mean_sec": round(sum(secs) / len(secs), 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--docs", type=int, default=250_000)
    ap.add_argument("--min-len", type=int, default=40)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--control", type=int, default=0, metavar="K",
                    help="also run K concurrent local[n] copies "
                    "(bandwidth control)")
    ap.add_argument("--record", action="store_true",
                    help="append the table to BENCH/BASELINE.md")
    args = ap.parse_args()

    path = prepare_corpus(args.docs)
    lo = run_level(args.n, path, args.min_len, args.repeats)
    hi = run_level(args.n * 4, path, args.min_len, args.repeats)
    if (lo["dup_chars"], lo["chars"]) != (hi["dup_chars"], hi["chars"]):
        raise SystemExit(
            f"result mismatch across levels: {lo} vs {hi}"
        )
    eff = (hi["chars_per_sec"] / lo["chars_per_sec"]) / 4
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    table = (
        f"\n## Span-dedup scaling {stamp} — {args.docs:,} docs "
        f"({lo['chars']:,} chars), min_len={args.min_len}, "
        f"local[{args.n}] vs local[{args.n * 4}]\n\n"
        "| cores | sec | chars/sec | docs/sec |\n|---|---|---|---|\n"
        f"| {lo['cores']} | {lo['sec']} | {lo['chars_per_sec']:,} | "
        f"{lo['docs_per_sec']:,} |\n"
        f"| {hi['cores']} | {hi['sec']} | {hi['chars_per_sec']:,} | "
        f"{hi['docs_per_sec']:,} |\n\n"
        f"**Scaling efficiency N→4N: {eff:.3f}** "
        f"(duplicate_span_stats end-to-end: gram explode + occurrence "
        f"count + position join + islands window + stats agg; "
        f"dup_chars={lo['dup_chars']:,} at both levels — bit-identical "
        f"results, best of {args.repeats}).\n"
    )
    if args.control:
        ctl = run_control(args.n, args.control, path, args.min_len)
        stretch = ctl["mean_sec"] / lo["sec"]
        table += (
            f"\nBandwidth control: {ctl['k']} CONCURRENT full local"
            f"[{args.n}] jobs (same corpus, whole-corpus shuffle each) "
            f"ran at mean {ctl['mean_sec']} s vs {lo['sec']} s solo = "
            f"{stretch:.2f}× stretch "
            f"(per-copy: {', '.join(str(x) for x in ctl['secs'])}). "
            f"A stretch near 1.0 means the box had spare bandwidth and "
            f"poor in-job scaling is engine structure; a stretch near "
            f"{ctl['k']}.0 means the box saturates — the N→4N residual "
            f"is shared hardware, which a real cluster multiplies with "
            f"executor count instead of sharing.\n"
        )
    print(table)
    print(json.dumps({"eff": round(eff, 3), "lo": lo, "hi": hi}))
    if args.record:
        with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "a") as f:
            f.write(table)


if __name__ == "__main__":
    main()
