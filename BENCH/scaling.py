"""Two-parallelism scaling evidence for the north rule.

Runs BENCH/run_job.py at local[N] and local[4N] (fresh JVM each, same
deterministic input) and reports throughput at both plus scaling
efficiency = (throughput_4N / throughput_N) / 4. Appends the result table
to BENCH/BASELINE.md.

    python BENCH/scaling.py [--n 8] [--docs 1000000] [--repeats 1]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from datetime import datetime, timezone

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def prepare_corpus(docs: int) -> str:
    """Materialize the deterministic corpus to parquet once — the
    Iceberg-scan analog: both parallelism levels read identical bytes."""
    path = f"/tmp/sparkcheck_corpus_{docs}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, %r); " % ROOT
             + "from pyspark.sql import SparkSession; "
             + "from sparkcheck.synth import generate_docs; "
             + "spark = (SparkSession.builder.master('local[32]')"
             + ".config('spark.driver.memory','16g')"
             + ".config('spark.ui.enabled','false').getOrCreate()); "
             + f"generate_docs(spark, {docs}, n_partitions=128)"
             + f".write.mode('overwrite').parquet({path!r})"],
            check=True, cwd=ROOT,
        )
    return path


def run_level(cores: int, docs: int, input_path: str | None = None) -> dict:
    cmd = [sys.executable, os.path.join(ROOT, "BENCH", "run_job.py"),
           "--cores", str(cores), "--docs", str(docs)]
    if input_path:
        cmd += ["--input", input_path]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd=ROOT)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--repeats", type=int, default=1)
    args = ap.parse_args()

    corpus = prepare_corpus(args.docs)
    results = {args.n: [], args.n * 4: []}
    for _ in range(args.repeats):
        for cores in (args.n, args.n * 4):
            r = run_level(cores, args.docs, corpus)
            results[cores].append(r)
            print(json.dumps(r))

    best = {c: max(rs, key=lambda r: r["docs_per_sec"]) for c, rs in results.items()}
    tp_n = best[args.n]["docs_per_sec"]
    tp_4n = best[args.n * 4]["docs_per_sec"]
    eff = (tp_4n / tp_n) / 4
    # time-paired estimator: each repeat's two legs ran adjacently (same
    # host drift window), so the per-repeat median-wall ratio controls
    # for slow box drift AND for the few-core turbo-boost regime that a
    # global best-of-N would select (see BENCH/BASELINE.md round-5
    # scaling analysis). Report both; the paired numbers are the
    # steady-state criterion evidence.
    import statistics as st

    paired = []
    for i in range(args.repeats):
        w_n = st.median(results[args.n][i]["wall_secs_all"])
        w_4n = st.median(results[args.n * 4][i]["wall_secs_all"])
        paired.append(round(w_n / w_4n / 4, 3))
    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    md = (
        f"\n## Scaling run {stamp} — {args.docs:,} docs, "
        f"local[{args.n}] vs local[{args.n * 4}]\n\n"
        "| cores | wall (s) | docs/sec | expectation-evals/sec |\n"
        "|---|---|---|---|\n"
        f"| {args.n} | {best[args.n]['wall_secs']} | {tp_n:,.0f} | "
        f"{best[args.n]['expectation_evals_per_sec']:,.0f} |\n"
        f"| {args.n * 4} | {best[args.n * 4]['wall_secs']} | {tp_4n:,.0f} | "
        f"{best[args.n * 4]['expectation_evals_per_sec']:,.0f} |\n\n"
        f"**Scaling efficiency N→4N: {eff:.3f}** (global best-of-all; "
        f"target ≥ 0.8 per BASELINE.json north rule)\n\n"
        f"Time-paired per-repeat efficiencies (median walls within each "
        f"adjacent pair): {paired}\n"
    )
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)
    print(md)
    print(json.dumps({"efficiency": round(eff, 3), "tp_n": tp_n, "tp_4n": tp_4n}))


if __name__ == "__main__":
    main()
