"""Multi-JVM cluster-analog scaling evidence for the north rule.

A single box cannot grow memory bandwidth, L3, or page cache when going
local[N] -> local[4N], so single-JVM thread scaling under-measures what N
-> 4N *executors on a cluster* (each with its own memory system) would do.
This harness models executors as PROCESSES: each JVM gets the same cores
and heap, and works a disjoint shard of the same deterministic corpus —
exactly how executors split an Iceberg table's partitions.

Phases (per --layout, default both):
  A. 1 x local[N]  over the full corpus            (N executors)
  B. K x local[N]  over K disjoint shards, timed   (K*N executors)
     concurrently behind a file barrier
  C. 1 x local[2N] over the full corpus            (control)
  D. 2 x local[N]  over two halves, barrier-timed  (control: same total
     cores as C — if D ≈ C, the engine has no cross-partition serial
     structure and the residual N->4N gap is shared-hardware, not engine)

Efficiency(N -> KN executors) = (tp_B / tp_A) / K.
Appends the result table to BENCH/BASELINE.md.

    python BENCH/multijvm.py --n 8 --k 4 --docs 16000000 --repeats 2
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time
import uuid
from datetime import datetime, timezone

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUN_JOB = os.path.join(ROOT, "BENCH", "run_job.py")


def _gen(script: str) -> None:
    subprocess.run([sys.executable, "-c", script], check=True, cwd=ROOT)


def prepare(docs: int, shards: int, layout: str) -> str:
    """Materialize the deterministic corpus once per (docs, layout):
    nested -> shard=<i>/ dirs of array<struct> docs; flat -> per-shard
    dirs each holding docs.parquet + spans.parquet."""
    if layout == "nested":
        path = f"/tmp/sparkcheck_shards_{docs}_{shards}"
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            _gen(
                f"import sys; sys.path.insert(0, {ROOT!r});\n"
                "from pyspark.sql import SparkSession\n"
                "from sparkcheck.synth import write_sharded_corpus\n"
                "spark = (SparkSession.builder.master('local[32]')"
                ".config('spark.driver.memory','16g')"
                ".config('spark.ui.enabled','false').getOrCreate())\n"
                f"write_sharded_corpus(spark, {path!r}, {docs}, {shards})\n"
            )
        return path
    path = f"/tmp/sparkcheck_flat_{docs}_{shards}"
    # check the LAST shard: a previously interrupted prep leaves early
    # shards complete
    if not os.path.exists(
        os.path.join(path, f"shard={shards - 1}", "docs.parquet", "_SUCCESS")
    ):
        # one generation pass; the deterministic shard key (md5 of the row's
        # doc_id/text hash would be fine too — xxhash64 of doc_id matches
        # the runner's bucketing and spreads the null/hot ids evenly) is
        # materialized so docs and spans agree on the split
        script = (
            f"import sys; sys.path.insert(0, {ROOT!r});\n"
            "from pyspark.sql import SparkSession\n"
            "from pyspark.sql import functions as F\n"
            "from sparkcheck.synth import generate_docs\n"
            "spark = (SparkSession.builder.master('local[32]')"
            ".config('spark.driver.memory','16g')"
            ".config('spark.ui.enabled','false').getOrCreate())\n"
            f"docs = generate_docs(spark, {docs})\n"
            "docs = docs.withColumn('shard', F.pmod(F.coalesce("
            f"F.xxhash64('doc_id'), F.lit(0)), F.lit({shards})))\n"
            "flat = docs.select('shard', 'doc_id', "
            "F.posexplode('spans').alias('span_index', 's'), "
            "F.transform(F.col('spans'), lambda x: x['offset']).alias('__offs'))"
            ".select('shard', 'doc_id', "
            "F.col('span_index').cast('int').alias('span_index'), "
            "F.col('s.kind').alias('kind'), F.col('s.text').alias('text'), "
            "F.col('s.media_ref').alias('media_ref'), "
            "F.col('s.offset').alias('offset'), "
            "F.when(F.col('span_index') > 0, "
            "F.element_at(F.col('__offs'), F.col('span_index'))).alias('prev_offset'))\n"
            f"for i in range({shards}):\n"
            f"    flat.where(F.col('shard') == i).drop('shard').write.mode('overwrite')"
            f".parquet(f'{path}/shard={{i}}/spans.parquet')\n"
            f"    docs.where(F.col('shard') == i)"
            ".select('doc_id', F.size('spans').alias('n_spans'))"
            f".write.mode('overwrite').parquet(f'{path}/shard={{i}}/docs.parquet')\n"
        )
        _gen(script)
    return path


def shard_paths(root: str, layout: str, shards: list[int]) -> str:
    return ",".join(f"{root}/shard={i}" for i in shards)


def launch(cores: int, inp: str, layout: str, mem: str, offheap: str,
           repeats: int, barrier: str | None, tag: str) -> subprocess.Popen:
    cmd = [sys.executable, RUN_JOB, "--cores", str(cores), "--input", inp,
           "--layout", layout, "--mem", mem, "--offheap", offheap,
           "--repeats", str(repeats), "--tag", tag]
    if barrier:
        cmd += ["--barrier", barrier]
    return subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True, cwd=ROOT)


def collect(proc: subprocess.Popen) -> dict:
    out, _ = proc.communicate()
    if proc.returncode != 0:
        raise RuntimeError(f"job failed rc={proc.returncode}: {out[-2000:]}")
    lines = [l for l in out.splitlines() if l.startswith("{")]
    return json.loads(lines[-1])


def run_group(n_jvms: int, cores: int, inputs: list[str], layout: str,
              mem: str, offheap: str, repeats: int) -> dict:
    """Launch n_jvms concurrently (barrier-synced when >1); returns
    aggregate docs/sec = total docs / max-of-per-iteration walls."""
    barrier = f"/tmp/sparkcheck_barrier_{uuid.uuid4().hex[:8]}" if n_jvms > 1 else None
    procs = [
        launch(cores, inputs[i], layout, mem, offheap, repeats, barrier, str(i))
        for i in range(n_jvms)
    ]
    if barrier:
        deadline = time.monotonic() + 900
        while len(glob.glob(f"{barrier}.ready.*")) < n_jvms:
            if time.monotonic() > deadline:
                for p in procs:
                    p.kill()
                raise TimeoutError("jobs never reached the barrier")
            if any(p.poll() is not None for p in procs):
                raise RuntimeError("a job died before the barrier")
            time.sleep(0.2)
        open(f"{barrier}.go", "w").close()
    results = [collect(p) for p in procs]
    total_docs = sum(r["docs"] for r in results)
    # per-iteration aggregate: iteration i finishes when the slowest JVM
    # finishes its i-th iteration (shards are equal-sized so drift is small)
    per_iter = [
        max(r["wall_secs_all"][i] for r in results)
        for i in range(min(len(r["wall_secs_all"]) for r in results))
    ]
    best = min(per_iter)
    return {
        "jvms": n_jvms,
        "cores_per_jvm": cores,
        "total_cores": n_jvms * cores,
        "docs": total_docs,
        "wall_secs": round(best, 3),
        "wall_secs_all": [round(x, 3) for x in per_iter],
        "docs_per_sec": round(total_docs / best, 1),
        "per_jvm": [
            {"docs": r["docs"], "wall_secs": r["wall_secs"]} for r in results
        ],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="cores per JVM/executor")
    ap.add_argument("--k", type=int, default=4, help="JVMs in the 4N phase")
    ap.add_argument("--docs", type=int, default=16_000_000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--mem", default="8g")
    ap.add_argument("--offheap", default="4g")
    ap.add_argument("--layout", choices=("nested", "flat"), default="nested")
    ap.add_argument("--skip-controls", action="store_true")
    args = ap.parse_args()

    root = prepare(args.docs, args.k, args.layout)
    all_shards = shard_paths(root, args.layout, list(range(args.k)))
    quarter = [shard_paths(root, args.layout, [i]) for i in range(args.k)]
    halves = [
        shard_paths(root, args.layout, list(range(args.k // 2))),
        shard_paths(root, args.layout, list(range(args.k // 2, args.k))),
    ]

    phases: dict[str, dict] = {}
    # A: N executors = 1 JVM x local[n] over everything
    phases["A_1jvm_N"] = run_group(
        1, args.n, [all_shards], args.layout, args.mem, args.offheap, args.repeats
    )
    print(json.dumps(phases["A_1jvm_N"]), flush=True)
    # B: 4N executors = k JVMs x local[n] over disjoint shards
    phases["B_kjvm_N"] = run_group(
        args.k, args.n, quarter, args.layout, args.mem, args.offheap, args.repeats
    )
    print(json.dumps(phases["B_kjvm_N"]), flush=True)
    if not args.skip_controls:
        # C: one JVM with 2N threads; D: two JVMs with N threads each —
        # same total cores; D >= C means no engine-level serial structure
        phases["C_1jvm_2N"] = run_group(
            1, args.n * 2, [all_shards], args.layout, args.mem, args.offheap,
            args.repeats,
        )
        print(json.dumps(phases["C_1jvm_2N"]), flush=True)
        phases["D_2jvm_N"] = run_group(
            2, args.n, halves, args.layout, args.mem, args.offheap, args.repeats
        )
        print(json.dumps(phases["D_2jvm_N"]), flush=True)

    tp_a = phases["A_1jvm_N"]["docs_per_sec"]
    tp_b = phases["B_kjvm_N"]["docs_per_sec"]
    eff = (tp_b / tp_a) / args.k
    summary = {
        "layout": args.layout,
        "docs": args.docs,
        "executor_model": f"{args.n} cores/JVM",
        "tp_N_executors": tp_a,
        "tp_4N_executors": tp_b,
        "efficiency_N_to_4N": round(eff, 3),
    }
    if not args.skip_controls:
        summary["tp_1jvm_2N"] = phases["C_1jvm_2N"]["docs_per_sec"]
        summary["tp_2jvm_N"] = phases["D_2jvm_N"]["docs_per_sec"]
        summary["two_jvm_vs_one_ratio"] = round(
            phases["D_2jvm_N"]["docs_per_sec"] / phases["C_1jvm_2N"]["docs_per_sec"], 3
        )

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    lines = [
        f"\n## Multi-JVM executor-model scaling {stamp} — {args.docs:,} docs, "
        f"layout={args.layout}, {args.n} cores + {args.mem}+{args.offheap} per JVM\n",
        "| phase | JVMs x cores | docs/sec |",
        "|---|---|---|",
    ]
    for name, r in phases.items():
        lines.append(
            f"| {name} | {r['jvms']} x local[{r['cores_per_jvm']}] | "
            f"{r['docs_per_sec']:,.0f} |"
        )
    lines.append(
        f"\n**Executor-model scaling efficiency N→4N "
        f"({args.n} → {args.k * args.n} cores as {args.k} executors): "
        f"{eff:.3f}**"
    )
    if "two_jvm_vs_one_ratio" in summary:
        lines.append(
            f"Two-JVM control: 2 x local[{args.n}] over disjoint halves reaches "
            f"{summary['two_jvm_vs_one_ratio']:.2f}x the throughput of "
            f"1 x local[{args.n * 2}] on the same input."
        )
    md = "\n".join(lines) + "\n"
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "a") as f:
        f.write(md)
    print(md)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
