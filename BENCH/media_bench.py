"""Media-validation throughput: check="header" vs check="full".

Generates a deterministic corpus of real png/jpeg/gif payloads (one per
row, sizes in the small-web-image regime), then times
``expect_column_values_to_be_media_decodable`` through ``validate_df``
in both modes at local[N]. The headline number is payloads/sec per mode
and the header/full speedup — the quantified version of the "100 TB
fast path" claim (full decode touches every byte; the header sniff is
O(header)).

    python BENCH/media_bench.py [--rows 100000] [--cores 32] [--repeats 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def build_corpus(spark, rows: int, parts: int):
    import pandas as pd

    def gen(batches):
        import numpy as _np

        from sparkcheck.gif import encode_gif
        from sparkcheck.jpeg import encode_jpeg
        from sparkcheck.media import encode_png

        for pdf in batches:
            out = []
            for i in pdf["id"]:
                i = int(i)
                side = 24 + (i % 5) * 8  # 24..56 px
                img = (
                    (_np.arange(side * side, dtype=_np.int64) * (i + 3))
                    % 256
                ).astype(_np.uint8).reshape(side, side)
                k = i % 3
                if k == 0:
                    buf = encode_png(_np.stack([img] * 3, axis=2))
                elif k == 1:
                    buf = encode_jpeg(img, quality=85)
                else:
                    buf = encode_gif(img // 16 * 16)
                if i % 53 == 0:
                    buf = buf[: len(buf) // 2]  # corrupt tail
                out.append((f"m{i}", bytearray(buf)))
            yield pd.DataFrame(out, columns=["media_ref", "payload"])

    return (
        spark.range(rows)
        .repartition(parts)
        .mapInPandas(gen, "media_ref string, payload binary")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(args.cores))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sparkcheck import ExpectationSuite, validate_df

    corpus = build_corpus(spark, args.rows, args.cores * 4)
    path = f"/tmp/media_bench_{args.rows}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        corpus.write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    total_bytes = df.selectExpr("sum(length(payload))").collect()[0][0]

    results = {}
    expected_bad = len([i for i in range(args.rows) if i % 53 == 0])
    for mode in ("header", "full"):
        suite = ExpectationSuite(f"media_{mode}")
        suite.add(
            "expect_column_values_to_be_media_decodable",
            column="payload", check=mode,
        )
        walls = []
        for _ in range(args.repeats):
            t0 = time.time()
            rep = validate_df(df, suite)
            walls.append(round(time.time() - t0, 3))
            n_bad = rep["results"][0]["result"]["unexpected_count"]
        # full catches every corrupt tail; header only the ones whose
        # header got cut — record both so the trade-off is explicit
        results[mode] = {
            "walls": walls,
            "wall": min(walls),
            "payloads_per_sec": round(args.rows / min(walls), 1),
            "unexpected": int(n_bad),
        }
    out = {
        "rows": args.rows,
        "cores": args.cores,
        "total_mb": round(total_bytes / 1e6, 1),
        "corrupt_rows": expected_bad,
        "header": results["header"],
        "full": results["full"],
        "header_speedup": round(
            results["full"]["wall"] / results["header"]["wall"], 2
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
