#!/usr/bin/env bash
# Ship the engine as a spark-submit --py-files job (north rule packaging).
#
#   BENCH/submit.sh [--master local[32]] [-- job args...]
#
# Builds sparkcheck.zip from the package and submits BENCH/run_job.py.
# On a real cluster, replace --master and size executors instead of the
# driver; the job itself is agnostic (it only uses the SparkSession).
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="local[32]"
if [[ "${1:-}" == "--master" ]]; then MASTER="$2"; shift 2; fi
[[ "${1:-}" == "--" ]] && shift

ZIP="$ROOT/BENCH/sparkcheck.zip"
(cd "$ROOT" && rm -f "$ZIP" && zip -qr "$ZIP" sparkcheck bench.py -x '*__pycache__*')

exec spark-submit \
  --master "$MASTER" \
  --driver-memory "${BENCH_DRIVER_MEM:-16g}" \
  --conf spark.driver.extraJavaOptions="-Xms${BENCH_DRIVER_MEM:-16g} -XX:+AlwaysPreTouch" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.parquet.columnarReaderBatchSize=1024 \
  --conf spark.sql.columnVector.offheap.enabled=true \
  --conf spark.memory.offHeap.enabled=true \
  --conf spark.memory.offHeap.size=8g \
  --py-files "$ZIP" \
  "$ROOT/BENCH/run_job.py" "$@"
