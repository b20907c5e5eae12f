#!/usr/bin/env bash
# Package the library and run one resumable pipeline pass via spark-submit
# (north rule: "packaged for spark-submit --py-files execution on
# multi-executor clusters").
#
# Usage:
#   scripts/submit_job.sh --chunks /path/chunks_table \
#                         --routes /path/routes.parquet \
#                         --state  /path/state_dir \
#                         [--master spark://host:7077] [extra spark-submit args]
#
# On a real cluster, point --master at the cluster manager and size
# spark.sql.shuffle.partitions at 2-3x total executor cores (see
# log_aggregator_spark/session.py). The same zip + entrypoint run
# unchanged on local[N] for smoke tests.
set -euo pipefail

REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
MASTER="local[*]"
ARGS=()
while [[ $# -gt 0 ]]; do
  case "$1" in
    --master) MASTER="$2"; shift 2 ;;
    *) ARGS+=("$1"); shift ;;
  esac
done

ZIP="$(mktemp -d)/log_aggregator_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" log_aggregator_spark -x '*__pycache__*')

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "$REPO/scripts/job_main.py" "${ARGS[@]}"
