#!/usr/bin/env bash
# Package lucene_spark and launch the index build via spark-submit
# (north-rule launch path). Local-mode example:
#
#   tools/spark_submit_build.sh --input /root/testdata/sf0.001 \
#       --index-dir /tmp/subidx [--master 'local[8]'] [...build_job args]
#
# On a cluster, pass --master spark://... / yarn and executor confs via
# SPARK_SUBMIT_EXTRA.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="local[8]"
ARGS=()
while [[ $# -gt 0 ]]; do
  case "$1" in
    --master) MASTER="$2"; shift 2 ;;
    *) ARGS+=("$1"); shift ;;
  esac
done

ZIP="$(mktemp -d)/lucene_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" lucene_spark -x '*__pycache__*')

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions=32 \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  ${SPARK_SUBMIT_EXTRA:-} \
  --py-files "$ZIP" \
  "$REPO/tools/build_job.py" "${ARGS[@]}"
