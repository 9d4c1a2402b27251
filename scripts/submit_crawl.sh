#!/usr/bin/env bash
# Cluster submission per the north rule: the engine ships as a zip via
# spark-submit --py-files, one invocation per crawl round (the round
# loop checkpoints frontier/seen through the catalog, so each
# spark-submit resumes exactly where the previous one committed).
#
# Usage:
#   scripts/submit_crawl.sh <master> <catalog_uri> <pages_table_uri> [executors] [seeds_uri]
#
# seeds_uri (a parquet/csv of seed urls) is REQUIRED on the very first
# submission — run_round.py refuses to start a crawl with an empty
# catalog and no seeds; later rounds resume from the checkpoint and
# ignore it.
#
# Two-cluster-size scaling run (N and 4N executors):
#   scripts/submit_crawl.sh spark://head:7077 s3://bkt/cat s3://bkt/pages 32 s3://bkt/seeds
#   scripts/submit_crawl.sh spark://head:7077 s3://bkt/cat s3://bkt/pages 128 s3://bkt/seeds
set -euo pipefail

MASTER="${1:?master}"
CATALOG="${2:?catalog uri}"
PAGES="${3:?pages table uri}"
EXECUTORS="${4:-32}"
SEEDS="${5:-}"

REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/langscrape_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" langscrape_spark)

# shuffle partitions ~2-3x total cores; AQE coalesces the remainder.
CORES_PER_EXEC=4
SHUFFLE=$((EXECUTORS * CORES_PER_EXEC * 3))

exec spark-submit \
  --master "$MASTER" \
  --deploy-mode client \
  --py-files "$ZIP" \
  --num-executors "$EXECUTORS" \
  --executor-cores "$CORES_PER_EXEC" \
  --executor-memory 8g \
  --conf spark.sql.shuffle.partitions="$SHUFFLE" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=128 \
  "$REPO/scripts/run_round.py" \
  --catalog "$CATALOG" --pages "$PAGES" \
  ${SEEDS:+--seeds "$SEEDS"}
