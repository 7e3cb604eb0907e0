#!/bin/bash
# q70/q67/q68 isolation matrix (VERDICT r9 #1): tiered LSH cap on/off x
# AQE initialPartitionNum 128 (default 4x cores) / 32 (= cores), each cell a
# standalone Bench run over both layouts with calib_mt_sec recorded, so
# cross-cell comparisons can be host-normalized. Results land one JSON line
# per cell in $OUT.
#
# Usage: tools/bench_matrix.sh [outFile] — run from the repo root.
set -u
OUT=${1:-/tmp/bench_matrix.jsonl}
: > "$OUT"
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
export SPARK_GRAFT_ONLY=q70_dup_clusters,q67_simhash_pairs,q68_native_pivot

cell() {
  local tier=$1 ipn=$2
  export SPARK_GRAFT_LSH_TIER=$tier
  export SPARK_GRAFT_CONF="spark.sql.adaptive.coalescePartitions.initialPartitionNum=$ipn"
  echo "=== cell tier=$tier ipn=$ipn ===" >&2
  rm -f /tmp/bench.json
  sbt --error "runMain graft.Bench" >/dev/null 2>&1
  # Bench persists the full JSON line to /tmp/bench.json (sbt log levels
  # can swallow stdout — the file is the reliable channel)
  local line
  line=$(cat /tmp/bench.json 2>/dev/null)
  [ -n "$line" ] || { echo "cell tier=$tier ipn=$ipn produced no bench.json" >&2; return 1; }
  echo "{\"cell\":{\"tier\":\"$tier\",\"ipn\":$ipn},${line#\{}" >> "$OUT"
}

cell on 128
cell on 32
cell off 128
cell off 32
echo "matrix done -> $OUT" >&2
