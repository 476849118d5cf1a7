#!/usr/bin/env bash
# Round-close ritual (r10 verdict #4/#5): full loose + bucketed bench
# at sf0.1 with the per-query maps ARCHIVED per round, so cross-round
# per-query diffs work from committed artifacts alone.
# Usage: tools/close.sh <round-number>
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:?usage: tools/close.sh <round-number>}"

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | sed 's/^\[info\] //'
cp bench_out.json "bench_out_r${N}.json"

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BUCKETED=true \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | sed 's/^\[info\] //'
cp bench_out.json "bench_out_bucketed_r${N}.json"

git add "bench_out_r${N}.json" "bench_out_bucketed_r${N}.json"
echo "[close] archived bench_out_r${N}.json + bench_out_bucketed_r${N}.json (staged)"
