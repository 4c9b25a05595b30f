#!/bin/bash
# Round-16 bench campaign: serial sbt (shared target dir), one JSON
# artifact per run extracted from the bench's single stdout line.
# Usage: bash scripts/r16_campaign.sh [phase...]  (default: all phases)
set -u
cd /root/repo
SF=/root/testdata/sf0.1

extract() { # log, metric, out
  grep -o "{\"metric\":\"$2\".*" "$1" | tail -1 > "$3" && echo "wrote $3" || echo "EXTRACT FAILED: $3"
}

phase_scale() {
  for t in a b; do
    SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=$SF \
      sbt -batch "runMain graft.ScaleBench" > /tmp/r16_scale_$t.log 2>&1
    echo "scale_$t rc=$?"
    extract /tmp/r16_scale_$t.log scale_bench SCALEBENCH_r16_$t.json
  done
}

phase_dpp() {
  for t in a b; do
    SPARK_GRAFT_STREAM_DPP=1 \
      SPARK_GRAFT_STREAM_CATALOG="100:40000,160000;1000:20000,40000" \
      SPARK_GRAFT_STREAM_SECS=120 SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS=16 \
      SPARK_GRAFT_SF_DIR=$SF \
      sbt -batch "runMain graft.StreamBench" > /tmp/r16_dpp_$t.log 2>&1
    echo "dpp_$t rc=$?"
    extract /tmp/r16_dpp_$t.log stream_bench STREAMBENCH_r16_dpp_$t.json
  done
}

phase_catalog() {
  # local[32] — the r15 catalog_k64 baselines ran at 32 (SURVEY 8.10);
  # a 4-cpu run reads 2-4x lower ceilings and is not comparable. 16 g:
  # 32 concurrent tasks against the 200k-item broadcast OOM the 8g
  # default.
  for t in a b; do
    SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g \
      SPARK_GRAFT_STREAM_CATALOG="1:320000,640000;10:80000,160000,320000,640000;100:20000,40000,80000,160000" \
      SPARK_GRAFT_SF_DIR=$SF \
      sbt -batch "runMain graft.StreamBench" > /tmp/r16_catalog_$t.log 2>&1
    echo "catalog_$t rc=$?"
    extract /tmp/r16_catalog_$t.log stream_bench STREAMBENCH_r16_catalog_$t.json
  done
}

phase_index() {
  for t in a b; do
    SPARK_GRAFT_SF_DIR=$SF \
      sbt -batch "runMain graft.IndexBench" > /tmp/r16_index_$t.log 2>&1
    echo "index_$t rc=$?"
    extract /tmp/r16_index_$t.log ivf_maintenance INDEXBENCH_r16_$t.json
  done
  for t in a b; do
    SPARK_GRAFT_INDEX_TILES=10 SPARK_GRAFT_SF_DIR=$SF \
      sbt -batch "runMain graft.IndexBench" > /tmp/r16_index_x10_$t.log 2>&1
    echo "index_x10_$t rc=$?"
    extract /tmp/r16_index_x10_$t.log ivf_maintenance INDEXBENCH_r16_x10_$t.json
  done
}

phase_detail() {
  # local[32] — the committed BENCH_r{N} / detail baselines all run 32
  for t in a b; do
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=$SF \
      SPARK_GRAFT_BENCH_DETAIL=/root/repo/BENCH_DETAIL_r16_$t.json \
      sbt -batch "runMain graft.Bench" > /tmp/r16_bench_$t.log 2>&1
    echo "bench_$t rc=$?"
  done
}

phase_classic() {
  for t in a b; do
    SPARK_GRAFT_SF_DIR=$SF \
      sbt -batch "runMain graft.StreamBench" > /tmp/r16_classic_$t.log 2>&1
    echo "classic_$t rc=$?"
    extract /tmp/r16_classic_$t.log stream_bench STREAMBENCH_r16_$t.json
  done
}

phases="${@:-scale dpp catalog index detail classic}"
for p in $phases; do
  echo "=== phase $p $(date +%H:%M:%S) ==="
  phase_$p
done
echo "=== campaign done $(date +%H:%M:%S) ==="
