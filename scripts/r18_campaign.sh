#!/bin/bash
# Round-18 bench campaign (VERDICT r17 next-items 1/2/4/5/6): serial
# sbt (shared target dir), one JSON artifact per run extracted from the
# bench's single stdout line. Env per family is r16_campaign.sh's,
# verbatim — the env is part of the baseline.
# Usage: bash scripts/r18_campaign.sh [phase...]  (default: all phases)
set -u
cd /root/repo
SF=/root/testdata/sf0.1

extract() { # log, metric, out
  grep -o "{\"metric\":\"$2\".*" "$1" | tail -1 > "$3" && echo "wrote $3" || echo "EXTRACT FAILED: $3"
}

# VERDICT r17 item 1 + 2: the r16 DPP grid verbatim (200k + 2M groups,
# 120 s/config, local[16]/24g) PLUS the never-run 20M-item group
# (10000:20000) — the BroadcastArmCap/HotItemCap arm. Extra candidate
# configs are fine for the comparator; the carried 200k/2M rows are
# what it gates.
phase_dpp() {
  for t in a b; do
    SPARK_GRAFT_STREAM_DPP=1 \
      SPARK_GRAFT_STREAM_CATALOG="100:40000,160000;1000:20000,40000;10000:20000" \
      SPARK_GRAFT_STREAM_SECS=120 SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS=16 \
      SPARK_GRAFT_SF_DIR=$SF \
      sbt -batch "runMain graft.StreamBench" > /tmp/r18_dpp_$t.log 2>&1
    echo "dpp_$t rc=$?"
    extract /tmp/r18_dpp_$t.log stream_bench STREAMBENCH_r18_dpp_$t.json
  done
}

# VERDICT r17 item 4: the r13+ same-code cpu-comparator pair at sf0.1.
phase_detail() {
  for t in a b; do
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=$SF \
      SPARK_GRAFT_BENCH_DETAIL=/root/repo/BENCH_DETAIL_r18_$t.json \
      sbt -batch "runMain graft.Bench" > /tmp/r18_bench_$t.log 2>&1
    echo "bench_$t rc=$?"
  done
  # restore the sf0.1 bench_detail.json the r17 snapshot clobbered with
  # an sf0.01 run (VERDICT r17 what's-wrong 3)
  cp BENCH_DETAIL_r18_a.json bench_detail.json
}

# VERDICT r17 item 5: the lifecycle bench, now carrying the cosine
# (buildLarge/appendLarge/compact) arm, at 1x and 10x.
phase_index() {
  for t in a b; do
    SPARK_GRAFT_SF_DIR=$SF \
      sbt -batch "runMain graft.IndexBench" > /tmp/r18_index_$t.log 2>&1
    echo "index_$t rc=$?"
    extract /tmp/r18_index_$t.log ivf_maintenance INDEXBENCH_r18_$t.json
  done
  for t in a b; do
    SPARK_GRAFT_INDEX_TILES=10 SPARK_GRAFT_SF_DIR=$SF \
      sbt -batch "runMain graft.IndexBench" > /tmp/r18_index_x10_$t.log 2>&1
    echo "index_x10_$t rc=$?"
    extract /tmp/r18_index_x10_$t.log ivf_maintenance INDEXBENCH_r18_x10_$t.json
  done
}

# VERDICT r17 item 6: routine same-code scale pair on the r18 code.
phase_scale() {
  for t in a b; do
    SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=$SF \
      sbt -batch "runMain graft.ScaleBench" > /tmp/r18_scale_$t.log 2>&1
    echo "scale_$t rc=$?"
    extract /tmp/r18_scale_$t.log scale_bench SCALEBENCH_r18_$t.json
  done
}

phases="${@:-dpp detail index scale}"
for p in $phases; do
  echo "=== phase $p $(date +%H:%M:%S) ==="
  phase_$p
done
echo "=== campaign done $(date +%H:%M:%S) ==="
