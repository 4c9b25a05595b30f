#!/bin/bash
# Round-19 bench campaign (VERDICT r18 next-items 1/3/6): serial sbt
# (shared target dir), one JSON artifact per run extracted from the
# bench's single stdout line. Env per family is r16/r18_campaign.sh's
# — the env is part of the baseline.
# Usage: bash scripts/r19_campaign.sh [phase...]  (default: all phases)
set -u
cd /root/repo
SF=/root/testdata/sf0.1

extract() { # log, metric, out
  grep -o "{\"metric\":\"$2\".*" "$1" | tail -1 > "$3" && echo "wrote $3" || echo "EXTRACT FAILED: $3"
}

# VERDICT r18 items 1+3: the PQ-coded serve measured where the raw
# serve's decode-I/O bound was diagnosed (20M items), plus a 2M PQ
# point, plus two MORE raw-dpp samples at the r18 dpp20 grid (5k/10k)
# so the 20M sustained-floor claim rests on >=3 runs. PQ mode adds
# serve_pq_evict (ADC shortlist + exact rerank) and serve_pqadc_evict
# (ADC-only — the decode-I/O-win mode) per group; the 20k offered rate
# asks whether ADC-only moves the 20M plateau itself.
phase_dpp20() {
  for t in a b; do
    SPARK_GRAFT_STREAM_DPP=1 SPARK_GRAFT_STREAM_PQ=1 \
      SPARK_GRAFT_STREAM_CATALOG="1000:40000;10000:5000,10000,20000" \
      SPARK_GRAFT_STREAM_SECS=120 SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS=16 \
      SPARK_GRAFT_SF_DIR=$SF \
      sbt -batch "runMain graft.StreamBench" > /tmp/r19_dpp20_$t.log 2>&1
    echo "dpp20_$t rc=$?"
    extract /tmp/r19_dpp20_$t.log stream_bench STREAMBENCH_r19_dpp20_$t.json
  done
}

# Routine same-code cpu-comparator pair at sf0.1 (VERDICT r18 item 6).
phase_detail() {
  for t in a b; do
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=$SF \
      SPARK_GRAFT_BENCH_DETAIL=/root/repo/BENCH_DETAIL_r19_$t.json \
      sbt -batch "runMain graft.Bench" > /tmp/r19_bench_$t.log 2>&1
    echo "bench_$t rc=$?"
  done
  cp BENCH_DETAIL_r19_a.json bench_detail.json
}

phases="${@:-dpp20 detail}"
for p in $phases; do
  echo "=== phase $p $(date +%H:%M:%S) ==="
  phase_$p
done
echo "=== campaign done $(date +%H:%M:%S) ==="
