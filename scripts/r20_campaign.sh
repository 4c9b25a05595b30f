#!/bin/bash
# Round-20 bench campaign (VERDICT r19 next-items 1/2/4/6 + ADVICE r19):
# serial sbt (shared target dir), one JSON artifact per run extracted
# from the bench's single stdout line. Env per family is the
# r16/r18/r19 campaign's — the env is part of the baseline.
#
# ADVICE r19 fixes carried here: extract() is CONTENT-gated (an empty
# artifact is a loud failure, not a silent "wrote"), and the long-window
# variants are phases of this script (the r19 180 s run-c was hand-run
# and irreproducible from r19_campaign.sh).
#
# Usage: bash scripts/r20_campaign.sh [phase...]
#   (default: dpp20 dpp20k detail)
set -u
cd /root/repo
SF=/root/testdata/sf0.1

extract() { # log, metric, out
  grep -o "{\"metric\":\"$2\".*" "$1" | tail -1 > "$3"
  if [ -s "$3" ]; then echo "wrote $3"; else echo "EXTRACT FAILED: $3"; fi
}

# One stream-bench run: $1=catalog spec, $2=secs, $3=kcap, $4=artifact tag
dpp_run() {
  # De-aliased 20M builds leave ~10 GB index trees under /tmp when a
  # run CRASHES (clean exits self-delete); three stale trees filled the
  # disk and killed the first dpp20k_a mid-write. Sweep before each run.
  rm -rf /tmp/graft-sb-*
  SPARK_GRAFT_STREAM_DPP=1 SPARK_GRAFT_STREAM_PQ=1 \
    SPARK_GRAFT_STREAM_CATALOG="$1" \
    SPARK_GRAFT_STREAM_SECS="$2" SPARK_GRAFT_STREAM_KCAP="$3" \
    SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS=16 SPARK_GRAFT_SF_DIR=$SF \
    sbt -batch "runMain graft.StreamBench" > /tmp/r20_$4.log 2>&1
  echo "$4 rc=$?"
  extract /tmp/r20_$4.log stream_bench "STREAMBENCH_r20_$4.json"
}

# VERDICT r19 item 1: the r19 dpp20 grid re-measured on the DE-ALIASED
# tiled catalog (distinct per-id vectors — disk bytes now scale with N,
# K_eff can reach K; both reported in-artifact as k_eff/cells_bytes).
# The raw-vs-ADC-only comparison is finally about bytes, not aliased
# pair volume. 120 s windows, default kcap 4096 (the r19-comparable
# structure; numbers are NOT comparable to r19 — the fixture changed by
# design, so compare_aux_bench flags vs r19 are expected and documented
# in SURVEY §8.15).
phase_dpp20() {
  for t in a b; do
    dpp_run "1000:40000;10000:5000,10000,20000" 120 4096 "dpp20_$t"
  done
}

# VERDICT r19 item 2: the pair-volume lever — lift the cell cap to the
# law's uncapped sqrt(nprobe*N) = 6325 at 20M (scored pairs per batch
# are ~users*nprobe*N/K once the cap binds). 20M group only; rates at
# the contested 10k/20k points.
phase_dpp20k() {
  for t in a b; do
    dpp_run "10000:10000,20000" 120 6325 "dpp20k_$t"
  done
}

# Long-window samples (the r19 run-c methodology, now reproducible):
# 180 s windows hold >=5 batches of the 30 s class, the sufficiency
# criterion SURVEY uses for "sustains" at 20M.
phase_dpp20c()  { dpp_run "10000:10000,20000" 180 4096 "dpp20_c"; }
phase_dpp20kc() { dpp_run "10000:10000,20000" 180 6325 "dpp20k_c"; }

# Routine same-code cpu-comparator pair at sf0.1 (VERDICT r19 item 6).
phase_detail() {
  for t in a b; do
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=$SF \
      SPARK_GRAFT_BENCH_DETAIL=/root/repo/BENCH_DETAIL_r20_$t.json \
      sbt -batch "runMain graft.Bench" > /tmp/r20_bench_$t.log 2>&1
    echo "bench_$t rc=$?"
  done
  cp BENCH_DETAIL_r20_a.json bench_detail.json
}

# VERDICT r19 item 3: three-scale oracle re-certification of the full
# catalog (last full 3-scale run was mid-r13 on 126 queries).
phase_recert() {
  for sf in 0.001 0.01 0.1; do
    SPARK_GRAFT_CPUS=8 sbt -batch \
      "runMain graft.Verify /root/testdata/sf$sf /tmp/verify_r20_sf$sf" \
      > /tmp/r20_verify_sf$sf.log 2>&1
    echo "verify sf$sf rc=$?"
    python3 scripts/check_oracle.py /root/testdata/sf$sf /tmp/verify_r20_sf$sf \
      > /tmp/r20_oracle_sf$sf.log 2>&1
    tail -1 /tmp/r20_oracle_sf$sf.log
  done
}

# Routine comparator pairs vs r19 (VERDICT r19 item 6) — warranted this
# round because the vec_id-sorted cell writes (VERDICT r19 item 4)
# touched IvfIndex/IvfPqIndex build paths, which these benches measure.
phase_index() {
  for t in a b; do
    SPARK_GRAFT_SF_DIR=$SF \
      sbt -batch "runMain graft.IndexBench" > /tmp/r20_index_$t.log 2>&1
    echo "index_$t rc=$?"
    extract /tmp/r20_index_$t.log ivf_maintenance INDEXBENCH_r20_$t.json
  done
}

phase_scale() {
  for t in a b; do
    SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=$SF \
      sbt -batch "runMain graft.ScaleBench" > /tmp/r20_scale_$t.log 2>&1
    echo "scale_$t rc=$?"
    extract /tmp/r20_scale_$t.log scale_bench SCALEBENCH_r20_$t.json
  done
}

# Throughput footnote for the streaming near-dup operator (SURVEY's
# LLM-pipeline table row): fixture corpus replayed in 10 micro-batches,
# x1 and x10 tiles (tiled copies get a marker token so signatures
# genuinely differ).
phase_dedup() {
  for t in a b; do
    SPARK_GRAFT_CPUS=16 SPARK_GRAFT_SF_DIR=$SF \
      sbt -batch "runMain graft.DedupStreamBench" > /tmp/r20_dedup_$t.log 2>&1
    echo "dedup_$t rc=$?"
    extract /tmp/r20_dedup_$t.log dedup_stream DEDUPSTREAMBENCH_r20_$t.json
  done
  for t in a b; do
    SPARK_GRAFT_DEDUP_TILES=10 SPARK_GRAFT_CPUS=16 SPARK_GRAFT_SF_DIR=$SF \
      sbt -batch "runMain graft.DedupStreamBench" > /tmp/r20_dedup_x10_$t.log 2>&1
    echo "dedup_x10_$t rc=$?"
    extract /tmp/r20_dedup_x10_$t.log dedup_stream DEDUPSTREAMBENCH_r20_x10_$t.json
  done
}

# Cross-boot drift probe (SURVEY §8.17): the SCALEBENCH_r20 pair read
# q32/q106 cpu 1.9-2.1x over the r19 pair with ZERO source changes to
# those queries; this re-times the flagged training loops via graft.Bench
# on the CURRENT boot so the flags can be adjudicated same-code against
# the banked BENCH_DETAIL_r20 pair (emitted on the previous boot).
phase_bootprobe() {
  for t in a b; do
    SPARK_GRAFT_BENCH_ONLY=q32_item_cf,q106_bpr_topn_metric,q88_lightgcn_training \
      SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=$SF \
      SPARK_GRAFT_BENCH_DETAIL=/root/repo/BOOTPROBE_r20_$t.json \
      sbt -batch "runMain graft.Bench" > /tmp/r20_bootprobe_$t.log 2>&1
    echo "bootprobe_$t rc=$?"
  done
}

phases="${@:-dpp20 dpp20k detail}"
for p in $phases; do
  echo "=== phase $p $(date +%H:%M:%S) ==="
  phase_$p
done
echo "=== campaign done $(date +%H:%M:%S) ==="
