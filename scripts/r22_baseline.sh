#!/bin/bash
# Round-22 baseline banking (BEFORE any code change): boot probe, then a
# same-boot bench-detail pair on the unchanged r21 code, then a quick
# sf0.001 oracle check for the "Inherited state" section.
set -u
cd /root/repo
SF=/root/testdata/sf0.1

for t in a b; do
  SPARK_GRAFT_BENCH_ONLY=q32_item_cf,q106_bpr_topn_metric,q88_lightgcn_training \
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=$SF \
    SPARK_GRAFT_BENCH_DETAIL=/root/repo/BOOTPROBE_r22_$t.json \
    sbt -batch "runMain graft.Bench" > /tmp/r22_bootprobe_$t.log 2>&1
  echo "bootprobe_$t rc=$?"
done

for t in a b; do
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=$SF \
    SPARK_GRAFT_BENCH_DETAIL=/root/repo/BENCH_DETAIL_r22_pre_$t.json \
    sbt -batch "runMain graft.Bench" > /tmp/r22_bench_pre_$t.log 2>&1
  echo "bench_pre_$t rc=$?"
done

SPARK_GRAFT_CPUS=8 sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.001 /tmp/verify_r22_inherit" \
  > /tmp/r22_verify_inherit.log 2>&1
echo "verify rc=$?"
python3 scripts/check_oracle.py /root/testdata/sf0.001 /tmp/verify_r22_inherit \
  > /tmp/r22_oracle_inherit.log 2>&1
tail -1 /tmp/r22_oracle_inherit.log
echo "=== baseline done $(date +%H:%M:%S) ==="
