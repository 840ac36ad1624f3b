#!/bin/bash
# Dev tool: after run_ladder_r8.sh — clean x1 re-run (the first x1 leg
# of this recording hit host contention: x3 ≈ x1 total), the full
# no-skip bench that refreshes the repo BENCH_DETAIL.json, and the x10
# oracle stress. NOT part of the shipped library.
set -e
cd /root/repo
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
J="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
   -cp /tmp/ladder_classes:/opt/spark/jars/*"
export SPARK_GRAFT_CPUS=32

echo "=== x1 re-run (ladder skip set) ==="
SPARK_GRAFT_BENCH_SKIP=d05_embedding_dups,s01_cosine_topk,s06_ann_recall \
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_WARM_DIR=/root/testdata/sf0.001 \
SPARK_GRAFT_BENCH_DETAIL=/tmp/bench_x1b.json \
$J -Xmx16g graft.Bench > /tmp/bench_x1b.out 2>/tmp/bench_x1b.err
tail -1 /tmp/bench_x1b.out

echo "=== full bench, no skip (refreshes repo BENCH_DETAIL.json) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_WARM_DIR=/root/testdata/sf0.001 \
$J -Xmx16g graft.Bench > /tmp/bench_full.out 2>/tmp/bench_full.err
tail -1 /tmp/bench_full.out

echo "=== x10 oracle stress ==="
$J -Xmx48g graft.Verify /tmp/upscale_x10 /tmp/verify_x10 \
  > /tmp/verify_x10.out 2>/tmp/verify_x10.err
python3 scripts/check_oracle.py /tmp/upscale_x10 /tmp/verify_x10 \
  > /tmp/stress_x10.out 2>&1 || true
tail -2 /tmp/stress_x10.out
echo "=== post-ladder complete ==="
