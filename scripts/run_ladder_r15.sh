#!/bin/bash
# Dev tool: build the x3/x10/x30 disjoint-shard corpora (reused from
# earlier rounds if present) and run the full-suite bench ladder
# (x1/x3/x10/x30) over the r15-close full-query surface (197 queries;
# the wa crawl plane and the r14/r15 fold work have never been
# laddered -- VERDICT r14 item 2). NOT part of the library.
set -e
cd /root/repo
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
# snapshot the classes: a concurrent `sbt compile` rewriting
# target/classes mid-leg makes the running JVM lazy-load torn class
# files -> spurious per-query failures (bitten in r8)
rm -rf /tmp/ladder_classes_r15
cp -r target/scala-2.13/classes /tmp/ladder_classes_r15
J="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
   -cp /tmp/ladder_classes_r15:/opt/spark/jars/*"
export SPARK_GRAFT_CPUS=32
# ladder legs measure SCALING, not stall robustness: 3 reps keeps the
# x30 leg affordable (the default of 5 is for recorded sf0.1 runs)
export SPARK_GRAFT_BENCH_REPS=3
# the documented all-pairs truth twins are quadratic BY DESIGN
# (oracle baselines for d07/s02-s04, and s12's mining twin); at x30
# they would dominate the whole ladder. This list is PINNED to
# graft.Bench.QuadraticTruthTwins: Bench refuses any other name, and
# BenchAuditSpec fails if this line and the constant ever drift
export SPARK_GRAFT_BENCH_SKIP=d05_embedding_dups,s01_cosine_topk,s06_ann_recall,s12_hard_negatives

for k in 3 10 30; do
  if [ ! -d /tmp/upscale_x$k/documents.parquet ]; then
    echo "=== building x$k corpus ==="
    rm -rf /tmp/upscale_x$k
    $J -Xmx16g graft.tools.UpscaleCorpus /root/testdata/sf0.1 /tmp/upscale_x$k $k
  fi
done

# stale persisted stores from earlier rounds/runs: the r12 contract
# queries rebuild them via initIfStale fingerprints, but clearing them
# keeps leg 1's init cost honest (paid inside the leg, not skipped)
rm -rf /tmp/graft_vector_index__tmp_upscale_x* /tmp/graft_bm25_index__tmp_upscale_x* \
       /tmp/graft_vector_index__root_testdata_sf0.1 /tmp/graft_bm25_index__root_testdata_sf0.1 \
       /tmp/graft_sig_store__tmp_upscale_x*_s27 /tmp/graft_sig_store__root_testdata_sf0.1_s27

run_leg() {
  local name=$1 dir=$2 xmx=$3
  echo "=== bench $name ($dir) ==="
  SPARK_GRAFT_SF_DIR=$dir \
  SPARK_GRAFT_WARM_DIR=/root/testdata/sf0.001 \
  SPARK_GRAFT_BENCH_DETAIL=/tmp/bench_$name.json \
  $J -Xmx$xmx graft.Bench > /tmp/bench_$name.out 2>/tmp/bench_$name.err
  tail -1 /tmp/bench_$name.out
}

run_leg x1 /root/testdata/sf0.1 16g
run_leg x3 /tmp/upscale_x3 24g
run_leg x10 /tmp/upscale_x10 48g
run_leg x30 /tmp/upscale_x30 80g
echo "=== ladder complete ==="
