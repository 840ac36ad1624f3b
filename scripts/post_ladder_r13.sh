#!/bin/bash
# Dev tool: after run_ladder_r13.sh — the x10 oracle stress over the
# full r11-close surface. NOT part of the shipped library.
set -e
cd /root/repo
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
J="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
   -cp /tmp/ladder_classes_r13:/opt/spark/jars/*"
export SPARK_GRAFT_CPUS=32

echo "=== x10 oracle stress ==="
$J -Xmx48g graft.Verify /tmp/upscale_x10 /tmp/verify_x10 \
  > /tmp/verify_x10.out 2>/tmp/verify_x10.err
python3 scripts/check_oracle.py /tmp/upscale_x10 /tmp/verify_x10 \
  > /tmp/stress_x10.out 2>&1 || true
tail -2 /tmp/stress_x10.out
echo "=== post-ladder complete ==="
