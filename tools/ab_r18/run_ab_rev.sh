#!/bin/bash
# Reversed-order control pair (pair 4): r18 FIRST, then r16 — the
# within-pair order was fixed (r16 first) in pairs 1-3, so a monotonic
# host-recovery ramp masquerades as a one-signed code delta. If the
# gap flips or vanishes here, the ramp explanation is proven at full-
# window scale (the t-family mini-control already proved it at 10-query
# scale on byte-identical bytecode).
set -u
cd /root/repo
AO="--add-opens=java.base/java.lang=ALL-UNNAMED \
--add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
--add-opens=java.base/java.io=ALL-UNNAMED \
--add-opens=java.base/java.net=ALL-UNNAMED \
--add-opens=java.base/java.nio=ALL-UNNAMED \
--add-opens=java.base/java.util=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
--add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
--add-opens=java.base/sun.security.action=ALL-UNNAMED \
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
JOPTS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m -Xmx32g \
-XX:+ExplicitGCInvokesConcurrent"
for side in r18 r16; do
  if [ "$side" = r16 ]; then CP="target/ab_r16/target/scala-2.13/classes:/opt/spark/jars/*"
  else CP="target/scala-2.13/classes:/opt/spark/jars/*"; fi
  echo "[ab-rev] side $side start $(date -u +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    java $AO $JOPTS -cp "$CP" graft.Bench \
    > "tools/ab_r18/ab_${side}_4.jsonl" \
    2> "tools/ab_r18/ab_${side}_4.log"
  rc=$?   # captured BEFORE the date substitution resets $?
  echo "[ab-rev] side $side done  $(date -u +%H:%M:%S) rc=$rc"
done
echo "[ab-rev] reversed pair complete"
