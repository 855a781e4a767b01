#!/bin/bash
# Interleaved two-HEAD bench A/B (round 18, VERDICT r17 task #1):
# alternate full-surface Bench windows at the r16 HEAD (974c5f3,
# compiled in target/ab_r16) and the r18 HEAD (target/scala-2.13),
# back-to-back in one session, 3 pairs — so any host-epoch drift hits
# BOTH sides of each pair and a code-real regression shows up as a
# persistent within-pair delta. JVM flags replicate build.sbt's
# runMain settings exactly (same heap, GC, codegen flags on both sides).
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
CP_R16="target/ab_r16/target/scala-2.13/classes:/opt/spark/jars/*"
CP_R18="target/scala-2.13/classes:/opt/spark/jars/*"
for pair in 1 2 3; do
  for side in r16 r18; do
    if [ "$side" = r16 ]; then CP="$CP_R16"; else CP="$CP_R18"; fi
    echo "[ab] pair $pair side $side start $(date -u +%H:%M:%S)"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      java $AO $JOPTS -cp "$CP" graft.Bench \
      > "tools/ab_r18/ab_${side}_${pair}.jsonl" \
      2> "tools/ab_r18/ab_${side}_${pair}.log"
    rc=$?   # captured BEFORE the date substitution resets $?
    echo "[ab] pair $pair side $side done  $(date -u +%H:%M:%S) rc=$rc"
  done
done
echo "[ab] all pairs complete"
