#!/bin/bash
# Full-surface bench windows for round 19 (optimization round).
# Usage: tools/run_bench_r20.sh <letter> [letter...]
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
for w in "$@"; do
  echo "[bench-r20] window $w start $(date -u +%H:%M:%S)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    java $AO $JOPTS -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Bench 2> "tools/bench_r20${w}.err" \
    | grep '"metric"' > "BENCH_LOCAL_r20${w}.jsonl"
  echo "[bench-r20] window $w done  $(date -u +%H:%M:%S)"
done
echo "[bench-r20] complete"
