#!/bin/bash
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
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  java $AO $JOPTS -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench 2> tools/bench_r18c.err | grep '"metric"' > BENCH_LOCAL_r18c.jsonl
echo done
