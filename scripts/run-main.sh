#!/bin/bash
# Run a graft main (ScaleCheck / Bench / Verify) as a plain JVM process so
# sbt stays free for compiles. Usage:
#   HEAP=24g scripts/run-main.sh graft.ScaleCheck /root/testdata/sf0.1 10 doc_ccnet_bucket
# Spark 4 on Java 17 needs the module opens spark-submit normally adds.
set -euo pipefail
HEAP="${HEAP:-24g}"
THREADS="${SPARK_GRAFT_CPUS:-32}"
AO=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  AO="$AO --add-opens=java.base/$p=ALL-UNNAMED"
done
AO="$AO --add-opens=java.base/sun.nio.ch=ALL-UNNAMED"
AO="$AO --add-opens=java.base/sun.nio.cs=ALL-UNNAMED"
AO="$AO --add-opens=java.base/sun.security.action=ALL-UNNAMED"
AO="$AO --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
exec java -Xmx"$HEAP" $AO \
  -Dspark.ui.enabled=false \
  -cp /root/repo/target/scala-2.13/classes:'/opt/spark/jars/*' \
  "$@"
