#!/bin/bash
# Spark Connect round-trip demo — proves the engine's production client
# path: a REMOTE JVM client (isolated classpath, no server jars) drives
# the engine's native expressions (GraftExtensions: float_dot/cosine_sim)
# over gRPC through a Spark Connect server.
#
# r5 NOTES claimed "no JVM client jar available in this sandbox" — wrong:
# /opt/spark/jars/connect-repl/ ships spark-connect-client-jvm (with
# shaded gRPC). The client classpath below is the minimal closure found
# by iterative ClassNotFound resolution; every jar is from the Spark
# distribution or the pre-warmed coursier cache (no downloads).
set -euo pipefail
cd "$(dirname "$0")"

J=/opt/spark/jars
SLIB=$(find /root/.cache/coursier -name "scala-library-2.13.17.jar" | head -1)
SREFL=$(find /root/.cache/coursier -name "scala-reflect-2.13.17.jar" | head -1)
KRYO=$(ls $J/kryo*.jar)
CP=".:$J/connect-repl/*:$SLIB:$SREFL:$J/spark-common-utils_2.13-4.1.2.jar:$J/spark-common-utils-java_2.13-4.1.2.jar:$J/spark-unsafe_2.13-4.1.2.jar:$KRYO:$J/slf4j-api-2.0.17.jar:$J/jackson-core-2.21.2.jar:$J/jackson-databind-2.21.2.jar:$J/jackson-annotations-2.21.jar:$J/jackson-module-scala_2.13-2.21.2.jar:$J/json4s-ast_2.13-4.0.7.jar:$J/json4s-core_2.13-4.0.7.jar:$J/json4s-jackson_2.13-4.0.7.jar:$J/json4s-jackson-core_2.13-4.0.7.jar:$J/json4s-scalap_2.13-4.0.7.jar:$J/log4j-api-2.24.3.jar:$J/log4j-core-2.24.3.jar:$J/log4j-slf4j2-impl-2.24.3.jar:$J/icu4j-77.1.jar"

# 1. build the graft jar and start a Connect server with the extensions
(sbt -batch package)
SPARK_HOME=/opt/spark /opt/spark/sbin/start-connect-server.sh \
  --jars /root/repo/target/scala-2.13/framequeryspark_2.13-0.1.0.jar \
  --conf spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions \
  --conf spark.sql.shuffle.partitions=8 \
  --master "local[8]"
sleep 25

# 2. compile + run the isolated client
javac -cp "$CP" ConnectClientDemo.java
java --add-opens=java.base/java.nio=ALL-UNNAMED \
     --add-opens=java.base/java.lang=ALL-UNNAMED \
     --add-opens=java.base/java.util=ALL-UNNAMED \
     --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
     -cp "$CP" ConnectClientDemo

# 3. stop the server
SPARK_HOME=/opt/spark /opt/spark/sbin/stop-connect-server.sh
