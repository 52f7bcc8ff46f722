#!/bin/bash
# Build hfsa-localfs.jar (the no-chmod local FileSystem shim) against the
# pyspark-bundled Hadoop client jars. Output: hfsa_spark/jars/hfsa-localfs.jar
# (committed; re-run this script after editing the Java sources).
set -euo pipefail
cd "$(dirname "$0")"
JARS=$(python3 -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
CP="$JARS/hadoop-client-api-3.4.2.jar"
[ -f "$CP" ] || CP=$(ls "$JARS"/hadoop-client-api-*.jar | head -1)
OUT=../hfsa_spark/jars
mkdir -p "$OUT" classes
javac -encoding UTF-8 -classpath "$CP" -d classes hfsa/*.java
jar cf "$OUT/hfsa-localfs.jar" -C classes hfsa
rm -rf classes
echo "built $OUT/hfsa-localfs.jar"
