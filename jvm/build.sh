#!/bin/sh
# Build polars-index-ext.jar against the pyspark-bundled Spark jars.
# Requires only JDK (javac/jar) — no Maven/Gradle/scalac.
set -e
cd "$(dirname "$0")"
SPARK_JARS=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
rm -rf classes && mkdir -p classes
javac -proc:none -encoding UTF-8 -cp "$SPARK_JARS/*" -d classes \
  src/org/polarsindex/PostingsIndexRule.java \
  src/org/polarsindex/PostingsIndexExtensions.java
jar cf polars-index-ext.jar -C classes .
echo "built $(pwd)/polars-index-ext.jar"
