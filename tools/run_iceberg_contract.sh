#!/bin/sh
# Exercise the Iceberg writeTo leg of the backend contract
# (tests/test_resume_lineage.py::test_write_documents_iceberg_semantics),
# which is environment-gated: it SKIPs unless the Iceberg Spark runtime
# jar is on the session classpath.
#
# This sandbox has no network (DNS to repo1.maven.org fails — recorded in
# BENCH/ANALYSIS.md), so the jar cannot be vendored here. On any machine
# with network OR a local maven cache, this script proves the
# writeTo/parquet-fallback equivalence and records the run.
#
# JAR PIN (update the two variables together):
#   PySpark here is 4.1.x (Scala 2.13). Use the newest Iceberg runtime
#   built for your Spark minor line — for Spark 4.0:
#   org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0
#   (adjust the artifact's spark suffix if a 4.1 runtime has shipped).
set -eu

REPO="$(cd "$(dirname "$0")/.." && pwd)"
ICEBERG_VERSION="${ICEBERG_VERSION:-1.10.0}"
SPARK_SUFFIX="${SPARK_SUFFIX:-4.0_2.13}"
JAR_NAME="iceberg-spark-runtime-${SPARK_SUFFIX}-${ICEBERG_VERSION}.jar"
JAR_URL="https://repo1.maven.org/maven2/org/apache/iceberg/iceberg-spark-runtime-${SPARK_SUFFIX}/${ICEBERG_VERSION}/${JAR_NAME}"
JAR_DIR="${JAR_DIR:-/tmp/iceberg_jars}"
JAR="${JAR_DIR}/${JAR_NAME}"

mkdir -p "$JAR_DIR"
if [ ! -f "$JAR" ]; then
  echo "fetching $JAR_URL"
  curl -fL -o "$JAR" "$JAR_URL" || {
    echo "ERROR: cannot fetch the Iceberg runtime jar (no network?)." >&2
    echo "Place $JAR_NAME at $JAR manually and re-run." >&2
    exit 2
  }
fi

echo "running the backend-contract Iceberg leg with $JAR"
cd "$REPO"
SPARK_GRAFT_ICEBERG_JARS="$JAR" \
  python -m pytest tests/test_resume_lineage.py -x -q \
    -k "iceberg" -rs 2>&1 | tee BENCH/iceberg_contract.txt
echo "recorded to BENCH/iceberg_contract.txt"
