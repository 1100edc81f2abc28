#!/bin/bash
# Scaling-efficiency protocol (BASELINE.md + round-1 amendments): one
# JVM, interleaved local[8]/local[32] passes over the same corpus,
# 2 warm-ups + 5 timed runs per level, medians + digests in one JSON
# line. See graft.BenchScaling for the full protocol rationale.
set -e
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_GRAFT_BENCH_DIR=${SPARK_GRAFT_BENCH_DIR:-/root/repo/data/bench_pages}
export SPARK_GRAFT_WARMUPS=${SPARK_GRAFT_WARMUPS:-2}
export SPARK_GRAFT_RUNS=${SPARK_GRAFT_RUNS:-5}
# corpus is generated once if absent
if [ ! -f "$SPARK_GRAFT_BENCH_DIR/_SUCCESS" ]; then
  SPARK_GRAFT_GEN=${SPARK_GRAFT_BENCH_PAGES:-500000} \
  java -Xmx48g -XX:+UseParallelGC $OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.GenCorpus 2>/dev/null | grep '^{' >&2
fi
java -Xmx48g -XX:+UseParallelGC $OPENS -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.BenchScaling 2>/dev/null | grep '^{'
