#!/bin/bash
# Scaling-efficiency protocol (BASELINE.md): same on-disk 500k-page
# corpus, fresh JVM per run, warm-up discarded, 3 timed runs per
# parallelism level; efficiency = (docs/sec@32 / docs/sec@8) / 4.
set -e
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
OUT=${1:-/tmp/bench_scaling.jsonl}
: > "$OUT"
export SPARK_GRAFT_PIPELINE_ONLY=1
export SPARK_GRAFT_BENCH_PAGES=${SPARK_GRAFT_BENCH_PAGES:-500000}
export SPARK_GRAFT_BENCH_DIR=${SPARK_GRAFT_BENCH_DIR:-/root/repo/data/bench_pages}

run() {
  SPARK_GRAFT_CPUS=$1 java -Xmx24g $OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Bench 2>/dev/null | grep '^{'
}

for cpus in 8 32; do
  echo "== warm-up cpus=$cpus (discarded; also generates corpus if absent)" >&2
  run $cpus > /dev/null
  for i in 1 2 3; do
    echo "== timed run $i cpus=$cpus" >&2
    run $cpus >> "$OUT"
  done
done
echo "results in $OUT" >&2
