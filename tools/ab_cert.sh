#!/usr/bin/env bash
# Interleaved cross-tree bench certification (round 17, verdict item 7).
#
# The committed BENCH artifacts carry a measured ±9% same-day whole-JVM
# band when arms run as whole-suite SEQUENTIAL runs (four strict runs
# 168.3-197.4 s on one tree, round 16) — per-gate movers under ~25% are
# unadjudicatable that way. This script shrinks the band by INTERLEAVING
# the two classpaths run-by-run (A,B,A,B,...) so slow host windows hit
# both arms equally, then compares per-gate MIN-of-N:
#
#   tools/ab_cert.sh <treeA> <treeB> [reps=3] [sfDir=/root/testdata/sf0.1]
#
# Each tree must be sbt-compiled (offline cache suffices:
#   git worktree add /tmp/r16tree <commit> && cd /tmp/r16tree && sbt compile).
# Each run is a fresh strict JVM from a scratch cwd (Bench writes its
# artifacts relative to cwd; the committed bench_full.json is never
# touched). Output: one line per run + per-arm files a_N.json/b_N.json
# in $OUT (default /tmp/ab_cert). Post-process with tools/ab_report.py.
set -euo pipefail
A="$1"; B="$2"; REPS="${3:-3}"; SF="${4:-/root/testdata/sf0.1}"
OUT="${OUT:-/tmp/ab_cert}"
mkdir -p "$OUT"
JARS=$(ls /opt/spark/jars/*.jar | tr '\n' ':')
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
run_arm() { # $1 tree, $2 outfile
  local cp="$1/target/scala-2.13/classes:$JARS"
  local d; d=$(mktemp -d "$OUT/run.XXXX")
  # SPARK_GRAFT_BENCH_ONLY / _REPEATS pass through for pinned-gate
  # adjudications (high repeats over a few movers instead of the suite)
  (cd "$d" && SPARK_GRAFT_BENCH_STRICT=1 SPARK_GRAFT_SF_DIR="$SF" \
    SPARK_GRAFT_BENCH_ONLY="${SPARK_GRAFT_BENCH_ONLY:-}" \
    SPARK_GRAFT_BENCH_REPEATS="${SPARK_GRAFT_BENCH_REPEATS:-}" \
    java $OPENS -Xmx48g -cp "$cp" graft.Bench > stdout.log 2> stderr.log) \
    || { echo "ARM FAILED ($1): see $d"; exit 1; }
  grep -m1 '^{"metric"' "$d/stdout.log" > "$2"
  echo "$(date +%H:%M:%S) $1 -> $(cut -c1-60 "$2")..."
}
for i in $(seq 1 "$REPS"); do
  run_arm "$A" "$OUT/a_$i.json"
  run_arm "$B" "$OUT/b_$i.json"
done
echo "done; report: python3 tools/ab_report.py $OUT"
