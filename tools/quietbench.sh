#!/usr/bin/env bash
# Floor-of-N quiet-window bench: waits for 1-min loadavg below a
# threshold before each pass, runs a Bench subset, repeats. The host
# is shared and its external load swings 0-26 on ~10-minute scales
# (TUNING.md "host weather"); single-thread calibration stays flat, so
# multi-thread wall times inflate with co-tenant load. The FLOOR over
# quiet-gated passes is the comparable quiet-machine number.
#
#   tools/quietbench.sh <sfdir> <q1,q2,...> [passes] [load_threshold]
#
# QB_OUTDIR (optional): copy each pass's bench_result.json (the full
# per-query record, incl. the round-13 cpu_s blocks) to
# $QB_OUTDIR/pass<i>.json — the stdout "metric" line carries only the
# headline-query walls, and cpu_s is what drift adjudication reads
# first. QB_CP (optional): classpath override, so passes can run from
# a snapshot while the live tree recompiles.
set -u
cd "$(dirname "$0")/.."
SFDIR="${1:?usage: quietbench.sh <sfdir> <queries> [passes] [load]}"
QUERIES="${2:?}"
PASSES="${3:-3}"
MAXLOAD="${4:-2.0}"
CP="${QB_CP:-target/scala-2.13/classes:/opt/spark/jars/*}"
for i in $(seq 1 "$PASSES"); do
  while :; do
    L=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$L" -v m="$MAXLOAD" 'BEGIN{exit !(l<m)}' && break
    echo "pass $i: load $L >= $MAXLOAD, waiting..." >&2
    sleep 30
  done
  echo "pass $i: load $(cut -d' ' -f1 /proc/loadavg), running" >&2
  SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_SF1=0 SPARK_GRAFT_QUERIES="$QUERIES" \
    SPARK_GRAFT_CPUS=32 java -Xmx96g -cp "$CP" graft.Bench 2>/dev/null | grep metric
  echo "pass $i: end load $(cut -d' ' -f1 /proc/loadavg)" >&2
  if [ -n "${QB_OUTDIR:-}" ]; then
    mkdir -p "$QB_OUTDIR"
    cp bench_result.json "$QB_OUTDIR/pass$i.json" 2>/dev/null || true
  fi
done
