#!/usr/bin/env bash
# Round-11 quiet-window ladder ANCHOR: full suite at sf0.1/sf1/sf3,
# NO floors, NO prior re-measure guard (SPARK_GRAFT_PRIOR points at a
# nonexistent file) — each number is one untimed warmup + median of 3,
# taken in a load-gated window. A loadavg sampler runs alongside so the
# weather during every rung is on the record (the r10 verdict asked for
# exactly this: one full quiet ladder as the new baseline, in place of
# the one-sided floor-patching protocol).
#
#   tools/ladder_anchor.sh <outdir>
set -u
cd "$(dirname "$0")/.."
OUT="${1:?usage: ladder_anchor.sh <outdir>}"
mkdir -p "$OUT"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
MAXLOAD=3.0

# background loadavg sampler (15 s cadence), killed on exit
( while :; do echo "$(date +%s) $(cat /proc/loadavg)"; sleep 15; done ) \
  > "$OUT/loadavg.log" &
SAMPLER=$!
trap 'kill $SAMPLER 2>/dev/null' EXIT

for RUNG in /root/testdata/sf0.1 benchdata/sf1 benchdata/sf3; do
  NAME=$(basename "$RUNG")
  while :; do
    L=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$L" -v m="$MAXLOAD" 'BEGIN{exit !(l<m)}' && break
    echo "rung $NAME: load $L >= $MAXLOAD, waiting..." >&2
    sleep 30
  done
  echo "rung $NAME: start load $(cut -d' ' -f1 /proc/loadavg) at $(date +%T)" >&2
  # Stale-result guard: remove the previous rung's bench_result.json
  # BEFORE the run and only copy it on a zero exit — a failed rung
  # must record as a failure, not silently re-label the prior rung's
  # numbers as its own.
  rm -f bench_result.json
  if SPARK_GRAFT_SF_DIR="$RUNG" SPARK_GRAFT_SF1=0 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_PRIOR=/nonexistent \
    java -Xmx96g -cp "$CP" graft.Bench > "$OUT/$NAME.stdout" 2>"$OUT/$NAME.stderr"
  then
    cp bench_result.json "$OUT/bench_$NAME.json"
    echo "rung $NAME: done at $(date +%T), end load $(cut -d' ' -f1 /proc/loadavg)" >&2
  else
    echo "rung $NAME: FAILED (rc=$?) at $(date +%T) — no bench_$NAME.json recorded" >&2
  fi
done
echo "ladder anchor complete" >&2
