#!/bin/bash
# Bench variance study (round-17 verdict ask #1): N full graft.Bench
# invocations of ONE code version, sequential, fresh JVM each, pinned heap
# (SPARK_DRIVER_MEM, default 24g via build.sbt). Each invocation is
# internally cold/warm/min-of-3; the study's unit of observation is the
# per-invocation total_min. Run on a quiet host; every record carries its
# own loadavg + GC + heap stamps so a polluted run is identifiable from
# the artifact alone.
#
# Usage: scripts/variance_study.sh [N] [outdir]
# Env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
#        SPARK_GRAFT_ONLY (optional name filter — the suite-size experiment)
set -euo pipefail
N=${1:-5}
OUT=${2:-/root/repo/scripts/variance}
mkdir -p "$OUT"
cd /root/repo
for i in $(seq 1 "$N"); do
  echo "[variance] run $i/$N start: $(cat /proc/loadavg)" >&2
  SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    sbt -batch "runMain graft.Bench" 2>/dev/null \
    | grep '"metric"' > "$OUT/run$i.json"
  echo "[variance] run $i/$N done" >&2
done
python3 scripts/variance_summary.py "$OUT"
