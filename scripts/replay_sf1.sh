#!/usr/bin/env bash
# Serialized full-inventory replay at a scale factor: graft.Verify, then
# the DuckDB oracle comparison — ALONE. Two rounds of dedup_simhash
# sf1-oracle OOM flakes came from running the replay concurrently with
# sf3 benches (DuckDB under external memory pressure); this script holds
# an exclusive lock so a bench or second replay started by habit blocks
# instead of corrupting the run, and sets the on-disk DuckDB spill knobs
# that made the one-batch sf1 replay pass clean.
#
# Usage: scripts/replay_sf1.sh [sfDir] [outDir]   (run from the repo root)
set -euo pipefail
SF_DIR=${1:-/tmp/sf1}
OUT=${2:-/tmp/verify_sf1}
exec 9>/tmp/graft_replay.lock
flock 9
# Sweep stale scenario/temp dirs BEFORE starting: the r11 replay's one
# in-sweep failure was the DuckDB oracle ENOSPC'ing on temp spill into a
# /tmp holding 21 GB of dead warehouse dirs from earlier runs. Only
# known graft-owned prefixes, and only dirs idle >30 min (the lock keeps
# out concurrent replays, but a bench started by habit without the lock
# must not lose a live dir under it).
for p in graft- cdc- rgp- bloomprobe pqprobe servebench verify_ vr12 \
         bench- duck_tmp keepprobe annprobe; do
  find /tmp -maxdepth 1 -name "${p}*" -mmin +30 \
    \( -type d -o -type f \) -exec rm -rf {} + 2>/dev/null || true
done
# Spark's own shuffle/block dirs from crashed runs are the other bulk
find /tmp -maxdepth 1 \( -name 'spark-*' -o -name 'blockmgr-*' \) \
  -mmin +30 -exec rm -rf {} + 2>/dev/null || true
# the jdk17AddOpens list from build.sbt (it is built programmatically
# there, so extract the module names rather than literal flags; empty is
# fine — Spark 4.1.2 runs on this image's JDK 17 without them, they are
# belt-and-braces for spark-submit parity)
OPTS=$(grep -o '"java\.[a-z./]*"' build.sbt | tr -d '"' |
  sed 's/^/--add-opens /; s|$|=ALL-UNNAMED|' | tr '\n' ' ' || true)
rm -rf "$OUT"
# shellcheck disable=SC2086
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} java $OPTS -Xmx${REPLAY_MEM:-60g} \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Verify "$SF_DIR" "$OUT"
mkdir -p /tmp/duck_tmp
# threads capped: the widest oracle (ann_ivfpq_prod's learned IVF-PQ
# chain) overran a 60 GB temp disk at default parallelism and needs
# zero spill at 8 threads (107 s at sf1)
DUCKDB_TMP=/tmp/duck_tmp DUCKDB_MEM=${DUCKDB_MEM:-100GB} \
  DUCKDB_THREADS=${DUCKDB_THREADS:-8} \
  python3 scripts/check.py "$SF_DIR" "$OUT"
