#!/usr/bin/env bash
# Reproduce tools/bench_sf1.json — the 10x scaling-evidence run.
#
# 1. Derives the sf1 fixture from /root/testdata/sf0.1 via
#    graft.tools.ScaleUp (the key-shifted clone-shard model, see
#    ScaleUp.scala) into tmp/sf1_raw, then flattens each table's
#    part-directory to a single parquet FILE in tmp/sf1 (DuckDB and the
#    oracle tooling read files, not Spark part-directories).
# 2. Runs the full Bench suite on it with SPARK_DRIVER_MEM=48g: the
#    whole suite shares one JVM, and its SessionCache /
#    localCheckpoint artifacts at sf1 need the headroom (the default 8g
#    dies with Spark OOM exit code 52). SPARK_DRIVER_MEM feeds the
#    forked runMain heap via build.sbt javaOptions — SBT_OPTS does NOT.
# 3. SPARK_GRAFT_RECYCLE=24 (round 12): chunked session recycling inside
#    Bench — every 24 queries get a fresh SparkSession plus one untimed
#    warm run before their two timed passes, so late-alphabet queries
#    measure their plan, not the GC debt of 250 predecessors' artifacts
#    (r11's committed file carried 9x distortions from exactly that).
#
# Usage: tools/bench_sf1.sh [outJson]     (default tools/bench_sf1.json)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-tools/bench_sf1.json}"
RAW=tmp/sf1_raw
SF1=tmp/sf1

if [ ! -f "$SF1/lineitem.parquet" ]; then
  sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 $RAW 10"
  mkdir -p "$SF1"
  for d in "$RAW"/*.parquet; do
    t="$(basename "$d")"
    parts=("$d"/part-*.parquet)
    if [ "${#parts[@]}" -ne 1 ]; then
      # single-file sf0.1 sources scan as one partition, so ScaleUp's
      # narrow plan writes one part per table; anything else needs a
      # deliberate merge, not a silent concat
      echo "ERROR: $d has ${#parts[@]} part files, expected 1" >&2
      exit 1
    fi
    cp "${parts[0]}" "$SF1/$t"
  done
fi

mkdir -p tmp
# tee the raw log: grep -o alone would discard the crash diagnostics if
# the JVM died mid-suite
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR="$PWD/$SF1" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_RECYCLE="${SPARK_GRAFT_RECYCLE:-24}" \
  sbt -batch "runMain graft.Bench" 2>&1 | tee tmp/bench_sf1.log \
  | grep -o '{"metric".*' > "$OUT"
echo "wrote $OUT"
