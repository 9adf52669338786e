#!/usr/bin/env bash
# Second scale decade for the scale-critical query tail (VERDICT r11 #5):
# the 10x point (tools/bench_sf1.json) showed the compacted plans flat at
# one decade; the 100 TB claim extrapolates two more. This derives a 30x
# fixture (ScaleUp, 30 key-shifted clone shards) next to the 10x one and
# measures the heavy tail at sf0.1 / sf1 / sf3 with graft.tools.ScaleLaw,
# then fits per-query growth exponents:
#
#   e(a->b) = log(t_b/t_a) / log(scale_b/scale_a)
#
# reported both for wall seconds and for seconds-per-output-row — the
# latter is the honest exponent for pair-emitting dedup queries, whose
# OUTPUT grows quadratically in the replica count by fixture construction
# (k clone shards make k^2 true pairs per original dup group).
#
# Round 15 (VERDICT r14 ask #1): ONE QUERY PER FRESH JVM, at every scale
# point. The single-JVM 30-query shape OOM-died at sf3 three times (r13,
# r14 mid-round, r14 post-commit) despite heartbeat/page-size/shuffle
# flags, losing the whole leg each time — and its dying JSON recorded 5 ms
# "times" for queries whose execution had thrown. Per-query isolation
# means: one OOM costs one row, not the leg; the OOMing query is
# identified by construction; a hard per-JVM timeout bounds GC-thrash
# spirals; and every JVM's result (success, error, timeout, death) is
# appended to a per-point .jsonl incrementally, so a cut-short leg keeps
# everything it measured. Timed-pass semantics are UNCHANGED vs the
# single-JVM r13 points (warm pass builds the query's SessionCache
# artifacts, two timed passes ride them, min-of-2, noop-write full
# execution), so exponents remain comparable across rounds.
#
# The JVM is launched directly (java -cp classes:/opt/spark/jars/*) with
# build.sbt's exact module flags — sbt startup would add ~40 s x 96 JVMs
# of pure overhead. `sbt -batch compile` runs once up front.
#
# Round 15 set additions (VERDICT r14 ask #4): q_fleiss_kappa (honest sf1
# suite #2 at 49.9 s, suite e=1.35 — artifact-confounded, never measured
# isolated) and q_cochran_q (same artifact family) -> 32 queries.
#
# Usage: tools/bench_scale.sh [outJson]   (default tools/growthlaw_r15.json)
set -uo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-tools/growthlaw_r15.json}"

QUERIES="q_dedup_minhash q_dedup_simhash q_dedup_embedding q_semdedup \
q_minhash_weighted q_minhash_calibration q_ngram_jaccard q_ngram_containment \
q_dup_components q_symspell q_label_noise q_bitext_margin q_nn_descent \
q_ann_graph q_link_predict q_graph_khop q_basket_pairs q_pagerank \
q_boilerplate q_lm_surprise q_decontaminate q_top_terms q_dsir q_cooccur \
q_detector_agreement q_mcnemar q_cohens_kappa \
q_range_join q_range_join_agg q_edit_verify \
q_fleiss_kappa q_cochran_q"

derive() { # derive <replicas> <dir>
  local reps="$1" dir="$2"
  if [ ! -e "$dir/lineitem.parquet" ]; then
    sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 $dir $reps" || exit 1
  fi
}
derive 10 tmp/sf1_raw
derive 30 tmp/sf3_raw

sbt -batch compile || exit 1
mkdir -p tmp

CP="target/scala-2.13/classes:/opt/spark/jars/*"
# build.sbt's jdk17AddOpens, verbatim (Spark 4 on JDK 17 outside
# spark-submit needs them)
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

run_one() { # run_one <sfdir> <tag> <mem> <cpus> <shuffle> <timeout> <pagesize|-> <query>
  local sfdir="$1" tag="$2" mem="$3" cpus="$4" shuffle="$5" tmo="$6" pg="$7" q="$8"
  local jsonl="tmp/${tag}.jsonl" log="tmp/${tag}.log"
  # skip-if-complete: a prior SUCCESS row (numeric sec) for this query
  # means it already ran; error/timeout rows are retried
  if [ -f "$jsonl" ] && grep -q "\"$q\":{\"sec\":[0-9]" "$jsonl"; then
    echo "skip $q @ $tag (already measured)"; return
  fi
  echo "=== $tag $q mem=$mem cpus=$cpus shuffle=$shuffle tmo=${tmo}s $(date +%T) ==="
  local pgenv=()
  [ "$pg" != "-" ] && pgenv=(SPARK_GRAFT_PAGESIZE="$pg")
  env SPARK_GRAFT_SF_DIR="$sfdir" SPARK_GRAFT_CPUS="$cpus" \
  SPARK_GRAFT_SHUFFLE="$shuffle" SPARK_GRAFT_ONLY="$q" "${pgenv[@]}" \
    timeout -k 30 "$tmo" \
    java $OPENS -Xmx"$mem" -XX:+ExitOnOutOfMemoryError \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$CP" graft.tools.ScaleLaw >> "$log" 2>&1
  local rc=$?
  local line
  line=$(grep -o '{"metric":"scalelaw".*' "$log" | tail -1)
  # the log accumulates across queries; the tail line is only THIS run's
  # if it names this query (ScaleLaw prints it after all measurement, so
  # a late nonzero exit — e.g. during spark.stop() — doesn't void it)
  if [ -n "$line" ] && echo "$line" | grep -q "\"$q\":{\"sec\""; then
    echo "$line" >> "$jsonl"
  else
    # per-query failure record, by construction attributable (ask #1)
    local err="jvm_rc_$rc"; [ $rc -eq 124 ] || [ $rc -eq 137 ] && err="timeout_${tmo}s"
    echo "{\"metric\":\"scalelaw\",\"sf\":\"$sfdir\",\"queries\":{\"$q\":{\"sec\":null,\"rows\":-1,\"err\":\"$err\"}}}" >> "$jsonl"
    echo "FAILED $q @ $tag rc=$rc"
  fi
}

point() { # point <sfdir> <tag> <mem> <cpus> <shuffle> <timeout> <pagesize|->
  for q in $QUERIES; do run_one "$1" "$2" "$3" "$4" "$5" "$6" "$7" "$q"; done
}

# Shuffle partitions scale with DATA (32/64/128), cores stay equal (32):
# the house partition-sizing rule. Per-JVM heap needs only ONE query's
# artifact set now, but sf3's single heaviest (detector-family artifact
# derivation) still wants the full headroom. sf3 runs FIRST: it is the
# leg a round boundary has three times cut short; per-query .jsonl rows
# survive any interruption.
# 128m page cap at sf3 ONLY (see ScaleLaw.scala: the blanket cap
# distorted small points 25x in r15 by forcing whole-pool page spills)
point "$PWD/tmp/sf3_raw"   scalelaw15_sf3  88g 32 128 5400 128m
point /root/testdata/sf0.1 scalelaw15_sf01 48g 32 32   900 -
point "$PWD/tmp/sf1_raw"   scalelaw15_sf1  64g 32 64  2400 -

python3 tools/merge_growthlaw.py "$OUT" \
  tmp/scalelaw15_sf01.jsonl tmp/scalelaw15_sf1.jsonl tmp/scalelaw15_sf3.jsonl
