#!/usr/bin/env bash
# Second scale decade for the scale-critical query tail (VERDICT r11 #5):
# the 10x point (tools/bench_sf1.json) showed the compacted plans flat at
# one decade; the 100 TB claim extrapolates two more. This derives a 30x
# fixture (ScaleUp, 30 key-shifted clone shards) next to the 10x one and
# measures the heavy tail at sf0.1 / sf1 / sf3 with graft.tools.ScaleLaw
# (fresh JVM per scale point, warm run + min-of-2, rows recorded), then
# fits per-query growth exponents:
#
#   e(a->b) = log(t_b/t_a) / log(scale_b/scale_a)
#
# reported both for wall seconds and for seconds-per-output-row — the
# latter is the honest exponent for pair-emitting dedup queries, whose
# OUTPUT grows quadratically in the replica count by fixture construction
# (k clone shards make k^2 true pairs per original dup group).
#
# Round 13 (VERDICT r12 asks #4/#5): all three points run at the SAME core
# count (32) — the r12 file's sf3 leg ran at 16 cores as an OOM workaround,
# inflating e(1->3) by up to +0.63 for CPU-bound queries. The memory fix is
# now the documented dial instead: GRAFT_SESSION_CACHE_MAX bounds live
# session artifacts by LRU (evicted artifacts rebuild through lineage), so
# the sf3 JVM no longer holds the whole tail's artifact set at once. The
# query set also gains the three artifact-composition audits
# (q_detector_agreement, q_mcnemar, q_cohens_kappa) — the exact class the
# 190.9 s pre-artifact-sharing regression hid in; their marginal cost is
# measured, not asserted.
#
# Round 14 (VERDICT r13 ask #3): the set gains the honest sf0.1 budget
# top-3 — q_range_join (bucketed interval equi-join), q_edit_verify
# (Levenshtein over the verified pair artifact) and q_minhash_calibration
# (already present since r11) — the exact class whose expensive work lives
# in output columns the old counted timing pruned; their exponents were
# asserted-sound, now measured. Plus q_range_join_agg, the pre-aggregated
# twin (ask #4), so the escape-hatch plan's scaling is on record next to
# the pair-level form it replaces for count/sum workloads.
#
# Usage: tools/bench_scale.sh [outJson]   (default tools/growthlaw_r14.json)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-tools/growthlaw_r14.json}"

QUERIES="q_dedup_minhash,q_dedup_simhash,q_dedup_embedding,q_semdedup,\
q_minhash_weighted,q_minhash_calibration,q_ngram_jaccard,q_ngram_containment,\
q_dup_components,q_symspell,q_label_noise,q_bitext_margin,q_nn_descent,\
q_ann_graph,q_link_predict,q_graph_khop,q_basket_pairs,q_pagerank,\
q_boilerplate,q_lm_surprise,q_decontaminate,q_top_terms,q_dsir,q_cooccur,\
q_detector_agreement,q_mcnemar,q_cohens_kappa,\
q_range_join,q_range_join_agg,q_edit_verify"

derive() { # derive <replicas> <dir>
  local reps="$1" dir="$2"
  if [ ! -e "$dir/lineitem.parquet" ]; then
    sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 $dir $reps"
  fi
}
derive 10 tmp/sf1_raw
derive 30 tmp/sf3_raw

mkdir -p tmp
run() { # run <sfdir> <log> <mem> <cpus> <shuffle>
  # skip-if-complete: a non-empty .json means this point already ran
  # (re-running a 30x point costs ~30 min; delete the json to force)
  if [ -s "$2.json" ]; then echo "skip $1 ($2.json exists)"; return; fi
  SPARK_DRIVER_MEM="$3" SPARK_GRAFT_CPUS="$4" SPARK_GRAFT_SF_DIR="$1" \
    SPARK_GRAFT_SHUFFLE="$5" SPARK_GRAFT_ONLY="$QUERIES" \
    sbt -batch "runMain graft.tools.ScaleLaw" 2>&1 | tee "$2" \
    | grep -o '{"metric":"scalelaw".*' > "$2.json"
}
# Shuffle partitions scale with DATA (32/64/128), cores stay equal (32):
# the house partition-sizing rule — 32 partitions of sf3's 1.2B-pair
# shuffles are ~40M rows each, the observed allocation-death at 88g.
run /root/testdata/sf0.1 tmp/scalelaw14_sf01.log 48g 32 32
# the 30x point runs SECOND (it is the leg a round boundary has twice cut
# short — each point is independent, fresh JVM, skip-if-complete) and at
# 32 cores like the others (r12 ran it at 16 as an OOM workaround): 88g
# heap + the SessionCache LRU bound keep the artifact working set bounded
# — evicted artifacts rebuild through lineage, which costs recompute, not
# correctness (and the warm pass re-materializes the live set before the
# timed passes)
export GRAFT_SESSION_CACHE_MAX="${GRAFT_SESSION_CACHE_MAX:-8}"
run "$PWD/tmp/sf3_raw"   tmp/scalelaw14_sf3.log  88g 32 128
unset GRAFT_SESSION_CACHE_MAX
run "$PWD/tmp/sf1_raw"   tmp/scalelaw14_sf1.log  48g 32 64

python3 - "$OUT" <<'EOF'
import json, math, sys
pts = [("sf0.1", 0.1, "tmp/scalelaw14_sf01.log.json"),
       ("sf1",   1.0, "tmp/scalelaw14_sf1.log.json"),
       ("sf3",   3.0, "tmp/scalelaw14_sf3.log.json")]
data = {}
for name, sf, path in pts:
    data[name] = json.loads(open(path).read())["queries"]
out = {}
def expo(ta, tb, sa, sb):
    if ta <= 0 or tb <= 0: return None
    return round(math.log(tb / ta) / math.log(sb / sa), 3)
for q in data["sf0.1"]:
    t01, r01 = data["sf0.1"][q]["sec"], data["sf0.1"][q]["rows"]
    t1,  r1  = data["sf1"][q]["sec"],  data["sf1"][q]["rows"]
    t3,  r3  = data["sf3"][q]["sec"],  data["sf3"][q]["rows"]
    rec = {"sec":  {"sf0.1": round(t01,3), "sf1": round(t1,3), "sf3": round(t3,3)},
           "rows": {"sf0.1": r01, "sf1": r1, "sf3": r3},
           "e_time": {"0.1->1": expo(t01,t1,0.1,1), "1->3": expo(t1,t3,1,3)}}
    # seconds per output row, when output itself grows: the honest
    # exponent for pair-emitting queries on the clone fixture
    if r01 and r1 and r3 and r01 > 0 and r3 > r01 * 30:
        rec["e_per_row"] = {"0.1->1": expo(t01/r01, t1/r1, 0.1, 1),
                            "1->3":   expo(t1/r1,  t3/r3,  1,   3)}
    out[q] = rec
json.dump({"queries": out,
           "note": "round-14: all three points (sf0.1/sf1/sf3) at 32 cores, "
                   "full noop-write execution, min-of-2 warm passes, fresh "
                   "JVM per scale point; shuffle partitions sized for data "
                   "volume per point (32/64/128, the house partition-sizing "
                   "rule - cores equal at every point); 30-query set adds "
                   "the honest budget top-3 (q_range_join, q_edit_verify; "
                   "q_minhash_calibration already present) and the "
                   "pre-aggregated twin q_range_join_agg. e_per_row "
                   "reported where output grows superlinearly (clone-shard "
                   "fixture makes true pairs quadratic in replicas by "
                   "construction)"},
          open(sys.argv[1], "w"), indent=1)
print("wrote", sys.argv[1])
EOF
