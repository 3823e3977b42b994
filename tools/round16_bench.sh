#!/bin/bash
# Round-16 measurement battery — serialized, direct JVM invocation (no sbt).
# Artifacts land in /tmp/r16bench/. Changes from round15_bench.sh:
#   - gate composition 27 -> 29 queries (+q_pq_planted, +q_corpus_diff per
#     the r15 verdict) => the 170 bar is void; re-derive median + 3x spread
#     from this battery's three runs
#   - sf1 run of the gate list (step 3b) + second SF-curve sweep sf1->sf10
#   - SF-curve threshold tightened 10x -> 5x, zero exemptions
#   - drain probe at 8 cycles with plain-vs-bucketed snapshot cost curves
#   - sf1 full-surface bar 300 (r15 HEAD observed 236.1 s; +~25% swing)
set -u
cd /root/repo
OUT=/tmp/r16bench
mkdir -p $OUT
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -XX:ReservedCodeCacheSize=512m"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
# Round-16 gate composition (r15 verdict item 7): the r13 27-query list
# + q_pq_planted (SF-invariant planted-recall gate) + q_corpus_diff (the
# (key, fingerprint) full-outer shuffle shape). Composition changed =>
# the 170 bar is VOID; re-derive from this battery's 3 runs
# (median + 3 x spread) and record in BASELINE.md.
GATE="q_dedup_exact q_seq_pack q_lang_id q_prep_pipeline q_events_hourly q_asof q3_top10 q_block_dedup q_events_sessions_native q_bpe_merges q1_agg q_text_stats q_embed_neardup q_bpe_docs q_bloom_join q_percentiles_scale q_dedup_clusters_sampled q_minhash_pairs_sampled q_curate_lsh_sampled q_minhash_pairs_md5 q_curate_lsh_md5 q_pagerank q_dup_spans q_cross_spans q_cdc_dedup q_domain_tiered_cap q_url_blocklist q_pq_planted q_corpus_diff"

run() { # name, heap, env-sfdir, args...
  local name=$1; shift
  local heap=$1; shift
  local sf=$1; shift
  echo "=== $name start $(date +%T) ==="
  # BENCH_LOCAL.json is committed, so a crashed/non-Bench step would
  # silently archive the PREVIOUS step's map under this step's name —
  # remove it first so a missing output is loud (no $OUT/$name.json).
  rm -f BENCH_LOCAL.json
  SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_CPUS=32 \
    java -Xmx$heap $JOPTS -cp "$CP" "$@" > $OUT/$name.log 2>&1
  local rc=$?
  echo "=== $name exit $rc $(date +%T) ==="
  if [ $rc -eq 0 ] && [ -f BENCH_LOCAL.json ]; then
    cp BENCH_LOCAL.json $OUT/$name.json
  else
    echo "!!! $name: no fresh BENCH_LOCAL.json archived (rc=$rc)"
  fi
}

# 1) fixed-cost breakdown (standing: steady plan wall must read 13-65 ms)
run fixed_cost 32g /root/testdata/sf0.1 graft.FixedCostProbe /root/testdata/sf0.1

# 2) standing sf10 29-query gate, three runs at 32 g (bar: re-derive —
#    composition changed this round; r15 27-q median was 142.3)
for i in 1 2 3; do
  run sf10_gate_$i 32g testdata-sf10 graft.Bench $GATE
done

# 3) the SAME 29-query gate at 8 g heap (bar: zero failures AND <=2x 32g median)
run sf10_gate_8g 8g testdata-sf10 graft.Bench $GATE

# 3b) the SAME gate list at sf1 — the sf1->sf10 decade of the SF-curve
#     (r15 verdict item 3: threshold crossings ABOVE sf1 were invisible)
run sf1_gate 32g testdata-sf1 graft.Bench $GATE

# 4) sf1 full-surface standing gate (bar: <=300 s total, zero spill)
run sf1_full 32g testdata-sf1 graft.Bench

# 5) standing sf10 probes
echo "=== bucket probe ==="
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g \
  java $JOPTS -cp "$CP" graft.BucketProbe testdata-sf10 32 > $OUT/bucket.log 2>&1
echo "bucket exit $?"
echo "=== stream probe ==="
SPARK_GRAFT_CPUS=32 \
  java -Xmx32g $JOPTS -cp "$CP" graft.StreamProbe testdata-sf10 8 250000 7000 > $OUT/stream.log 2>&1
echo "stream exit $?"

# 6) stateful-screen kill/restart under sf10 volume (standing)
echo "=== screen restart probe ==="
SPARK_GRAFT_CPUS=32 \
  java -Xmx32g $JOPTS -cp "$CP" graft.ScreenRestartProbe testdata-sf10 4 > $OUT/screen_restart.log 2>&1
echo "screen_restart exit $?"

# 7) bounded-state drain cycles: parity + plateau + the per-batch cost
#    curve vs snapshot size, plain AND bucketed layouts (r15 item 1 —
#    8 cycles so the snapshot grows ~7x cycle 1 -> 8)
echo "=== screen drain probe ==="
SPARK_GRAFT_CPUS=32 \
  java -Xmx32g $JOPTS -cp "$CP" graft.ScreenDrainProbe testdata-sf10 8 > $OUT/screen_drain.log 2>&1
echo "screen_drain exit $?"

# 8) graph-scale gate (parity required) -> GRAPH_SCALE.json
echo "=== graph scale probe ==="
SPARK_GRAFT_CPUS=32 \
  java -Xmx32g $JOPTS -cp "$CP" graft.GraphScaleProbe > $OUT/graph_scale.log 2>&1
echo "graph_scale exit $?"

# 9) the retired q_curate_fast number (probe convention)
echo "=== curate fast probe ==="
SPARK_GRAFT_CPUS=32 \
  java -Xmx32g $JOPTS -cp "$CP" graft.CurateFastProbe /root/testdata/sf0.1 > $OUT/curate_fast.log 2>&1
echo "curate_fast exit $?"

# 10) full-surface sf0.1 anchor, three runs — LAST so BENCH_LOCAL.json
#     holds the full sf0.1 map afterwards
for i in 1 2 3; do
  run full_sf01_$i 32g /root/testdata/sf0.1 graft.Bench
done

# 11) SF-curve sweeps. Threshold 5x with ZERO exemptions (r15 item 2);
#     a 5-6x in-sweep reading must be re-measured isolated before being
#     treated as real (see tools/sf_curve.py docstring).
#     Step 1: sf0.1 anchor -> sf1 full surface.
#     Step 2: sf1 -> sf10 on the gate list (r15 item 3 — the decade the
#     r15 sweep could not see).
echo "=== sf-curve sweep sf0.1 -> sf1 ==="
python3 tools/sf_curve.py $OUT/full_sf01_3.json $OUT/sf1_full.json
echo "sf_curve exit $?"
echo "=== sf-curve sweep sf1 -> sf10 (gate list) ==="
# Threshold 10 (the linear bound) for THIS decade, not 5: at sf1 the
# data term already dominates fixed cost, so an honestly-linear query
# reads close to 10x for 10x data (q1_agg measured 5.3x = fixed-cost
# dilution alone). 5x is the right bar only for the sf0.1 -> sf1 step,
# where per-query fixed cost pads the denominator.
python3 tools/sf_curve.py $OUT/sf1_gate.json $OUT/sf10_gate_3.json 10
echo "sf_curve_gate exit $?"
echo "ALL DONE $(date +%T)"
