#!/bin/bash
# Round-18 measurement battery — serialized, direct JVM invocation (no sbt).
# Artifacts land in /tmp/r18bench/. Changes from round17_bench.sh:
#   - FULL-SURFACE sf10 (step 4b) + sf1->sf10 sweep over ALL queries
#     at the 10x linear bound (standing since r17)
#   - IncCurationProbe and CadenceProbe standing (store-backed ledger +
#     publish-window kills since r18); full-surface sf10 ALSO runs at
#     8 g (r17 item 5); surface is 182 queries (+q_inc_curate_store)
#   - gate composition UNCHANGED from r17 (30 queries) => the 230 s bar
#     stands
set -u
cd /root/repo
OUT=/tmp/r18bench
mkdir -p $OUT
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -XX:ReservedCodeCacheSize=512m"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
# Round-18 gate: UNCHANGED from round 17 (30 queries) — the 230 s bar
# derived there stands.
GATE="q_dedup_exact q_seq_pack q_lang_id q_prep_pipeline q_events_hourly q_asof q3_top10 q_block_dedup q_events_sessions_native q_bpe_merges q1_agg q_text_stats q_embed_neardup q_bpe_docs q_bloom_join q_percentiles_scale q_dedup_clusters_sampled q_minhash_pairs_sampled q_curate_lsh_sampled q_minhash_pairs_md5 q_curate_lsh_md5 q_pagerank q_dup_spans q_cross_spans q_cdc_dedup q_domain_tiered_cap q_url_blocklist q_pq_planted q_corpus_diff q_inc_curate"

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

# 2) standing sf10 30-query gate, three runs at 32 g (bar: 230 s, r17)
for i in 1 2 3; do
  run sf10_gate_$i 32g testdata-sf10 graft.Bench $GATE
done

# 3) the SAME 30-query gate at 8 g heap (bar: zero failures AND <=2x 32g median)
run sf10_gate_8g 8g testdata-sf10 graft.Bench $GATE

# 3c) FULL-SURFACE sf10 at 8 g heap (r17 verdict item 5): the whole
#     182-query surface under the spill regime, not just the gate list —
#     exactly where the exact-pair family's 26-52 s tail could go
#     quadratic in spill. Bar: zero failures; document ratio vs the 32 g
#     full-surface run.
run sf10_full_8g 8g testdata-sf10 graft.Bench

# 3b) the SAME gate list at sf1 — the sf1->sf10 decade of the gate sweep
run sf1_gate 32g testdata-sf1 graft.Bench $GATE

# 4) sf1 full-surface standing gate (bar: <=300 s total, zero spill)
run sf1_full 32g testdata-sf1 graft.Bench

# 4b) FULL-SURFACE sf10 run (r16 verdict item 4) — every query, so a
#     quadratic hiding in a non-gate fixture above sf1 becomes visible.
#     No total bar yet (first round measuring it); the SWEEP below is
#     the gate. Expected to dominate battery wall time — the full-exact
#     pair queries alone ran 22-90 s each at sf10 in round 10.
run sf10_full 32g testdata-sf10 graft.Bench

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

# 7) bounded-state drain cycles (standing, 8 cycles; the bucketed
#    snapshot twin now re-drains idempotently via insertInto dynamic
#    overwrite — r16 ADVICE fix)
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

# 9b) NEW: incremental-curation volume probe (r16 item 1; parity
#     required) -> INC_CURATION.json
echo "=== inc curation probe ==="
SPARK_GRAFT_CPUS=32 \
  java -Xmx32g $JOPTS -cp "$CP" graft.IncCurationProbe testdata-sf10 > $OUT/inc_curation.log 2>&1
echo "inc_curation exit $?"

# 9c2) publishDrop phase decomposition (r18) -> DROP_PHASES.json
echo "=== drop phase probe ==="
SPARK_GRAFT_CPUS=32 \
  java -Xmx32g $JOPTS -cp "$CP" graft.DropPhaseProbe testdata-sf10 > $OUT/drop_phases.log 2>&1
echo "drop_phases exit $?"

# 9c) NEW: cadence probe — ingest -> publish -> incremental curation ->
#     versioned v+1 -> vacuum, with a mid-loop kill (r16 item 6; parity
#     required) -> CADENCE.json
echo "=== cadence probe ==="
SPARK_GRAFT_CPUS=32 \
  java -Xmx32g $JOPTS -cp "$CP" graft.CadenceProbe testdata-sf10 4 4 > $OUT/cadence.log 2>&1
echo "cadence exit $?"

# 10) full-surface sf0.1 anchor, three runs — LAST so BENCH_LOCAL.json
#     holds the full sf0.1 map afterwards
for i in 1 2 3; do
  run full_sf01_$i 32g /root/testdata/sf0.1 graft.Bench
done

# 11) SF-curve sweeps. Threshold 5x for sf0.1->sf1, 10x (linear bound)
#     for sf1->sf10 — see round17_bench.sh rationale. The sf1->sf10
#     step now sweeps the FULL surface (r16 item 4), not the gate list.
echo "=== sf-curve sweep sf0.1 -> sf1 ==="
python3 tools/sf_curve.py $OUT/full_sf01_3.json $OUT/sf1_full.json
echo "sf_curve exit $?"
echo "=== sf-curve sweep sf1 -> sf10 (FULL surface) ==="
python3 tools/sf_curve.py $OUT/sf1_full.json $OUT/sf10_full.json 10
echo "sf_curve_full exit $?"

# 12) cold-smear self-report per full-surface record (r16 item 5)
for rec in full_sf01_3 sf10_full sf1_full; do
  echo "=== cold smear: $rec ==="
  python3 tools/cold_smear.py $OUT/$rec.json
done
echo "ALL DONE $(date +%T)"
