#!/bin/bash
# Round-14 measurement battery — serialized, direct JVM invocation (no sbt).
# Artifacts land in /tmp/r14bench/.
#
# Implements the r13 verdict's standing-gate items:
#   item 3 — isolate the three r12→r13 bench regressions fresh-JVM
#   item 4 — fixed-cost breakdown (FixedCostProbe)
#   item 5 — 8 g spill-regime rehearsal as a standing sf10 gate entry
#   item 6 — stateful-screen restart under load (ScreenRestartProbe)
#   item 7 — GraphScaleProbe in the per-round battery (GRAPH_SCALE.json)
# plus the standing sf10 27-query gate ×3, stream/bucket probes,
# CurateFastProbe (the retired q_curate_fast number), and the
# full-surface sf0.1 anchor ×3.
set -u
cd /root/repo
OUT=/tmp/r14bench
mkdir -p $OUT
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -XX:ReservedCodeCacheSize=512m"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
GATE="q_dedup_exact q_seq_pack q_lang_id q_prep_pipeline q_events_hourly q_asof q3_top10 q_block_dedup q_events_sessions_native q_bpe_merges q1_agg q_text_stats q_embed_neardup q_bpe_docs q_bloom_join q_percentiles_scale q_dedup_clusters_sampled q_minhash_pairs_sampled q_curate_lsh_sampled q_minhash_pairs_md5 q_curate_lsh_md5 q_pagerank q_dup_spans q_cross_spans q_cdc_dedup q_domain_tiered_cap q_url_blocklist"

run() { # name, heap, env-sfdir, args...
  local name=$1; shift
  local heap=$1; shift
  local sf=$1; shift
  echo "=== $name start $(date +%T) ==="
  SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_CPUS=32 \
    java -Xmx$heap $JOPTS -cp "$CP" "$@" > $OUT/$name.log 2>&1
  echo "=== $name exit $? $(date +%T) ==="
  [ -f BENCH_LOCAL.json ] && cp BENCH_LOCAL.json $OUT/$name.json
}

# 1) item 3 — the three r12→r13 regressions, isolated fresh-JVM each
for q in q_leaked_docs q_j7_key_discovery q_simhash_pairs_md5; do
  run iso_$q 32g /root/testdata/sf0.1 graft.Bench $q
done

# 2) item 4 — fixed-cost breakdown
run fixed_cost 32g /root/testdata/sf0.1 graft.FixedCostProbe /root/testdata/sf0.1

# 3) standing sf10 27-query gate, three runs at 32 g
for i in 1 2 3; do
  run sf10_gate_$i 32g testdata-sf10 graft.Bench $GATE
done

# 4) item 5 — the SAME 27-query gate at 8 g heap (spill-regime bar:
#    zero failures; spill expected and recorded in the JSON line)
run sf10_gate_8g 8g testdata-sf10 graft.Bench $GATE

# 5) standing sf10 probes
echo "=== bucket probe ==="
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g \
  java $JOPTS -cp "$CP" graft.BucketProbe testdata-sf10 32 > $OUT/bucket.log 2>&1
echo "bucket exit $?"
echo "=== stream probe ==="
SPARK_GRAFT_CPUS=32 \
  java -Xmx32g $JOPTS -cp "$CP" graft.StreamProbe testdata-sf10 8 250000 7000 > $OUT/stream.log 2>&1
echo "stream exit $?"

# 6) item 6 — stateful-screen kill/restart under sf10 volume
echo "=== screen restart probe ==="
SPARK_GRAFT_CPUS=32 \
  java -Xmx32g $JOPTS -cp "$CP" graft.ScreenRestartProbe testdata-sf10 4 > $OUT/screen_restart.log 2>&1
echo "screen_restart exit $?"

# 7) item 7 — graph-scale gate (parity required) → GRAPH_SCALE.json
echo "=== graph scale probe ==="
SPARK_GRAFT_CPUS=32 \
  java -Xmx32g $JOPTS -cp "$CP" graft.GraphScaleProbe > $OUT/graph_scale.log 2>&1
echo "graph_scale exit $?"

# 8) the retired q_curate_fast number, now a probe (r13 item 2)
echo "=== curate fast probe ==="
SPARK_GRAFT_CPUS=32 \
  java -Xmx32g $JOPTS -cp "$CP" graft.CurateFastProbe /root/testdata/sf0.1 > $OUT/curate_fast.log 2>&1
echo "curate_fast exit $?"

# 9) full-surface sf0.1 anchor, three runs — LAST so BENCH_LOCAL.json
#    holds the full map afterwards
for i in 1 2 3; do
  run full_sf01_$i 32g /root/testdata/sf0.1 graft.Bench
done
echo "ALL DONE $(date +%T)"
