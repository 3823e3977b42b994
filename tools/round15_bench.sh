#!/bin/bash
# Round-15 measurement battery — serialized, direct JVM invocation (no sbt).
# Artifacts land in /tmp/r15bench/.
#
# Implements the r14 verdict's standing-gate items:
#   item 1 — ScreenDrainProbe: bounded-state drain cycles (parity + plateau)
#   item 4 — BPE watch: q_bpe_merges / q_bpe_encode isolated fresh-JVM
#   item 7 — sf1 full-surface run as a JSON gate entry (bar <=350 s, zero spill)
#   item 8 — JdbcScaleProbe: partitioned ingest at >=10 M rows / >=16 stripes
# plus the standing gates: sf10 27-query gate x3 (bar <=170 s, r15 derivation),
# the same gate at 8 g heap (bar: zero failures), bucket/stream probes,
# ScreenRestartProbe, GraphScaleProbe, CurateFastProbe, FixedCostProbe,
# and the full-surface sf0.1 anchor x3.
set -u
cd /root/repo
OUT=/tmp/r15bench
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

# 1) item 4 — the BPE watch pair, isolated fresh-JVM each (r13 protocol)
for q in q_bpe_merges q_bpe_encode; do
  run iso_$q 32g /root/testdata/sf0.1 graft.Bench $q
done

# 2) fixed-cost breakdown (standing: steady plan wall must read 13-65 ms)
run fixed_cost 32g /root/testdata/sf0.1 graft.FixedCostProbe /root/testdata/sf0.1

# 3) standing sf10 27-query gate, three runs at 32 g (bar: median <=170 s)
for i in 1 2 3; do
  run sf10_gate_$i 32g testdata-sf10 graft.Bench $GATE
done

# 4) the SAME 27-query gate at 8 g heap (bar: zero failures; spill recorded)
run sf10_gate_8g 8g testdata-sf10 graft.Bench $GATE

# 5) item 7 — sf1 full-surface standing gate (bar: <=350 s total, zero spill)
run sf1_full 32g testdata-sf1 graft.Bench

# 6) standing sf10 probes
echo "=== bucket probe ==="
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g \
  java $JOPTS -cp "$CP" graft.BucketProbe testdata-sf10 32 > $OUT/bucket.log 2>&1
echo "bucket exit $?"
echo "=== stream probe ==="
SPARK_GRAFT_CPUS=32 \
  java -Xmx32g $JOPTS -cp "$CP" graft.StreamProbe testdata-sf10 8 250000 7000 > $OUT/stream.log 2>&1
echo "stream exit $?"

# 7) stateful-screen kill/restart under sf10 volume (standing)
echo "=== screen restart probe ==="
SPARK_GRAFT_CPUS=32 \
  java -Xmx32g $JOPTS -cp "$CP" graft.ScreenRestartProbe testdata-sf10 4 > $OUT/screen_restart.log 2>&1
echo "screen_restart exit $?"

# 8) item 1 — bounded-state drain cycles: parity + plateau (NEW standing gate)
echo "=== screen drain probe ==="
SPARK_GRAFT_CPUS=32 \
  java -Xmx32g $JOPTS -cp "$CP" graft.ScreenDrainProbe testdata-sf10 3 > $OUT/screen_drain.log 2>&1
echo "screen_drain exit $?"

# 9) graph-scale gate (parity required) -> GRAPH_SCALE.json
echo "=== graph scale probe ==="
SPARK_GRAFT_CPUS=32 \
  java -Xmx32g $JOPTS -cp "$CP" graft.GraphScaleProbe > $OUT/graph_scale.log 2>&1
echo "graph_scale exit $?"

# 10) the retired q_curate_fast number (probe convention)
echo "=== curate fast probe ==="
SPARK_GRAFT_CPUS=32 \
  java -Xmx32g $JOPTS -cp "$CP" graft.CurateFastProbe /root/testdata/sf0.1 > $OUT/curate_fast.log 2>&1
echo "curate_fast exit $?"

# 11) item 8 — JDBC partitioned ingest at volume -> JDBC_SCALE.json
echo "=== jdbc scale probe ==="
SPARK_GRAFT_CPUS=32 \
  java -Xmx32g $JOPTS -cp "$CP" graft.JdbcScaleProbe > $OUT/jdbc_scale.log 2>&1
echo "jdbc_scale exit $?"

# 12) full-surface sf0.1 anchor, three runs — LAST so BENCH_LOCAL.json
#     holds the full map afterwards
for i in 1 2 3; do
  run full_sf01_$i 32g /root/testdata/sf0.1 graft.Bench
done
echo "ALL DONE $(date +%T)"
