#!/bin/bash
# Round-13 measurement battery — serialized, direct JVM invocation (no sbt).
# Artifacts land in /tmp/r13bench/.
set -u
cd /root/repo
OUT=/tmp/r13bench
mkdir -p $OUT
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx32g -XX:ReservedCodeCacheSize=512m"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
GATE="q_dedup_exact q_seq_pack q_lang_id q_prep_pipeline q_events_hourly q_asof q3_top10 q_block_dedup q_events_sessions_native q_bpe_merges q1_agg q_text_stats q_embed_neardup q_bpe_docs q_bloom_join q_percentiles_scale q_dedup_clusters_sampled q_minhash_pairs_sampled q_curate_lsh_sampled q_minhash_pairs_md5 q_curate_lsh_md5 q_pagerank q_dup_spans q_cross_spans q_cdc_dedup q_domain_tiered_cap q_url_blocklist"

run() { # name, env-sfdir, args...
  local name=$1; shift
  local sf=$1; shift
  echo "=== $name start $(date +%T) ==="
  SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_CPUS=32 \
    java $JOPTS -cp "$CP" "$@" > $OUT/$name.log 2>&1
  echo "=== $name exit $? $(date +%T) ==="
  [ -f BENCH_LOCAL.json ] && cp BENCH_LOCAL.json $OUT/$name.json
}

# 1) widened sf10 gate, three runs
for i in 1 2 3; do
  run sf10_gate_$i testdata-sf10 graft.Bench $GATE
done

# 2) standing sf10 probes
echo "=== bucket probe ==="
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=32g \
  java $JOPTS -cp "$CP" graft.BucketProbe testdata-sf10 32 > $OUT/bucket.log 2>&1
echo "bucket exit $?"
echo "=== stream probe ==="
SPARK_GRAFT_CPUS=32 \
  java $JOPTS -cp "$CP" graft.StreamProbe testdata-sf10 8 250000 7000 > $OUT/stream.log 2>&1
echo "stream exit $?"

# 3) isolated curate fast-path vs dual-path at sf0.1 (judge item 7)
run curate_iso /root/testdata/sf0.1 graft.Bench q_curate_fast q_curate_lsh q_curate_lsh_md5

# 4) full-surface sf0.1 anchor, three runs — LAST so BENCH_LOCAL.json
#    holds the full map afterwards
for i in 1 2 3; do
  run full_sf01_$i /root/testdata/sf0.1 graft.Bench
done
echo "ALL DONE $(date +%T)"
