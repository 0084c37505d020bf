#!/bin/bash
# Fourth-decade (sf10 -> sf100) scaling probes for the scale-critical
# families — r12 verdict item 1. Assumes tools/gen_decades.sh has
# populated /tmp/graft_sf10 and /tmp/graft_sf100 (documents/embeddings/
# events subset at the fourth decade). SCALING_REPS=1: at these
# magnitudes a single sample is 100x the noise floor and the min-of-reps
# estimator degrades gracefully (same protocol as the r12 sf10 probes).
set -e
cd /root/repo
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPTS="--add-opens=java.base/java.lang=ALL-UNNAMED \
--add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
--add-opens=java.base/java.io=ALL-UNNAMED \
--add-opens=java.base/java.net=ALL-UNNAMED \
--add-opens=java.base/java.nio=ALL-UNNAMED \
--add-opens=java.base/java.util=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
--add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
--add-opens=java.base/sun.security.action=ALL-UNNAMED \
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
-Xmx48g -XX:ReservedCodeCacheSize=1g"
SMALL=/tmp/graft_sf10
BIG=/tmp/graft_sf100

probe () { # name queries
  echo "=== probe $1: $2"
  SCALING_REPS=1 SCALING_JSON_OUT=/root/repo/SCALING_r13_$1.json \
    java $OPTS -cp "$CP" graft.tools.ScalingProbe "$SMALL" "$BIG" "$2"
}

probe fuzzymh_sf100  "dedup_fuzzy_minhash"
probe minhash_sf100  "dedup_minhash_lsh"
probe graph_sf100    "dedup_cluster_cc,graph_kcore"
probe adaptive_sf100 "ann_lsh_adaptive,knn_join_lsh_adaptive"
echo "=== all probes done"
