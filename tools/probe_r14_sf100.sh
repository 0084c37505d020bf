#!/bin/bash
# Fourth-decade (sf10 -> sf100) scaling probes, round 14 — the r13
# verdict's triage-or-fix items: the adaptive LSH families re-probed
# with PAIR-WORK instrumentation (ScalingProbe emits w_small/w_big/
# w_ratio/w_design_ratio per row; verdict = work follows the design law
# AND time follows the measured work), on the r14-regenerated decades
# (tools/gen_decades.sh — the char-bijection documents transform that
# fixed the suffix-tag gram corruption). dedup_minhash_lsh re-probed
# because the corpus changed under it. SCALING_REPS=1: at these
# magnitudes a single sample is ~100x the noise floor.
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

probe () { # name queries — `|| true`: ScalingProbe exits 1 when a row
  # flags, which must not abort the REMAINING probes under set -e (the
  # flag lives in the JSON artifact either way)
  echo "=== probe $1: $2"
  SCALING_REPS=1 SCALING_JSON_OUT=/root/repo/SCALING_r14_$1.json \
    java $OPTS -cp "$CP" graft.tools.ScalingProbe "$SMALL" "$BIG" "$2" \
    || echo "=== probe $1 flagged (exit $?)"
}

probe fuzzymh_sf100  "dedup_fuzzy_minhash"
probe adaptive_sf100 "ann_lsh_adaptive,knn_join_lsh_adaptive"
probe minhash_sf100  "dedup_minhash_lsh"
echo "=== all probes done"
