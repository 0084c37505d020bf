#!/bin/bash
# Fourth-decade (sf10 -> sf100) re-probe, round 15: the adaptive
# hyperplane-LSH family on (a) the r15 CENTERED projections (per-plane
# median-split thresholds — the r14 clumping watch item's fix) and
# (b) embeddings/events decades regenerated under the audited generator
# (GeneratorHonestySpec gates the transforms). PairWork runs first so
# the clump verdict (pairsUB vs designPairs at both decades) lands in
# the log even if a probe dies. SCALING_REPS=1: at these magnitudes a
# single sample is ~100x the noise floor.
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

echo "=== pairwork (centered planes): sf10, sf100"
java $OPTS -cp "$CP" graft.tools.PairWork "$SMALL" "$BIG" \
  || echo "=== pairwork FAILED (exit $?)"

probe () { # `|| true`: ScalingProbe exits 1 when a row flags, which
  # must not abort the remaining probes under set -e
  echo "=== probe $1: $2"
  SCALING_REPS=1 SCALING_JSON_OUT=/root/repo/SCALING_r15_$1.json \
    java $OPTS -cp "$CP" graft.tools.ScalingProbe "$SMALL" "$BIG" "$2" \
    || echo "=== probe $1 flagged (exit $?)"
}

probe adaptive_sf100 "ann_lsh_adaptive,knn_join_lsh_adaptive"
echo "=== all probes done"
