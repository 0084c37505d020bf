#!/bin/bash
# Regenerate the /tmp scaling decades (sf1 -> sf10 -> sf100) from the
# read-only driver testdata. The fourth decade only needs
# documents/embeddings/events (skipping lineitem saves ~14 GB + time).
set -e
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
-Xmx24g -XX:ReservedCodeCacheSize=1g"
echo "=== decade 2: sf0.1 -> /tmp/graft_sf1 (10x default)"
java $OPTS -cp "$CP" graft.tools.ScaleUpGen /root/testdata/sf0.1 /tmp/graft_sf1 10
echo "=== decade 3: sf1 -> /tmp/graft_sf10 (10x chain)"
java $OPTS -cp "$CP" graft.tools.ScaleUpGen /tmp/graft_sf1 /tmp/graft_sf10 10 chain
echo "=== decade 4: sf10 -> /tmp/graft_sf100 (10x chain2, docs/embeddings/events)"
java $OPTS -cp "$CP" graft.tools.ScaleUpGen /tmp/graft_sf10 /tmp/graft_sf100 10 chain2 documents,embeddings,events
echo "=== done"; du -sh /tmp/graft_sf1 /tmp/graft_sf10 /tmp/graft_sf100
