#!/usr/bin/env bash
# Launch a graft bench main (default graft.Bench) as a plain JVM from the
# CURRENT directory, so bench.json and marker output land here instead of
# the repo (sbt runs in the project cwd and would clobber the committed
# artifact). Compile first: sbt -batch compile.
#
# Usage: [env knobs] runbench.sh [graft.Bench|graft.BenchArm args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CP="$REPO/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
AO=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  AO="$AO --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $AO -Xmx24g -XX:+UseG1GC \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "${@:-graft.Bench}"
