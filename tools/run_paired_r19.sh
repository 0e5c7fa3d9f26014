#!/bin/bash
# Interleaved A/B/A/B paired bench: A = r18 binary (worktree), B = r19 (repo).
set -e
cd /root/repo
ADDOPENS=$(for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar; do echo --add-opens=$p=ALL-UNNAMED; done)
CP_OLD=".claude/worktrees/r18bench/target/scala-2.13/classes:/opt/spark/jars/*"
CP_NEW="target/scala-2.13/classes:/opt/spark/jars/*"
mkdir -p target/paired_r19
for leg in 1 2; do
  for side in old new; do
    CP=$([ $side = old ] && echo "$CP_OLD" || echo "$CP_NEW")
    echo "=== leg $leg side $side $(date)" >&2
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      java $ADDOPENS -Xmx32g -cp "$CP" graft.Bench \
      > target/paired_r19/${side}_leg${leg}.json 2> target/paired_r19/${side}_leg${leg}.err
  done
done
echo DONE
