#!/bin/bash
# Interleaved A/B/A/B/A/B paired bench: A = r19 binary (worktree at
# fcb809e), B = r20 (repo HEAD). Per-side MIN across the three legs,
# folded by tools/pair_r20.py. Run on a QUIET box (no Verify/test legs
# concurrent).
set -e
cd /root/repo
ADDOPENS=$(for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar; do echo --add-opens=$p=ALL-UNNAMED; done)
CP_OLD=".claude/worktrees/r19bench/target/scala-2.13/classes:/opt/spark/jars/*"
CP_NEW="target/scala-2.13/classes:/opt/spark/jars/*"
mkdir -p target/paired_r20
for leg in 1 2 3; do
  for side in old new; do
    CP=$([ $side = old ] && echo "$CP_OLD" || echo "$CP_NEW")
    echo "=== leg $leg side $side $(date)" >&2
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      java $ADDOPENS -Xmx32g -cp "$CP" graft.Bench \
      > target/paired_r20/${side}_leg${leg}.json 2> target/paired_r20/${side}_leg${leg}.err
  done
done
echo DONE
