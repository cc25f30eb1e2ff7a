#!/bin/bash
set -e
cd /root/repo
SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_WARMUP=0 \
SPARK_GRAFT_ONLY=q81_audio_fingerprint,q83_video_fingerprint \
SPARK_GRAFT_BENCH_OUT=dev/r12/rung100x_av.json \
sbt -batch "runMain graft.Bench" > dev/r12/rung100x_av.log 2>&1 || true
echo "=== 100x AV done: $(date)"
for i in 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=dev/r12/sf01_84_rep$i.json \
  sbt -batch "runMain graft.Bench" >> dev/r12/sf01_84_reps.log 2>&1 || true
done
python3 dev/min_reps.py dev/r12/sf01_84_min3.json \
  dev/r12/sf01_84_rep1.json dev/r12/sf01_84_rep2.json dev/r12/sf01_84_rep3.json \
  > dev/r12/min3_84.log 2>&1 || true
echo PROBE2_COMPLETE
