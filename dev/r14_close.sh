#!/bin/bash
# Round-14 closing pass.
#   J: 10x rung + Verify dump for q103 (SemDeDup) and q104 (KN LM),
#      plus post-fix q97 re-time at 10x and 100x
#   K: fresh sf0.1 record over the full 104-query suite (4 reps)
set -e
cd /root/repo
mkdir -p dev/r14

SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_ONLY=q97_bpe_vocab,q103_sem_dedup,q104_lm_kn \
SPARK_GRAFT_BENCH_OUT=dev/r14/rung10x_close.json \
sbt -batch "runMain graft.Bench" > dev/r14/rung10x_close.log 2>&1 || true

SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_WARMUP=0 \
SPARK_GRAFT_ONLY=q97_bpe_vocab,q104_lm_kn \
SPARK_GRAFT_BENCH_OUT=dev/r14/rung100x_close.json \
sbt -batch "runMain graft.Bench" > dev/r14/rung100x_close.log 2>&1 || true

rm -rf /tmp/v10xc
SPARK_GRAFT_ONLY=q103_sem_dedup,q104_lm_kn SPARK_GRAFT_CPUS=32 \
sbt -batch "runMain graft.Verify /tmp/sf1 /tmp/v10xc" \
  > dev/r14/verify10x_close.log 2>&1 || true
GRAFT_ORACLE_ONLY=q103_sem_dedup,q104_lm_kn \
python3 dev/oracle_check.py /tmp/sf1 /tmp/v10xc \
  > dev/r14/oracle10x_close.log 2>&1 || true
echo "=== J done: $(date)"

for i in 1 2 3 4; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=dev/r14/sf01f_rep$i.json \
  sbt -batch "runMain graft.Bench" >> dev/r14/sf01f_reps.log 2>&1 || true
done
python3 dev/min_reps.py dev/r14/sf01f_min4.json \
  dev/r14/sf01f_rep1.json dev/r14/sf01f_rep2.json dev/r14/sf01f_rep3.json \
  dev/r14/sf01f_rep4.json > dev/r14/minf4.log 2>&1 || true
echo "=== K done: $(date)"
echo CLOSE_COMPLETE
