#!/bin/bash
# Round-13 scale campaign.
#   A: sf0.1 min-over-3 record, full 89-query suite
#   B: 10x correctness for the round-13 queries (q85-q89) vs DuckDB
#   C: 10x rung timings (new queries + q80 reference)
#   D: 100x rung — including q87, THE guarded media-pair rung that
#      SCALE_r12 §5 had to skip for the plain join (~5e8 pairs); the
#      star-collapse guard bounds it to ~stars + rep cliques
#   E: 100x guarded-pair CORRECTNESS — q87 row-identical vs the DuckDB
#      guard mirror at 500k docs
set -e
cd /root/repo
mkdir -p dev/r13

for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=dev/r13/sf01_rep$i.json \
  sbt -batch "runMain graft.Bench" >> dev/r13/sf01_reps.log 2>&1 || true
done
python3 dev/min_reps.py dev/r13/sf01_min3.json \
  dev/r13/sf01_rep1.json dev/r13/sf01_rep2.json dev/r13/sf01_rep3.json \
  > dev/r13/min3.log 2>&1 || true
echo "=== A done: $(date)"

rm -rf /tmp/v10x
SPARK_GRAFT_ONLY=q85_image_dedup,q86_bmp_decode,q87_guarded_image_neardup,q88_gif_decode,q89_video_strided \
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /tmp/sf1 /tmp/v10x" \
  > dev/r13/verify10x.log 2>&1 || true
python3 dev/oracle_check.py /tmp/sf1 /tmp/v10x > dev/r13/oracle10x.log 2>&1 || true
echo "=== B done: $(date)"

SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_ONLY=q80_image_neardup,q85_image_dedup,q86_bmp_decode,q87_guarded_image_neardup,q88_gif_decode,q89_video_strided \
SPARK_GRAFT_BENCH_OUT=dev/r13/rung10x.json \
sbt -batch "runMain graft.Bench" > dev/r13/rung10x.log 2>&1 || true
echo "=== C done: $(date)"

SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_WARMUP=0 \
SPARK_GRAFT_ONLY=q86_bmp_decode,q87_guarded_image_neardup,q88_gif_decode,q89_video_strided \
SPARK_GRAFT_BENCH_OUT=dev/r13/rung100x.json \
sbt -batch "runMain graft.Bench" > dev/r13/rung100x.log 2>&1 || true
echo "=== D done: $(date)"

rm -rf /tmp/v100x
SPARK_GRAFT_ONLY=q87_guarded_image_neardup SPARK_GRAFT_CPUS=32 \
sbt -batch "runMain graft.Verify /tmp/sf10 /tmp/v100x" \
  > dev/r13/verify100x.log 2>&1 || true
python3 dev/oracle_check.py /tmp/sf10 /tmp/v100x > dev/r13/oracle100x.log 2>&1 || true
echo "=== E done: $(date)"
echo CAMPAIGN_COMPLETE
