#!/bin/bash
# Round-13 final campaign: clean timings + scale correctness with the
# final round-13 binary. The first campaign's step-A reps ran concurrently
# with foreground verify/test work (CPU contention) and predate q90; its
# step B stalled on q85's recursive-CTE closure at 10x — the same
# O(component^2) infeasibility as q45's (oracle_check docstring), so q85
# uses the independent union-find checker (dev/media_dedup_check.py) at
# scale, exactly the q45 convention.
set -e
cd /root/repo
mkdir -p dev/r13

# A': sf0.1 min-over-3, full 90-query suite
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=dev/r13/sf01f_rep$i.json \
  sbt -batch "runMain graft.Bench" >> dev/r13/sf01f_reps.log 2>&1 || true
done
python3 dev/min_reps.py dev/r13/sf01_min3.json \
  dev/r13/sf01f_rep1.json dev/r13/sf01f_rep2.json dev/r13/sf01f_rep3.json \
  > dev/r13/min3.log 2>&1 || true
echo "=== A done: $(date)"

# B': 10x correctness for q85-q90 (q85 via union-find; rest via DuckDB)
rm -rf /tmp/v10x
SPARK_GRAFT_ONLY=q85_image_dedup,q86_bmp_decode,q87_guarded_image_neardup,q88_gif_decode,q89_video_strided,q90_guarded_audio_neardup \
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /tmp/sf1 /tmp/v10x" \
  > dev/r13/verify10x.log 2>&1 || true
python3 dev/oracle_check.py /tmp/sf1 /tmp/v10x q85_image_dedup \
  > dev/r13/oracle10x.log 2>&1 || true
python3 dev/media_dedup_check.py /tmp/sf1 /tmp/v10x \
  > dev/r13/media_dedup10x.log 2>&1 || true
echo "=== B done: $(date)"

# C': 10x rung timings
SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_ONLY=q80_image_neardup,q85_image_dedup,q86_bmp_decode,q87_guarded_image_neardup,q88_gif_decode,q89_video_strided,q90_guarded_audio_neardup \
SPARK_GRAFT_BENCH_OUT=dev/r13/rung10x.json \
sbt -batch "runMain graft.Bench" > dev/r13/rung10x.log 2>&1 || true
echo "=== C done: $(date)"

# D': 100x rung — including the guarded media-pair rungs (q87 image,
# q90 audio) that SCALE_r12 §5 had to skip for the plain join
SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_WARMUP=0 \
SPARK_GRAFT_ONLY=q86_bmp_decode,q87_guarded_image_neardup,q88_gif_decode,q89_video_strided,q90_guarded_audio_neardup \
SPARK_GRAFT_BENCH_OUT=dev/r13/rung100x.json \
sbt -batch "runMain graft.Bench" > dev/r13/rung100x.log 2>&1 || true
echo "=== D done: $(date)"

# E': 100x guarded-pair CORRECTNESS — q87 + q90 row-identical vs the
# DuckDB guard mirrors at 500k docs
rm -rf /tmp/v100x
SPARK_GRAFT_ONLY=q87_guarded_image_neardup,q90_guarded_audio_neardup \
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /tmp/sf10 /tmp/v100x" \
  > dev/r13/verify100x.log 2>&1 || true
python3 dev/oracle_check.py /tmp/sf10 /tmp/v100x \
  > dev/r13/oracle100x.log 2>&1 || true
echo "=== E done: $(date)"
echo RETIME_COMPLETE
