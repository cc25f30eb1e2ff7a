#!/bin/bash
# Round-12 scale campaign (run inside tmux — NOTES r11: /tmp is a
# namespace overlay, artifacts live under /root/repo).
#   A: sf0.1 min-over-3 record (rep1 = the committed BENCH.out.json run)
#   B: 100x q72/q74 probe — the SCALE_r11 §4 drift adjudication's fresh rep
#   C: 10x rung — containment/prep family + the round-12 queries
#   D: 100x rung — same (q80 documented-skip: the synthetic corpus's
#      256-class structure makes the plain band join ~5e8 pairs there;
#      the guarded variant is the scale path, see SCALE_r12.md)
set -e
cd /root/repo
mkdir -p dev/r12

for i in 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=dev/r12/sf01_rep$i.json \
  sbt -batch "runMain graft.Bench" >> dev/r12/sf01_reps.log 2>&1 || true
done
python3 dev/min_reps.py dev/r12/sf01_min3.json \
  dev/r12/sf01_rep1.json dev/r12/sf01_rep2.json dev/r12/sf01_rep3.json \
  > dev/r12/min3.log 2>&1 || true
echo "=== A done: $(date)"

SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_ONLY=q72_containment_production,q74_train_prep_production \
SPARK_GRAFT_BENCH_OUT=dev/r12/probe_q72q74_100x.json \
sbt -batch "runMain graft.Bench" > dev/r12/probe.log 2>&1 || true
echo "=== B done: $(date)"

SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_ONLY=q67_containment_pairs,q69_containment_curated,q72_containment_production,q73_train_prep,q74_train_prep_production,q75_prep_pack,q76_wav_decode,q77_png_decode,q78_pack_split,q79_image_ahash,q80_image_neardup \
SPARK_GRAFT_BENCH_OUT=dev/r12/rung10x.json \
sbt -batch "runMain graft.Bench" > dev/r12/rung10x.log 2>&1 || true
echo "=== C done: $(date)"

SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_WARMUP=0 \
SPARK_GRAFT_ONLY=q67_containment_pairs,q72_containment_production,q73_train_prep,q74_train_prep_production,q75_prep_pack,q76_wav_decode,q77_png_decode,q78_pack_split,q79_image_ahash \
SPARK_GRAFT_BENCH_OUT=dev/r12/rung100x.json \
sbt -batch "runMain graft.Bench" > dev/r12/rung100x.log 2>&1 || true
echo "=== D done: $(date)"
echo CAMPAIGN_COMPLETE
