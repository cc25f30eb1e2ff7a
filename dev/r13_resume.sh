#!/bin/bash
# Round-13 campaign resume: step A (min-over-3) and the step-B engine
# dumps at /tmp/v10x completed in the prior run; this finishes the checks
# and the rungs, with GRAFT_ORACLE_ONLY restricting the DuckDB gate to the
# queries actually dumped (the oracle SQL runs before the dump check, so
# an unrestricted gate pays every heavy oracle at 10x/100x).
set -e
cd /root/repo
mkdir -p dev/r13

GRAFT_ORACLE_ONLY=q86_bmp_decode,q87_guarded_image_neardup,q88_gif_decode,q89_video_strided,q90_guarded_audio_neardup \
python3 dev/oracle_check.py /tmp/sf1 /tmp/v10x q85_image_dedup \
  > dev/r13/oracle10x.log 2>&1 || true
python3 dev/media_dedup_check.py /tmp/sf1 /tmp/v10x \
  > dev/r13/media_dedup10x.log 2>&1 || true
echo "=== B done: $(date)"

SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_ONLY=q80_image_neardup,q85_image_dedup,q86_bmp_decode,q87_guarded_image_neardup,q88_gif_decode,q89_video_strided,q90_guarded_audio_neardup \
SPARK_GRAFT_BENCH_OUT=dev/r13/rung10x.json \
sbt -batch "runMain graft.Bench" > dev/r13/rung10x.log 2>&1 || true
echo "=== C done: $(date)"

SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_WARMUP=0 \
SPARK_GRAFT_ONLY=q86_bmp_decode,q87_guarded_image_neardup,q88_gif_decode,q89_video_strided,q90_guarded_audio_neardup \
SPARK_GRAFT_BENCH_OUT=dev/r13/rung100x.json \
sbt -batch "runMain graft.Bench" > dev/r13/rung100x.log 2>&1 || true
echo "=== D done: $(date)"

rm -rf /tmp/v100x
SPARK_GRAFT_ONLY=q87_guarded_image_neardup,q90_guarded_audio_neardup \
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /tmp/sf10 /tmp/v100x" \
  > dev/r13/verify100x.log 2>&1 || true
GRAFT_ORACLE_ONLY=q87_guarded_image_neardup,q90_guarded_audio_neardup \
python3 dev/oracle_check.py /tmp/sf10 /tmp/v100x \
  > dev/r13/oracle100x.log 2>&1 || true
echo "=== E done: $(date)"

# F: box-band adjudication probe — a quiet min-over-3 of a stable
# 12-query subset to compare against the r12 record's minima (the full
# r13 reps sit ~20-25% above r12 across UNRELATED queries; quantify
# whether the box is uniformly slower this round)
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ONLY=q01_pricing_summary,q03_part_revenue,q17_minhash_lsh_pairs,q24_cosine_topk,q33_curation_pipeline,q36_exact_quantiles,q44_moments,q67_containment_pairs,q69_containment_curated,q73_train_prep,q75_prep_pack,q80_image_neardup \
  SPARK_GRAFT_BENCH_OUT=dev/r13/probe_rep$i.json \
  sbt -batch "runMain graft.Bench" >> dev/r13/probe_reps.log 2>&1 || true
done
python3 dev/min_reps.py dev/r13/probe_min3.json \
  dev/r13/probe_rep1.json dev/r13/probe_rep2.json dev/r13/probe_rep3.json \
  > dev/r13/probe_min3.log 2>&1 || true
echo "=== F done: $(date)"
echo RESUME_COMPLETE
