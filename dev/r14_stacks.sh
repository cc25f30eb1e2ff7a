#!/bin/bash
# Round-14 production rungs (run AFTER dev/r14_campaign.sh).
#   F: BPE merge-learning at production vocab scale — 10x at 1,024 merges,
#      batchK=1 (sequential baseline) vs batchK=64, round counts + exact
#      merge-table identity; then 100x at 1,024 merges, batchK=64
#   G: DSIR selection at production topN — 100x, both paths, set identity
#   H: finale — the full modern pipeline in ONE RunTrainPrep invocation at
#      100x: --select-frac budget, fixed-reference LM gate (--lm-ref),
#      BPE learn+encode (--bpe-merges), pack-split on real token counts
#   I: mixed-modality ONE-invocation clean corpus at 100x:
#      RunMediaAudit --pairs --max-bucket 6 --dedup --text-survivors <H>
set -e
cd /root/repo
mkdir -p dev/r14

SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.DevBpeLadder /tmp/sf1 1024 1,64" \
  > dev/r14/bpe_ladder10x.log 2>&1 || true
grep BPE_LADDER dev/r14/bpe_ladder10x.log || true
echo "=== F1 done: $(date)"

SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.DevBpeLadder /tmp/sf10 1024 64" \
  > dev/r14/bpe_ladder100x.log 2>&1 || true
grep BPE_LADDER dev/r14/bpe_ladder100x.log || true
echo "=== F2 done: $(date)"

SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.DevSelectLadder /tmp/sf10 100000,250000" \
  > dev/r14/select_ladder100x.log 2>&1 || true
grep SELECT_LADDER dev/r14/select_ladder100x.log || true
echo "=== G done: $(date)"

# the trusted reference slice for the fixed-ref LM gate: src0 docs of the
# 100x corpus (what CCNet's Wikipedia-side model is in this harness)
SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.DevSliceGen /tmp/sf10 /tmp/lmref100" \
  > dev/r14/lmref_gen.log 2>&1 || true
start=$(date +%s)
SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.RunTrainPrep --in /tmp/docs100_tgt.parquet --out /tmp/prep100_r14 --select-target-col is_tgt --select-frac 0.2 --lm-ref /tmp/lmref100 --lm-ref-broadcast --lm-max-ppl 35 --bpe-merges 64 --pack-capacity 1024 --pack-split" \
  > dev/r14/prep100_r14.log 2>&1 || true
end=$(date +%s)
echo "finale_wall_seconds=$((end - start))" | tee dev/r14/prep100_time.txt
grep "train-prep" dev/r14/prep100_r14.log | tee -a dev/r14/prep100_time.txt
echo "=== H done: $(date)"

SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.DevMediaGen /tmp/sf10 /tmp/media100" \
  > dev/r14/media_gen.log 2>&1 || true
start=$(date +%s)
SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.RunMediaAudit --in /tmp/media100 --out /tmp/maudit100 --pairs --max-bucket 6 --dedup --text-survivors /tmp/prep100_r14/clean_corpus --text-id-col doc_id" \
  > dev/r14/mixed100.log 2>&1 || true
end=$(date +%s)
echo "mixed_wall_seconds=$((end - start))" | tee dev/r14/mixed100_time.txt
grep "media-audit" dev/r14/mixed100.log | tee -a dev/r14/mixed100_time.txt
echo "=== I done: $(date)"
echo STACKS_COMPLETE
