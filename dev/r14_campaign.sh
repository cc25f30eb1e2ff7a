#!/bin/bash
# Round-14 scale campaign.
#   A: sf0.1 min-over-4 record, full 102-query suite
#   B: 10x correctness for the round-14 queries (q97-q102) vs DuckDB
#   C: 10x rung timings (new queries + q95/q96 reference)
#   D: 100x rung timings (q97-q102)
#   E: 100x correctness for the feasible class (q100 cutoff selection,
#      q101 fixed-reference LM — the q92/q93 oracle family)
set -e
cd /root/repo
mkdir -p dev/r14

for i in 1 2 3 4; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=dev/r14/sf01_rep$i.json \
  sbt -batch "runMain graft.Bench" >> dev/r14/sf01_reps.log 2>&1 || true
done
python3 dev/min_reps.py dev/r14/sf01_min4.json \
  dev/r14/sf01_rep1.json dev/r14/sf01_rep2.json dev/r14/sf01_rep3.json \
  dev/r14/sf01_rep4.json > dev/r14/min4.log 2>&1 || true
echo "=== A done: $(date)"

rm -rf /tmp/v10x
SPARK_GRAFT_ONLY=q97_bpe_vocab,q98_bpe_encode,q99_bpe_pack,q100_select_cutoff,q101_lm_ref,q102_containment_planted \
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify /tmp/sf1 /tmp/v10x" \
  > dev/r14/verify10x.log 2>&1 || true
# GRAFT_ORACLE_ONLY is REQUIRED for subset dumps at big SFs: oracle_check
# runs every oracle SQL before checking the dump exists, and the
# q67/q71-class recursive oracles are minutes-to-hours at 10x/100x
# (learned the hard way this round: 200+ CPU-minutes on never-dumped
# queries before the first kill)
GRAFT_ORACLE_ONLY=q97_bpe_vocab,q98_bpe_encode,q99_bpe_pack,q100_select_cutoff,q101_lm_ref,q102_containment_planted \
python3 dev/oracle_check.py /tmp/sf1 /tmp/v10x > dev/r14/oracle10x.log 2>&1 || true
echo "=== B done: $(date)"

SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_ONLY=q95_bpe_merges,q96_bpe_subwords,q97_bpe_vocab,q98_bpe_encode,q99_bpe_pack,q100_select_cutoff,q101_lm_ref,q102_containment_planted \
SPARK_GRAFT_BENCH_OUT=dev/r14/rung10x.json \
sbt -batch "runMain graft.Bench" > dev/r14/rung10x.log 2>&1 || true
echo "=== C done: $(date)"

SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_WARMUP=0 \
SPARK_GRAFT_ONLY=q97_bpe_vocab,q98_bpe_encode,q99_bpe_pack,q100_select_cutoff,q101_lm_ref,q102_containment_planted \
SPARK_GRAFT_BENCH_OUT=dev/r14/rung100x.json \
sbt -batch "runMain graft.Bench" > dev/r14/rung100x.log 2>&1 || true
echo "=== D done: $(date)"

rm -rf /tmp/v100x
SPARK_GRAFT_ONLY=q100_select_cutoff,q101_lm_ref SPARK_GRAFT_CPUS=32 \
sbt -batch "runMain graft.Verify /tmp/sf10 /tmp/v100x" \
  > dev/r14/verify100x.log 2>&1 || true
GRAFT_ORACLE_ONLY=q100_select_cutoff,q101_lm_ref \
python3 dev/oracle_check.py /tmp/sf10 /tmp/v100x > dev/r14/oracle100x.log 2>&1 || true
echo "=== E done: $(date)"
echo CAMPAIGN_COMPLETE
