#!/bin/bash
# The full production media stack at the 100x rung: fixture parquet
# (1.5M assets: 500k images + 500k audio clips + 500k 4-frame videos),
# RunMediaAudit --pairs --max-bucket 6 --dedup, survivors independently
# verified by the class-level guarded-graph mirror.
set -e
cd /root/repo
mkdir -p dev/r13

SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.DevMediaGen /tmp/sf10 /tmp/media100" \
  > dev/r13/stack100x_gen.log 2>&1 || true
echo "=== gen done: $(date)"

start=$(date +%s)
SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.RunMediaAudit --in /tmp/media100 --out /tmp/maudit100 --pairs --max-bucket 6 --dedup" \
  > dev/r13/stack100x_audit.log 2>&1 || true
end=$(date +%s)
echo "audit_wall_seconds=$((end - start))" | tee dev/r13/stack100x_time.txt
grep "media-audit" dev/r13/stack100x_audit.log | tee -a dev/r13/stack100x_time.txt

python3 dev/media_stack_check.py /tmp/sf10 /tmp/maudit100 6 \
  > dev/r13/stack100x_check.log 2>&1 || true
cat dev/r13/stack100x_check.log
echo STACK100X_COMPLETE
