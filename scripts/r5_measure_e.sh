#!/bin/bash
# Round-5 measurement batch E: bench.py headline A/B — ragged (engine hot
# step, new default) vs flat (historical lockstep step), full 7B b8.
set -u
cd /root/repo
mkdir -p /tmp/r5

echo "=== bench.py ragged (default) ===" > /tmp/r5/e.log
timeout 2400 python bench.py >> /tmp/r5/e.log 2>&1
echo "bench ragged exit=$?" >> /tmp/r5/e.log

echo "=== bench.py flat (historical) ===" >> /tmp/r5/e.log
ONEBIT_BENCH_STEP=flat ONEBIT_BENCH_SKIP_BASELINE=1 \
timeout 2400 python bench.py >> /tmp/r5/e.log 2>&1
echo "bench flat exit=$?" >> /tmp/r5/e.log
echo "=== DONE batch E ===" >> /tmp/r5/e.log
