#!/bin/bash
# Round-5 batch N: bench with the length-aware window + serving re-check.
set -u
cd /root/repo
mkdir -p /tmp/r5
echo "=== bench.py ragged + window ladder ===" > /tmp/r5/n.log
ONEBIT_BENCH_SKIP_BASELINE=1 timeout 2400 python bench.py >> /tmp/r5/n.log 2>&1
echo "bench exit=$?" >> /tmp/r5/n.log
echo "=== dense serving (block 32, b16) pipelined + window ===" >> /tmp/r5/n.log
ONEBIT_SERVE_PAGED=0 ONEBIT_SERVE_BLOCK=32 ONEBIT_SERVE_PIPELINE=1 \
ONEBIT_SERVE_BATCH=16 ONEBIT_SERVE_TOKENS=96 ONEBIT_SERVE_MAXLEN=256 \
timeout 2400 python scripts/measure_serving.py >> /tmp/r5/n.log 2>&1
echo "serve exit=$?" >> /tmp/r5/n.log
echo "=== DONE batch N ===" >> /tmp/r5/n.log
