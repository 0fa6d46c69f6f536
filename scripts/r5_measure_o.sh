#!/bin/bash
set -u
cd /root/repo
mkdir -p /tmp/r5
echo "=== bench.py b16 ragged + window ===" > /tmp/r5/o.log
ONEBIT_BENCH_BATCH=16 ONEBIT_BENCH_SKIP_BASELINE=1 \
timeout 2400 python bench.py >> /tmp/r5/o.log 2>&1
echo "bench b16 exit=$?" >> /tmp/r5/o.log
echo "=== probe_serving_step b8 (flat/ragged/block post-window) ===" >> /tmp/r5/o.log
ONEBIT_PROBE_BATCH=8 ONEBIT_PROBE_MAXLEN=256 ONEBIT_PROBE_WHICH=2,3 \
timeout 2400 python scripts/probe_serving_step.py >> /tmp/r5/o.log 2>&1
echo "probe exit=$?" >> /tmp/r5/o.log
echo "=== DONE batch O ===" >> /tmp/r5/o.log
