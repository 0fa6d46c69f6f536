#!/bin/bash
# Round-5 measurement batch G: int4 engine rate with planar-carried scales.
set -u
cd /root/repo
mkdir -p /tmp/r5

echo "=== deep-context serving: int4 KT engine PLANAR (prompt 2048, b4, block 64) ===" > /tmp/r5/g.log
ONEBIT_SERVE_PAGED=0 ONEBIT_SERVE_KVQ=int4 ONEBIT_SERVE_PROMPT=2048 \
ONEBIT_SERVE_BATCH=4 ONEBIT_SERVE_TOKENS=192 ONEBIT_SERVE_BLOCK=64 \
ONEBIT_SERVE_MAXLEN=2304 \
timeout 2700 python scripts/measure_serving.py >> /tmp/r5/g.log 2>&1
echo "serve int4 planar exit=$?" >> /tmp/r5/g.log
echo "=== DONE batch G ===" >> /tmp/r5/g.log
