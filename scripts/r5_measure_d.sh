#!/bin/bash
# Round-5 measurement batch D: int4 engine rate with the FULLY-fused
# append kernel (re-run of the batch-B int4 row), then batch C's paged
# serving sweep.
set -u
cd /root/repo
mkdir -p /tmp/r5

echo "=== deep-context serving: int4 KT engine FUSED (prompt 2048, b4, block 64) ===" > /tmp/r5/d.log
ONEBIT_SERVE_PAGED=0 ONEBIT_SERVE_KVQ=int4 ONEBIT_SERVE_PROMPT=2048 \
ONEBIT_SERVE_BATCH=4 ONEBIT_SERVE_TOKENS=192 ONEBIT_SERVE_BLOCK=64 \
ONEBIT_SERVE_MAXLEN=2304 \
timeout 2700 python scripts/measure_serving.py >> /tmp/r5/d.log 2>&1
echo "serve int4 fused exit=$?" >> /tmp/r5/d.log

bash scripts/r5_measure_c.sh
echo "=== DONE batch D (see c.log for paged) ===" >> /tmp/r5/d.log
