#!/bin/bash
# Round-5 measurement batch J: pipelined serving with the drain-tail guard.
set -u
cd /root/repo
mkdir -p /tmp/r5

echo "=== dense serving (block 32, b16) PIPELINED v2 ===" > /tmp/r5/j.log
ONEBIT_SERVE_PAGED=0 ONEBIT_SERVE_BLOCK=32 ONEBIT_SERVE_PIPELINE=1 \
ONEBIT_SERVE_BATCH=16 ONEBIT_SERVE_TOKENS=96 ONEBIT_SERVE_MAXLEN=256 \
timeout 2400 python scripts/measure_serving.py >> /tmp/r5/j.log 2>&1
echo "dense pipe2 exit=$?" >> /tmp/r5/j.log

echo "=== deep-context int8 KT (prompt 2048, b4, block 16) PIPELINED v2 ===" >> /tmp/r5/j.log
ONEBIT_SERVE_PAGED=0 ONEBIT_SERVE_KVQ=int8 ONEBIT_SERVE_PROMPT=2048 \
ONEBIT_SERVE_BATCH=4 ONEBIT_SERVE_TOKENS=96 ONEBIT_SERVE_BLOCK=16 \
ONEBIT_SERVE_MAXLEN=2304 ONEBIT_SERVE_PIPELINE=1 \
timeout 2700 python scripts/measure_serving.py >> /tmp/r5/j.log 2>&1
echo "kt blk16 pipe2 exit=$?" >> /tmp/r5/j.log

echo "=== deep-context int8 KT (prompt 2048, b4, block 64) PIPELINED v2 ===" >> /tmp/r5/j.log
ONEBIT_SERVE_PAGED=0 ONEBIT_SERVE_KVQ=int8 ONEBIT_SERVE_PROMPT=2048 \
ONEBIT_SERVE_BATCH=4 ONEBIT_SERVE_TOKENS=192 ONEBIT_SERVE_BLOCK=64 \
ONEBIT_SERVE_MAXLEN=2304 ONEBIT_SERVE_PIPELINE=1 \
timeout 2700 python scripts/measure_serving.py >> /tmp/r5/j.log 2>&1
echo "kt blk64 pipe2 exit=$?" >> /tmp/r5/j.log
echo "=== DONE batch J ===" >> /tmp/r5/j.log
