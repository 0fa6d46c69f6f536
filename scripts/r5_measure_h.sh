#!/bin/bash
# Round-5 measurement batch H: 13B ragged headline + deep-context int8 at
# block 128 (remaining block-RTT amortization).
set -u
cd /root/repo
mkdir -p /tmp/r5

echo "=== bench.py 13B ragged ===" > /tmp/r5/h.log
ONEBIT_BENCH_SIZE=llama2-13b ONEBIT_BENCH_SKIP_BASELINE=1 \
timeout 2700 python bench.py >> /tmp/r5/h.log 2>&1
echo "bench 13b exit=$?" >> /tmp/r5/h.log

echo "=== deep-context serving: int8 KT engine (prompt 2048, b4, block 128) ===" >> /tmp/r5/h.log
ONEBIT_SERVE_PAGED=0 ONEBIT_SERVE_KVQ=int8 ONEBIT_SERVE_PROMPT=2048 \
ONEBIT_SERVE_BATCH=4 ONEBIT_SERVE_TOKENS=256 ONEBIT_SERVE_BLOCK=128 \
ONEBIT_SERVE_MAXLEN=2304 \
timeout 2700 python scripts/measure_serving.py >> /tmp/r5/h.log 2>&1
echo "serve int8 blk128 exit=$?" >> /tmp/r5/h.log
echo "=== DONE batch H ===" >> /tmp/r5/h.log
