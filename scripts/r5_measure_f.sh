#!/bin/bash
# Round-5 measurement batch F: int4 fused retry (Mosaic block fix) + the
# bench.py ragged-vs-flat headline A/B.
set -u
cd /root/repo
mkdir -p /tmp/r5

echo "=== deep-context serving: int4 KT engine FUSED v2 (prompt 2048, b4, block 64) ===" > /tmp/r5/f.log
ONEBIT_SERVE_PAGED=0 ONEBIT_SERVE_KVQ=int4 ONEBIT_SERVE_PROMPT=2048 \
ONEBIT_SERVE_BATCH=4 ONEBIT_SERVE_TOKENS=192 ONEBIT_SERVE_BLOCK=64 \
ONEBIT_SERVE_MAXLEN=2304 \
timeout 2700 python scripts/measure_serving.py >> /tmp/r5/f.log 2>&1
echo "serve int4 fused v2 exit=$?" >> /tmp/r5/f.log

bash scripts/r5_measure_e.sh
echo "=== DONE batch F (see e.log for bench A/B) ===" >> /tmp/r5/f.log
