#!/bin/bash
# Round-5 measurement batch C (VERDICT r4 item 1b): paged serving at the
# page sizes the probe sweep favored (ps=256 best, ps=64 runner-up), int8
# pools, block 32, batch 16 — compare against the r2 rows (ps in {16,32}:
# 976 tok/s; equally-configured dense: 1223).
set -u
cd /root/repo
mkdir -p /tmp/r5

for PS in 256 64; do
  echo "=== paged serving: int8, page ${PS}, block 32, b16 ===" >> /tmp/r5/c.log
  ONEBIT_SERVE_PAGED=1 ONEBIT_SERVE_PAGE=${PS} ONEBIT_SERVE_BLOCK=32 \
  ONEBIT_SERVE_BATCH=16 ONEBIT_SERVE_TOKENS=96 ONEBIT_SERVE_MAXLEN=256 \
  timeout 2400 python scripts/measure_serving.py >> /tmp/r5/c.log 2>&1
  echo "serve ps=${PS} exit=$?" >> /tmp/r5/c.log
done

echo "=== dense serving reference row (block 32, b16) ===" >> /tmp/r5/c.log
ONEBIT_SERVE_PAGED=0 ONEBIT_SERVE_BLOCK=32 \
ONEBIT_SERVE_BATCH=16 ONEBIT_SERVE_TOKENS=96 ONEBIT_SERVE_MAXLEN=256 \
timeout 2400 python scripts/measure_serving.py >> /tmp/r5/c.log 2>&1
echo "serve dense exit=$?" >> /tmp/r5/c.log
echo "=== DONE batch C ===" >> /tmp/r5/c.log
