#!/bin/bash
# Round-5 measurement batch A (VERDICT r4 item 1):
#  1. paged-attend kernel-vs-gather sweep at ps 16/64/128/256
#  2. deep-context serving rows: bf16-dense vs KT-dense engine, prompt 2048
# Sequenced because there is one chip.  Logs under /tmp/r5/.
set -u
cd /root/repo
mkdir -p /tmp/r5

echo "=== probe_paged_attend ps=16,64,128,256 ===" > /tmp/r5/a.log
ONEBIT_PROBE_PS=16,64,128,256 timeout 1800 python scripts/probe_paged_attend.py \
  >> /tmp/r5/a.log 2>&1
echo "probe_paged_attend exit=$?" >> /tmp/r5/a.log

echo "=== deep-context serving: bf16 dense engine (prompt 2048, b4) ===" >> /tmp/r5/a.log
ONEBIT_SERVE_PAGED=0 ONEBIT_SERVE_KVQ=0 ONEBIT_SERVE_PROMPT=2048 \
ONEBIT_SERVE_BATCH=4 ONEBIT_SERVE_TOKENS=96 ONEBIT_SERVE_MAXLEN=2176 \
timeout 2400 python scripts/measure_serving.py >> /tmp/r5/a.log 2>&1
echo "serve bf16 exit=$?" >> /tmp/r5/a.log

echo "=== deep-context serving: KT dense quantized engine (prompt 2048, b4) ===" >> /tmp/r5/a.log
ONEBIT_SERVE_PAGED=0 ONEBIT_SERVE_KVQ=1 ONEBIT_SERVE_PROMPT=2048 \
ONEBIT_SERVE_BATCH=4 ONEBIT_SERVE_TOKENS=96 ONEBIT_SERVE_MAXLEN=2176 \
timeout 2400 python scripts/measure_serving.py >> /tmp/r5/a.log 2>&1
echo "serve kvq exit=$?" >> /tmp/r5/a.log
echo "=== DONE batch A ===" >> /tmp/r5/a.log
