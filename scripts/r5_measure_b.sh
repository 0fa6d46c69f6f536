#!/bin/bash
# Round-5 measurement batch B (VERDICT r4 items 3+4):
#  1. bench.py default — BENCH_r05 headline preview
#  2. probe_serving_step batch 8 — same config as bench.py, reconcile the
#     7.69ms/1040 (probe) vs 8.15ms/981 (bench) methodology delta
#  3. int8 vs int4 KT engine at ctx 2048 (max_len 2304 so the int4 kernel's
#     256-wide unpacked blocks divide) — the engine-level capacity-option rate
set -u
cd /root/repo
mkdir -p /tmp/r5

echo "=== bench.py default (llama2-7b b8) ===" > /tmp/r5/b.log
timeout 2400 python bench.py >> /tmp/r5/b.log 2>&1
echo "bench exit=$?" >> /tmp/r5/b.log

echo "=== probe_serving_step b8 maxlen256 (flat + ragged + block) ===" >> /tmp/r5/b.log
ONEBIT_PROBE_BATCH=8 ONEBIT_PROBE_MAXLEN=256 ONEBIT_PROBE_WHICH=1,2,3 \
timeout 2400 python scripts/probe_serving_step.py >> /tmp/r5/b.log 2>&1
echo "probe exit=$?" >> /tmp/r5/b.log

# deep-context engine rows at block 64: the batch-A block-16 runs showed
# ~2-4 ms/step of per-block host RTT diluting the kernel's 1.4x to 1.15x —
# block 64 amortizes it 4x further on BOTH paths
echo "=== deep-context serving: bf16 dense engine (prompt 2048, b4, block 64) ===" >> /tmp/r5/b.log
ONEBIT_SERVE_PAGED=0 ONEBIT_SERVE_KVQ=0 ONEBIT_SERVE_PROMPT=2048 \
ONEBIT_SERVE_BATCH=4 ONEBIT_SERVE_TOKENS=192 ONEBIT_SERVE_BLOCK=64 \
ONEBIT_SERVE_MAXLEN=2304 \
timeout 2400 python scripts/measure_serving.py >> /tmp/r5/b.log 2>&1
echo "serve bf16 blk64 exit=$?" >> /tmp/r5/b.log

echo "=== deep-context serving: int8 KT engine (prompt 2048, b4, block 64) ===" >> /tmp/r5/b.log
ONEBIT_SERVE_PAGED=0 ONEBIT_SERVE_KVQ=int8 ONEBIT_SERVE_PROMPT=2048 \
ONEBIT_SERVE_BATCH=4 ONEBIT_SERVE_TOKENS=192 ONEBIT_SERVE_BLOCK=64 \
ONEBIT_SERVE_MAXLEN=2304 \
timeout 2400 python scripts/measure_serving.py >> /tmp/r5/b.log 2>&1
echo "serve int8@2304 blk64 exit=$?" >> /tmp/r5/b.log

echo "=== deep-context serving: int4 KT engine (prompt 2048, b4, block 64) ===" >> /tmp/r5/b.log
ONEBIT_SERVE_PAGED=0 ONEBIT_SERVE_KVQ=int4 ONEBIT_SERVE_PROMPT=2048 \
ONEBIT_SERVE_BATCH=4 ONEBIT_SERVE_TOKENS=192 ONEBIT_SERVE_BLOCK=64 \
ONEBIT_SERVE_MAXLEN=2304 \
timeout 2400 python scripts/measure_serving.py >> /tmp/r5/b.log 2>&1
echo "serve int4@2304 blk64 exit=$?" >> /tmp/r5/b.log
echo "=== DONE batch B ===" >> /tmp/r5/b.log
