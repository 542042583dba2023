#!/bin/bash
# Round-5 end-window TPU sequence — run AFTER the 50k HIGHRES training run
# releases the chip (never concurrently: tunnel contention stalls both).
# Ordered by priority in case the wall clock cuts it short.
# Usage: bash benchmarks/round5_tpu_sequence.sh 2>&1 | tee /tmp/r5_seq.log
set -x
cd /root/repo

# 1. the 50k loss_at_high_res run's honest 512-sample eval at task 80
SAVE_DIR=/tmp/hr50k NUM_FG=50 EVAL_BATCHES=32 \
    timeout 1200 python benchmarks/convergence_eval.py \
    | tee benchmarks/results/highres50k_eval_task80.json

# 2. windowed-gather + relpay score-map A/B (decides TPU.scoremap_gather)
timeout 1200 python benchmarks/scoremap_probe.py

# 3. the driver bench (guard incl. windowed+relpay, train fps line)
timeout 1800 python bench.py

# 4. flagship checkpoint drill at production batch (verdict #5)
STEPS=10 timeout 1200 python benchmarks/flagship_ckpt_drill.py

# 5. encoder batch->channel folding probe (verdict #4)
timeout 1000 python benchmarks/fold_probe.py

# 6. isolated gather probe + the task-128 read of the HIGHRES carry
timeout 900 python benchmarks/wingather_probe.py
SAVE_DIR=/tmp/hr50k NUM_FG=50 EVAL_BATCHES=32 TASK_EVAL=128 \
    timeout 1200 python benchmarks/convergence_eval.py \
    | tee benchmarks/results/highres50k_eval_task128.json
