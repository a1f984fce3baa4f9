#!/bin/bash
# Round-4c drive: e2e trainer at the full-unroll dalle_coco config + the
# relay-interrupted verify smoke + headline confirmation.
set -x
cd /root/repo

# 1. verify smoke the relay wedge interrupted (train driver, loss path
#    now goes through the fused bias-grad head)
timeout 900 python train_dalle.py --model dalle_long --new --yes 2>&1 | grep -E "eval_loss|eval_acc" | tail -2

# 2. e2e Trainer at the UPDATED dalle_coco config (scan_unroll: "full"):
#    pre-unroll best was 90.2k @ b=20
for b in 16 18 20; do BENCH_E2E_BATCH=$b python bench_e2e_step.py; done

# 3. headline confirmation at the shipped defaults (incl. head VJP)
python bench.py
