#!/bin/bash
# r4d drive: validate the device-loop bench default (BENCH_DEVICE_LOOP=100
# is now bench.py's default — this measures the fresh-compile wall cost the
# driver will pay, the headline it will record, and a batch re-sweep under
# the loop form). Run on the real TPU once the relay is responsive.
cd /root/repo || exit 1
LOG=runs/drive_r4d.log
: > "$LOG"
note() { echo "== $* ==" | tee -a "$LOG"; }

note "r4d drive start $(date -u +%FT%TZ)"

note "1. default bench.py (device loop K=100, outer=2): fresh-compile wall"
t0=$SECONDS
python bench.py 2>&1 | tail -2 | tee -a "$LOG"
note "total wall: $((SECONDS - t0))s (compile + warmup call + 2 timed calls)"

note "2. per-step control (BENCH_DEVICE_LOOP=0)"
t0=$SECONDS
BENCH_DEVICE_LOOP=0 python bench.py 2>&1 | tail -1 | tee -a "$LOG"
note "total wall: $((SECONDS - t0))s"

note "3. batch re-sweep under the device loop (b=20, 24)"
for b in 20 24; do
  BENCH_BATCH=$b python bench.py 2>&1 | tail -1 | sed "s/^/b=$b /" | tee -a "$LOG"
done

note "4. REAL trainer with the production device loop (train_multi, K=32 cap)"
BENCH_E2E_BATCH=18 BENCH_E2E_ITERATIONS=32 python bench_e2e_step.py 2>&1 \
  | tail -1 | tee -a "$LOG"

note "r4d drive done $(date -u +%FT%TZ)"
