#!/bin/bash
# Poll the TPU tunnel; when it answers, finish the verify smoke stages the
# relay wedge interrupted (sampling + benches), then the r4b drive.
cd /root/repo
for i in $(seq 1 200); do
  if timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'; import jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" >/dev/null 2>&1; then
    echo "probe ok on attempt $i at $(date)"
    timeout 900 python sample_dalle.py --model dalle_long --text "time year people" --n 2 --top_k 8 2>&1 | tail -2
    timeout 900 python bench_vae.py 2>&1 | tail -1
    bash run_tpu_drive_r4b.sh
    exit $?
  fi
  echo "probe failed attempt $i at $(date); sleeping 90s"
  sleep 90
done
echo "TPU never came up"
exit 41
