#!/bin/bash
# Poll the TPU tunnel; when it answers, re-run the post-change smoke
# stage, then the r4 measurement drive.
cd /root/repo
for i in $(seq 1 200); do
  if timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'; import jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" >/dev/null 2>&1; then
    echo "probe ok on attempt $i at $(date)"
    timeout 600 python train_dalle.py --model dalle_long --new --yes 2>&1 | grep -E "loss" | tail -2
    bash run_tpu_drive_r4.sh
    exit $?
  fi
  echo "probe failed attempt $i at $(date); sleeping 120s"
  sleep 120
done
echo "TPU never came up"
exit 41
