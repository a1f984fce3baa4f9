#!/bin/bash
# Poll the TPU tunnel; when it answers, run the r3b drive.
cd /root/repo
for i in $(seq 1 200); do
  if timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'; import jax.numpy as jnp; print(float(jnp.ones((8,8)).sum()))" >/dev/null 2>&1; then
    echo "probe ok on attempt $i at $(date)"
    bash run_tpu_drive_r3b.sh
    exit $?
  fi
  echo "probe failed attempt $i at $(date); sleeping 120s"
  sleep 120
done
echo "TPU never came up"
exit 41
