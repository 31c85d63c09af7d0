#!/bin/bash
# poll the TPU; exit 0 when healthy
for i in $(seq 1 60); do
  if timeout 30 python -c "import jax, jax.numpy as jnp; print((jnp.ones((8,))*2).sum())" >/dev/null 2>&1; then
    echo "TPU healthy after $i attempts"
    exit 0
  fi
  sleep 25
done
echo "TPU still down"
exit 1
