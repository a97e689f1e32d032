#!/bin/sh
# Round-4 chip-job chain: waits for the long-subword pipeline sentinel,
# smoke-tests the bf16-residual fused LSTM on the real chip, then runs the
# grammar and sub5k pipelines back to back. Logs: /tmp/chain.log.
set -e
ENV="env -u XLA_FLAGS -u JAX_PLATFORMS"

# bounded wait: the upstream script has `set -e` and never echoes the
# sentinel on failure — give up after 4 h instead of spinning forever
i=0
while ! grep -q "pipeline done" /tmp/long_pipeline.log 2>/dev/null; do
  i=$((i + 1))
  [ $i -gt 240 ] && { echo "timed out waiting for long pipeline"; exit 1; }
  sleep 60
done
echo "=== long pipeline finished; kernel smoke ($(date +%H:%M:%S)) ==="

$ENV python - <<'EOF'
# bf16-residual fused-LSTM smoke on the REAL chip: fwd+bwd compile + run
import jax, jax.numpy as jnp
from end_to_end_asr_pytorch_tpu.ops.pallas.lstm_kernel import lstm_scan_fused
assert jax.devices()[0].platform == "tpu", jax.devices()
T, B, H = 32, 8, 128
k = jax.random.PRNGKey(0)
xp = jax.random.normal(k, (T, B, 4 * H), jnp.bfloat16)
whh = jax.random.normal(k, (H, 4 * H), jnp.float32) * 0.1
mask = jnp.ones((T, B), bool)
f = jax.jit(lambda xp, w: jnp.sum(
    lstm_scan_fused(xp, w, mask).astype(jnp.float32)))
g = jax.jit(jax.grad(f, argnums=(0, 1)))
print("fwd", float(f(xp, whh)))
dxp, dw = g(xp, whh)
print("bwd ok", dxp.dtype, float(jnp.abs(dw).sum()))
EOF
echo "=== smoke ok; grammar pipeline ==="
sh util/run_grammar.sh
echo "=== sub5k pipeline ==="
sh util/run_sub5k.sh
echo "=== chain done ($(date +%H:%M:%S)) ==="
