#!/bin/sh
# Round-4 measurement pass: runs after round4_chain.sh finishes (sentinel
# "chain done" in /tmp/chain.log). Flagship bench, train/MFU details (the
# bf16-residual fused-LSTM effect), the full V-scaling sweep incl. q8 +
# approx_topk rows, then the compiled on-chip kernel suite.
# Logs: /tmp/measure.log.
set -e
ENV="env -u XLA_FLAGS -u JAX_PLATFORMS"

# bounded wait (see round4_chain.sh): give up after 6 h, don't spin forever
i=0
while ! grep -q "chain done" /tmp/chain.log 2>/dev/null; do
  i=$((i + 1))
  [ $i -gt 360 ] && { echo "timed out waiting for chain"; exit 1; }
  sleep 60
done
echo "=== chain finished; flagship bench ($(date +%H:%M:%S)) ==="
$ENV python bench.py
echo "=== bench_details (train MFU w/ bf16 residuals) ($(date +%H:%M:%S)) ==="
$ENV python bench_details.py
echo "=== bench_vocab full sweep ($(date +%H:%M:%S)) ==="
$ENV python bench_vocab.py
echo "=== tests_tpu ($(date +%H:%M:%S)) ==="
$ENV python -m pytest tests_tpu/ -q 2>&1 | tail -5
echo "=== measure done ($(date +%H:%M:%S)) ==="
