#!/bin/sh
# Round-4 resume chain (after the 01:59 tunnel drop killed the first run):
# long-subword ASR train (LM already done, ppx 120.95) -> decodes ->
# kernel smoke -> grammar pipeline -> sub5k pipeline -> measurement pass.
# Each main.py TRAIN call retries up to 3x, resuming from latest.pth, so a
# transient remote-compile drop costs one checkpoint interval, not the run.
# Logs: /tmp/*.log ; master log is this script's stdout.
ENV="env -u XLA_FLAGS -u JAX_PLATFORMS"

# train_retry <config> <ckpt_dir> <log> [extra flags...]
train_retry() {
  cfg=$1; ckdir=$2; log=$3; shift 3
  for attempt in 1 2 3; do
    RESUME=""
    # -e, not -f: with ckpt_format: orbax latest.pth is a DIRECTORY
    [ -e "$ckdir/latest.pth" ] && RESUME="--load $ckdir/latest.pth"
    echo "--- train attempt $attempt ($cfg) $RESUME ($(date +%H:%M:%S))"
    if $ENV python main.py --config "$cfg" $RESUME "$@" >> "$log" 2>&1; then
      return 0
    fi
    echo "--- attempt $attempt FAILED (tail of $log):"; tail -3 "$log"
    sleep 30
  done
  echo "--- giving up on $cfg"; return 1
}

cd /root/repo

echo "=== long ASR train ($(date +%H:%M:%S)) ==="
train_retry config/synthetic/las_subword_long.yaml \
  ckpt/las_subword_long_sd0 /tmp/long_asr.log --amp || exit 1
grep -E "WER|saved" /tmp/long_asr.log | tail -8

python - <<'EOF'
import yaml
cfg = yaml.safe_load(open('config/synthetic/las_subword_long.yaml'))
cfg['decode']['early_stop'] = False
yaml.safe_dump(cfg, open('/tmp/las_subword_long_noes.yaml', 'w'))
EOF

for ckpt in best_att latest; do
  echo "=== decode $ckpt early_stop=on ($(date +%H:%M:%S)) ==="
  $ENV python main.py --config config/synthetic/las_subword_long.yaml --test \
      --load ckpt/las_subword_long_sd0/$ckpt.pth --name long_$ckpt \
      > /tmp/long_decode_${ckpt}_es.log 2>&1
  tail -6 /tmp/long_decode_${ckpt}_es.log
done
echo "=== decode latest early_stop=off ($(date +%H:%M:%S)) ==="
$ENV python main.py --config /tmp/las_subword_long_noes.yaml --test \
    --load ckpt/las_subword_long_sd0/latest.pth --name long_latest_noes \
    > /tmp/long_decode_latest_noes.log 2>&1
tail -6 /tmp/long_decode_latest_noes.log
echo "=== long pipeline done ($(date +%H:%M:%S)) ==="

echo "=== kernel smoke ($(date +%H:%M:%S)) ==="
$ENV python - <<'EOF'
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

echo "=== grammar LM train ($(date +%H:%M:%S)) ==="
if [ ! -f ckpt/lm_grammar_sd0/best_ppx.pth ]; then
  train_retry config/synthetic/lm_grammar.yaml ckpt/lm_grammar_sd0 \
    /tmp/gram_lm.log --lm || exit 1
fi
grep ppx /tmp/gram_lm.log | tail -3

echo "=== grammar ASR train ($(date +%H:%M:%S)) ==="
train_retry config/synthetic/las_grammar.yaml ckpt/las_grammar_sd0 \
  /tmp/gram_asr.log --amp || exit 1
grep -E "WER|saved" /tmp/gram_asr.log | tail -6

python - <<'EOF'
import yaml
cfg = yaml.safe_load(open('config/synthetic/las_grammar.yaml'))
cfg['decode']['lm_weight'] = 0.0
yaml.safe_dump(cfg, open('/tmp/las_grammar_nolm.yaml', 'w'))
EOF
for variant in lm nolm; do
  CFG=config/synthetic/las_grammar.yaml
  [ "$variant" = nolm ] && CFG=/tmp/las_grammar_nolm.yaml
  echo "=== decode best_att $variant ($(date +%H:%M:%S)) ==="
  $ENV python main.py --config $CFG --test \
      --load ckpt/las_grammar_sd0/best_att.pth --name grammar_$variant \
      > /tmp/gram_decode_$variant.log 2>&1
  grep -E "WER" /tmp/gram_decode_$variant.log | tail -2
done
echo "=== grammar pipeline done ($(date +%H:%M:%S)) ==="

echo "=== sub5k LM train ($(date +%H:%M:%S)) ==="
if [ ! -f ckpt/lm_sub5k_sd0/best_ppx.pth ]; then
  train_retry config/synthetic/lm_sub5k.yaml ckpt/lm_sub5k_sd0 \
    /tmp/sub5k_lm.log --lm || exit 1
fi
grep ppx /tmp/sub5k_lm.log | tail -2

echo "=== sub5k ASR train ($(date +%H:%M:%S)) ==="
train_retry config/synthetic/las_sub5k.yaml ckpt/las_sub5k_sd0 \
  /tmp/sub5k_asr.log --amp || exit 1
grep -E "WER|saved" /tmp/sub5k_asr.log | tail -6

python - <<'EOF'
import yaml
for tag, knobs in (("q8", {"psi_quant": "int8"}),
                   ("atk", {"approx_topk": 0.95}),
                   ("q8atk", {"psi_quant": "int8", "approx_topk": 0.95})):
    cfg = yaml.safe_load(open('config/synthetic/las_sub5k.yaml'))
    cfg['decode'].update(knobs)
    yaml.safe_dump(cfg, open(f'/tmp/las_sub5k_{tag}.yaml', 'w'))
EOF
for variant in default q8 atk q8atk; do
  CFG=config/synthetic/las_sub5k.yaml
  [ "$variant" != default ] && CFG=/tmp/las_sub5k_$variant.yaml
  echo "=== decode best_att $variant ($(date +%H:%M:%S)) ==="
  $ENV python main.py --config $CFG --test \
      --load ckpt/las_sub5k_sd0/best_att.pth --name sub5k_$variant \
      > /tmp/sub5k_decode_$variant.log 2>&1
  grep -E "WER" /tmp/sub5k_decode_$variant.log | tail -2
done
echo "=== sub5k pipeline done ($(date +%H:%M:%S)) ==="

echo "=== flagship bench ($(date +%H:%M:%S)) ==="
$ENV python bench.py
echo "=== bench_details (train MFU w/ bf16 residuals) ($(date +%H:%M:%S)) ==="
$ENV python bench_details.py
echo "=== bench_vocab full sweep ($(date +%H:%M:%S)) ==="
$ENV python bench_vocab.py
echo "=== tests_tpu ($(date +%H:%M:%S)) ==="
$ENV python -m pytest tests_tpu/ -q 2>&1 | tail -5
echo "=== ALL DONE ($(date +%H:%M:%S)) ==="
