#!/bin/sh
# The LibriSpeech-length subword pipeline (BASELINE.md "long subword" row):
# LM train -> ASR train (30k bf16) -> beam+LM decode of best_att and latest,
# each decode twice (early_stop on/off) for the early-exit A/B timing.
# Run from the repo root on the TPU host; logs to /tmp/long_*.log.
set -e
ENV="env -u XLA_FLAGS -u JAX_PLATFORMS"

echo "=== LM train ($(date +%H:%M:%S)) ==="
$ENV python main.py --config config/synthetic/lm_subword_long.yaml --lm \
    > /tmp/long_lm.log 2>&1
tail -3 /tmp/long_lm.log

echo "=== ASR train ($(date +%H:%M:%S)) ==="
$ENV python main.py --config config/synthetic/las_subword_long.yaml --amp \
    > /tmp/long_asr.log 2>&1
grep -E "WER|saved" /tmp/long_asr.log | tail -8

# early_stop=false variant config for the A/B
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
echo "=== pipeline done ($(date +%H:%M:%S)) ==="
