#!/bin/sh
# LM-fusion demonstration pipeline (BASELINE.md "grammar corpus"):
# LM train (50k text-only grammar sentences) -> ASR train (15k bf16,
# uniform-order audio with homophones) -> beam decode WITH vs WITHOUT LM.
# Run from the repo root on the TPU host; logs to /tmp/gram_*.log.
set -e
ENV="env -u XLA_FLAGS -u JAX_PLATFORMS"

echo "=== grammar LM train ($(date +%H:%M:%S)) ==="
$ENV python main.py --config config/synthetic/lm_grammar.yaml --lm \
    > /tmp/gram_lm.log 2>&1
grep ppx /tmp/gram_lm.log | tail -3

echo "=== grammar ASR train ($(date +%H:%M:%S)) ==="
$ENV python main.py --config config/synthetic/las_grammar.yaml --amp \
    > /tmp/gram_asr.log 2>&1
grep -E "WER|saved" /tmp/gram_asr.log | tail -6

# no-LM variant config for the A/B
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
