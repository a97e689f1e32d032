#!/bin/sh
# V=5120 trained-model pipeline (BASELINE.md V-scaling accuracy companion):
# LM train -> ASR train (20k bf16) -> beam+LM decode default / psi_quant
# int8 / approx_topk 0.95 (the two large-V levers' WER effect on a TRAINED
# checkpoint). Run from the repo root on the TPU host; logs /tmp/sub5k_*.log.
set -e
ENV="env -u XLA_FLAGS -u JAX_PLATFORMS"

echo "=== sub5k LM train ($(date +%H:%M:%S)) ==="
$ENV python main.py --config config/synthetic/lm_sub5k.yaml --lm \
    > /tmp/sub5k_lm.log 2>&1
grep ppx /tmp/sub5k_lm.log | tail -2

echo "=== sub5k ASR train ($(date +%H:%M:%S)) ==="
$ENV python main.py --config config/synthetic/las_sub5k.yaml --amp \
    > /tmp/sub5k_asr.log 2>&1
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
