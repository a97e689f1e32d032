#!/bin/sh
# Regenerate every on-disk synthetic corpus (none are git-tracked; a fresh
# VM wipes them). Deterministic seeds: corpora are bit-identical across
# regenerations, so trained checkpoints stay compatible with their data.
# ~3.5 min on the 1-core sandbox host. Run from the repo root.
set -e
echo "=== synth ($(date +%H:%M:%S)) ==="
python -m end_to_end_asr_pytorch_tpu.data.make_synthetic \
    --out data/synth --n_train 256
echo "=== synth_sub_long ($(date +%H:%M:%S)) ==="
sh util/make_subword_corpus.sh data/synth_sub_long 12 14
echo "=== synth_grammar ($(date +%H:%M:%S)) ==="
sh util/make_grammar_corpus.sh
echo "=== synth_sub5k ($(date +%H:%M:%S)) ==="
sh util/make_subword5k_corpus.sh
echo "=== synth_sub ($(date +%H:%M:%S)) ==="
sh util/make_subword_corpus.sh
echo "=== datagen done ($(date +%H:%M:%S)) ==="
