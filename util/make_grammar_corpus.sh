#!/bin/sh
# Generate the LM-fusion demonstration corpus (BASELINE.md "grammar corpus"):
# 800-word inventory, 200 homophone pairs (identical audio, different
# spelling), bigram grammar (branch 4) on dev/test/lm_text, UNIFORM word
# order on the ASR train split, 50k text-only LM sentences, V=1024 spm
# vocab trained on the LM text. Run from the repo root.
set -e
OUT=${1:-data/synth_grammar}
python -m end_to_end_asr_pytorch_tpu.data.make_synthetic \
    --out "$OUT" --n_train 4096 --n_dev 64 --n_test 64 \
    --min_words 5 --max_words 8 --word_inventory 800 \
    --grammar bigram --branch 4 --homophones 200 \
    --text_only 50000 --uniform_train
python util/generate_vocab_file.py --input_file "$OUT/lm_text.txt" \
    --mode subword --vocab_size 1024 --format spm \
    --output_file "$OUT/bpe1024.model"
echo "grammar corpus ready at $OUT"
