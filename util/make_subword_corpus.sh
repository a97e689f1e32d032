#!/bin/sh
# Generate a subword-scale synthetic corpus + V=1024 sentencepiece vocab.
#   util/make_subword_corpus.sh [OUT] [MIN_WORDS] [MAX_WORDS]
# Defaults reproduce data/synth_sub (2-5 words/utt), used by
# config/synthetic/{las,lm}_subword.yaml (BASELINE.md "subword-scale
# learnability"). `util/make_subword_corpus.sh data/synth_sub_long 12 14`
# builds the LibriSpeech-length (~7 s/utt) variant for
# {las,lm}_subword_long.yaml. Run from the repo root.
set -e
OUT=${1:-data/synth_sub}
MINW=${2:-2}
MAXW=${3:-5}
# 4096 train utts x ~3.5 words ~= 18 instances per inventory word — the
# 768-utt first attempt (3.4/word) was data-starved (dev WER stuck at 1.0)
python -m end_to_end_asr_pytorch_tpu.data.make_synthetic \
    --out "$OUT" --n_train 4096 --n_dev 64 --n_test 64 \
    --min_words "$MINW" --max_words "$MAXW" --word_inventory 800
# transcripts -> training text
find "$OUT/train-clean" -name '*.trans.txt' -exec cat {} + \
    | cut -d' ' -f2- | tr 'A-Z' 'a-z' > "$OUT/train_text.txt"
python util/generate_vocab_file.py --input_file "$OUT/train_text.txt" \
    --mode subword --vocab_size 1024 --format spm \
    --output_file "$OUT/bpe1024.model"
echo "subword corpus ready at $OUT"
