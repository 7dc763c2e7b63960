#!/bin/bash
# r5 chip chain, part 4 (optional, time-permitting): longer BPE-vocab
# flagship run — 1500 char-tuned steps left vocab-563 unconverged
# (WER 0.97, docs/flagship_bpe_r5.json); give it a real budget.
cd /root/repo
D=docs
set -x
# (decode re-measure already done directly)
timeout 5400 python scripts/flagship_results.py --algos fomaml \
  --grad-dtype bfloat16 --vocab bpe --profile bpe --seed 0 \
  --steps 5000 --ctc-candidates 40 \
  --out $D/flagship_bpe_r5_long.json --workdir /tmp/fr_bpe_long \
  2> /tmp/fr_bpe_long.err
echo CHAIN4_DONE
