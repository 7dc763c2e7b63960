#!/bin/bash
# r5 chip chain, part 2: quality runs + serving/decode benches.
# Serialized — launch only after r5_chip_chain.sh prints CHAIN_DONE.
cd /root/repo
D=docs
set -x

# ---- P0: ANIL-decoder deeper-k probes — the old fused-64 knee was set
# by per-task fast-weight HBM traffic, which ANIL mostly removes; map
# where the NEW knee lands ----
BENCH_ADAPT_FILTER=decoder timeout 2400 python \
  scripts/sweep_throughput.py --points 4x48,4x64,8x32 --steps 6 \
  > $D/r5_sweeps/anil_decoder_deep.jsonl 2> $D/r5_sweeps/anil_decoder_deep.err

# ---- Q1: ANIL-decoder quality, 3 training seeds (fomaml bf16,
# config3 geometry 4x4 — same protocol as the committed full-adaptation
# baseline 0.021 +- 0.003) ----
for s in 0 1 2; do
  timeout 3600 python scripts/flagship_results.py --algos fomaml \
    --grad-dtype bfloat16 --adapt-filter decoder --seed $s \
    --out $D/flagship_hard_r5_anil_dec_seed$s.json \
    --workdir /tmp/fr_anil_$s 2> /tmp/fr_anil_$s.err
done

# ---- Q2: MAML bf16 at the promoted 4x16 operating point, 3 seeds ----
for s in 0 1 2; do
  timeout 3600 python scripts/flagship_results.py --algos maml \
    --grad-dtype bfloat16 --tasks 4 --k 16 --seed $s \
    --out $D/flagship_hard_r5_maml_4x16_seed$s.json \
    --workdir /tmp/fr_maml416_$s 2> /tmp/fr_maml416_$s.err
done

# ---- Q3: BPE-vocab flagship run (vocab >= 512, fomaml bf16) ----
timeout 5400 python scripts/flagship_results.py --algos fomaml \
  --grad-dtype bfloat16 --vocab bpe --profile bpe --seed 0 \
  --out $D/flagship_bpe_r5.json --workdir /tmp/fr_bpe \
  2> /tmp/fr_bpe.err

echo CHAIN2_DONE
