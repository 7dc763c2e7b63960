#!/bin/bash
# r5 chip chain, part 3: middle-ground ANIL probes + serving/decode
# benches + final headline. Launch after r5_chip_chain2.sh CHAIN2_DONE.
cd /root/repo
D=docs
set -x

# ---- B0: BPE eval rerun (training completed in chain 2; its eval
# crashed the worker at full-vocab scoring — now re-decoded from the
# saved checkpoint with candidate pruning) ----
timeout 3600 python scripts/flagship_results.py --algos fomaml \
  --grad-dtype bfloat16 --vocab bpe --profile bpe --seed 0 --eval-only \
  --ctc-candidates 40 --out $D/flagship_bpe_r5.json \
  --workdir /tmp/fr_bpe 2> /tmp/fr_bpe_eval.err

# ---- P1: middle-ground adapt_filter throughput probes ----
# acoustic-front + decoder: the accent shift is acoustic, so adapt the
# subsampler + first two encoder layers + decoder (fast weights ~45%)
BENCH_ADAPT_FILTER="subsample,encoder/layer_0/,encoder/layer_1/,decoder" \
  timeout 2400 python scripts/sweep_throughput.py --points 4x16,4x32 \
  --steps 8 > $D/r5_sweeps/anil_front_dec.jsonl 2> $D/r5_sweeps/anil_front_dec.err
# encoder-only: language is shared across accents; adapt all acoustics,
# freeze decoder + ctc head
BENCH_ADAPT_FILTER="subsample,encoder" \
  timeout 2400 python scripts/sweep_throughput.py --points 4x16,4x32 \
  --steps 8 > $D/r5_sweeps/anil_encoder.jsonl 2> $D/r5_sweeps/anil_encoder.err

# ---- P2: quality probe (seed 0) — encoder-only is the stronger
# hypothesis (the accent shift is acoustic; language is shared), and
# the decoder-freeze throughput win comes for free if it holds.
# (front+decoder quality probe dropped for wall-clock; its throughput
# point in P1 bounds what it could buy.) ----
timeout 3600 python scripts/flagship_results.py --algos fomaml \
  --grad-dtype bfloat16 --adapt-filter "subsample,encoder" \
  --seed 0 --out $D/flagship_hard_r5_anil_encoder.json \
  --workdir /tmp/fr_enconly 2> /tmp/fr_enconly.err

# ---- S: serving benches with the r5 async staging ----
timeout 2400 python scripts/serve_bench.py \
  > $D/r5_sweeps/serve_bench_r5.jsonl 2> $D/r5_sweeps/serve_bench_r5.err
timeout 3000 python scripts/batcher_bench.py --loads 100,180,240,300,360 \
  --secs 12 > $D/r5_sweeps/batcher_bench_r5.jsonl \
  2> $D/r5_sweeps/batcher_bench_r5.err

# ---- Dv: BPE-scale decode bench rows ----
timeout 2400 python scripts/decode_bench.py --bpe-only \
  > $D/r5_sweeps/decode_bpe_r5.jsonl 2> $D/r5_sweeps/decode_bpe_r5.err

# ---- F: final headline + second-order bench record ----
timeout 1800 python bench.py > $D/r5_sweeps/bench_final.json \
  2> $D/r5_sweeps/bench_final.err
BENCH_SECOND_ORDER=1 timeout 1800 python scripts/sweep_throughput.py \
  --points 4x16 --steps 6 > $D/r5_sweeps/bench_so_final.jsonl \
  2> $D/r5_sweeps/bench_so_final.err

echo CHAIN3_DONE
