#!/bin/bash
# r5 serialized on-chip sweep chain (ONE chip — never run two TPU
# processes concurrently; see memory: tpu-attachment-behavior).
# Logs one JSONL per leg under docs/r5_sweeps/.
cd /root/repo
L=docs/r5_sweeps
mkdir -p $L
set -x

# ---- leg 1: MAML knee sweep, second order, pallas CTC (r5 hybrid) ----
BENCH_SECOND_ORDER=1 timeout 3600 python scripts/sweep_throughput.py \
  --points 8x4,4x8,4x16,2x16,4x24 --steps 6 \
  > $L/maml_pallas.jsonl 2> $L/maml_pallas.err

# ---- leg 2: MAML scan backend A/B (same session, same attachment) ----
BENCH_SECOND_ORDER=1 BENCH_CTC_IMPL=scan timeout 2400 python \
  scripts/sweep_throughput.py --points 4x4,8x4,4x16 --steps 6 \
  > $L/maml_scan.jsonl 2> $L/maml_scan.err

# ---- leg 3: ANIL partial-adaptation sweep (FOMAML bf16 flagship) ----
timeout 1800 python scripts/sweep_throughput.py \
  --points 4x16,4x32 --steps 8 \
  > $L/anil_none.jsonl 2> $L/anil_none.err
BENCH_ADAPT_FILTER=decoder timeout 2400 python \
  scripts/sweep_throughput.py --points 4x16,4x24,4x32 --steps 8 \
  > $L/anil_decoder.jsonl 2> $L/anil_decoder.err
BENCH_ADAPT_FILTER=ctc_head,decoder timeout 2400 python \
  scripts/sweep_throughput.py --points 4x16,4x24,4x32 --steps 8 \
  > $L/anil_headdec.jsonl 2> $L/anil_headdec.err

echo CHAIN_DONE
