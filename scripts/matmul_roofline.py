#!/usr/bin/env python
"""Isolated matmul microbench at the meta-step's dominant shapes.

docs/PROFILE.md attributes ~46% of step time to matmul fusions running at
~46 TF/s (~23% of v5e bf16 peak). This measures whether that is the SHAPE
REGIME's ceiling or a scheduling problem: each row times a bare jitted
bf16 matmul (or batched matmul, mirroring the vmapped task axis) at the
shapes the flagship model actually runs, with enough iterations to
amortize dispatch.

Shapes (flagship bench workload: 4 tasks x 4 utts, T=99 encoder frames
after 4x subsampling, d=256, ff=2048, heads 4):

  encoder QKV/proj:   [B*T, 256]   x [256, 256]    (B*T = 16*99 = 1584)
  encoder FFN in:     [B*T, 256]   x [256, 2048]
  encoder FFN out:    [B*T, 2048]  x [2048, 256]
  attention scores:   batched [16*4, 99, 64] x [16*4, 64, 99]
  per-task (vmapped): batched [4, 396, 256] x [4, 256, 256]
  large-batch (8x8):  [8*8*99, 256] x [256, 2048]

Run on the TPU machine: python scripts/matmul_roofline.py
Output belongs in docs/PROFILE.md (roofline evidence, VERDICT r2 #5b).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def bench_matmul(a_shape, b_shape, iters=50, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(a_shape), dtype)
    b = jnp.asarray(rng.standard_normal(b_shape), dtype)

    @jax.jit
    def run(a, b):
        # chain of dependent matmuls so the device stays busy and XLA
        # can't hoist anything; re-projects back to a's shape each round
        def body(x, _):
            y = x @ b
            x2 = y @ jnp.swapaxes(b, -1, -2)
            return x2.astype(dtype), ()

        out, _ = jax.lax.scan(body, a, None, length=iters)
        return out

    out = run(a, b)
    jax.block_until_ready(out)
    # median of 3; completion forced by a host value read (block_until_ready
    # can return early on this attachment — see bench.py timing note)
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(a, b)
        _ = float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
        dts.append(time.perf_counter() - t0)
    dt = sorted(dts)[1]
    m = int(np.prod(a_shape[:-1]))
    k = a_shape[-1]
    n = b_shape[-1]
    batch = 1
    if len(b_shape) == 3:
        batch = b_shape[0]
        m = int(np.prod(a_shape[1:-1]))
    flops = 2 * 2 * batch * m * k * n * iters   # fwd+transpose chain
    return flops / dt / 1e12


def main():
    kind = jax.devices()[0].device_kind
    peak = 197.0 if "v5 lite" in kind.lower() else 275.0
    print(f"device={kind}  bf16 peak ~{peak} TF/s")
    rows = [
        ("enc qkv/proj [1584,256]x[256,256]", (1584, 256), (256, 256)),
        ("enc ffn-in   [1584,256]x[256,2048]", (1584, 256), (256, 2048)),
        ("enc ffn-out  [1584,2048]x[2048,256]", (1584, 2048), (2048, 256)),
        ("attn scores  [64,99,64]x[64,64,99]", (64, 99, 64), (64, 64, 99)),
        ("task-batched [4,396,256]x[4,256,256]", (4, 396, 256), (4, 256, 256)),
        ("8x8-shot ffn [6336,256]x[256,2048]", (6336, 256), (256, 2048)),
        ("ideal-large  [8192,2048]x[2048,2048]", (8192, 2048), (2048, 2048)),
    ]
    for name, a, b in rows:
        tf = bench_matmul(a, b)
        print(f"  {name:<42} {tf:7.1f} TF/s  ({100*tf/peak:5.1f}% peak)")


if __name__ == "__main__":
    main()
