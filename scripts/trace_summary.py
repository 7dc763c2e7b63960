#!/usr/bin/env python
"""Summarize a jax.profiler TPU trace into an op-time table.

Usage:
    BENCH_PROFILE=1 python bench.py          # writes profiles/...xplane.pb
    python scripts/trace_summary.py [trace.xplane.pb] [--steps 5] [--top 25]

Aggregates XLA-op durations from the trace's "XLA Ops" line, collapsing
fusion-instance suffixes, and prints per-step costs (the bench profiles 5
steps). Parses the XSpace proto with tensorflow's bundled schema; protobuf
descriptor-version friction is worked around by forcing the pure-python
implementation.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def find_trace() -> str:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cands = sorted(glob.glob(
        os.path.join(here, "profiles/plugins/profile/*/*.xplane.pb")))
    if not cands:
        raise SystemExit("no trace found — run BENCH_PROFILE=1 python bench.py")
    return cands[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", nargs="?", default=None)
    ap.add_argument("--steps", type=int, default=5,
                    help="steps profiled (bench.py traces 5)")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = args.trace or find_trace()
    sp = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        sp.ParseFromString(f.read())
    tpu = [p for p in sp.planes if p.name.startswith("/device:TPU")]
    if not tpu:
        raise SystemExit(f"no TPU plane in {path}")
    plane = tpu[0]
    evmeta = {m.id: m.name for m in plane.event_metadata.values()}
    lines = [l for l in plane.lines if l.name == "XLA Ops"]
    if not lines:
        raise SystemExit("no 'XLA Ops' line — was the trace device-side?")
    agg = collections.Counter()
    cnt = collections.Counter()
    for ev in lines[0].events:
        name = evmeta.get(ev.metadata_id, "?")
        base = name.split(".")[0]
        agg[base] += ev.duration_ps / 1e6
        cnt[base] += 1
    # %while is a container op: its duration includes its body's ops,
    # which are also reported individually — exclude it from the total
    body = {k: v for k, v in agg.items() if not k.startswith("%while")}
    total = sum(body.values())
    print(f"trace: {path}")
    print(f"device-op time: {total / args.steps / 1e3:.2f} ms/step "
          f"({args.steps} steps)")
    print(f"{'ms/step':>9}  {'%':>5}  {'count':>6}  op")
    for name, t in sorted(body.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{t / args.steps / 1e3:9.3f}  {100 * t / total:5.1f}  "
              f"{cnt[name] // args.steps:6d}  {name}")


if __name__ == "__main__":
    main()
