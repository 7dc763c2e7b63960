"""Throughput-knee sweep (VERDICT r3 item 3): measure the FOMAML meta-step
at operating points past 8x8 until HBM or the MXU saturates, with the same
median-of-passes host-read timing methodology as bench.py (it imports and
reuses bench.measure_jax verbatim, so the numbers are directly comparable
to the headline row).

Prints one JSON line per point and a final summary naming the knee; commit
the table into docs/PROFILE.md.

Usage: python scripts/sweep_throughput.py [--points 16x8,8x16,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

# ordered roughly by fused batch size (tasks * k): the gain path named by
# docs/PROFILE.md is bigger fused batches, so walk it until it bends
DEFAULT_POINTS = [(4, 4), (8, 8), (16, 8), (8, 16), (16, 16), (32, 8),
                  (8, 32), (32, 16), (16, 32)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=str, default=None,
                    help="comma list like 16x8,8x16 (tasks x k_shot)")
    ap.add_argument("--steps", type=int, default=8,
                    help="steps per timing pass (big points need fewer)")
    args = ap.parse_args()
    points = DEFAULT_POINTS
    if args.points:
        points = [tuple(int(v) for v in p.split("x"))
                  for p in args.points.split(",")]

    rows = []
    for m_tasks, k_shot in points:
        try:
            pres_per_sec, mfu = bench.measure_jax(
                steps=args.steps, m_tasks=m_tasks, k_shot=k_shot)
        except Exception as e:  # noqa: BLE001 — OOM/HBM exhaustion ends a leg
            print(json.dumps({"tasks": m_tasks, "k_shot": k_shot,
                              "error": f"{type(e).__name__}: {e}"[:300]}))
            sys.stdout.flush()
            continue
        unique = pres_per_sec * (k_shot + k_shot) / (
            k_shot * bench.INNER_STEPS + k_shot)
        row = {"tasks": m_tasks, "k_shot": k_shot,
               "fused_batch": m_tasks * k_shot,
               "unique_utts_per_sec": round(unique, 2),
               "presentations_per_sec": round(pres_per_sec, 2),
               "mfu": round(mfu, 4) if mfu == mfu else None}
        rows.append(row)
        print(json.dumps(row))
        sys.stdout.flush()

    if rows:
        best = max(rows, key=lambda r: r["unique_utts_per_sec"])
        print(json.dumps({"summary": "best operating point", **best}))


if __name__ == "__main__":
    main()
