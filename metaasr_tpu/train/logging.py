"""Metrics/observability (SURVEY.md section 2.1 #19, section 5.5).

The reference logs scalars to comet_ml/TensorBoard. Offline-first here:
a JSONL scalar writer (always works) + optional clu/TensorBoard backend when
requested (clu pulls in TF, so it is lazy). Scalar set mirrors the
reference: per-step losses (ctc, att, total), per-task inner/outer loss,
dev CER/WER, LR, plus utts/sec/chip (BASELINE.json:2).
"""

from __future__ import annotations

import json
import os
import time


class MetricLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = False,
                 print_every: int = 0):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "scalars.jsonl"), "a", buffering=1)
        self._tb = None
        self.print_every = print_every
        if use_tensorboard:
            try:
                from clu import metric_writers

                self._tb = metric_writers.create_default_writer(log_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: dict) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.write_scalars(step, {k: float(v) for k, v in scalars.items()})
        if self.print_every and step % self.print_every == 0:
            msg = " ".join(f"{k}={float(v):.4g}" for k, v in scalars.items())
            print(f"[step {step}] {msg}", flush=True)

    def log_text(self, step: int, tag: str, text: str) -> None:
        self._f.write(json.dumps({"step": int(step), "tag": tag, "text": text}) + "\n")

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
