"""The day-1 acceptance drill's composition (VERDICT r4 item 7): every
CLI stage — CV prep, meta-train, adapt, adapted-npz, export, serve —
must run green end-to-end. Smoke mode: tiny model/steps, WER quality
bound waived (quality is RESULTS.md's job; this pins the COMPOSITION).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_acceptance_drill_smoke(tmp_path):
    out = str(tmp_path / "acc")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "acceptance.py"),
         "--out", out, "--smoke", "--steps", "6", "--utts", "10"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "ACCEPTANCE GREEN" in r.stdout
    summary = json.load(open(os.path.join(out, "acceptance.json")))
    assert "served_wer" in summary and summary["served_wer"] == summary[
        "served_wer"]
    # every serve record produced text output (possibly imperfect)
    records = [json.loads(line) for line in
               open(os.path.join(out, "serve_out.jsonl"))]
    assert len(records) == 8
    for rec in records:
        assert "text" in rec and "score" in rec
