"""On-chip AOT serving check: export the decode bundle, reload it, and
assert parity against the in-process jitted decode ON THE REAL TPU.

The CI tests (tests/test_export.py) prove the round trip on the CPU
backend; this script closes the "Mosaic/TPU execution differs" risk class
the same way scripts/kernel_check.py does for the Pallas kernels — run it
on the TPU machine and commit the output (docs/EXPORT_CHECK_TPU.md).

Usage: python scripts/export_check.py [--flagship]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flagship", action="store_true",
                    help="flagship dims (d=256, 12 enc / 6 dec, bf16) "
                    "instead of tiny")
    args = ap.parse_args()

    from metaasr_tpu.config import Config
    from metaasr_tpu.data.tokenizer import CharTokenizer
    from metaasr_tpu.serve import ExportSpec, ServingDecoder, export_bundle
    from metaasr_tpu.serve.export import _beam_cfg_from_train, make_decode_fn
    from metaasr_tpu.train.task import ASRTask

    dev = jax.devices()[0]
    print(f"platform={dev.platform} device={dev}")

    tok = CharTokenizer.ascii_default()
    cfg = Config()
    cfg.model.arch = "transformer"
    cfg.model.vocab_size = tok.vocab_size
    if args.flagship:
        cfg.model.d_model, cfg.model.num_heads = 256, 4
        cfg.model.d_ff = 2048
        cfg.model.num_encoder_layers, cfg.model.num_decoder_layers = 12, 6
        cfg.model.dtype = "bfloat16"
    else:
        cfg.model.d_model, cfg.model.num_heads = 64, 2
        cfg.model.d_ff = 128
        cfg.model.num_encoder_layers, cfg.model.num_decoder_layers = 2, 2
    cfg.model.dropout = 0.0
    cfg.data.max_tokens = 16
    cfg.train.beam_size = 5
    task = ASRTask(cfg, tok.sos_eos_id)

    rng = np.random.default_rng(0)
    bsz, width = 4, 16000
    batch = {
        "audio": jnp.asarray(0.1 * rng.standard_normal((bsz, width)),
                             jnp.float32),
        "audio_lens": jnp.asarray([width, 12000, 9000, 15000], np.int32),
        "tokens": jnp.asarray(rng.integers(1, tok.vocab_size - 1, (bsz, 8)),
                              jnp.int32),
        "token_lens": jnp.asarray([8, 5, 6, 7], np.int32),
    }
    params = task.init_params(jax.random.PRNGKey(0), batch)

    with tempfile.TemporaryDirectory() as d:
        export_bundle(cfg, params, tok, d,
                      spec=ExportSpec(buckets=((bsz, width),),
                                      platforms=("cpu", "tpu")))
        size = sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d))
        dec = ServingDecoder(d)
        waves = [np.asarray(batch["audio"][i, : int(batch["audio_lens"][i])])
                 for i in range(bsz)]
        got = dec.transcribe(waves)

    bs_cfg = _beam_cfg_from_train(cfg, lm_active=False)
    fn = jax.jit(make_decode_fn(task, bs_cfg))
    ref = fn(params, batch["audio"], batch["audio_lens"])
    toks, lengths = np.asarray(ref["tokens"]), np.asarray(ref["lengths"])
    scores = np.asarray(ref["scores"])

    ok = True
    for i in range(bsz):
        want = tok.decode(toks[i, 0, : lengths[i, 0]])
        match = got[i]["text"] == want
        sdiff = abs(got[i]["score"] - scores[i, 0])
        ok &= match and sdiff < 1e-3 * max(1.0, abs(scores[i, 0]))
        print(f"utt{i}: exported={got[i]['text']!r} jit={want!r} "
              f"match={match} score_diff={sdiff:.2e}")
    print(f"bundle_bytes={size}")
    print("EXPORT CHECK:", "ALL PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
