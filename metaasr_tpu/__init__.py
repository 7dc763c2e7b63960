"""metaasr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) meta-learning ASR framework.

A from-scratch rebuild of the capabilities of ``sunprinceS/MetaASR-CrossAccent``
(joint CTC-attention ASR meta-learned across per-accent tasks with MAML/FOMAML,
k-shot adaptation to unseen accents, beam-search decoding), re-designed
TPU-first:

- the audio front-end (STFT -> log-mel fbank -> CMVN -> SpecAugment) is
  GEMM-native (matmul DFT + mel matmul) and fused into a single Pallas kernel;
- the CTC forward-backward loss is a log-space alpha/beta recursion under
  ``lax.scan`` with a Pallas kernel variant;
- the MAML inner/outer loop is ``jax.grad``-over-``grad`` with inner SGD steps
  unrolled under ``jit`` and accent tasks ``vmap``-ped and sharded over a
  device mesh (no copy-the-model orchestration);
- beam search runs batched on-device with fixed-shape hypothesis state.

Reference behavior spec: SURVEY.md (reconstruction; reference mount was empty)
and BASELINE.json (binding functional spec).
"""

__version__ = "0.1.0"

from metaasr_tpu.config import Config, load_config, save_config  # noqa: E402

__all__ = ["Config", "load_config", "save_config", "__version__"]
