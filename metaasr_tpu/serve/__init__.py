"""AOT serving: export the decode path as a portable StableHLO bundle.

The reference family has no deployment story (decode runs inside the
training repo's python process); a TPU-native production framework needs
one. ``export.py`` serializes the jitted fbank -> encoder -> batched joint
beam search program with ``jax.export`` so it can be served without the
training code, and keeps the model parameters as ARGUMENTS so the
meta-learning workflow (adapt per accent, hot-swap the adapted weights
into one compiled artifact) costs zero recompiles.
"""

from metaasr_tpu.serve.batcher import DynamicBatcher  # noqa: F401
from metaasr_tpu.serve.export import (  # noqa: F401
    ExportSpec,
    ServingDecoder,
    cast_weights,
    export_bundle,
    make_decode_fn,
    pack_decode_outputs,
    unpack_decode_outputs,
)
