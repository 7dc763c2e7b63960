from metaasr_tpu.ops.ctc import ctc_loss, ctc_forward

__all__ = ["ctc_loss", "ctc_forward"]
